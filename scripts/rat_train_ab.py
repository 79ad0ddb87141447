"""RAT (retrieval-augmented training) on-chip cost: fused vs plain step.

The reference's RAT step leaves the device every batch: `.cpu().numpy()` →
FAISS C++ search → caption reconstruct loop → `torch.from_numpy(...).to()`
(`/root/reference/src/models.py:655-715`).  This framework retrieves
INSIDE the jitted step (models/rat.py::loss_fn_fused): exact top-i over a
COCO-scale store is one (B, 118k) MXU matmul + lax.top_k + gathers.  This
script puts a device-true number on that design: the marginal cost of
retrieval-augmenting a training step at COCO train2017 scale.

Legs (in-jit fori of N=10 dependent reps — the only trustworthy sub-50ms
timing over this tunnel, see scripts/train_ab2.py):
  1. plain loss value_and_grad (flagship: frozen GPT-2, transformer mapper)
  2. RAT fused loss value_and_grad (store: 118,287 x 512 images,
     591,435 x 512 captions, top_i=4, top_k=10, attention aggregator)
  3. fused_retrieve forward alone

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/rat_train_ab.py \
      > /tmp/rat_train_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 10


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timeit1(fn, reps=5, warm=2):
    for _ in range(warm):
        np.asarray(fn())
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        out.append((time.perf_counter() - t0) * 1000)
    return float(np.median(out))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.models import rat as R
    from gpt2_image_captioning_tpu.retrieval.exact import fused_retrieve

    assert jax.default_backend() != "cpu", "run on the TPU"
    policy = BF16
    b, L = 128, 50
    n_img, n_cap, d_emb, c_max = 118_287, 591_435, 512, 7

    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=d_emb, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    rcfg = R.RATConfig(embed_dim=d_emb, aggregation_type="attention", top_k=10, top_i=4)
    log("init 124M params + COCO-scale store (118k imgs / 591k caps)...")
    trainable, frozen = R.init_params(jax.random.PRNGKey(0), ccfg, rcfg)
    rng = np.random.default_rng(0)

    def unit(n, d):
        x = rng.normal(size=(n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    store = {
        "image_embeddings": jnp.asarray(unit(n_img, d_emb)),
        "caption_embeddings": jnp.asarray(unit(n_cap, d_emb)),
        "caption_table": jnp.asarray(
            rng.integers(0, n_cap, size=(n_img, c_max)).astype(np.int32)
        ),
    }
    batch = {
        "image_embedding": jnp.asarray(unit(b, d_emb)),
        "token_ids": jnp.asarray(
            rng.integers(0, gcfg.vocab_size, size=(b, L)).astype(np.int32)
        ),
        "attention_mask": jnp.ones((b, L), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, gcfg.vocab_size, size=(b, L)).astype(np.int32)),
    }

    def nrep(f):
        """f(trainable, frozen, batch, store, i) -> scalar; N dependent reps
        inside one jit.  Everything is a jit ARGUMENT — closing over device
        arrays (the 1.2 GB store especially) forces a device->host copy at
        lowering over this tunnel (CLAUDE.md rule 2)."""

        def run(trainable, frozen, batch, store):
            def body(i, c):
                return c + f(trainable, frozen, batch, store, i) * 0.0 + 1.0

            return jax.lax.fori_loop(0, N, body, jnp.float32(0))

        j = jax.jit(run)
        np.asarray(j(trainable, frozen, batch, store))
        return timeit1(lambda: j(trainable, frozen, batch, store)) / N

    def grad_reduce(loss, grads):
        return loss + jax.tree.reduce(
            lambda a, x: a + x.sum().astype(jnp.float32), grads, jnp.float32(0)
        ) * 0.0

    def plain_step(tr, fz, bt, st, i):
        def lf(tr):
            loss, _ = C.loss_fn(
                tr, fz, ccfg,
                dict(bt, image_embedding=bt["image_embedding"] + i * 0.0),
                policy,
            )
            return loss

        return grad_reduce(*jax.value_and_grad(lf)(tr))

    def rat_step(tr, fz, bt, st, i):
        def lf(tr):
            loss, _ = R.loss_fn_fused(
                tr, fz, ccfg, rcfg,
                dict(bt, image_embedding=bt["image_embedding"] + i * 0.0),
                st, policy,
            )
            return loss

        return grad_reduce(*jax.value_and_grad(lf)(tr))

    def retrieve_only(tr, fz, bt, st, i):
        out = fused_retrieve(
            bt["image_embedding"] + i * 0.0,
            st["image_embeddings"], st["caption_embeddings"],
            st["caption_table"], top_i=rcfg.top_i, top_k=rcfg.top_k,
        )
        return out.sum().astype(jnp.float32)

    t_plain = nrep(plain_step)
    log(f"plain  loss+grad           {t_plain:7.2f} ms/step -> {b / t_plain * 1000:6.0f} captions/s")
    t_rat = nrep(rat_step)
    log(f"RAT    loss+grad (fused)   {t_rat:7.2f} ms/step -> {b / t_rat * 1000:6.0f} captions/s")
    t_ret = nrep(retrieve_only)
    log(f"fused_retrieve alone       {t_ret:7.2f} ms/step")
    log(f"retrieval-augmentation marginal cost: {t_rat - t_plain:+.2f} ms/step "
        f"({(t_rat - t_plain) / t_plain * 100:+.1f}%)")
    log("done")


if __name__ == "__main__":
    main()
