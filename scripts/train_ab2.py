"""Device-true training decomposition: repeat the computation INSIDE one jit.

scripts/train_ab.py showed every per-call measurement on this box clamps at
the ~24-27 ms dispatch floor even when pipelined — the only trustworthy way
to time sub-50ms device work over this tunnel is to run N dependent
repetitions inside a single jitted program and divide.

Items (each a fori_loop of N=10 dependent iterations, one dispatch):
  1. 12 GPT-2 blocks forward (T=65, unrolled, bf16)
  2. full loss forward (mapper + blocks + chunked CE)
  3. loss value_and_grad (the training gradient)
  4. xent_sum fwd+bwd at chunk = 4096 / 8192 / 16384
  5. mapper forward alone

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/train_ab2.py \
      > /tmp/train_ab2.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 10


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
    from gpt2_image_captioning_tpu.ops import xent as X

    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    batch = 128
    rng = np.random.default_rng(2)
    tbatch = {
        "token_ids": jnp.asarray(rng.integers(0, 50256, size=(batch, 50)).astype(np.int32)),
        "labels": jnp.asarray(rng.integers(0, 50256, size=(batch, 50)).astype(np.int32)),
        "attention_mask": jnp.ones((batch, 50), jnp.int32),
        "image_embedding": jnp.asarray(rng.normal(size=(batch, 512)).astype(np.float32)),
    }

    # Fixed reference: one dispatch of a trivial program (dispatch floor)
    @jax.jit
    def empty(x):
        return x + 1

    g_t = timeit1(lambda: empty(jnp.zeros((), jnp.int32)))
    print(f"0  dispatch floor (empty jit)          : {g_t:7.2f} ms", flush=True)

    def report(name, per_iter_ms):
        print(f"{name}: {per_iter_ms:7.2f} ms/iter (N={N} in-jit)", flush=True)

    # --- 1: blocks forward ----------------------------------------------------
    x65 = jnp.asarray(rng.normal(size=(batch, 65, 768)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def blocks_loop(gpt, x):
        def body(i, x):
            h = G.forward_hidden(gpt, gcfg, x, None, policy, unroll_layers=True)
            return x + h * jnp.bfloat16(1e-6)  # dependency, negligible cost

        return jnp.sum(jax.lax.fori_loop(0, N, body, x)[:, -1, :4].astype(jnp.float32))

    t = timeit1(lambda: blocks_loop(frozen["gpt"], x65))
    report("1  12 blocks fwd (T=65, unrolled)     ", (t - g_t) / N)

    # --- 2: loss forward --------------------------------------------------------
    @jax.jit
    def lossfwd_loop(tr, fz, b):
        def body(i, acc):
            s, c = C.loss_fn(tr, fz, ccfg, dict(b, image_embedding=b["image_embedding"] + acc * 1e-9), policy)
            return acc + (s / jnp.maximum(c, 1)).astype(jnp.float32)

        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    t = timeit1(lambda: lossfwd_loop(trainable, frozen, tbatch))
    report("2  loss forward (mapper+blocks+CE)    ", (t - g_t) / N)

    # --- 3: loss value_and_grad --------------------------------------------------
    @jax.jit
    def vg_loop(tr, fz, b):
        def f(tr, b):
            s, c = C.loss_fn(tr, fz, ccfg, b, policy)
            return s / jnp.maximum(c, 1)

        def body(i, carry):
            acc, tr = carry
            loss, g = jax.value_and_grad(f)(tr, dict(b, image_embedding=b["image_embedding"] + acc * 1e-9))
            # consume the grad with a dependency so nothing is dead
            tr = jax.tree.map(lambda p, gg: p + gg.astype(p.dtype) * 1e-9, tr, g)
            return acc + loss.astype(jnp.float32), tr

        acc, _ = jax.lax.fori_loop(0, N, body, (jnp.float32(0), tr))
        return acc

    t = timeit1(lambda: vg_loop(trainable, frozen, tbatch))
    report("3  loss value_and_grad                ", (t - g_t) / N)

    # --- 4: xent chunk A/B --------------------------------------------------------
    n_rows = batch * 50
    h0 = jnp.asarray(rng.normal(size=(n_rows, 768)).astype(np.float32)).astype(jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 50256, size=(n_rows,)).astype(np.int32))

    for chunk in (1024, 2048, 4096, 8192):

        @jax.jit
        def xg_loop(h, wte, labels, chunk=chunk):
            def f(h):
                return X.xent_sum(h, wte, labels, chunk)

            def body(i, h):
                loss, g = jax.value_and_grad(f)(h)
                return h + g.astype(h.dtype) * jnp.bfloat16(1e-9)

            return jnp.sum(jax.lax.fori_loop(0, N, body, h).astype(jnp.float32)[:4, :4])

        t = timeit1(lambda: xg_loop(h0, frozen["gpt"]["wte"], labels))
        report(f"4  xent fwd+bwd chunk={chunk:5d}           ", (t - g_t) / N)

    # --- 5: mapper forward ----------------------------------------------------------
    emb0 = tbatch["image_embedding"]

    @jax.jit
    def mapper_loop(tr, e):
        def body(i, acc):
            p = C.build_prefix(tr, ccfg, e + acc * 1e-9, policy)
            return acc + jnp.sum(p[:, 0, :4].astype(jnp.float32))

        return jax.lax.fori_loop(0, N, body, jnp.float32(0))

    t = timeit1(lambda: mapper_loop(trainable, emb0))
    report("5  mapper forward                     ", (t - g_t) / N)

    print("done", flush=True)


if __name__ == "__main__":
    main()
