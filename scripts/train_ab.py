"""On-chip decomposition of the flagship training step + xent chunk A/B.

Times (pipelined N-iteration loops, one sync — the only reliable method on
this box, see PERF_NOTES "Round-2 correction"):

  1. loss forward only
  2. loss value_and_grad
  3. full train step (grad + AdamW + schedule)
  4. xent_sum fwd+bwd in isolation at chunk = 2048/4096/8192/16384
  5. blocks forward only (no mapper/CE) as the matmul-ceiling reference

Run DETACHED alone on the real chip (no other process, PYTHONPATH untouched):
  cd /root/repo && setsid nohup python -u scripts/train_ab.py \
      > /tmp/train_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit_loop(fn, n=12, warm=2):
    """fn() must return something device-resident; syncs once at the end."""
    for _ in range(warm):
        np.asarray(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(n)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / n * 1000


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

    # --- 1: loss forward only ----------------------------------------------
    @jax.jit
    def fwd(tr, fz, b):
        s, c = C.loss_fn(tr, fz, ccfg, b, policy)
        return s / jnp.maximum(c, 1)

    t1 = timeit_loop(lambda: fwd(trainable, frozen, tbatch))
    print(f"1  loss forward only                 : {t1:7.2f} ms", flush=True)

    # --- 2: value_and_grad ---------------------------------------------------
    @jax.jit
    def vg(tr, fz, b):
        def f(tr):
            s, c = C.loss_fn(tr, fz, ccfg, b, policy)
            return s / jnp.maximum(c, 1)

        loss, g = jax.value_and_grad(f)(tr)
        return loss + jax.tree.reduce(
            lambda a, x: a + jnp.sum(x).astype(jnp.float32), g, jnp.float32(0)
        ) * 0

    t2 = timeit_loop(lambda: vg(trainable, frozen, tbatch))
    print(f"2  loss value_and_grad               : {t2:7.2f} ms", flush=True)

    # --- 3: full train step ---------------------------------------------------
    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.train import optim as _optim
    from gpt2_image_captioning_tpu.train.loop import make_train_step

    mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    opt_cfg = _optim.AdamWConfig(learning_rate=1e-4, num_training_steps=1000)
    step_fn, (tr_sh, fr_sh, opt_sh, b_sh) = make_train_step(ccfg, opt_cfg, mesh, policy)
    tr_d = jax.device_put(trainable, tr_sh)
    fz_d = jax.device_put(frozen, fr_sh)
    opt_d = jax.device_put(_optim.init(tr_d), opt_sh)
    b_d = jax.device_put(tbatch, b_sh)

    state = [tr_d, opt_d]

    def step():
        tr, opt, loss, _ = step_fn(state[0], state[1], fz_d, b_d, {})
        state[0], state[1] = tr, opt
        return loss

    t3 = timeit_loop(step)
    print(f"3  full train step (AdamW)           : {t3:7.2f} ms", flush=True)

    # --- 4: xent chunk A/B ----------------------------------------------------
    n_rows = batch * 50
    h = jnp.asarray(rng.normal(size=(n_rows, 768)).astype(np.float32)).astype(jnp.bfloat16)
    wte = frozen["gpt"]["wte"]
    labels = jnp.asarray(rng.integers(0, 50256, size=(n_rows,)).astype(np.int32))

    for chunk in (2048, 4096, 8192, 16384):

        @jax.jit
        def xg(h, wte, labels, chunk=chunk):
            def f(h):
                return X.xent_sum(h, wte, labels, chunk)

            loss, g = jax.value_and_grad(f)(h)
            return loss + jnp.sum(g).astype(jnp.float32) * 0

        t = timeit_loop(lambda: xg(h, wte, labels))
        print(f"4  xent fwd+bwd chunk={chunk:5d}          : {t:7.2f} ms", flush=True)

    # --- 5: blocks forward ceiling --------------------------------------------
    x65 = jnp.asarray(rng.normal(size=(batch, 65, 768)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    @jax.jit
    def blocks_fwd(gpt, x):
        h = G.forward_hidden(gpt, gcfg, x, None, policy, unroll_layers=True)
        return jnp.sum(h[:, -1, :4].astype(jnp.float32))

    t5 = timeit_loop(lambda: blocks_fwd(frozen["gpt"], x65))
    print(f"5  12 blocks fwd (T=65, unrolled)    : {t5:7.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
