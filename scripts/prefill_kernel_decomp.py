"""Decompose the fused prefill kernel's 6.8 ms (vs 6.3 XLA): where does it go?

Variants (timing only — numerics deliberately wrong for the debug legs):
  full          — the real kernel
  shift1        — only the s=0 attention pass (isolates the 14 extra passes)
  shift1+nokv   — additionally skip the K/V out-DMA
  rows480       — 480-row blocks (nb=4): confirmed VMEM-OOM at compile round 1;
                  retried here only if the others leave margin unexplained.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/prefill_kernel_decomp.py \
      > /tmp/prefill_kernel_decomp.log 2>&1 < /dev/null & disown
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops import decode_step as DS
    from gpt2_image_captioning_tpu.ops import prefill_step as PS

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    gpt_params = C._gpt(trainable, frozen)

    b, p_len = 128, 15
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        rng.normal(size=(b, p_len, 768)).astype(np.float32)
    ).astype(policy.compute_dtype)

    packed = jax.jit(
        lambda gp: DS.pack_decode_weights(gp, policy.compute_dtype)
    )(gpt_params)

    def nloop(step):
        def run(*arrays):
            def body(c, _):
                return step(c, *arrays), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return out

        return jax.jit(run)

    def timed(jitted, *args):
        np.asarray(jitted(*args))
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        np.asarray(jitted(*args))
        return (time.perf_counter() - t0) / 2 / N * 1000

    def leg(tag, **kw):
        def s(c, pk, px):
            xo, ko, vo = PS.fused_prefill(
                pk, px + c.astype(px.dtype), n_head=gcfg.n_head, **kw
            )
            return (
                xo[0, 0, 0].astype(jnp.float32)
                + ko[0, 0, 0, 0].astype(jnp.float32)
                + vo[0, 0, 0, 0].astype(jnp.float32)
            )

        try:
            ms = timed(nloop(s), packed, x0)
            log(f"{tag:24s}: {ms:7.3f} ms/iter")
        except Exception as e:  # noqa: BLE001
            log(f"{tag:24s}: FAILED {type(e).__name__}: {str(e)[:160]}")

    leg("full (240-row blocks)")
    leg("shift1", debug_max_shift=1)
    leg("shift1+nokv", debug_max_shift=1, debug_skip_kv_dma=True)
    leg("full rows480", target_rows=512)
    log("done")


if __name__ == "__main__":
    main()
