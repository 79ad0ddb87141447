"""int8 KV cache, round-5 re-witness at HEAD (ADVICE r4 medium).

The round-4 snapshot landed a reworked int8-KV scale layout (chunk-major 4D
scale reads + nsk/nsv VMEM new-row-scale outputs + wrapper DUS,
ops/decode_step.py) with no committed on-chip success witness — the one
passing b=128 leg in docs/ab_logs/kv_quant_scale_ab.log may predate the
rework, and interpret-mode tests do not exercise Mosaic lowering.  This
script witnesses, against HEAD:

1. b=128 int8-W bf16-KV vs int8-KV — does the reworked layout COMPILE on
   Mosaic and what does it measure?  (The standing verdict: int8-KV loses at
   b=128, 3,222 vs 3,287 img/s — expect the same shape of result.)
2. b=512 int8-KV — capture the FULL Mosaic error (untruncated traceback),
   replacing the useless "HTTP 500" wrapper line in the r4 log.  Runs under
   GIC_ALLOW_INT8_KV_LARGE_BATCH=1 because the library now fences this
   config (models/captioner.py).

Run DETACHED alone on the real chip:
  cd /root/repo && GIC_ALLOW_INT8_KV_LARGE_BATCH=1 setsid nohup \
      python -u scripts/kv_quant_scale_ab3.py \
      > docs/ab_logs/kv_quant_scale_ab3.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

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

    max_len = 50
    rng = np.random.default_rng(0)
    pack_std = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True
    )

    def bench(b: int, qcache: bool, reps: int = 5) -> None:
        tag = f"b={b:<5d} int8-W {'int8-KV' if qcache else 'bf16-KV'}"
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        try:
            def run():
                return C.generate(
                    trainable, frozen, ccfg, emb,
                    max_length=max_len, temperature=0.0, top_p=1.0,
                    policy=policy, packed=pack_std, decode_quant=True,
                    decode_quant_cache=qcache,
                )

            np.asarray(run())
            np.asarray(run())
            t0 = time.perf_counter()
            outs = [run() for _ in range(reps)]
            for o in outs:
                np.asarray(o)
            dt = time.perf_counter() - t0
            log(f"{tag}: {b * reps / dt:8.1f} img/s  ({dt / reps * 1000:7.2f} ms/batch)")
        except Exception as e:  # noqa: BLE001 — the full error IS the data
            log(f"{tag}: FAILED {type(e).__name__} — full traceback follows")
            traceback.print_exc()
            sys.stderr.flush()

    log("=== leg 1: b=128, HEAD int8-KV layout (nsk/nsv) compile + throughput ===")
    bench(128, qcache=False)
    bench(128, qcache=True)
    log("=== leg 2: b=512 int8-KV — full Mosaic error capture ===")
    assert os.environ.get("GIC_ALLOW_INT8_KV_LARGE_BATCH"), (
        "run with GIC_ALLOW_INT8_KV_LARGE_BATCH=1 (the library fences b>128)"
    )
    bench(512, qcache=True, reps=3)
    log("done")


if __name__ == "__main__":
    main()
