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
2. b>128 int8-KV — compile witness with FULL error capture (untruncated
   traceback), replacing the useless "HTTP 500" wrapper line in the r4 log.

OUTCOME (docs/ab_logs/kv_quant_scale_ab3.log): the rework FIXED the compile —
every config (b=128/512/1024, 128-row and 256-row blocks) Mosaic-compiles
and runs at HEAD; the r4 failure logs predate the rework.  int8-KV still
loses to bf16-KV at every batch (−0.9% to −14%), so the rejected-as-default
verdict stands; the early-round-5 batch fence was removed.  See
docs/PERF_NOTES.md round 5.

Leg selection via GIC_KV_AB_LEGS (default "128ref,128,512"): "128ref" =
bf16-KV comparator at 128, plain numbers = 128-row batches, "<b>t" =
256-row (tw=384) batches.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/kv_quant_scale_ab3.py \
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
    pack_384 = None

    def bench(b: int, qcache: bool, reps: int = 5, tw384: bool = False) -> None:
        nonlocal pack_384
        rows = "256row" if tw384 else "128row"
        tag = f"b={b:<5d} {rows} int8-W {'int8-KV' if qcache else 'bf16-KV'}"
        if tw384 and pack_384 is None:
            pack_384 = C.prepare_decode_weights(
                trainable, frozen, ccfg, policy=policy, quant=True, tw=384
            )
        packed = pack_384 if tw384 else pack_std
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        try:
            def run():
                return C.generate(
                    trainable, frozen, ccfg, emb,
                    max_length=max_len, temperature=0.0, top_p=1.0,
                    policy=policy, packed=packed, decode_quant=True,
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

    legs = os.environ.get("GIC_KV_AB_LEGS", "128ref,128,512")
    if "128ref" in legs:
        log("=== leg 1: b=128, HEAD int8-KV layout (nsk/nsv) compile + throughput ===")
        bench(128, qcache=False)
    if "128," in legs + ",":
        bench(128, qcache=True)
    big = [int(x) for x in legs.split(",") if x.isdigit() and int(x) > 128]
    tw384 = [int(x[:-1]) for x in legs.split(",") if x.endswith("t") and x[:-1].isdigit()]
    if big or tw384:
        log(f"=== leg 2: b={big} 128row + b={tw384} 256row int8-KV — "
            "compile witness / full error capture ===")
        for b in big:
            bench(b, qcache=True, reps=3)
            bench(b, qcache=False, reps=3)  # same-session bf16-KV comparator
        for b in tw384:
            bench(b, qcache=True, reps=3, tw384=True)
            bench(b, qcache=False, reps=3, tw384=True)
    log("done")


if __name__ == "__main__":
    main()
