"""int8 KV cache at large batch, 128-row blocks (follow-up to kv_quant_scale_ab).

The first run (docs/ab_logs/kv_quant_scale_ab.log) answered b=128 (int8-KV
still loses: 3,222 vs 3,287 img/s) but hit a Mosaic compile failure for the
quant-cache mode at the 256-row block config (b=512/1024 with tw=384): the
greedy 256-row block already sits ~0.4 MB under the 16 MB scoped-VMEM limit
(ops/decode_step.py buffer accounting), and the quant-cache walk adds
per-chunk scale tiles + int8->bf16 staging on top.

This follow-up forces the 128-row block at b=512/1024 (standard tw=768
packing — the kernel only widens the block when tw<=384), attempting to
isolate the BANDWIDTH question: at wide batch the chunked attention walk is
bytes-bound, which is where halved KV bytes should pay.

OUTCOME: this run's log (docs/ab_logs/kv_quant_scale_ab2.log, int8-KV
failing Mosaic compile at b=512/1024) PREDATES the nsk/nsv scale-layout
rework that landed in the same round-4 snapshot.  Re-run at HEAD
(scripts/kv_quant_scale_ab3.py, docs/ab_logs/kv_quant_scale_ab3.log) every
config compiles and runs; int8-KV still loses to bf16-KV at every batch, so
the round-2 rejection stands as the throughput verdict.  See
docs/PERF_NOTES.md round 5.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/kv_quant_scale_ab2.py \
      > docs/ab_logs/kv_quant_scale_ab2.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

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

    # standard tw=768 packing => the kernel keeps 128-row blocks at any batch
    pack_std = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True
    )

    for b in (512, 1024):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        for qcache in (False, True):
            tag = f"b={b:<5d} 128row int8-W {'int8-KV' if qcache else 'bf16-KV'}"
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
                reps = 5
                t0 = time.perf_counter()
                outs = [run() for _ in range(reps)]
                for o in outs:
                    np.asarray(o)
                dt = time.perf_counter() - t0
                log(f"{tag}: {b * reps / dt:8.1f} img/s  ({dt / reps * 1000:7.2f} ms/batch)")
            except Exception as e:  # noqa: BLE001
                # full traceback: truncating to str(e)[:200] reduced the r4
                # Mosaic failures to an undiagnosable HTTP-500 wrapper line
                import traceback

                log(f"{tag}: FAILED {type(e).__name__}")
                traceback.print_exc()
    log("done")


if __name__ == "__main__":
    main()
