"""int8 KV cache at LARGE serving batches (round-3 revisit of a rejection).

Round 2 rejected the int8 KV cache as default from a b=128 A/B (37.8 vs
37.0 ms/batch): at 128 rows the chunked attention walk is DMA-latency/
VPU-bound, so the per-chunk dequant multiplies eat the halved bytes.  But
the round-3 batch sweep showed KV traffic is what ends batch scaling —
b=1024 regresses below b=512 "KV-cache traffic grows linearly while the
weight stream is already fully amortized" (docs/PERF_NOTES.md).  At those
shapes each KV chunk is (ct, 1024, 768) and the walk should be bandwidth-
bound, which is exactly where halved cache bytes pay.

Legs: b in {128, 512, 1024} x int8 W8A8 weights x {bf16 KV, int8 KV},
greedy len-50, tw=384 packing (256-row blocks at b%256==0), same timing
protocol as scripts/batch_scale_ab.py so rows are comparable.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/kv_quant_scale_ab.py \
      > /tmp/kv_quant_scale_ab.log 2>&1 < /dev/null & disown
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

    pack_wide = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True, tw=384
    )
    pack_std = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True
    )

    for b in (128, 512, 1024):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        packed = pack_wide if b % 256 == 0 else pack_std
        for qcache in (False, True):
            tag = f"b={b:<5d} int8-W {'int8-KV' if qcache else 'bf16-KV'}"
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
                reps = 5
                t0 = time.perf_counter()
                outs = [run() for _ in range(reps)]
                for o in outs:
                    np.asarray(o)
                dt = time.perf_counter() - t0
                log(f"{tag}: {b * reps / dt:8.1f} img/s  ({dt / reps * 1000:7.2f} ms/batch)")
            except Exception as e:  # noqa: BLE001
                log(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}")
    log("done")


if __name__ == "__main__":
    main()
