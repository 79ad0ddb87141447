"""Serving batch-size scaling on the fused decode kernel (round 3).

Round-2 found b=256 (tw=384 packing, 256-row kernel blocks) beats b=128 by
+24%, peak 4,027 img/s with int8.  This probes b=512/1024: more rows per
weight stream amortize the per-step weight read further — until KV-cache
traffic (linear in batch) and VMEM limits take over.

Legs: b in {256, 512, 1024} × {bf16, int8}, greedy len-50, packed weights.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/batch_scale_ab.py \
      > /tmp/batch_scale_ab.log 2>&1 < /dev/null & disown
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

    packs = {
        False: C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy, tw=384),
        True: C.prepare_decode_weights(
            trainable, frozen, ccfg, policy=policy, quant=True, tw=384
        ),
    }

    for b in (256, 512, 1024):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        for quant in (False, True):
            tag = f"b={b:<5d} {'int8' if quant else 'bf16'}"
            try:
                def run():
                    return C.generate(
                        trainable, frozen, ccfg, emb,
                        max_length=max_len, temperature=0.0, top_p=1.0,
                        policy=policy, packed=packs[quant], decode_quant=quant,
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
