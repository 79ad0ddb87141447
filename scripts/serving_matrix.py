"""On-chip serving matrix: {bf16, int8} x {b=128, b=256} greedy decode.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/serving_matrix.py \
      > /tmp/serving_matrix.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(fn, reps=8, warm=2):
    for _ in range(warm):
        np.asarray(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / reps * 1000


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    assert jax.default_backend() != "cpu", "run on the TPU"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init 124M params (bf16)...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    rng = np.random.default_rng(0)
    max_len = 50

    results = {}
    for b in (128, 256):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        tw = 384 if b % 256 == 0 else None
        for quant in (False, True):
            packed = C.prepare_decode_weights(
                trainable, frozen, ccfg, policy=policy, quant=quant, tw=tw
            )

            def run():
                return C.generate(
                    trainable, frozen, ccfg, emb, max_length=max_len,
                    temperature=0.0, top_p=1.0, policy=policy, packed=packed,
                    decode_quant=quant,
                )

            name = f"b={b} {'int8' if quant else 'bf16'}"
            log(f"compiling {name}...")
            ms = timed(run)
            results[name] = b / ms * 1000
            log(f"   {name}: {ms:.1f} ms = {results[name]:.0f} img/s")

    log("SUMMARY " + "; ".join(f"{k}: {v:.0f}" for k, v in results.items()))
    log("done")


if __name__ == "__main__":
    main()
