"""On-chip A/B: int8 (W8A8) fused decode vs bf16 at flagship shapes.

Decode is weight-HBM-bandwidth-bound; int8 tiles halve the dominant traffic
term (weights ~248 MB/step bf16 -> ~124 MB).  Measures greedy throughput and
token agreement vs the bf16 kernel.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/int8_decode_ab.py \
      > /tmp/int8_ab.log 2>&1 < /dev/null & disown
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

    b, max_len = 128, 50
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(b, 512)).astype(np.float32))

    packed_bf16 = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)
    packed_int8 = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True
    )

    def run(packed, quant):
        return C.generate(
            trainable, frozen, ccfg, emb, max_length=max_len, temperature=0.0,
            top_p=1.0, policy=policy, packed=packed, decode_quant=quant,
        )

    log("compiling bf16 greedy...")
    ms_bf16 = timed(lambda: run(packed_bf16, False))
    log(f"   bf16: {ms_bf16:.1f} ms/batch = {b / ms_bf16 * 1000:.0f} img/s")
    log("compiling int8 greedy...")
    ms_int8 = timed(lambda: run(packed_int8, True))
    log(f"   int8: {ms_int8:.1f} ms/batch = {b / ms_int8 * 1000:.0f} img/s")

    tok_b = np.asarray(run(packed_bf16, False))
    tok_i = np.asarray(run(packed_int8, True))
    agree = (tok_b == tok_i).mean()
    log(f"   token agreement int8 vs bf16 (random-init, worst case): {agree:.3f}")

    # sampled decode on int8 too
    key = jax.random.PRNGKey(7)

    def run_sampled(packed, quant):
        return C.generate(
            trainable, frozen, ccfg, emb, max_length=max_len, temperature=1.0,
            top_p=0.9, rng=key, policy=policy, packed=packed, decode_quant=quant,
        )

    log("compiling int8 sampled...")
    ms_int8_s = timed(lambda: run_sampled(packed_int8, True))
    log(f"   int8 sampled: {ms_int8_s:.1f} ms/batch = {b / ms_int8_s * 1000:.0f} img/s")

    log(
        f"SUMMARY greedy {ms_bf16:.1f} -> {ms_int8:.1f} ms "
        f"({ms_bf16 / ms_int8:.2f}x); sampled int8 {ms_int8_s:.1f} ms; "
        f"agreement {agree:.3f}"
    )
    log("done")


if __name__ == "__main__":
    main()
