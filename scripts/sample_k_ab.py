"""On-chip sweep: speculative-accept candidate count K for in-kernel sampling.

Trade-off (docs/PERF_NOTES.md): each candidate costs a two-transcendental
Gumbel per element in every vocab stream, but fewer candidates reject more
often — P(some row of b unresolved after a round) = 1 − (1−(1−top_p)^K)^b,
so small K re-streams the vocab more rounds.  At b=128, top_p=0.9 the
predicted P(round 2 runs) is 72% (K=2), 12% (K=3), 1.3% (K=4).

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/sample_k_ab.py \
      > /tmp/sample_k_ab.log 2>&1 < /dev/null & disown
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
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init 124M params (bf16)...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    rng = np.random.default_rng(1)
    emb = jnp.asarray(rng.normal(size=(128, 512)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    for k in (2, 3, 4, 6):
        ms = timed(
            lambda k=k: C.generate(
                trainable, frozen, ccfg, emb, max_length=50, temperature=1.0,
                top_p=0.9, rng=key, policy=BF16, sample_in_kernel=True,
                sample_k=k,
            )
        )
        log(f"   K={k}: {ms:.1f} ms/batch = {128 / ms * 1000:.0f} img/s")
    log("done")


if __name__ == "__main__":
    main()
