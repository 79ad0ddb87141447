"""Continuous serving dispatch-pipeline depth A/B: 1 vs 2 in-flight macros.

Round-3 decomposition (BASELINE.md): continuous wall time on this 1-core
host is dominated by device sync — 542 of 704 ms per 1,024-request burst —
with only a depth-1 pipeline engaged (harvest of macro N overlaps macro
N+1's device time, but staging/bookkeeping for macro N+2 waits for N's
harvest).  Depth 2 keeps the device queue one whole macro deep so host
hiccups never idle the chip; the cost is completions becoming visible one
macro later (staler admission, longer tails).  This script measures both
protocols both ways:

  * burst: 1,024 queued embedding requests end-to-end (bench.py's leg)
  * steady: closed loop, completions immediately resubmitted (production
    occupancy, scripts/continuous_steady_ab.py protocol)

at depth 1 and depth 2, bf16 and int8.  Flip the service default only if
depth 2 wins; otherwise this file is the documented rejection.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/continuous_depth_ab.py \
      > /tmp/continuous_depth_ab.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

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

    vcfg = CL.CLIPVisionConfig.vit_b32()
    vparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
    )

    class _NullTokenizer:
        def batch_decode(self, arr, skip_special_tokens=True):
            return [""] * len(arr)

    model = C.ImageCaptioningModel(ccfg, tokenizer=_NullTokenizer(), policy=BF16)
    model.trainable, model.frozen = trainable, frozen

    emb_pool = np.random.default_rng(9).normal(size=(4096, 512)).astype(np.float32)

    def make(depth, precision):
        return ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=128, segment=8,
            bursts=16, admit=32, max_length=50, decode_precision=precision,
            pipeline_depth=depth,
        )

    def burst_leg(depth, precision, n=1024):
        svc = make(depth, precision)
        for e in emb_pool[:128]:
            svc.submit_embedding(e)
        svc.drain()  # compile + warm
        t0 = time.perf_counter()
        for e in emb_pool[:n]:
            svc.submit_embedding(e)
        done = svc.drain()
        rate = n / (time.perf_counter() - t0)
        assert len(done) >= n
        s = svc.stats
        log(f"burst  depth={depth} {precision}: {rate:7.1f} img/s  "
            f"(macros={s['macros']}, sync={s['sync_s']:.2f}s, "
            f"dispatch={s['dispatch_s']:.2f}s, host={s['host_s']:.2f}s, "
            f"p95={s.get('latency_p95_s', 0):.3f}s)")
        return rate

    WARM, MEAS = 8, 24

    def steady_leg(depth, precision):
        svc = make(depth, precision)
        nxt = 0

        def submit(k):
            nonlocal nxt
            for _ in range(k):
                svc.submit_embedding(emb_pool[nxt % len(emb_pool)])
                nxt += 1

        submit(3 * 128)
        for _ in range(WARM):
            submit(len(svc.step()))
        t0 = time.perf_counter()
        completed = 0
        for _ in range(MEAS):
            done = svc.step()
            completed += len(done)
            submit(len(done))
        rate = completed / (time.perf_counter() - t0)
        log(f"steady depth={depth} {precision}: {rate:7.1f} img/s "
            f"({completed} over {MEAS} macros)")
        svc.drain()
        return rate

    for precision in ("bf16", "int8"):
        for depth in (1, 2):
            burst_leg(depth, precision)
    for precision in ("bf16", "int8"):
        for depth in (1, 2):
            steady_leg(depth, precision)
    log("done")


if __name__ == "__main__":
    main()
