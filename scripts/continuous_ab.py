"""On-chip A/B: continuous batching (rolling admission) vs fixed-batch decode.

Fixed-batch serving (CaptionService / one-shot generate) decodes a batch
until its LONGEST caption finishes — every shorter request idles its row for
the tail steps.  With COCO-like caption lengths (mean ~12, tail to ~25+ at
b=128) that is ~40-50% wasted row-steps.  ContinuousCaptionService re-fills
each freed row mid-flight (admit_prefill + per-row start windows in the
fused kernel), trading that waste for segment-boundary waste (a finished row
idles until its burst ends), host round trips, and admission prefills.

This script measures both sides on the flagship 124M bf16 config with the
SAME 512-request stream (per-request lengths ~ N(12, 4) clipped [5, 30]) and
sweeps the segment size.  Fixed-batch cost is modeled per arrival-order
group of 128 as t(Lmax_group) with t(L) fit linearly from two measured
max_lengths (identical methodology to bench.py's reference-algorithm leg —
avoids one compile per distinct group max).

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/continuous_ab.py \
      > /tmp/continuous_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N_REQ = 512
SLOTS = 128
SERVICE_MAX = 50


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


class _NullTokenizer:
    def batch_decode(self, ids, skip_special_tokens=True):
        return [""] * len(ids)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
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
    log("init flagship params...")
    model = C.ImageCaptioningModel(ccfg, tokenizer=_NullTokenizer(), policy=policy)
    log("init done")

    rng = np.random.default_rng(0)
    embs = rng.normal(size=(N_REQ, 512)).astype(np.float32)
    # two caption-length workloads: COCO-like short captions (mean ~12) and
    # a long-form one (mean ~30, cap 50) where fixed batches waste more
    workloads = {
        "short": np.clip(rng.normal(12, 4, size=N_REQ).round(), 5, 30).astype(int),
        "long": np.clip(rng.normal(30, 10, size=N_REQ).round(), 5, 50).astype(int),
    }
    for name, lengths in workloads.items():
        log(f"workload {name}: mean len {lengths.mean():.1f}, "
            f"p95 {np.percentile(lengths, 95):.0f}, max {lengths.max()}")

    # --- fixed-batch comparator: t(L) linear fit over two measured maxes ---
    tr, fz, pol = model.decode_params("bf16")
    packed = C.prepare_decode_weights(tr, fz, ccfg, pol)
    emb_b = jnp.asarray(embs[:SLOTS])
    skip_fixed = os.environ.get("CONT_AB_SKIP_FIXED") == "1"

    def fixed(ml):
        return C.generate(
            tr, fz, ccfg, emb_b, max_length=ml, temperature=0.0, top_p=1.0,
            policy=pol, packed=packed,
        )

    t_of = {15: 0.033, 50: 0.0478}  # last measured; overwritten unless skipped
    for ml in () if skip_fixed else (15, 50):
        log(f"compiling fixed decode max_length={ml}...")
        np.asarray(fixed(ml))
        np.asarray(fixed(ml))
        reps = 6
        t0 = time.perf_counter()
        outs = [fixed(ml) for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        t_of[ml] = (time.perf_counter() - t0) / reps
        log(f"fixed t({ml}) = {t_of[ml]*1000:.2f} ms")
    b_coef = (t_of[50] - t_of[15]) / 35
    a_coef = t_of[15] - b_coef * 15

    def fixed_req_s_for(lengths):
        groups = [lengths[i : i + SLOTS] for i in range(0, N_REQ, SLOTS)]
        t_fixed = sum(a_coef + b_coef * int(g.max()) for g in groups)
        return N_REQ / t_fixed

    # --- continuous serving (on-device macro engine) ------------------------
    def run_continuous(lengths, segment, bursts, admit):
        def run():
            svc = ContinuousCaptionService(
                model, None, None, slots=SLOTS, segment=segment,
                bursts=bursts, admit=admit, max_length=SERVICE_MAX,
                decode_precision="bf16",
            )
            for i in range(N_REQ):
                svc.submit_embedding(embs[i], max_length=int(lengths[i]))
            t0 = time.perf_counter()
            svc.drain()
            return time.perf_counter() - t0, svc.stats

        run()  # warmup (compiles)
        return run()

    for name, lengths in workloads.items():
        fixed_rs = fixed_req_s_for(lengths)
        log(f"== workload {name}: fixed-batch model {fixed_rs:.0f} req/s ==")
        results = {}
        for segment, bursts, admit in (
            (2, 16, 32), (4, 8, 32), (4, 8, 64), (4, 8, 128), (8, 8, 64),
        ):
            log(f"{name} seg={segment} bursts={bursts} admit={admit}: warmup...")
            dt, stats = run_continuous(lengths, segment, bursts, admit)
            req_s = N_REQ / dt
            results[(segment, bursts, admit)] = req_s
            log(
                f"{name} seg={segment} bursts={bursts} admit={admit}: "
                f"{dt*1000:.1f} ms, {req_s:.0f} req/s, "
                f"{stats['macros']} macros, vs fixed {req_s/fixed_rs:.2f}x | "
                f"dispatch {stats['dispatch_s']*1000:.0f} "
                f"sync {stats['sync_s']*1000:.0f} "
                f"host {stats['host_s']*1000:.0f} ms | "
                f"p50 lat {stats.get('latency_p50_s', 0)*1000:.0f} ms "
                f"p95 {stats.get('latency_p95_s', 0)*1000:.0f} ms"
            )
        best = max(results, key=results.get)
        log(
            f"RESULT {name}: best (seg, bursts, admit)={best} "
            f"{results[best]:.0f} req/s vs fixed {fixed_rs:.0f} req/s "
            f"({results[best]/fixed_rs:.2f}x); mean_len {lengths.mean():.1f}"
        )


if __name__ == "__main__":
    main()
