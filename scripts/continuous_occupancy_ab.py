"""Continuous-serving occupancy ceiling: where do the 1,6xx/1,9xx img/s go?

VERDICT r4 weak #4: continuous serving holds at ~55% of fixed-batch decode
with no named remaining lever and no derived ceiling.  This script measures
every term of the steady-state protocol so the gap decomposes into
(1) pool occupancy, (2) host/dispatch gaps the depth-1 pipeline fails to
hide, and (3) per-step device cost of the macro engine vs the fixed-batch
kernel loop — and prints the occupancy ceiling = what the same engine would
serve at 100% occupancy with zero host gap.

Protocol per precision (bf16, int8), slots=128 seg=8 bursts=16 greedy:

- **steady instrumented**: closed loop (every completion resubmitted),
  8 warm + 24 timed macros; a patched ``_harvest`` reads each macro's packed
  output BEFORE the service consumes it and records per-step occupancy
  (fraction of pool rows live, ``uid >= 0``) and admission counts.
- **steady serialized**: same load, but dispatch → immediate harvest with no
  overlap — the per-macro wall here is device time + fetch + staging with
  nothing hidden, isolating how much the depth-1 overlap actually hides.
- **fixed-batch reference**: one-shot ``generate`` at b=128 (same weights,
  same session) — the engine-free upper anchor.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/continuous_occupancy_ab.py \
      > docs/ab_logs/continuous_occupancy_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SLOTS, ADMIT, MAXLEN = 128, 32, 50
# macro granularity (overridable): the decomp/backlog sweeps ran the r3-tuned
# seg=8/bursts=16; the seg sweep found seg=4/bursts=32 wins once populated
SEG = int(os.environ.get("GIC_OCC_SEG", "8"))
BURSTS = int(os.environ.get("GIC_OCC_BURSTS", "16"))
WARM, MEAS = 8, 24
STEPS = SEG * BURSTS


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

    def make_svc(precision, slots=SLOTS, admit=ADMIT, **kw):
        return ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=slots, segment=SEG,
            bursts=BURSTS, admit=admit, max_length=MAXLEN,
            decode_precision=precision, **kw,
        )

    def closed_loop(svc, n_macros, instrument, timeit=True):
        """Run n_macros closed-loop steps; returns (rate, stats_delta, occ,
        adm, caption_lens)."""
        occ, adm, lens = [], [], []
        if instrument:
            orig = svc._harvest

            def patched(inflight):
                if inflight is not None:
                    out = np.asarray(inflight[0])  # extra fetch, stats only
                    occ.append(float((out[:, 1] >= 0).mean()))
                    adm.append(int((out[:, 3] >= 0).sum()))
                orig(inflight)

            svc._harvest = patched
        nxt = [0]

        def submit(k):
            for _ in range(k):
                svc.submit_embedding(emb_pool[nxt[0] % len(emb_pool)])
                nxt[0] += 1

        s0 = dict(svc._stats)
        n_done0 = svc._stats["images"]
        t0 = time.perf_counter()
        for _ in range(n_macros):
            done = svc.step()
            submit(len(done))
        dt = time.perf_counter() - t0
        if instrument:
            svc._harvest = orig
        completed = svc._stats["images"] - n_done0
        stats = {k: svc._stats[k] - s0.get(k, 0) for k in svc._stats}
        return completed / dt, dt, stats, occ, adm

    def leg(precision):
        log(f"--- {precision} ---")
        svc = make_svc(precision)
        # ramp: fill pool + staged backlog, warm the compiled macro
        for i in range(3 * SLOTS):
            svc.submit_embedding(emb_pool[i % len(emb_pool)])
        closed_loop(svc, WARM, instrument=False)

        # A) steady instrumented (occupancy + admission telemetry)
        rate_i, dt_i, st_i, occ, adm = closed_loop(svc, MEAS, instrument=True)
        mo = float(np.mean(occ)) if occ else float("nan")
        log(f"instrumented steady: {rate_i:7.1f} img/s | occupancy "
            f"mean={mo:.3f} min={min(occ):.3f} max={max(occ):.3f} | "
            f"admissions/macro mean={np.mean(adm):.1f}")
        log(f"  wall/macro {dt_i / MEAS * 1000:6.1f} ms | per-macro "
            f"dispatch {st_i['dispatch_s'] / MEAS * 1000:5.1f} sync "
            f"{st_i['sync_s'] / MEAS * 1000:5.1f} host "
            f"{st_i['host_s'] / MEAS * 1000:5.1f} ms")
        tokens = mo * SLOTS * STEPS * MEAS
        done_n = rate_i * dt_i
        log(f"  mean caption len ~= {tokens / max(done_n, 1):.1f} tokens")

        # B) steady clean (no instrumentation fetch) — the honest number
        rate_c, dt_c, st_c, _, _ = closed_loop(svc, MEAS, instrument=False)
        log(f"clean steady:        {rate_c:7.1f} img/s | wall/macro "
            f"{dt_c / MEAS * 1000:6.1f} ms | dispatch "
            f"{st_c['dispatch_s'] / MEAS * 1000:5.1f} sync "
            f"{st_c['sync_s'] / MEAS * 1000:5.1f} host "
            f"{st_c['host_s'] / MEAS * 1000:5.1f} ms")

        # C) serialized: dispatch -> immediate harvest, zero overlap
        s0 = dict(svc._stats)
        n0 = svc._stats["images"]
        t0 = time.perf_counter()
        nxt = 0
        for _ in range(MEAS):
            svc._dispatch()
            while svc._inflight:
                svc._harvest(svc._inflight.popleft())
            done = svc._stats["images"] - n0 - nxt
            for _ in range(done):
                svc.submit_embedding(emb_pool[nxt % len(emb_pool)])
                nxt += 1
            # NB: resubmission accounting approximate; population stays ~constant
        dt_s = time.perf_counter() - t0
        st_s = {k: svc._stats[k] - s0.get(k, 0) for k in svc._stats}
        rate_s = (svc._stats["images"] - n0) / dt_s
        log(f"serialized steady:   {rate_s:7.1f} img/s | wall/macro "
            f"{dt_s / MEAS * 1000:6.1f} ms | dispatch "
            f"{st_s['dispatch_s'] / MEAS * 1000:5.1f} sync "
            f"{st_s['sync_s'] / MEAS * 1000:5.1f} host "
            f"{st_s['host_s'] / MEAS * 1000:5.1f} ms")

        # ceiling table
        step_wall_ms = dt_c / MEAS / STEPS * 1000
        # device-only per-macro = serialized minus host bookkeeping+staging.
        # On this backend the device wait lands in sync_s (the packed-output
        # fetch); dispatch_s is host staging.  If the decomposition collapses
        # (sync ~0 means the wait hid somewhere else), fall back to sync-only.
        dev_macro_ms = (dt_s - st_s["host_s"] - st_s["dispatch_s"]) / MEAS * 1000
        if dev_macro_ms < 0.25 * dt_s / MEAS * 1000:
            dev_macro_ms = max(dev_macro_ms, st_s["sync_s"] / MEAS * 1000)
            log("  (device-time decomposition degenerate; using sync_s floor)")
        ceil_occ = rate_c / mo  # 100% occupancy at the same step cost
        ceil_dev = rate_c * (dt_c / MEAS * 1000) / max(dev_macro_ms, 1e-3) / mo
        log(f"CEILING[{precision}]: achieved {rate_c:.0f} | occupancy-only "
            f"ceiling {ceil_occ:.0f} ({rate_c / ceil_occ * 100:.0f}%) | "
            f"occupancy+zero-host-gap ceiling {ceil_dev:.0f} "
            f"({rate_c / ceil_dev * 100:.0f}%) | step wall {step_wall_ms:.2f} ms "
            f"dev-only {dev_macro_ms / STEPS:.2f} ms")
        svc.drain()
        return rate_c

    def backlog_leg(precision, mult):
        """Steady loop with ``mult``×slots requests in-system.

        The first run of this script found steady occupancy stuck at 0.574
        with the inherited 3×slots population: holding all 128 rows live
        through a 128-step macro needs live(S) + ~S·steps/len staged ≈ 4.6×
        slots in-system, so at 3× the pool equilibrates wherever
        completions/macro matches the staged shortfall.  This sweep measures
        occupancy/throughput vs population directly."""
        svc = make_svc(precision)
        nxt = [0]
        for _ in range(mult * SLOTS):
            svc.submit_embedding(emb_pool[nxt[0] % len(emb_pool)])
            nxt[0] += 1
        closed_loop(svc, WARM, instrument=False)
        rate, dt, st, occ, adm = closed_loop(svc, MEAS, instrument=True)
        mo = float(np.mean(occ))
        log(f"backlog={mult}x slots {precision}: {rate:7.1f} img/s | "
            f"occupancy mean={mo:.3f} min={min(occ):.3f} | "
            f"wall/macro {dt / MEAS * 1000:6.1f} ms | adm/macro {np.mean(adm):.0f}")
        svc.drain()

    def bigpool_leg(precision, slots, admit_n):
        """Steady throughput at bigger pools with the population fix.

        Pre-fix, steady slots=256 measured 1,782 bf16 / 2,002 int8
        (scripts/continuous_steady_ab.py) — but that protocol's 3×slots
        population starved the pool exactly like slots=128.  Correctly
        populated, occupancy×(fixed-batch b=slots rate) predicts ~3,1xx at
        256 and ~3,5xx at 512 int8.  ``admit`` must scale with the pool:
        completions/macro ≈ slots·steps/len must not exceed bursts·admit or
        admission caps occupancy structurally."""
        svc = make_svc(precision, slots=slots, admit=admit_n)
        pop = svc.recommended_inflight(expected_len=49)
        nxt = [0]
        for _ in range(pop):
            svc.submit_embedding(emb_pool[nxt[0] % len(emb_pool)])
            nxt[0] += 1
        closed_loop(svc, 4, instrument=False)
        rate, dt, st, occ, adm = closed_loop(svc, 12, instrument=True)
        mo = float(np.mean(occ))
        log(f"slots={slots} admit={admit_n} pop={pop} {precision}: "
            f"{rate:7.1f} img/s | occupancy mean={mo:.3f} min={min(occ):.3f} | "
            f"wall/macro {dt / 12 * 1000:6.1f} ms | adm/macro {np.mean(adm):.0f}")
        svc.drain()

    legs_sel = os.environ.get("GIC_OCC_LEGS", "decomp,backlog")
    if "decomp" in legs_sel:
        for precision in ("bf16", "int8"):
            leg(precision)
    if "backlog" in legs_sel:
        log("--- backlog (in-system population) sweep ---")
        for mult in (3, 5, 7):
            backlog_leg("bf16", mult)
        backlog_leg("int8", 5)
        backlog_leg("int8", 7)
    if "bigpool" in legs_sel:
        log("--- big-pool steady (population-corrected) ---")
        for slots, admit_n in ((256, 64), (512, 128)):
            for precision in ("bf16", "int8"):
                bigpool_leg(precision, slots, admit_n)
    if "affin" in legs_sel:
        # A/B: age-affine admission + the kernel's per-block chunk skip
        # (blk_c0) vs the old lowest-free-row-first policy.  Affinity only
        # changes WHICH free rows admit (exact either way); the win is KV
        # reads — blocks of similar-age rows walk their own window.
        log("--- age-affine admission A/B (per-block chunk skip) ---")
        for slots, admit_n, precision in (
            (512, 128, "int8"), (512, 128, "bf16"), (256, 64, "int8"),
        ):
            for affin in (False, True):
                svc = make_svc(precision, slots=slots, admit=admit_n,
                               admit_affinity=affin)
                pop = svc.recommended_inflight(expected_len=49)
                nxt = [0]
                for _ in range(pop):
                    svc.submit_embedding(emb_pool[nxt[0] % len(emb_pool)])
                    nxt[0] += 1
                closed_loop(svc, 4, instrument=False)
                rate, dt, st, occ, adm = closed_loop(svc, 12, instrument=True)
                log(f"slots={slots} {precision} affinity={int(affin)}: "
                    f"{rate:7.1f} img/s | occ {np.mean(occ):.3f} | "
                    f"wall/macro {dt / 12 * 1000:6.1f} ms")
                svc.drain()
    if "seg" in legs_sel:
        # seg granularity re-tune at corrected population: seg=8 was chosen
        # while the steady protocol ran starved (occupancy-insensitive);
        # with occupancy at its seg-governed ceiling, halving seg lifts the
        # refill-latency ceiling 0.875 -> ~0.92 IF the doubled admission-
        # boundary machinery costs less than that 5%.
        log("--- seg granularity at corrected population (128 tokens/macro) ---")
        for seg_v, bursts_v in ((8, 16), (4, 32), (16, 8)):
            for precision in ("bf16", "int8"):
                svc = ContinuousCaptionService(
                    model, vparams, vcfg, encoder="clip", slots=SLOTS,
                    segment=seg_v, bursts=bursts_v, admit=ADMIT,
                    max_length=MAXLEN, decode_precision=precision,
                )
                pop = svc.recommended_inflight(expected_len=49)
                for i in range(pop):
                    svc.submit_embedding(emb_pool[i % len(emb_pool)])
                closed_loop(svc, 4, instrument=False)
                rate, dt, st, occ, adm = closed_loop(svc, 12, instrument=True)
                log(f"seg={seg_v} bursts={bursts_v} {precision}: "
                    f"{rate:7.1f} img/s | occupancy mean={np.mean(occ):.3f} | "
                    f"wall/macro {dt / 12 * 1000:6.1f} ms")
                svc.drain()

    # fixed-batch anchor, same session (engine-free kernel loop)
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)
    emb = jnp.asarray(emb_pool[:128])

    def fb():
        return C.generate(trainable, frozen, ccfg, emb, max_length=MAXLEN,
                          temperature=0.0, top_p=1.0, policy=policy, packed=packed)

    np.asarray(fb())
    np.asarray(fb())
    t0 = time.perf_counter()
    outs = [fb() for _ in range(8)]
    for o in outs:
        np.asarray(o)
    dt = (time.perf_counter() - t0) / 8
    log(f"fixed-batch anchor: {128 / dt:7.1f} img/s ({dt * 1000:.1f} ms/batch)")
    log("done")


if __name__ == "__main__":
    main()
