"""Benchmark: caption decode throughput on the flagship model (real chip).

Measures KV-cached, jit-compiled greedy decode (GPT-2 124M + transformer
mapper, bf16) in images/sec, and compares against a faithful re-creation of
the reference's decode *algorithm* (no KV cache: full re-forward of the whole
sequence per generated token, ``/root/reference/src/models.py:389-395``)
running on the SAME chip — i.e. ``vs_baseline`` isolates the framework's
algorithmic/compilation win at equal hardware and numerics.

Timeout-proof by construction (round-5; the reference's own methodology
section is "WIP", ``/root/reference/README.md:188-190`` — this artifact is
what that section should have been):

- **Incremental emission**: the COMPLETE summary JSON line (same schema,
  extras-so-far) prints after EVERY leg, so a driver that kills the run at
  any point still parses a valid result from the last stdout line.
- **Wall-clock budget**: ``GIC_BENCH_BUDGET_S`` (default 2400 s).  Legs that
  would start past the budget are skipped and recorded under
  ``extras.skipped_over_budget``; the final JSON always prints.
- **Value-first leg order**: headline (greedy) → baseline → train →
  int8/b512 serving peak → beam → encoders → continuous, so an early kill
  loses the least important numbers.
- **Compile cache**: JAX's persistent compilation cache is enabled (best
  effort) so a re-run reuses executables instead of re-paying the
  tunnel-dominated compile wall time.

Every leg is fault-isolated (round-4): a leg that raises records its error
string under ``extras.errors`` and the run continues.  ``INTERNAL`` backend
errors (the tunnel/backend transient class documented in CLAUDE.md rule 7 and
the BENCH_r03 post-mortem) get one retry after a ``GIC_BENCH_COOLDOWN_S``
(default 120 s) cooldown — skipped when the remaining budget cannot afford it.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

BUDGET_S = float(os.environ.get("GIC_BENCH_BUDGET_S", "2400"))
COOLDOWN_S = float(os.environ.get("GIC_BENCH_COOLDOWN_S", "120"))
T_START = time.monotonic()


def elapsed() -> float:
    return time.monotonic() - T_START


def log(m):
    print(f"[bench {elapsed():6.0f}s] {m}", file=sys.stderr, flush=True)


# --- peak-rate constants for the MFU/roofline extras -----------------------
# TPU v5e (the chip this framework benches on; the axon tunnel reports
# device_kind "TPU v5 lite"): 197 TFLOP/s bf16 MXU peak, 394 TOP/s int8,
# ~819 GB/s HBM.  Unknown device kinds fall back to these and say so (the
# pct-of-peak keys are then labelled approximate).
_CHIP_PEAKS = {
    "v5e": {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_Bps": 819e9},
    "v5litepod": {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_Bps": 819e9},
    "v5lite": {"bf16_flops": 197e12, "int8_ops": 394e12, "hbm_Bps": 819e9},
}


def chip_peaks(device_kind: str) -> tuple[dict, bool]:
    dk = device_kind.lower().replace(" ", "")
    for key, peaks in _CHIP_PEAKS.items():
        if key in dk:
            return peaks, True
    return _CHIP_PEAKS["v5e"], False


def enable_compile_cache() -> bool:
    """Best-effort persistent compilation cache (saves the ~20-40 s per-leg
    first-compile over the tunnel on re-runs).  Not all PJRT backends can
    serialize executables — failure to enable is non-fatal."""
    try:
        import jax

        cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 ".jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception as e:  # noqa: BLE001 — cache is an optimization only
        log(f"compile cache unavailable: {type(e).__name__}: {e}")
        return False


def gpt2_block_params(d: int, n_layer: int) -> int:
    """Matmul weights in the transformer blocks (per-step HBM weight stream)."""
    per_layer = 3 * d * d + d * d + d * 4 * d + 4 * d * d  # qkv, proj, fc, fc2
    return n_layer * per_layer


def train_step_flops(b: int, t: int, cap_t: int, d: int, n_layer: int,
                     vocab: int, prefix: int, emb_dim: int,
                     hidden_len: int) -> float:
    """Analytic matmul FLOPs of one frozen-decoder training step.

    Forward: mapper (input proj + ``hidden_len+prefix``-token transformer of
    8 GPT-shaped blocks at d=768) + ``n_layer`` GPT-2 blocks over the full T
    rows + vocab logits over the ``cap_t`` caption rows only (the chunked
    xent masks prefix rows out before the matmul, ops/xent.py).  Backward
    multipliers per matmul (each grad matmul costs the same 2mnk as its
    forward): frozen weights get activation grads only (the unrolled
    partial-eval drops their weight-grad matmuls, models/gpt2.py) → 2×
    forward; trainable mapper weights → 3×; attention score/value products
    have two activation operands → 3×.
    """
    blk_w = gpt2_block_params(d, n_layer)
    blocks_fwd = 2.0 * b * t * blk_w
    attn_fwd = 2.0 * n_layer * 2 * b * t * t * d
    logits_fwd = 2.0 * b * cap_t * d * vocab  # tied frozen wte head
    map_tokens = prefix + hidden_len
    mapper_fwd = 2.0 * b * (map_tokens * gpt2_block_params(d, 8) + emb_dim * d)
    return 3.0 * mapper_fwd + 2.0 * (blocks_fwd + logits_fwd) + 3.0 * attn_fwd


def vit_encode_flops(img_tokens: int, d: int, n_layer: int, inter_mult: int = 4) -> float:
    """Per-image matmul FLOPs of a ViT tower (patch embed ~ one more matmul)."""
    per_layer = 2.0 * img_tokens * (4 * d * d + 2 * inter_mult * d * d) \
        + 2.0 * 2 * img_tokens * img_tokens * d
    return n_layer * per_layer + 2.0 * img_tokens * 3 * d * 16 * 16  # patch proj upper bound


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    extras: dict = {}
    errors: dict = {}
    headline: dict = {"value": None, "vs_baseline": None, "baseline_img_s": None}
    if enable_compile_cache():
        extras["compile_cache"] = "on"

    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init params...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    log("init done")
    # bf16 weights on device for the compute path
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    batch, max_len = 128, 50
    emb = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 512)).astype(np.float32)
    )
    device_kind = jax.devices()[0].device_kind
    device_str = str(jax.devices()[0])
    peaks, peaks_known = chip_peaks(device_kind)

    def emit() -> None:
        """Print the complete current summary JSON as one line.  Called after
        EVERY leg: the last stdout line is always a full, parseable artifact
        no matter where the process is killed (the r3 crash and r4 driver
        timeout both produced parsed=null under the old end-only print)."""
        vs = None
        if headline["value"] is not None and headline["baseline_img_s"]:
            vs = round(headline["value"] / headline["baseline_img_s"], 2)
        ex = dict(extras)
        if errors:
            ex["errors"] = dict(errors)
        if not peaks_known:
            ex["mfu_note"] = (
                f"unrecognized device_kind {device_kind!r}; pct-of-peak keys "
                "assume TPU v5e rates"
            )
        ex["bench_elapsed_s"] = round(elapsed(), 1)
        print(
            json.dumps(
                {
                    "metric": "caption_decode_throughput_gpt2_124m_b128_len50",
                    "value": round(headline["value"], 2) if headline["value"] else None,
                    "unit": "img/s",
                    "vs_baseline": vs,
                    "baseline": {
                        "what": "reference decode algorithm (uncached full re-forward/step) on the same chip",
                        "img_s": round(headline["baseline_img_s"], 2)
                        if headline["baseline_img_s"] else None,
                    },
                    "extras": ex,
                    "device": device_str,
                }
            ),
            flush=True,
        )

    def run_leg(name, fn):
        """Fault-isolated leg: one retry after cooldown on backend INTERNAL
        errors (BENCH_r03 died at the int8 leg with zero isolation — the
        headline and every later leg were lost; never again).  The retry is
        skipped when the remaining budget cannot cover cooldown + a rerun."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — isolation is the point
            msg = f"{type(e).__name__}: {e}"
            transient = "INTERNAL" in msg or "DEADLINE" in msg or "UNAVAILABLE" in msg
            log(f"leg {name} FAILED: {msg[:300]}")
            affordable = elapsed() + COOLDOWN_S + 120 < BUDGET_S
            if transient and affordable:
                log(f"leg {name}: backend transient — cooling {COOLDOWN_S:.0f}s, one retry")
                time.sleep(COOLDOWN_S)
                try:
                    out = fn()
                    extras.setdefault("retried_legs", []).append(name)
                    return out
                except Exception as e2:  # noqa: BLE001
                    msg = f"retry: {type(e2).__name__}: {e2}"
                    log(f"leg {name} retry FAILED: {msg[:300]}")
            elif transient:
                msg += " (retry skipped: over budget)"
            errors[name] = msg[:400]
            return None

    def timed_batches(fn, n_items, reps=8):
        """Pipelined throughput: dispatch back-to-back, sync at the end.
        axon's block_until_ready does not reliably block; a (tiny) D2H
        readback is the only trustworthy sync point on this backend."""
        np.asarray(fn())  # compile
        np.asarray(fn())  # warmup rep (first post-compile dispatch is slow)
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        dt = time.perf_counter() - t0
        return n_items * reps / dt, dt / reps

    # --- ours: fused-kernel greedy decode (headline) ------------------------
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)

    def ours():
        return C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
            packed=packed,
        )

    def leg_greedy():
        log("compiling fused decode...")
        img_s, _ = timed_batches(ours, batch)
        headline["value"] = img_s
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(ours())
        extras["decode_batch_latency_ms_per_call_sync"] = round(
            (time.perf_counter() - t0) / 3 * 1000, 1
        )
        log(f"greedy decode: {img_s:.0f} img/s")

    # --- reference algorithm on the same chip: uncached O(L^2) decode ------
    # The reference's Python loop re-forwards the whole sequence every step
    # (src/models.py:389-395), so step t costs one full forward of length
    # prefix+t.  Measure that forward at three static lengths (lengths are
    # dynamic in the reference too — each step is a fresh shape), fit the
    # per-step cost linearly, and sum over the 50 steps.  This gives the
    # reference algorithm's best-case time on this chip without compiling 50
    # shapes.
    # NB: params must be jit ARGUMENTS — closing over device arrays embeds
    # them as constants, which forces a device→host copy of all weights at
    # lowering time (pathological over the axon tunnel).
    def leg_baseline():
        @jax.jit
        def fwd_last(gpt, seq):
            logits = G.forward(gpt, gcfg, seq, None, policy)
            return jnp.argmax(logits[:, -1, :], axis=-1)

        log("compiling uncached baseline forwards...")
        lengths = [mcfg.prefix_length + 1, mcfg.prefix_length + max_len // 2,
                   mcfg.prefix_length + max_len]
        per_len_s = {}
        for t_len in lengths:
            seq = jnp.zeros((batch, t_len, 768), policy.compute_dtype)
            for _ in range(3):  # compile + warm the dispatch path
                np.asarray(fwd_last(frozen["gpt"], seq))
            samples = []
            for _ in range(7):
                t0 = time.perf_counter()
                np.asarray(fwd_last(frozen["gpt"], seq))  # D2H sync per call
                samples.append(time.perf_counter() - t0)
            per_len_s[t_len] = float(np.median(samples))
        log(f"uncached per-forward seconds: {per_len_s}")
        # linear model: cost(t) = a + b * t  (attention quadratic term
        # negligible at these lengths; fit through the endpoints)
        t_a, t_b = lengths[0], lengths[-1]
        b_coef = (per_len_s[t_b] - per_len_s[t_a]) / (t_b - t_a)
        a_coef = per_len_s[t_a] - b_coef * t_a
        total_s = sum(
            max(per_len_s[t_a], a_coef + b_coef * (mcfg.prefix_length + i + 1))
            for i in range(max_len)
        )
        headline["baseline_img_s"] = batch / total_s
        log(f"reference-algorithm baseline: {batch / total_s:.1f} img/s")

    # --- marginal decode step + HBM roofline (round-4 MFU table) -----------
    def leg_marginal():
        short_len = 26

        def ours_short():
            return C.generate(
                trainable, frozen, ccfg, emb,
                max_length=short_len, temperature=0.0, top_p=1.0,
                policy=policy, packed=packed,
            )

        log("compiling len-26 decode for the marginal-step measurement...")
        _, t_short = timed_batches(ours_short, batch)
        # re-time the len-50 decode HERE, back to back with the len-26 run:
        # subtracting the headline leg's timing (minutes earlier) is
        # transient-sensitive on this shared box — session 3 produced an
        # impossible 149%-of-floor from exactly that (the ours() program is
        # already compiled, so this costs ~0.4 s)
        _, t_long = timed_batches(ours, batch)
        step_ms = (t_long - t_short) / (max_len - short_len) * 1000
        # analytic HBM floor of one fused decode step at this config:
        # block weight stream + tied-vocab logits walk + avg valid KV read
        d, L, V = gcfg.n_embd, gcfg.n_layer, gcfg.vocab_size
        wbytes = gpt2_block_params(d, L) * 2 + V * d * 2
        avg_t = mcfg.prefix_length + max_len // 2
        kvbytes = 2 * L * d * 2 * batch * avg_t
        floor_ms = (wbytes + kvbytes) / peaks["hbm_Bps"] * 1000
        extras["decode_marginal_step_ms_b128"] = round(step_ms, 3)
        extras["decode_step_hbm_floor_ms"] = round(floor_ms, 3)
        extras["decode_step_pct_of_hbm_floor"] = round(floor_ms / step_ms * 100, 1)
        log(
            f"marginal decode step {step_ms:.3f} ms vs HBM floor {floor_ms:.3f} ms "
            f"({floor_ms / step_ms * 100:.0f}% of floor)"
        )

    # --- training-step throughput (flagship config) -------------------------
    def leg_train():
        from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
        from gpt2_image_captioning_tpu.train import optim as _optim
        from gpt2_image_captioning_tpu.train.loop import make_train_step

        mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
        opt_cfg = _optim.AdamWConfig(learning_rate=1e-4, num_training_steps=1000)
        step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(
            ccfg, opt_cfg, mesh, policy
        )
        rng_np = np.random.default_rng(2)
        tbatch = {
            "token_ids": rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32),
            "labels": rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32),
            "attention_mask": np.ones((batch, 50), np.int32),
            "image_embedding": rng_np.normal(size=(batch, 512)).astype(np.float32),
        }
        tr_d = jax.device_put(
            jax.tree.map(lambda x: x.astype(jnp.float32), trainable), tr_sh
        )
        fz_d = jax.device_put(frozen, fr_sh)
        opt_d = jax.device_put(_optim.init(tr_d), opt_sh)
        b_d = jax.device_put(tbatch, batch_sh)
        log("compiling train step...")
        tr_d, opt_d, loss, _ = step_fn(tr_d, opt_d, fz_d, b_d, {})
        float(np.asarray(loss))  # sync
        t0 = time.perf_counter()
        n_steps = 15
        for _ in range(n_steps):
            tr_d, opt_d, loss, _ = step_fn(tr_d, opt_d, fz_d, b_d, {})
        float(np.asarray(loss))
        dt = (time.perf_counter() - t0) / n_steps
        extras["train_step_captions_s_b128"] = round(batch / dt, 1)
        # MFU: analytic matmul FLOPs of the frozen-decoder step vs chip peak
        seq_t = 50 + mcfg.prefix_length  # caption + prefix rows in the blocks
        flops = train_step_flops(
            batch, seq_t, 50, gcfg.n_embd, gcfg.n_layer, gcfg.vocab_size,
            mcfg.prefix_length, mcfg.embed_dim, mcfg.hidden_length,
        )
        mfu = flops / dt / peaks["bf16_flops"] * 100
        extras["train_step_ms"] = round(dt * 1000, 1)
        extras["train_step_mfu_pct"] = round(mfu, 1)
        log(f"train: {batch / dt:.0f} captions/s, {dt * 1000:.1f} ms/step, MFU {mfu:.1f}%")

    # --- int8 W8A8 greedy decode (opt-in serving mode) ----------------------
    # BENCH_r03 died exactly here (INTERNAL backend error) after the
    # in-kernel-sample leg; scripts/int8_crash_repro.py re-runs that precise
    # leg sequence for the root-cause record.  This leg is now isolated +
    # retried, so a repeat costs the int8 number only.
    def leg_int8():
        packed8 = C.prepare_decode_weights(
            trainable, frozen, ccfg, policy=policy, quant=True
        )

        def f():
            return C.generate(
                trainable, frozen, ccfg, emb,
                max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
                packed=packed8, decode_quant=True,
            )
        log("compiling int8 decode...")
        img_s, _ = timed_batches(f, batch)
        extras["int8_decode_img_s"] = round(img_s, 1)
        log(f"int8 decode: {img_s:.0f} img/s")

    # --- peak serving config: b=512, int8 W8A8, 256-row kernel blocks -------
    # the measured single-chip serving peak (scripts/batch_scale_ab.py:
    # weight stream fully amortized at 512 rows; b=1024 regresses on KV
    # traffic).  tw=384 packing engages the 256-row block automatically.
    def leg_peak():
        emb512 = jnp.asarray(
            np.random.default_rng(5).normal(size=(512, 512)).astype(np.float32)
        )
        packed512 = C.prepare_decode_weights(
            trainable, frozen, ccfg, policy=policy, quant=True, tw=384
        )

        def f():
            return C.generate(
                trainable, frozen, ccfg, emb512,
                max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
                packed=packed512, decode_quant=True,
            )
        log("compiling b=512 int8 decode...")
        img_s, _ = timed_batches(f, 512)
        extras["peak_serving_b512_int8_img_s"] = round(img_s, 1)
        log(f"b=512 int8 decode: {img_s:.0f} img/s")

    # --- beam search (beam 4) on the beam-aware fused kernel ----------------
    # a capability the reference lacks entirely; round-3 kernel replaces the
    # per-step cache gather with an ancestry-map indirection inside the
    # attention walk plus in-kernel per-row top-k/logsumexp
    def leg_beam():
        def f():
            return C.beam_generate(
                trainable, frozen, ccfg, emb,
                max_length=max_len, beam_size=4, policy=policy,
            )
        log("compiling beam decode...")
        img_s, _ = timed_batches(f, batch, reps=3)
        extras["beam4_decode_img_s"] = round(img_s, 1)
        log(f"beam-4 decode: {img_s:.0f} img/s")

    # int8 W8A8 beam (decode_quant=True): same packed-tile serving mode as
    # greedy/sampled; on-chip A/B scripts/beam_e2e_onehot_ab.py
    def leg_beam_int8():
        def f():
            return C.beam_generate(
                trainable, frozen, ccfg, emb,
                max_length=max_len, beam_size=4, policy=policy, decode_quant=True,
            )
        log("compiling int8 beam decode...")
        img_s, _ = timed_batches(f, batch, reps=3)
        extras["beam4_int8_img_s"] = round(img_s, 1)
        log(f"beam-4 int8 decode: {img_s:.0f} img/s")

    # --- sampled decode (T=1.0, top_p=0.9) on the fused emit_logits path ---
    skey = jax.random.PRNGKey(7)

    def leg_sampled():
        def f():
            return C.generate(
                trainable, frozen, ccfg, emb,
                max_length=max_len, temperature=1.0, top_p=0.9, rng=skey,
                policy=policy, packed=packed,
            )
        log("compiling sampled decode...")
        img_s, _ = timed_batches(f, batch)
        extras["sampled_decode_top_p_img_s"] = round(img_s, 1)
        log(f"sampled decode: {img_s:.0f} img/s")

    # --- sampled decode with the in-kernel draw (serving opt-in) -----------
    def leg_sampled_in_kernel():
        def f():
            return C.generate(
                trainable, frozen, ccfg, emb,
                max_length=max_len, temperature=1.0, top_p=0.9, rng=skey,
                policy=policy, packed=packed, sample_in_kernel=True,
            )
        log("compiling in-kernel-sampled decode...")
        img_s, _ = timed_batches(f, batch)
        extras["sampled_in_kernel_img_s"] = round(img_s, 1)
        log(f"in-kernel-sampled decode: {img_s:.0f} img/s")

    # --- b=256 serving decode (256-row kernel blocks via tw=384 packing) ---
    def leg_b256():
        emb256 = jnp.asarray(
            np.random.default_rng(3).normal(size=(256, 512)).astype(np.float32)
        )
        packed256 = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy, tw=384)

        def f():
            return C.generate(
                trainable, frozen, ccfg, emb256,
                max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
                packed=packed256,
            )
        log("compiling b=256 decode...")
        img_s, _ = timed_batches(f, 256)
        extras["decode_b256_img_s"] = round(img_s, 1)
        log(f"b=256 decode: {img_s:.0f} img/s")

    # --- RAT (retrieval-augmented) training step -----------------------------
    # fused on-device retrieval inside the jitted loss (models/rat.py::
    # loss_fn_fused); promoted from scripts/rat_train_ab.py per VERDICT r3 so
    # the RAT capability has a driver-captured number.  Store is 8k images /
    # 40k captions (≈100 MB) to bound the host→device staging time over the
    # tunnel; the COCO-scale (118k/591k) marginal-cost number is +0.7% vs the
    # plain step (docs/ab_logs/rat_train_ab.log).
    def leg_rat_train():
        from gpt2_image_captioning_tpu.models import rat as R

        rcfg = R.RATConfig(embed_dim=512, aggregation_type="attention",
                           top_k=10, top_i=4)
        r_tr, r_fz = R.init_params(jax.random.PRNGKey(3), ccfg, rcfg)
        r_fz = jax.tree.map(lambda x: x.astype(jnp.bfloat16), r_fz)
        rng_np = np.random.default_rng(4)
        n_img, n_cap, c_max = 8192, 40960, 7

        def unit(n, d):
            x = rng_np.normal(size=(n, d)).astype(np.float32)
            return x / np.linalg.norm(x, axis=1, keepdims=True)

        store = {
            "image_embeddings": jnp.asarray(unit(n_img, 512)),
            "caption_embeddings": jnp.asarray(unit(n_cap, 512)),
            "caption_table": jnp.asarray(
                rng_np.integers(0, n_cap, size=(n_img, c_max)).astype(np.int32)
            ),
        }
        tb = {
            "token_ids": jnp.asarray(
                rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32)),
            "labels": jnp.asarray(
                rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32)),
            "attention_mask": jnp.ones((batch, 50), jnp.int32),
            "image_embedding": jnp.asarray(unit(batch, 512)),
        }

        @jax.jit
        def vg(tr, fz, bt, st):
            def lf(tr):
                loss, _ = R.loss_fn_fused(tr, fz, ccfg, rcfg, bt, st, policy)
                return loss

            loss, grads = jax.value_and_grad(lf)(tr)
            return loss + jax.tree.reduce(
                lambda a, x: a + x.sum().astype(jnp.float32), grads,
                jnp.float32(0)) * 0.0

        log("compiling RAT fused-retrieval train step...")
        float(np.asarray(vg(r_tr, r_fz, tb, store)))
        float(np.asarray(vg(r_tr, r_fz, tb, store)))  # warm dispatch
        n_steps = 10
        t0 = time.perf_counter()
        outs = [vg(r_tr, r_fz, tb, store) for _ in range(n_steps)]
        for o in outs:
            np.asarray(o)
        dt = (time.perf_counter() - t0) / n_steps
        extras["rat_train_captions_s_b128_store8k"] = round(batch / dt, 1)
        log(f"RAT train: {batch / dt:.0f} captions/s ({dt * 1000:.1f} ms/step)")

    # --- embedding extraction: CLIP ViT-B/32 encode throughput --------------
    # (device compute only, synthetic pixels — the host JPEG pipeline is
    # measured separately by the imagepipe tests).  The reference's committed
    # anchor is ~65 img/s on its author's CUDA GPU (BASELINE.md).
    def leg_clip():
        vcfg = CL.CLIPVisionConfig.vit_b32()
        vparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
        )
        enc_batch = 256
        px = jnp.asarray(
            np.random.default_rng(1).normal(size=(enc_batch, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

        # scan-chunked program: 4 host batches of 256 per dispatch, the shape
        # the extraction pipeline uses with device_chunks=4
        # (embeddings/extract.py).  On-chip A/B (scripts/clip_chunk_ab.py):
        # per-256 pipelined 6,901 img/s, scan(4,256) 9,040 — within 2% of the
        # 9,190 device-true rate — while a flat b=2048 megabatch REGRESSES to
        # 6,516.  Outputs bit-identical.
        @jax.jit
        def encode_block(p, blocks):  # (C, B, 3, S, S) -> (C, B, D)
            def body(_, b):
                return None, CL.encode_image(p, vcfg, b, policy=policy, normalize=True)

            return jax.lax.scan(body, None, blocks)[1]

        blocks = [
            jnp.stack([px] * 4),
            jnp.stack([px[::-1]] * 4),
            jnp.stack([px] * 4),
            jnp.stack([px[::-1]] * 4),
        ]
        log("compiling clip encode...")
        np.asarray(encode_block(vparams, blocks[0]))  # compile + sync
        np.asarray(encode_block(vparams, blocks[1]))  # warm dispatch
        t0 = time.perf_counter()
        eouts = [encode_block(vparams, blk) for blk in blocks]
        for o in eouts:
            np.asarray(o)
        dt = time.perf_counter() - t0
        img_s = enc_batch * 4 * len(blocks) / dt
        extras["clip_vit_b32_encode_img_s"] = round(img_s, 1)
        extras["vs_reference_gpu_extraction_65_img_s"] = round(img_s / 65.0, 1)
        # MXU roofline: CLIP ViT-B/32 = 50 tokens, d=768, 12 layers
        fl = vit_encode_flops(50, 768, 12)
        mfu = fl * img_s / peaks["bf16_flops"] * 100
        extras["clip_encode_mfu_pct"] = round(mfu, 1)
        log(f"clip encode: {img_s:.1f} img/s (MFU {mfu:.1f}%)")

    # --- ViT-B/16 encode (SURVEY L1 tower #2; round-4 leg) -------------------
    def leg_vit():
        from gpt2_image_captioning_tpu.models import vit as VT

        vcfg = VT.ViTConfig.base_patch16_224()
        vp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), VT.init(jax.random.PRNGKey(2), vcfg)
        )
        enc_batch = 128
        px = jnp.asarray(
            np.random.default_rng(6).normal(size=(enc_batch, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def enc(p, blocks):
            def body(_, b):
                return None, VT.encode_image(p, vcfg, b, policy=policy)

            return jax.lax.scan(body, None, blocks)[1]

        blocks = jnp.stack([px, px[::-1], px, px[::-1]])
        log("compiling vit encode...")
        img_s, _ = timed_batches(lambda: enc(vp, blocks), enc_batch * 4, reps=4)
        extras["vit_encode_img_s"] = round(img_s, 1)
        fl = vit_encode_flops(197, 768, 12)
        extras["vit_encode_mfu_pct"] = round(fl * img_s / peaks["bf16_flops"] * 100, 1)
        log(f"vit encode: {img_s:.1f} img/s")

    # --- DINOv3 ViT-L/16 encode (SURVEY L1 tower #3; round-4 leg) ------------
    # random weights — throughput is weight-independent (real checkpoint is
    # license-gated offline, VERDICT r3 missing #2)
    def leg_dino():
        from gpt2_image_captioning_tpu.models import dino as DN

        dcfg = DN.DINOv3Config.vitl16()
        dp = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16), DN.init(jax.random.PRNGKey(5), dcfg)
        )
        enc_batch = 64
        px = jnp.asarray(
            np.random.default_rng(8).normal(size=(enc_batch, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def enc(p, blocks):
            def body(_, b):
                return None, DN.encode_image(p, dcfg, b, policy=policy)

            return jax.lax.scan(body, None, blocks)[1]

        blocks = jnp.stack([px, px[::-1], px, px[::-1]])
        log("compiling dino encode...")
        img_s, _ = timed_batches(lambda: enc(dp, blocks), enc_batch * 4, reps=4)
        extras["dino_encode_img_s"] = round(img_s, 1)
        # ViT-L/16: 196 patches + specials, d=1024, 24 layers
        fl = vit_encode_flops(201, 1024, 24)
        extras["dino_encode_mfu_pct"] = round(fl * img_s / peaks["bf16_flops"] * 100, 1)
        log(f"dino encode: {img_s:.1f} img/s")

    # --- continuous (rolling-admission) serving ------------------------------
    # the production-serving surface: one on-device macro-step program
    # (admission every `segment` steps inside the jit), pipelined dispatch,
    # greedy.  Embedding intake isolates the engine from the vision tower
    # (measured separately above).  The reference has no serving surface at
    # all (/root/reference/src/models.py:389-469 is a notebook loop).
    def leg_continuous():
        from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

        vcfg = CL.CLIPVisionConfig.vit_b32()
        vparams = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16),
            CL.init_vision(jax.random.PRNGKey(1), vcfg),
        )

        class _NullTokenizer:
            """Throughput-only: detokenization is not under test here."""

            def batch_decode(self, arr, skip_special_tokens=True):
                return [""] * len(arr)

        model = C.ImageCaptioningModel(ccfg, tokenizer=_NullTokenizer(), policy=BF16)
        model.trainable, model.frozen = trainable, frozen  # share the bf16 copies
        # seg=4/bursts=32 (128 tokens per dispatch): the round-5 tuned point.
        # The macro must stay >=128 tokens to amortize this box's ~24 ms
        # dispatch roundtrip (scripts/continuous_tune_ab2.py), and WITHIN
        # that macro size finer admission granularity wins once the pool is
        # correctly populated: occupancy 0.928 vs 0.873 at seg=8, +4-6%
        # throughput (docs/ab_logs/continuous_occupancy_ab.log seg sweep —
        # the old seg=8 choice was tuned under the starved protocol).
        svc = ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=128, segment=4, bursts=32,
            admit=32, max_length=max_len, decode_precision="bf16",
        )
        emb_np = np.random.default_rng(9).normal(size=(1024, 512)).astype(np.float32)
        log("compiling continuous macro-step...")
        for e in emb_np[:128]:
            svc.submit_embedding(e)
        svc.drain()  # compile + warm (one macro program; no image buckets)
        t0 = time.perf_counter()
        for e in emb_np:
            svc.submit_embedding(e)
        done = svc.drain()
        cont_img_s = 1024 / (time.perf_counter() - t0)
        assert len(done) >= 1024
        extras["continuous_serving_img_s"] = round(cont_img_s, 1)
        log(f"continuous serving (1024-burst): {cont_img_s:.0f} img/s")

        # steady-state (closed-loop) at the occupancy-sizing recommendation:
        # in-system population per recommended_inflight() — the round-5
        # occupancy decomposition showed the old 3x-slots steady protocol
        # equilibrates at 57% occupancy purely from population starvation
        # (docs/ab_logs/continuous_occupancy_ab.log: 5-7x lifts bf16
        # 1,644 -> 2,229 img/s at occupancy 0.875)
        pop = min(svc.recommended_inflight(expected_len=49), 7 * 128)
        nxt = 0
        for _ in range(pop):
            svc.submit_embedding(emb_np[nxt % 1024])
            nxt += 1
        for _ in range(4):  # warm to steady occupancy
            for _ in svc.step():
                svc.submit_embedding(emb_np[nxt % 1024]); nxt += 1
        n0 = svc.stats["images"]
        t0 = time.perf_counter()
        for _ in range(16):
            for _ in svc.step():
                svc.submit_embedding(emb_np[nxt % 1024]); nxt += 1
        steady = (svc.stats["images"] - n0) / (time.perf_counter() - t0)
        svc.drain()
        extras["continuous_steady_img_s"] = round(steady, 1)
        log(f"continuous serving (steady, pop={pop}): {steady:.0f} img/s")

    # ------------------------------------------------------------------------
    # Value-first leg order: an early kill loses the least-important numbers.
    # The complete summary JSON prints after EVERY leg (emit()).
    legs = [
        ("greedy", leg_greedy),
        ("baseline", leg_baseline),
        ("marginal_step", leg_marginal),
        ("train", leg_train),
        ("int8", leg_int8),
        ("peak_b512_int8", leg_peak),
        ("beam", leg_beam),
        ("beam_int8", leg_beam_int8),
        ("sampled", leg_sampled),
        ("sampled_in_kernel", leg_sampled_in_kernel),
        ("b256", leg_b256),
        ("rat_train", leg_rat_train),
        ("clip_encode", leg_clip),
        ("vit_encode", leg_vit),
        ("dino_encode", leg_dino),
        ("continuous", leg_continuous),
    ]
    for name, fn in legs:
        if elapsed() > BUDGET_S:
            extras.setdefault("skipped_over_budget", []).append(name)
            log(f"leg {name} SKIPPED: over {BUDGET_S:.0f}s budget")
            continue
        run_leg(name, fn)
        emit()
    if "skipped_over_budget" in extras:
        emit()


if __name__ == "__main__":
    main()
