"""Benchmark: caption decode throughput on the flagship model (real chip).

Measures KV-cached, jit-compiled greedy decode (GPT-2 124M + transformer
mapper, bf16) in images/sec, and compares against a faithful re-creation of
the reference's decode *algorithm* (no KV cache: full re-forward of the whole
sequence per generated token, ``/root/reference/src/models.py:389-395``)
running on the SAME chip — i.e. ``vs_baseline`` isolates the framework's
algorithmic/compilation win at equal hardware and numerics.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    import sys
    def log(m):
        print(f"[bench] {m}", file=sys.stderr, flush=True)

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

    # --- ours: fused-kernel greedy decode ---------------------------------
    # weights pre-tiled once for the fused step kernel (the model facade
    # caches this identically; serving pays it once per weight set)
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)

    def ours():
        return C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
            packed=packed,
        )

    log("compiling fused decode...")
    # axon's block_until_ready does not reliably block; a (tiny) D2H
    # readback is the only trustworthy sync point on this backend
    np.asarray(ours())  # compile
    np.asarray(ours())  # warmup rep (first post-compile dispatch can be slow)
    log("fused decode compiled")
    reps = 8
    # throughput timing: dispatch batches back-to-back (serving-style
    # pipelining hides the ~2 ms tunnel roundtrip per dispatch), sync at end
    t0 = time.perf_counter()
    outs = [ours() for _ in range(reps)]
    for o in outs:
        np.asarray(o)
    ours_img_s = batch * reps / (time.perf_counter() - t0)
    # per-call (latency) variant for the extras
    t0 = time.perf_counter()
    for _ in range(3):
        np.asarray(ours())
    ours_latency_ms = (time.perf_counter() - t0) / 3 * 1000

    # --- sampled decode (T=1.0, top_p=0.9) on the fused emit_logits path ---
    skey = jax.random.PRNGKey(7)

    def ours_sampled():
        return C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=1.0, top_p=0.9, rng=skey,
            policy=policy, packed=packed,
        )

    log("compiling sampled decode...")
    np.asarray(ours_sampled())
    np.asarray(ours_sampled())
    t0 = time.perf_counter()
    souts = [ours_sampled() for _ in range(reps)]
    for o in souts:
        np.asarray(o)
    sampled_img_s = batch * reps / (time.perf_counter() - t0)
    log(f"sampled decode: {sampled_img_s:.0f} img/s")

    # --- sampled decode with the in-kernel draw (serving opt-in) -----------
    def ours_sampled_sk():
        return C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=1.0, top_p=0.9, rng=skey,
            policy=policy, packed=packed, sample_in_kernel=True,
        )

    log("compiling in-kernel-sampled decode...")
    np.asarray(ours_sampled_sk())
    np.asarray(ours_sampled_sk())
    t0 = time.perf_counter()
    skouts = [ours_sampled_sk() for _ in range(reps)]
    for o in skouts:
        np.asarray(o)
    sampled_sk_img_s = batch * reps / (time.perf_counter() - t0)
    log(f"in-kernel-sampled decode: {sampled_sk_img_s:.0f} img/s")

    # --- int8 W8A8 greedy decode (opt-in serving mode) --------------------
    packed8 = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy, quant=True)

    def ours_int8():
        return C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
            packed=packed8, decode_quant=True,
        )

    log("compiling int8 decode...")
    np.asarray(ours_int8())
    np.asarray(ours_int8())
    t0 = time.perf_counter()
    iouts = [ours_int8() for _ in range(reps)]
    for o in iouts:
        np.asarray(o)
    int8_img_s = batch * reps / (time.perf_counter() - t0)
    log(f"int8 decode: {int8_img_s:.0f} img/s")

    # --- b=256 serving decode (256-row kernel blocks via tw=384 packing) ---
    emb256 = jnp.asarray(
        np.random.default_rng(3).normal(size=(256, 512)).astype(np.float32)
    )
    packed256 = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy, tw=384)

    def ours_256():
        return C.generate(
            trainable, frozen, ccfg, emb256,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
            packed=packed256,
        )

    log("compiling b=256 decode...")
    np.asarray(ours_256())
    np.asarray(ours_256())
    t0 = time.perf_counter()
    bouts = [ours_256() for _ in range(reps)]
    for o in bouts:
        np.asarray(o)
    b256_img_s = 256 * reps / (time.perf_counter() - t0)
    log(f"b=256 decode: {b256_img_s:.0f} img/s")

    # --- peak serving config: b=512, int8 W8A8, 256-row kernel blocks -----
    # the measured single-chip serving peak (scripts/batch_scale_ab.py:
    # weight stream fully amortized at 512 rows; b=1024 regresses on KV
    # traffic).  tw=384 packing engages the 256-row block automatically.
    emb512 = jnp.asarray(
        np.random.default_rng(5).normal(size=(512, 512)).astype(np.float32)
    )
    packed512 = C.prepare_decode_weights(
        trainable, frozen, ccfg, policy=policy, quant=True, tw=384
    )

    def ours_peak():
        return C.generate(
            trainable, frozen, ccfg, emb512,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
            packed=packed512, decode_quant=True,
        )

    log("compiling b=512 int8 decode...")
    np.asarray(ours_peak())
    np.asarray(ours_peak())
    t0 = time.perf_counter()
    pouts = [ours_peak() for _ in range(reps)]
    for o in pouts:
        np.asarray(o)
    peak_img_s = 512 * reps / (time.perf_counter() - t0)
    log(f"b=512 int8 decode: {peak_img_s:.0f} img/s")

    # --- beam search (beam 4) on the beam-aware fused kernel --------------
    # a capability the reference lacks entirely; round-3 kernel replaces the
    # per-step cache gather with an ancestry-map indirection inside the
    # attention walk plus in-kernel per-row top-k/logsumexp
    def ours_beam():
        return C.beam_generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, beam_size=4, policy=policy,
        )

    log("compiling beam decode...")
    np.asarray(ours_beam())
    np.asarray(ours_beam())
    beam_reps = 3
    t0 = time.perf_counter()
    wouts = [ours_beam() for _ in range(beam_reps)]
    for o in wouts:
        np.asarray(o)
    beam_img_s = batch * beam_reps / (time.perf_counter() - t0)
    log(f"beam-4 decode: {beam_img_s:.0f} img/s")

    # int8 W8A8 beam (decode_quant=True): same packed-tile serving mode as
    # greedy/sampled; on-chip A/B scripts/beam_e2e_onehot_ab.py
    def ours_beam_q():
        return C.beam_generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, beam_size=4, policy=policy, decode_quant=True,
        )

    log("compiling int8 beam decode...")
    np.asarray(ours_beam_q())
    np.asarray(ours_beam_q())
    t0 = time.perf_counter()
    qouts = [ours_beam_q() for _ in range(beam_reps)]
    for o in qouts:
        np.asarray(o)
    beam_q_img_s = batch * beam_reps / (time.perf_counter() - t0)
    log(f"beam-4 int8 decode: {beam_q_img_s:.0f} img/s")

    # --- reference algorithm on the same chip: uncached O(L^2) decode ----
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
    # linear model: cost(t) = a + b * t  (attention quadratic term negligible
    # at these lengths; fit through the endpoints)
    t_a, t_b = lengths[0], lengths[-1]
    b_coef = (per_len_s[t_b] - per_len_s[t_a]) / (t_b - t_a)
    a_coef = per_len_s[t_a] - b_coef * t_a
    total_s = sum(
        max(per_len_s[t_a], a_coef + b_coef * (mcfg.prefix_length + i + 1))
        for i in range(max_len)
    )
    base_img_s = batch / total_s

    # --- training-step throughput (flagship config) ------------------------
    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.train import optim as _optim
    from gpt2_image_captioning_tpu.train.loop import make_train_step

    mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    opt_cfg = _optim.AdamWConfig(learning_rate=1e-4, num_training_steps=1000)
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(ccfg, opt_cfg, mesh, policy)
    rng_np = np.random.default_rng(2)
    tbatch = {
        "token_ids": rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32),
        "labels": rng_np.integers(0, 50256, size=(batch, 50)).astype(np.int32),
        "attention_mask": np.ones((batch, 50), np.int32),
        "image_embedding": rng_np.normal(size=(batch, 512)).astype(np.float32),
    }
    tr_d = jax.device_put(jax.tree.map(lambda x: x.astype(jnp.float32), trainable), tr_sh)
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
    train_caps_s = batch * n_steps / (time.perf_counter() - t0)
    log(f"train: {train_caps_s:.0f} captions/s")

    # --- embedding extraction: CLIP ViT-B/32 encode throughput ------------
    # (device compute only, synthetic pixels — the host JPEG pipeline is
    # measured separately by the imagepipe tests).  The reference's committed
    # anchor is ~65 img/s on its author's CUDA GPU (BASELINE.md).
    from gpt2_image_captioning_tpu.models import clip as CL

    vcfg = CL.CLIPVisionConfig.vit_b32()
    vparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
    )
    enc_batch = 256
    px = jnp.asarray(
        np.random.default_rng(1).normal(size=(enc_batch, 3, 224, 224)).astype(np.float32)
    ).astype(jnp.bfloat16)

    # scan-chunked program: 4 host batches of 256 per dispatch, the shape the
    # extraction pipeline uses with device_chunks=4 (embeddings/extract.py).
    # On-chip A/B (scripts/clip_chunk_ab.py): per-256 pipelined 6,901 img/s,
    # scan(4,256) 9,040 — within 2% of the 9,190 device-true rate — while a
    # flat b=2048 megabatch REGRESSES to 6,516.  Outputs bit-identical.
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
    clip_img_s = enc_batch * 4 * len(blocks) / (time.perf_counter() - t0)
    log(f"clip encode: {clip_img_s:.1f} img/s")

    # --- continuous (rolling-admission) serving ----------------------------
    # the round-3 production-serving surface: one on-device macro-step
    # program (admission every `segment` steps inside the jit), depth-1
    # dispatch pipeline, greedy.  Embedding intake isolates the engine from
    # the vision tower (measured separately above).  The reference has no
    # serving surface at all (/root/reference/src/models.py:389-469 is a
    # notebook loop).
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    class _NullTokenizer:
        """Throughput-only: detokenization is not under test here."""

        def batch_decode(self, arr, skip_special_tokens=True):
            return [""] * len(arr)

    model = C.ImageCaptioningModel(ccfg, tokenizer=_NullTokenizer(), policy=BF16)
    model.trainable, model.frozen = trainable, frozen  # share the bf16 copies
    # seg=8/bursts=16 (128 tokens per dispatch): the tuned throughput point —
    # 32-token macros can't amortize this box's ~24 ms dispatch roundtrip
    # even under the depth-1 pipeline (scripts/continuous_tune_ab2.py:
    # +14% bf16, +28% int8, and p95 latency IMPROVES)
    svc = ContinuousCaptionService(
        model, vparams, vcfg, encoder="clip", slots=128, segment=8, bursts=16,
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
    log(f"continuous serving: {cont_img_s:.0f} img/s")

    print(
        json.dumps(
            {
                "metric": "caption_decode_throughput_gpt2_124m_b128_len50",
                "value": round(ours_img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(ours_img_s / base_img_s, 2),
                "baseline": {
                    "what": "reference decode algorithm (uncached full re-forward/step) on the same chip",
                    "img_s": round(base_img_s, 2),
                },
                "extras": {
                    "decode_batch_latency_ms_per_call_sync": round(ours_latency_ms, 1),
                    "sampled_decode_top_p_img_s": round(sampled_img_s, 1),
                    "sampled_in_kernel_img_s": round(sampled_sk_img_s, 1),
                    "int8_decode_img_s": round(int8_img_s, 1),
                    "decode_b256_img_s": round(b256_img_s, 1),
                    "peak_serving_b512_int8_img_s": round(peak_img_s, 1),
                    "beam4_decode_img_s": round(beam_img_s, 1),
                    "beam4_int8_img_s": round(beam_q_img_s, 1),
                    "continuous_serving_img_s": round(cont_img_s, 1),
                    "clip_vit_b32_encode_img_s": round(clip_img_s, 1),
                    "vs_reference_gpu_extraction_65_img_s": round(clip_img_s / 65.0, 1),
                    "train_step_captions_s_b128": round(train_caps_s, 1),
                },
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
