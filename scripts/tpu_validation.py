"""On-chip validation: run the framework's hot paths on the real TPU and
check VALUES against the CPU backend (the CI suite runs CPU-only, so this is
the hardware truth check).  Run: ``python scripts/tpu_validation.py``.

Covers: Pallas flash attention (compiled, not interpreted) vs XLA; GPT-2
forward TPU vs CPU; KV-cached greedy generate TPU vs CPU; in-kernel nucleus
sampling determinism; train step loss; fused RAT retrieval; beam search
(XLA + beam-aware fused kernel); int8 W8A8 greedy and beam (the quantized
serving path); sampled fused-vs-XLA agreement; the continuous macro engine.
"""

import contextlib
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


@contextlib.contextmanager
def xla_attention():
    """mha() keys its pallas dispatch off the global backend at TRACE time;
    CPU-reference computations must trace with the XLA path."""
    os.environ["GIC_DISABLE_PALLAS_ATTENTION"] = "1"
    try:
        yield
    finally:
        os.environ.pop("GIC_DISABLE_PALLAS_ATTENTION", None)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops import nn
    from gpt2_image_captioning_tpu.ops.attention import flash_attention

    assert jax.default_backend() != "cpu", "run on the TPU"
    cpu = jax.devices("cpu")[0]
    failures = []
    rng = np.random.default_rng(0)

    # --- 2. GPT-2 forward TPU vs CPU ---------------------------------------
    log("1/5 GPT-2 forward TPU vs CPU...")
    gcfg = G.GPT2Config(vocab_size=1000, n_positions=96, n_embd=128, n_layer=3, n_head=4)
    params = G.init(jax.random.PRNGKey(0), gcfg)
    x = jnp.asarray(rng.normal(size=(4, 20, 128)).astype(np.float32))
    tpu_logits = np.asarray(jax.jit(lambda p, x: G.forward(p, gcfg, x))(params, x))
    with xla_attention():
        cpu_logits = np.asarray(
            jax.jit(lambda p, x: G.forward(p, gcfg, x), device=cpu)(
                jax.device_put(params, cpu), jax.device_put(x, cpu)
            )
        )
    err = np.abs(tpu_logits - cpu_logits).max()
    log(f"   forward maxdiff={err:.2e}")
    # bf16-pass matmul noise accumulated over layers and the big vocab matmul
    if err > 1e-1:
        failures.append(f"gpt2 forward diff {err}")

    # --- 3. KV-cached greedy generate TPU vs CPU ----------------------------
    log("2/5 greedy generate TPU vs CPU...")
    mcfg = M.MLPMappingConfig(prefix_length=3, embed_dim=16, gpt_dim=128)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=999)
    tr, fz = C.init_params(jax.random.PRNGKey(1), ccfg)
    emb = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    t0 = time.time()
    tpu_toks = np.asarray(
        C.generate(tr, fz, ccfg, emb, max_length=12, temperature=0.0, top_p=1.0)
    )
    log(f"   tpu generate took {time.time() - t0:.1f}s")
    with xla_attention():
        with jax.default_device(cpu):
            # use_pallas_decode=False: the fused-step kernel dispatches off
            # the default BACKEND (tpu here), but this trace lowers for CPU
            cpu_toks = np.asarray(
                C.generate(
                    jax.device_put(tr, cpu), jax.device_put(fz, cpu), ccfg,
                    jax.device_put(emb, cpu), max_length=12, temperature=0.0,
                    top_p=1.0, use_pallas_decode=False,
                )
            )
    same = (tpu_toks == cpu_toks).mean()
    log(f"   token agreement: {same:.3f}")
    if same < 0.95:  # argmax ties at f32 noise may flip the rare token
        failures.append(f"generate agreement {same}")

    # --- in-kernel nucleus sampling on real Mosaic ---------------------------
    # (the interpreter stubs the PRNG to zeros, so seed determinism and
    # re-draw across seeds are only provable here; full distribution and
    # membership validation lives in scripts/kernel_sample_ab.py)
    log("sample: in-kernel nucleus sampling (sample_in_kernel=True)...")

    def sk_gen(seed):
        return np.asarray(
            C.generate(
                tr, fz, ccfg, emb, max_length=12, temperature=1.0, top_p=0.9,
                rng=jax.random.PRNGKey(seed), use_pallas_decode=True,
                sample_in_kernel=True,
            )
        )

    s1, s2, s3 = sk_gen(5), sk_gen(5), sk_gen(6)
    redraw = (s1 != s3).mean()
    log(f"   deterministic={np.array_equal(s1, s2)}  redraw across seeds={redraw:.2f}")
    if not np.array_equal(s1, s2):
        failures.append("in-kernel sampling not deterministic per seed")
    if redraw == 0.0:
        failures.append("in-kernel sampling identical across seeds")

    # --- 4. train step ------------------------------------------------------
    log("3/5 train step on TPU...")
    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.train import optim
    from gpt2_image_captioning_tpu.train.loop import make_train_step

    mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3, num_training_steps=10)
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(ccfg, opt_cfg, mesh, F32)
    batch = {
        "token_ids": rng.integers(0, 999, size=(8, 12)).astype(np.int32),
        "labels": rng.integers(0, 999, size=(8, 12)).astype(np.int32),
        "attention_mask": np.ones((8, 12), np.int32),
        "image_embedding": rng.normal(size=(8, 16)).astype(np.float32),
    }
    # deep-copy: device_put of an on-device tree can alias, and the step
    # donates its first two args — `tr` is reused by the beam check below
    tr_d = jax.device_put(jax.tree.map(jnp.copy, tr), tr_sh)
    fz_d = jax.device_put(fz, fr_sh)
    opt_d = jax.device_put(optim.init(tr), opt_sh)
    new_tr, _, loss, gnorm = step_fn(tr_d, opt_d, fz_d, jax.device_put(batch, batch_sh), {})
    loss_v, gnorm_v = float(np.asarray(loss)), float(np.asarray(gnorm))
    log(f"   loss={loss_v:.4f} gnorm={gnorm_v:.4f}")
    if not np.isfinite(loss_v):
        failures.append("train step loss non-finite")

    # --- 5. fused retrieval --------------------------------------------------
    log("4/5 fused retrieval on TPU...")
    from gpt2_image_captioning_tpu.retrieval.exact import fused_retrieve

    img = rng.normal(size=(50, 16)).astype(np.float32)
    img /= np.linalg.norm(img, axis=-1, keepdims=True)
    caps = rng.normal(size=(120, 16)).astype(np.float32)
    table = np.full((50, 3), -1, np.int32)
    for i in range(50):
        table[i, : 1 + i % 3] = np.arange(1 + i % 3) + (i * 2) % 118
    out = np.asarray(
        fused_retrieve(
            jnp.asarray(img[:5]), jnp.asarray(img), jnp.asarray(caps),
            jnp.asarray(table), top_i=3, top_k=4,
        )
    )
    log(f"   retrieved shape {out.shape}, nonzero rows {(np.abs(out).sum(-1) > 0).sum()}")
    if out.shape != (5, 4, 16):
        failures.append("fused retrieve shape")

    # --- beam search on-chip sanity ----------------------------------------
    # small-batch leg (16 rows): rides the XLA beam path (the beam-aware
    # kernel's origin-map slice needs the row dim on the 128 grid — the
    # fused default gates on it, which this leg regression-checks by NOT
    # crashing Mosaic)
    log("beam: beam_generate(4) on TPU (16 rows, XLA path)...")
    beam_toks = np.asarray(
        C.beam_generate(tr, fz, ccfg, emb, max_length=8, beam_size=4)
    )
    greedy8 = np.asarray(
        C.generate(tr, fz, ccfg, emb, max_length=8, temperature=0.0, top_p=1.0)
    )
    log(f"   beam shape {beam_toks.shape}; rows differing from greedy: "
        f"{(beam_toks != greedy8).any(axis=1).sum()}/4")
    if beam_toks.shape != greedy8.shape:
        failures.append("beam output shape")

    # row-aligned leg (32 images x beam 4 = 128 rows): the beam-aware fused
    # kernel Mosaic-compiles and runs on the real chip
    log("beam: beam-aware fused kernel at 128 rows...")
    emb32 = jnp.asarray(
        np.random.default_rng(21)
        .normal(size=(32, ccfg.mapping.embed_dim))
        .astype(np.float32)
    )
    beam_f = np.asarray(
        C.beam_generate(tr, fz, ccfg, emb32, max_length=8, beam_size=4)
    )
    log(f"   fused beam shape {beam_f.shape}")
    if beam_f.shape != (32, 8):
        failures.append("fused beam output shape")

    # --- int8 W8A8 decode on real Mosaic -------------------------------------
    # the quantized serving path is exactly where BENCH_r03 died with an
    # un-root-caused INTERNAL backend error (scripts/int8_crash_repro.py);
    # these legs make int8 part of the standing on-chip truth check.
    log("int8: W8A8 greedy decode (decode_quant=True)...")
    int8_toks = np.asarray(
        C.generate(tr, fz, ccfg, emb, max_length=12, temperature=0.0,
                   top_p=1.0, decode_quant=True)
    )
    q_agree = (int8_toks == tpu_toks).mean()
    log(f"   int8 greedy shape {int8_toks.shape}; agreement vs f32 greedy "
        f"{q_agree:.3f}")
    if int8_toks.shape != tpu_toks.shape:
        failures.append(f"int8 greedy shape {int8_toks.shape}")
    if not ((int8_toks >= 0) & (int8_toks < gcfg.vocab_size)).all():
        failures.append("int8 greedy tokens out of vocab range")
    # random-init logits are near-flat — the adversarial case for W8A8 drift
    # (flagship shapes measured 82.6% agreement, docs/PERF_NOTES.md); this
    # leg guards compilation + sanity, not tie order
    if q_agree < 0.4:
        failures.append(f"int8 greedy agreement {q_agree}")

    log("int8: W8A8 beam-aware fused kernel at 128 rows...")
    beam_q = np.asarray(
        C.beam_generate(tr, fz, ccfg, emb32, max_length=8, beam_size=4,
                        decode_quant=True)
    )
    log(f"   int8 fused beam shape {beam_q.shape}")
    if beam_q.shape != (32, 8):
        failures.append(f"int8 fused beam shape {beam_q.shape}")
    if not ((beam_q >= 0) & (beam_q < gcfg.vocab_size)).all():
        failures.append("int8 beam tokens out of vocab range")

    # --- sampled decode: fused emit_logits vs XLA forward, on-chip ---------
    log("sampled: fused emit_logits vs XLA path (T=0.9, top_p=0.9)...")
    skey = jax.random.PRNGKey(13)
    samp_fused = np.asarray(
        C.generate(tr, fz, ccfg, emb, max_length=10, temperature=0.9, top_p=0.9,
                   rng=skey, use_pallas_decode=True)
    )
    samp_xla = np.asarray(
        C.generate(tr, fz, ccfg, emb, max_length=10, temperature=0.9, top_p=0.9,
                   rng=skey, use_pallas_decode=False)
    )
    s_agree = (samp_fused == samp_xla).mean()
    log(f"   sampled token agreement: {s_agree:.3f}")
    if s_agree < 0.95:  # same rng; only logit near-ties can diverge
        failures.append(f"sampled agreement {s_agree}")

    # --- continuous batching: on-device macro engine, compiled on TPU ------
    log("continuous: rolling-admission macro engine vs one-shot...")
    from gpt2_image_captioning_tpu.serving import ContinuousCaptionService

    class _IdTok:
        """Tokenizer stub: captions are the space-joined token ids."""

        def batch_decode(self, ids, skip_special_tokens=True):
            return [
                " ".join(str(int(t)) for t in row if int(t) != ccfg.eos_token_id)
                for row in np.asarray(ids)
            ]

    cmodel = C.ImageCaptioningModel(ccfg, tokenizer=_IdTok())
    cemb = rng.normal(size=(10, 16)).astype(np.float32)
    want_caps = cmodel.generate_captions(
        jnp.asarray(cemb), max_length=12, temperature=0.0
    )
    svc = ContinuousCaptionService(
        cmodel, None, None, slots=4, segment=4, bursts=4, admit=4,
        max_length=12,
    )
    rids = [svc.submit_embedding(e) for e in cemb]
    svc.drain()
    got_caps = [svc.pop_result(r) for r in rids]
    c_same = sum(g == w for g, w in zip(got_caps, want_caps))
    log(f"   continuous == one-shot for {c_same}/10 requests "
        f"({svc.stats['macros']} macros)")
    # requests admitted after the first wave sit at shifted cache positions:
    # different chunk alignment → different MXU reduction order → random-init
    # near-tie argmax flips are possible on-chip (interpret-mode tests pin
    # exactness; cf. the beam-tie note in BASELINE.md)
    if c_same < 8:
        failures.append(f"continuous agreement {c_same}/10")

    # --- continuous with PER-REQUEST sampling params, compiled on TPU ------
    # the mixed greedy+sampled pool (per-row temperature/top_p in the macro)
    # must Mosaic-compile and keep greedy rows exactly greedy on-chip
    log("continuous: per-request sampling (mixed greedy+sampled pool)...")
    svc_s = ContinuousCaptionService(
        cmodel, None, None, slots=4, segment=4, bursts=4, admit=4,
        max_length=12, per_request_sampling=True, seed=3,
    )
    rids_g = [svc_s.submit_embedding(e) for e in cemb[:3]]
    rids_s = [
        svc_s.submit_embedding(e, temperature=1.0, top_p=0.9) for e in cemb[3:6]
    ]
    svc_s.drain()
    got_g = [svc_s.pop_result(r) for r in rids_g]
    got_s = [svc_s.pop_result(r) for r in rids_s]
    g_same = sum(g == w for g, w in zip(got_g, want_caps[:3]))
    log(f"   greedy rows == one-shot for {g_same}/3; sampled rows drew "
        f"{sum(bool(s) for s in got_s)}/3 non-empty")
    if g_same < 2:  # same near-tie caveat as above
        failures.append(f"mixed-pool greedy agreement {g_same}/3")

    # --- last: Pallas flash attention, compiled on TPU ---------------------

    log("5/5 pallas flash attention vs XLA (compiled)...")
    q = jnp.asarray(rng.normal(size=(2, 4, 65, 64)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 4, 65, 64)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(2, 4, 65, 64)).astype(np.float32))
    mask = np.ones((2, 65), np.int32)
    mask[0, 50:] = 0
    want = np.asarray(nn.attention_xla(q, k, v, causal=True, key_mask=jnp.asarray(mask)))
    got = np.asarray(
        jax.jit(lambda q, k, v, m: flash_attention(q, k, v, causal=True, key_mask=m))(
            q, k, v, jnp.asarray(mask)
        )
    )
    err = np.abs(got - want).max()
    log(f"   flash maxdiff={err:.2e}")
    # TPU f32 matmuls run as bf16 MXU passes by default: ~1e-3 relative noise
    if err > 2e-2:
        failures.append(f"flash attention diff {err}")

    print()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("TPU validation: ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
