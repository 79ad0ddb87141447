"""On-chip A/B: fused emit_logits decode (sampled + beam) vs the XLA paths.

Validates that the emit_logits kernel mode lowers and runs on real Mosaic
(interpret-mode tests cannot prove that), checks on-chip numerics, and
measures throughput at the flagship shapes.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/sampled_decode_ab.py \
      > /tmp/sampled_ab.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.ops import decode_step as DS

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

    # --- 1. on-chip numerics: one emit_logits step vs forward_cached --------
    log("1/3 emit_logits kernel numerics on chip...")
    params = frozen["gpt"]
    b = 128
    rng = np.random.default_rng(1)
    prefix = jnp.asarray(rng.normal(size=(b, 20, 768)), jnp.bfloat16)

    @jax.jit
    def one_step(params, prefix):
        cache = G.init_cache(gcfg, b, 70, dtype=jnp.bfloat16)
        logits0, cache = G.forward_cached(
            params, gcfg, prefix, cache, BF16, fresh_prefill=True
        )
        tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
        x0 = (
            jnp.take(params["wte"], tok, axis=0) + params["wpe"][cache["index"]]
        ).astype(jnp.bfloat16)
        packed = DS.pack_decode_weights(params, jnp.bfloat16)
        flogits, _, _ = DS.fused_decode_step(
            packed, x0, cache["k"], cache["v"], cache["index"],
            n_head=12, vocab=gcfg.vocab_size, emit_logits=True,
        )
        emb = jnp.take(params["wte"], tok[:, None], axis=0).astype(jnp.bfloat16)
        xlogits, _ = G.forward_cached(params, gcfg, emb, cache, BF16)
        return flogits, xlogits

    fl, xl = one_step(params, prefix)
    fl, xl = np.asarray(fl, np.float32), np.asarray(xl, np.float32)
    maxdiff = np.abs(fl - xl).max()
    agree = (fl.argmax(-1) == xl.argmax(-1)).mean()
    log(f"   logits maxdiff={maxdiff:.3e}  argmax agreement={agree:.4f}")
    assert maxdiff < 0.5, maxdiff  # bf16 matmul-order noise on ~20-unit logits
    assert agree > 0.99, agree

    # --- 2. sampled decode A/B at flagship shapes ---------------------------
    log("2/3 sampled decode (T=1.0, top_p=0.9, b=128, len 50)...")
    emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
    key = jax.random.PRNGKey(7)

    def run(use_pallas):
        return C.generate(
            trainable, frozen, ccfg, emb, max_length=50, temperature=1.0,
            top_p=0.9, rng=key, policy=policy, use_pallas_decode=use_pallas,
        )

    log("   compiling fused...")
    ms_fused = timed(lambda: run(True))
    log(f"   fused: {ms_fused:.1f} ms/batch = {b / ms_fused * 1000:.0f} img/s")
    log("   compiling xla...")
    ms_xla = timed(lambda: run(False))
    log(f"   xla:   {ms_xla:.1f} ms/batch = {b / ms_xla * 1000:.0f} img/s")

    tok_f = np.asarray(run(True))
    tok_x = np.asarray(run(False))
    sample_agree = (tok_f == tok_x).mean()
    log(f"   token agreement fused vs xla (bf16, random-init): {sample_agree:.3f}")

    # --- 3. beam search A/B -------------------------------------------------
    log("3/3 beam search (beam=4, b=32 -> 128 rows, len 50)...")
    emb32 = jnp.asarray(rng.normal(size=(32, 512)).astype(np.float32))

    def run_beam(use_pallas):
        return C.beam_generate(
            trainable, frozen, ccfg, emb32, max_length=50, beam_size=4,
            policy=policy, use_pallas_decode=use_pallas,
        )

    log("   compiling fused...")
    beam_fused = timed(lambda: run_beam(True), reps=6)
    log(f"   fused: {beam_fused:.1f} ms/batch = {32 / beam_fused * 1000:.0f} img/s")
    log("   compiling xla...")
    beam_xla = timed(lambda: run_beam(False), reps=6)
    log(f"   xla:   {beam_xla:.1f} ms/batch = {32 / beam_xla * 1000:.0f} img/s")

    log(
        f"SUMMARY sampled {ms_xla:.1f} -> {ms_fused:.1f} ms "
        f"({ms_xla / ms_fused:.2f}x); beam {beam_xla:.1f} -> {beam_fused:.1f} ms "
        f"({beam_xla / beam_fused:.2f}x)"
    )
    log("done")


if __name__ == "__main__":
    main()
