"""In-kernel nucleus sampling (fused decode step ``sample`` mode).

The kernel draws Gumbel-max candidates from the full temperature-scaled
softmax during the vocab walk and accepts the first candidate whose
strictly-above mass is ≤ top_p — exact rejection sampling from the nucleus
(ops/decode_step.py sample branch; the nucleus rule is ops/sampling.py's
per-token rule, matching the reference's top-p semantics at
``/root/reference/src/models.py:407-449``).

These tests run under the TPU interpreter (``force_tpu_interpret_mode``),
where ``pltpu.prng_random_bits`` returns ZERO bits: the Gumbel noise is then
a per-element constant, so every candidate collapses to the row argmax and
the accept test trivially passes (mass strictly above the max is 0).  That
makes the whole sampled path DETERMINISTIC here — ideal for validating the
plumbing (per-row dispatch, stats, round machinery, cache updates).  The
stochastic properties (distribution, nucleus membership, seed determinism)
are validated on real hardware by scripts/tpu_validation.py, where the
hardware PRNG is live.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.pallas import tpu as pltpu

from gpt2_image_captioning_tpu.models import gpt2
from gpt2_image_captioning_tpu.ops import decode_step as DS


def _setup(b=3, p_len=5, vocab=700, n_embd=32, n_layer=2, n_head=2, slack=6, seed=0):
    cfg = gpt2.GPT2Config(
        vocab_size=vocab, n_positions=128, n_embd=n_embd, n_layer=n_layer,
        n_head=n_head,
    )
    params = gpt2.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed + 1)
    prefix = jnp.asarray(rng.normal(size=(b, p_len, n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + slack)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    return cfg, params, packed, cache, tok


def _x0(params, tok, idx):
    return (gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]).astype(
        jnp.float32
    )


def _sample_step(cfg, packed, cache, x0, temp, topp, seed=7, **kw):
    with pltpu.force_tpu_interpret_mode():
        return DS.fused_decode_step(
            packed, x0, cache["k"], cache["v"], cache["index"],
            n_head=cfg.n_head, vocab=cfg.vocab_size,
            sample={
                "temp": jnp.asarray(temp, jnp.float32),
                "top_p": jnp.asarray(topp, jnp.float32),
                "seed": seed,
            },
            **kw,
        )


def test_sample_mode_zero_bits_matches_argmax_and_cache():
    """Zero interpreter noise ⇒ every candidate is the argmax, accepted in
    round 1; caches update exactly as the layerwise path."""
    cfg, params, packed, cache, tok = _setup()
    b = tok.shape[0]
    for step in range(3):
        emb = gpt2.embed_tokens(params, tok[:, None])
        want_logits, cache_x = gpt2.forward_cached(
            params, cfg, emb, dict(cache), use_pallas_decode=False
        )
        want = jnp.argmax(want_logits, axis=-1).astype(jnp.int32)

        x0 = _x0(params, tok, cache["index"])
        got, rnd, lse, kc, vc = _sample_step(
            cfg, packed, cache, x0, [1.0] * b, [0.9] * b, seed=step
        )
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        np.testing.assert_array_equal(np.asarray(rnd), np.ones(b, np.int32))
        np.testing.assert_allclose(
            np.asarray(cache_x["k"]), np.asarray(kc), atol=1e-6, rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(cache_x["v"]), np.asarray(vc), atol=1e-6, rtol=1e-6
        )
        # lse equals the XLA logsumexp of the temperature-scaled logits
        want_lse = jax.nn.logsumexp(
            np.asarray(want_logits, np.float32), axis=-1, keepdims=True
        )
        np.testing.assert_allclose(
            np.asarray(want_lse), np.asarray(lse), atol=1e-4, rtol=1e-5
        )
        cache = {"k": kc, "v": vc, "index": cache["index"] + 1}
        tok = got


def test_sample_mode_per_row_temperature_and_lse():
    """temp == 0 rows take the raw argmax and report round 0; sampled rows'
    lse reflects each row's own temperature."""
    cfg, params, packed, cache, tok = _setup(b=4, seed=3)
    temps = [0.0, 1.0, 2.0, 0.5]
    x0 = _x0(params, tok, cache["index"])
    # oracle logits for this step
    emb = gpt2.embed_tokens(params, tok[:, None])
    want_logits, _ = gpt2.forward_cached(
        params, cfg, emb, dict(cache), use_pallas_decode=False
    )
    got, rnd, lse, _, _ = _sample_step(cfg, packed, cache, x0, temps, [0.9] * 4)
    want = np.argmax(np.asarray(want_logits), axis=-1)
    np.testing.assert_array_equal(want, np.asarray(got))  # zero bits ⇒ argmax
    np.testing.assert_array_equal(np.asarray(rnd), [0, 1, 1, 1])
    lw = np.asarray(want_logits, np.float64)
    for r, t in enumerate(temps):
        scale = 1.0 / t if t > 0 else 1.0
        want_lse = np.log(np.sum(np.exp(lw[r] * scale - lw[r].max() * scale))) + (
            lw[r].max() * scale
        )
        np.testing.assert_allclose(want_lse, float(lse[r, 0]), atol=1e-3, rtol=1e-5)


def test_sample_mode_rejection_rounds_and_forced_fallback():
    """An impossible top_p (< 0) rejects every candidate: all rounds run,
    fresh candidates are drawn each round, and the forced fallback takes the
    final round's first candidate (= argmax under zero noise)."""
    cfg, params, packed, cache, tok = _setup(seed=5)
    b = tok.shape[0]
    x0 = _x0(params, tok, cache["index"])
    got, rnd, _, _, _ = _sample_step(
        cfg, packed, cache, x0, [1.0] * b, [-1.0] * b, sample_rounds=3
    )
    emb = gpt2.embed_tokens(params, tok[:, None])
    want_logits, _ = gpt2.forward_cached(
        params, cfg, emb, dict(cache), use_pallas_decode=False
    )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(want_logits), axis=-1), np.asarray(got)
    )
    np.testing.assert_array_equal(np.asarray(rnd), np.full(b, 4, np.int32))


def test_sample_mode_top_p_one_accepts_first_candidate():
    """top_p ≥ 1 keeps the whole vocabulary: the first candidate always
    passes the membership test (mass ≤ 1 ≤ top_p)."""
    cfg, params, packed, cache, tok = _setup(seed=9)
    b = tok.shape[0]
    x0 = _x0(params, tok, cache["index"])
    _, rnd, _, _, _ = _sample_step(cfg, packed, cache, x0, [1.3] * b, [1.0] * b)
    np.testing.assert_array_equal(np.asarray(rnd), np.ones(b, np.int32))


def test_sample_mode_batch_padding_and_multi_tile_vocab():
    """Non-multiple-of-8 batch rows pad cleanly and a vocab spanning several
    512-wide tiles keeps the cross-tile running candidate/stats correct."""
    cfg, params, packed, cache, tok = _setup(b=5, vocab=1100, seed=11)
    b = tok.shape[0]
    x0 = _x0(params, tok, cache["index"])
    emb = gpt2.embed_tokens(params, tok[:, None])
    want_logits, _ = gpt2.forward_cached(
        params, cfg, emb, dict(cache), use_pallas_decode=False
    )
    got, rnd, lse, _, _ = _sample_step(cfg, packed, cache, x0, [1.0] * b, [0.9] * b)
    np.testing.assert_array_equal(
        np.argmax(np.asarray(want_logits), axis=-1), np.asarray(got)
    )
    want_lse = jax.nn.logsumexp(np.asarray(want_logits, np.float32), axis=-1)
    np.testing.assert_allclose(
        np.asarray(want_lse), np.asarray(lse)[:, 0], atol=1e-4, rtol=1e-5
    )
    assert got.shape == (b,) and rnd.shape == (b,)


def test_generate_sample_in_kernel_wiring():
    """generate(sample_in_kernel=True) under zero interpreter noise: the
    first token is the XLA draw from the prefill logits (same rng fold as
    the XLA tail), every later token is the argmax chain — i.e. exactly a
    greedy continuation of the sampled first token, with EOS semantics."""
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops.sampling import sample_token

    gcfg = gpt2.GPT2Config(
        vocab_size=311, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    mcfg = M.TransformerMappingConfig(
        embed_dim=16, gpt_dim=32, prefix_length=3, hidden_length=2
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=gcfg.vocab_size - 1)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    emb = jnp.asarray(
        np.random.default_rng(2).normal(size=(4, 16)).astype(np.float32)
    )
    rng = jax.random.PRNGKey(11)
    max_length = 6

    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            C.generate(
                trainable, frozen, ccfg, emb, max_length=max_length,
                temperature=1.0, top_p=0.9, rng=rng, use_pallas_decode=True,
                sample_in_kernel=True,
            )
        )

    # oracle: XLA first-token draw, then greedy continuation
    gpt_params = C._gpt(trainable, frozen)
    prefix = C.build_prefix(trainable, ccfg, emb)
    cache = gpt2.init_cache(gcfg, 4, prefix.shape[1] + max_length)
    logits, cache = gpt2.forward_cached(gpt_params, gcfg, prefix, cache)
    tok = sample_token(
        logits.astype(jnp.float32), temperature=1.0, top_p=0.9,
        rng=jax.random.fold_in(rng, 0),
    )
    eos = ccfg.eos_token_id
    want = np.full((4, max_length), eos, np.int32)
    finished = np.asarray(tok) == eos
    want[:, 0] = np.asarray(tok)
    for step in range(1, max_length):
        embx = gpt2.embed_tokens(gpt_params, tok[:, None])
        logits, cache = gpt2.forward_cached(
            gpt_params, gcfg, embx, cache, use_pallas_decode=False
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        finished = finished | (np.asarray(tok) == eos)
        want[:, step] = np.where(finished, eos, np.asarray(tok))
        tok = jnp.asarray(want[:, step])
    np.testing.assert_array_equal(want, got)


def test_sample_mode_int8_weights():
    """Sample mode composes with the int8 W8A8 weight packing."""
    cfg, params, packed, cache, tok = _setup(seed=13)
    b = tok.shape[0]
    packed_q = DS.pack_decode_weights(params, compute_dtype=jnp.float32, quant=True)
    x0 = _x0(params, tok, cache["index"])
    got, rnd, _, _, _ = _sample_step(cfg, packed_q, cache, x0, [1.0] * b, [0.9] * b)
    # int8 forward: token must match the int8 emit_logits argmax (same
    # quantized logits), not necessarily the f32 one
    with pltpu.force_tpu_interpret_mode():
        lg, _, _ = DS.fused_decode_step(
            packed_q, x0, cache["k"], cache["v"], cache["index"],
            n_head=cfg.n_head, vocab=cfg.vocab_size, emit_logits=True,
        )
    np.testing.assert_array_equal(
        np.argmax(np.asarray(lg), axis=-1), np.asarray(got)
    )
    np.testing.assert_array_equal(np.asarray(rnd), np.ones(b, np.int32))
