"""Fused whole-prefill kernel (ops/prefill_step.py) vs the XLA layerwise path.

Interpret mode on CPU; the oracle is ``gpt2.forward_cached(...,
fresh_prefill=True)`` — the same prefix forward the reference model performs
before its decode loop (/root/reference/src/models.py:389-400).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpt2_image_captioning_tpu.core.precision import F32
from gpt2_image_captioning_tpu.models import gpt2
from gpt2_image_captioning_tpu.ops import decode_step as DS
from gpt2_image_captioning_tpu.ops import prefill_step as PS


def _setup(b=3, p_len=7, n_layer=2, n_head=2, d=32, seed=0):
    cfg = gpt2.GPT2Config(
        vocab_size=293, n_positions=128, n_embd=d, n_layer=n_layer, n_head=n_head
    )
    params = gpt2.init(jax.random.PRNGKey(seed), cfg)
    rng = np.random.default_rng(seed + 1)
    prefix = jnp.asarray(rng.normal(size=(b, p_len, d)).astype(np.float32))
    return cfg, params, prefix


def _oracle(cfg, params, prefix, extra=6):
    b, p_len, _ = prefix.shape
    cache = gpt2.init_cache(cfg, b, p_len + extra)
    logits, cache = gpt2.forward_cached(
        params, cfg, prefix, cache, fresh_prefill=True
    )
    return logits, cache


def test_fused_prefill_matches_forward_cached():
    """Logits AND every written cache row match the layerwise XLA prefill."""
    cfg, params, prefix = _setup()
    b, p_len, _ = prefix.shape
    want_logits, want_cache = _oracle(cfg, params, prefix)

    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    cache0 = gpt2.init_cache(cfg, b, p_len + 6)
    got_logits, got_cache = PS.prefill_into_cache(
        packed, params, cfg, prefix, cache0, F32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_cache["k"]), np.asarray(want_cache["k"]), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_cache["v"]), np.asarray(want_cache["v"]), atol=1e-4, rtol=1e-4
    )
    assert int(got_cache["index"]) == p_len
    # rows beyond the prefix stay zero (decode appends there)
    assert not np.asarray(got_cache["k"][:, p_len:]).any()


def test_fused_prefill_multi_block_grid_matches_single():
    """A 3-block grid (forced tiny block target) equals the 1-block run —
    block padding rows and per-block DMA offsets don't leak."""
    cfg, params, prefix = _setup(b=5, p_len=8)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    x0 = prefix.astype(jnp.float32)

    one = PS.fused_prefill(packed, x0, n_head=cfg.n_head, interpret=True)
    many = PS.fused_prefill(
        packed, x0, n_head=cfg.n_head, interpret=True, target_rows=16
    )
    for a, b_ in zip(one, many):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("p_len", [1, 2, 10])
def test_fused_prefill_odd_prefix_lengths(p_len):
    """Short/odd prefixes (alignment padding paths) still match the oracle."""
    cfg, params, prefix = _setup(b=2, p_len=p_len)
    want_logits, want_cache = _oracle(cfg, params, prefix)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    cache0 = gpt2.init_cache(cfg, 2, p_len + 6)
    got_logits, got_cache = PS.prefill_into_cache(
        packed, params, cfg, prefix, cache0, F32, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_cache["k"][:, :p_len]),
        np.asarray(want_cache["k"][:, :p_len]),
        atol=1e-4,
        rtol=1e-4,
    )


def test_generate_with_fused_prefill_matches_xla(monkeypatch):
    """The env-gated opt-in (GIC_ENABLE_FUSED_PREFILL=1) routes generate()
    and beam_generate() through the fused prefill; outputs match the
    default XLA-prefill path token-for-token (interpret mode)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = gpt2.GPT2Config(
        vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(
        np.random.default_rng(5).normal(size=(4, 16)).astype(np.float32)
    )

    want = C.generate(
        trainable, frozen, ccfg, emb, max_length=8, temperature=0.0,
        use_pallas_decode=False,
    )
    want_beam = C.beam_generate(
        trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
        use_pallas_decode=False,
    )
    monkeypatch.setenv("GIC_ENABLE_FUSED_PREFILL", "1")
    C.generate.clear_cache()
    C.beam_generate.clear_cache()
    with pltpu.force_tpu_interpret_mode():
        got = C.generate(
            trainable, frozen, ccfg, emb, max_length=8, temperature=0.0,
            use_pallas_decode=True,
        )
        got_beam = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
            use_pallas_decode=True,
        )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
    np.testing.assert_array_equal(np.asarray(want_beam), np.asarray(got_beam))
    C.generate.clear_cache()
    C.beam_generate.clear_cache()


def test_fused_prefill_then_fused_decode_chain():
    """End-to-end: fused prefill seeds the cache, the fused decode kernel
    continues from it, and the token stream equals the all-XLA path."""
    cfg, params, prefix = _setup(b=3, p_len=7, seed=3)
    b, p_len, _ = prefix.shape
    steps = 4

    # all-XLA oracle
    logits, cache = _oracle(cfg, params, prefix, extra=steps + 1)
    tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    want_toks = [tok]
    for _ in range(steps):
        emb = gpt2.embed_tokens(params, tok[:, None])
        logits, cache = gpt2.forward_cached(
            params, cfg, emb, cache, use_pallas_decode=False
        )
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        want_toks.append(tok)

    # fused prefill + fused decode
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    cache0 = gpt2.init_cache(cfg, b, p_len + steps + 1)
    logits_f, cache_f = PS.prefill_into_cache(
        packed, params, cfg, prefix, cache0, F32, interpret=True
    )
    tok_f = jnp.argmax(logits_f, axis=-1).astype(jnp.int32)
    got_toks = [tok_f]
    for _ in range(steps):
        idx = cache_f["index"]
        x0 = gpt2.embed_tokens(params, tok_f[:, None])[:, 0] + params["wpe"][idx]
        nxt, kc, vc = DS.fused_decode_step(
            packed, x0.astype(jnp.float32), cache_f["k"], cache_f["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        )
        cache_f = {"k": kc, "v": vc, "index": idx + 1}
        tok_f = nxt
        got_toks.append(nxt)

    np.testing.assert_array_equal(
        np.asarray(jnp.stack(want_toks)), np.asarray(jnp.stack(got_toks))
    )
