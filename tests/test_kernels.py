"""Pallas kernels (interpret mode on CPU) vs the XLA reference path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.attention import flash_attention
from gpt2_image_captioning_tpu.ops.sampling import top_p_filter


def _qkv(b=2, h=3, tq=17, tk=23, hd=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(b, h, tq, hd)).astype(np.float32)
    k = rng.normal(size=(b, h, tk, hd)).astype(np.float32)
    v = rng.normal(size=(b, h, tk, hd)).astype(np.float32)
    return jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_matches_xla(causal):
    q, k, v = _qkv(tq=16, tk=16)
    want = nn.attention_xla(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_flash_odd_lengths_and_mask():
    q, k, v = _qkv(tq=17, tk=23)
    mask = np.ones((2, 23), dtype=np.int32)
    mask[0, 15:] = 0
    mask[1, 20:] = 0
    want = nn.attention_xla(q, k, v, key_mask=jnp.asarray(mask))
    got = flash_attention(q, k, v, key_mask=jnp.asarray(mask), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_flash_causal_with_q_offset():
    """Decode-style: queries positioned after a cached prefix."""
    q, k, v = _qkv(tq=4, tk=12)
    want = nn.attention_xla(q, k, v, causal=True, q_offset=8)
    got = flash_attention(q, k, v, causal=True, q_offset=8, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_flash_multiblock():
    """Sequence longer than one 128 block exercises the online softmax."""
    q, k, v = _qkv(tq=200, tk=200, h=1)
    want = nn.attention_xla(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_flash_gradients_match_xla():
    q, k, v = _qkv(tq=16, tk=16)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(nn.attention_xla(q, k, v, causal=True) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_top_p_filter_semantics():
    # distribution: softmax over [3, 2, 1, 0, -1] — top-1 always kept
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0, -1.0]])
    kept = np.asarray(top_p_filter(logits, 0.5))[0]
    # p(3.0) ~ 0.64 > 0.5 -> only top-1 kept
    assert np.isfinite(kept[0])
    assert (kept[1:] < -1e30).all()

    kept2 = np.asarray(top_p_filter(logits, 0.9))[0]
    # cumulative: 0.64, 0.87, 0.96 -> keep first three
    assert np.isfinite(kept2[:3]).all()
    assert (kept2[3:] < -1e30).all()


def test_top_p_filter_matches_torch_reference_masking():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 50)).astype(np.float32)
    top_p = 0.9
    t = torch.from_numpy(logits.copy())
    sorted_logits, sorted_idx = torch.sort(t, descending=True)
    cum = torch.cumsum(F.softmax(sorted_logits, dim=-1), dim=-1)
    rm = cum > top_p
    rm[:, 1:] = rm[:, :-1].clone()
    rm[:, 0] = 0
    mask = rm.scatter(1, sorted_idx, rm)
    want_removed = mask.numpy()

    got = np.asarray(top_p_filter(jnp.asarray(logits), top_p))
    got_removed = got < -1e30
    np.testing.assert_array_equal(got_removed, want_removed)


def test_fused_patch_embed_matches_xla():
    """Pallas fused dequant-normalize-patch-embed == the XLA composition."""
    import dataclasses

    from gpt2_image_captioning_tpu.embeddings.preprocess import CLIP_SPEC
    from gpt2_image_captioning_tpu.ops.patch_embed import patch_embed

    spec = dataclasses.replace(CLIP_SPEC, resize=32, crop=32)
    rng = np.random.default_rng(4)
    batch = rng.integers(0, 255, size=(2, 32, 32, 3), dtype=np.uint8)
    patch = 8
    k, d = 3 * patch * patch, 48
    w = rng.normal(size=(k, d)).astype(np.float32) * 0.02
    bias = rng.normal(size=(d,)).astype(np.float32)

    want = patch_embed(jnp.asarray(batch), jnp.asarray(w), spec, patch,
                       bias=jnp.asarray(bias), use_pallas=False)
    got = patch_embed(jnp.asarray(batch), jnp.asarray(w), spec, patch,
                      bias=jnp.asarray(bias), use_pallas=True, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    assert got.shape == (2, 16, 48)


def test_fused_patch_embed_equals_model_pipeline():
    """The fused op reproduces normalize_on_device + extract_patches + matmul
    exactly as used by the CLIP tower."""
    import dataclasses

    from gpt2_image_captioning_tpu.embeddings.preprocess import (
        VIT_SPEC,
        normalize_on_device,
    )
    from gpt2_image_captioning_tpu.models.clip import extract_patches
    from gpt2_image_captioning_tpu.ops.patch_embed import patch_embed

    spec = dataclasses.replace(VIT_SPEC, resize=16)
    rng = np.random.default_rng(5)
    batch = rng.integers(0, 255, size=(3, 16, 16, 3), dtype=np.uint8)
    patch = 8
    w = rng.normal(size=(3 * 64, 32)).astype(np.float32)

    px = normalize_on_device(jnp.asarray(batch), spec)  # (B, 3, S, S)
    ref = jnp.dot(extract_patches(px, patch), jnp.asarray(w),
                  preferred_element_type=jnp.float32)
    got = patch_embed(jnp.asarray(batch), jnp.asarray(w), spec, patch, use_pallas=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Fused decode attention (cache append + valid-prefix attention)
# ---------------------------------------------------------------------------

from gpt2_image_captioning_tpu.ops import decode_attention as DA


def _decode_inputs(b=5, n_head=4, tk=48, d=32, idx=19, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    q, kn, vn = (rng.normal(size=(b, d)).astype(dtype) for _ in range(3))
    kc = rng.normal(size=(tk, b, d)).astype(dtype)  # cache layout (T, B, D)
    vc = rng.normal(size=(tk, b, d)).astype(dtype)
    # rows >= idx are garbage the kernel must never attend
    kc[idx:] = 1e6
    vc[idx:] = -1e6
    return (
        jnp.asarray(q), jnp.asarray(kn), jnp.asarray(vn),
        jnp.asarray(kc), jnp.asarray(vc), jnp.int32(idx),
    )


@pytest.mark.parametrize("idx", [0, 1, 15, 16, 17, 47])
def test_decode_attention_kernel_matches_xla(idx):
    """Interpret-mode kernel == XLA oracle at chunk boundaries and extremes."""
    q, kn, vn, kc, vc, _ = _decode_inputs(idx=max(idx, 1) if idx else 0)
    kc = kc.at[idx:].set(1e6)
    vc = vc.at[idx:].set(-1e6)
    idx = jnp.int32(idx)
    want, kc_w, vc_w = DA.decode_attention(
        q, kn, vn, kc, vc, idx, n_head=4, use_pallas=False
    )
    got, kc_g, vc_g = DA.decode_attention(
        q, kn, vn, kc, vc, idx, n_head=4, use_pallas=True, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(kc_g), np.asarray(kc_w))
    np.testing.assert_array_equal(np.asarray(vc_g), np.asarray(vc_w))


def test_decode_attention_kernel_matches_multihead_einsum():
    """Against plain multi-head attention math (independent of the XLA path)."""
    b, h, tk, d, idx = 3, 2, 32, 16, 11
    q, kn, vn, kc, vc, idxj = _decode_inputs(b=b, n_head=h, tk=tk, d=d, idx=idx)
    got, kc2, vc2 = DA.decode_attention(
        q, kn, vn, kc, vc, idxj, n_head=h, use_pallas=True, interpret=True
    )
    hd = d // h
    keys = np.concatenate(
        [np.asarray(kc)[:idx].transpose(1, 0, 2), np.asarray(kn)[:, None]], axis=1
    )
    vals = np.concatenate(
        [np.asarray(vc)[:idx].transpose(1, 0, 2), np.asarray(vn)[:, None]], axis=1
    )
    qh = np.asarray(q).reshape(b, h, hd)
    kh = keys.reshape(b, idx + 1, h, hd)
    vh = vals.reshape(b, idx + 1, h, hd)
    s = np.einsum("bhd,bkhd->bhk", qh, kh) / np.sqrt(hd)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    want = np.einsum("bhk,bkhd->bhd", p, vh).reshape(b, d)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=1e-5)
    # the caches gained the new row at idx
    np.testing.assert_array_equal(np.asarray(kc2)[idx], np.asarray(kn))
    np.testing.assert_array_equal(np.asarray(vc2)[idx], np.asarray(vn))


def test_decode_attention_bf16_close_to_f32():
    q, kn, vn, kc, vc, idx = _decode_inputs(idx=19)
    want, *_ = DA.decode_attention(q, kn, vn, kc, vc, idx, n_head=4, use_pallas=False)
    bf = jnp.bfloat16
    got, *_ = DA.decode_attention(
        q.astype(bf), kn.astype(bf), vn.astype(bf), kc.astype(bf), vc.astype(bf),
        idx, n_head=4, use_pallas=True, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want), atol=3e-2, rtol=3e-2
    )


def test_forward_cached_decode_step_pallas_matches_xla():
    """Full GPT-2 decode step: kernel path == XLA path, token-for-token."""
    from gpt2_image_captioning_tpu.models import gpt2

    cfg = gpt2.GPT2Config.tiny()
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, p_len = 3, 7
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 5)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    tok = jnp.asarray(rng.normal(size=(b, 1, cfg.n_embd)).astype(np.float32))
    want, cache_w = gpt2.forward_cached(params, cfg, tok, cache, use_pallas_decode=False)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        got, cache_g = gpt2.forward_cached(params, cfg, tok, cache, use_pallas_decode=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(cache_g["k"]), np.asarray(cache_w["k"]), atol=1e-5, rtol=1e-5
    )


# ---------------------------------------------------------------------------
# Fused whole-step greedy decode kernel (ops/decode_step.py)
# ---------------------------------------------------------------------------


def test_fused_decode_step_matches_forward_cached():
    """Interpret mode: the mega-kernel's token AND cache update equal the
    layerwise forward_cached + argmax path over several chained steps."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(1)
    b, p_len = 3, 7
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 6)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)

    cache_f = dict(cache)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    tok_f = tok
    for _ in range(5):
        emb = gpt2.embed_tokens(params, tok[:, None])
        logits, cache = gpt2.forward_cached(params, cfg, emb, cache, use_pallas_decode=False)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        idx = cache_f["index"]
        x0 = gpt2.embed_tokens(params, tok_f[:, None])[:, 0] + params["wpe"][idx]
        nxt, kc, vc = DS.fused_decode_step(
            packed, x0.astype(jnp.float32), cache_f["k"], cache_f["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        )
        cache_f = {"k": kc, "v": vc, "index": idx + 1}
        tok_f = nxt
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(nxt))
        np.testing.assert_allclose(
            np.asarray(cache["k"]), np.asarray(kc), atol=1e-6, rtol=1e-6
        )


def test_fused_decode_step_emit_logits_matches_forward_cached():
    """Interpret mode: emit_logits returns the full (B, vocab) logits equal to
    the layerwise forward_cached path (and the same cache update)."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(7)
    b, p_len = 3, 5
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 4)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    cache_f = dict(cache)
    for _ in range(3):
        emb = gpt2.embed_tokens(params, tok[:, None])
        want_logits, cache = gpt2.forward_cached(
            params, cfg, emb, cache, use_pallas_decode=False
        )

        idx = cache_f["index"]
        x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]
        got_logits, kc, vc = DS.fused_decode_step(
            packed, x0.astype(jnp.float32), cache_f["k"], cache_f["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
            emit_logits=True,
        )
        cache_f = {"k": kc, "v": vc, "index": idx + 1}
        assert got_logits.shape == (b, cfg.vocab_size)
        np.testing.assert_allclose(
            np.asarray(want_logits[:, 0] if want_logits.ndim == 3 else want_logits),
            np.asarray(got_logits), atol=1e-4, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(cache["k"]), np.asarray(kc), atol=1e-6, rtol=1e-6
        )
        tok = jnp.argmax(got_logits, axis=-1).astype(jnp.int32)


def test_generate_fused_sampled_matches_xla_path():
    """End-to-end generate() with temperature/top-p sampling: the fused
    emit_logits path == the per-layer XLA path token-for-token under the same
    rng (sampling runs outside the kernel with identical rng folding)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(np.random.default_rng(5).normal(size=(4, 16)).astype(np.float32))

    for temperature, top_p in [(0.8, 0.9), (1.0, 1.0)]:
        key = jax.random.PRNGKey(11)
        want = C.generate(
            trainable, frozen, ccfg, emb, max_length=10,
            temperature=temperature, top_p=top_p, rng=key,
            use_pallas_decode=False,
        )
        with pltpu.force_tpu_interpret_mode():
            got = C.generate(
                trainable, frozen, ccfg, emb, max_length=10,
                temperature=temperature, top_p=top_p, rng=key,
                use_pallas_decode=True,
            )
        np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.parametrize(
    "b,p_len,vocab,n_layer,n_head,d",
    [
        (1, 1, 97, 1, 1, 16),    # degenerate: single row, single layer/head
        (5, 9, 131, 3, 4, 32),   # odd batch, vocab not a tile multiple
        (9, 2, 640, 2, 2, 48),   # vocab > logits tile, 3-head-unfriendly d
        (16, 6, 257, 4, 8, 64),  # deeper stack, aligned batch
    ],
)
def test_fused_decode_step_shape_fuzz(b, p_len, vocab, n_layer, n_head, d):
    """The fused kernel's padding/tiling logic across irregular shapes:
    tokens == layerwise XLA path for several chained steps."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(
        vocab_size=vocab, n_positions=64, n_embd=d, n_layer=n_layer, n_head=n_head
    )
    params = gpt2.init(jax.random.PRNGKey(b + vocab), cfg)
    rng = np.random.default_rng(b)
    prefix = jnp.asarray(rng.normal(size=(b, p_len, d)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 3)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    cache_f = dict(cache)
    tok_f = tok
    for _ in range(2):
        emb = gpt2.embed_tokens(params, tok[:, None])
        logits, cache = gpt2.forward_cached(params, cfg, emb, cache, use_pallas_decode=False)
        tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        idx = cache_f["index"]
        x0 = gpt2.embed_tokens(params, tok_f[:, None])[:, 0] + params["wpe"][idx]
        nxt, kc, vc = DS.fused_decode_step(
            packed, x0.astype(jnp.float32), cache_f["k"], cache_f["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        )
        cache_f = {"k": kc, "v": vc, "index": idx + 1}
        tok_f = nxt
        np.testing.assert_array_equal(np.asarray(tok), np.asarray(nxt))


def test_fused_decode_step_multi_block_grid_matches_single():
    """The batch-blocked grid (nb > 1 programs, each slicing its own cache
    rows) produces identical tokens to one whole-batch program — exercises
    the bi-indexed DMA slicing that large-batch serving relies on."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(17)
    b, p_len = 24, 5
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 3)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    idx = cache["index"]
    x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]
    one, k1, v1 = DS.fused_decode_step(
        packed, x0.astype(jnp.float32), cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        block_b=24, chunk_t=8,
    )
    three, k3, v3 = DS.fused_decode_step(
        packed, x0.astype(jnp.float32), cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        block_b=8, chunk_t=8,
    )
    np.testing.assert_array_equal(np.asarray(one), np.asarray(three))
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k3), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v3), atol=1e-6)


def test_fused_decode_narrow_tile_packing_matches():
    """tw=384-style narrow weight tiles (used for 256-row serving blocks)
    give the same results as the default packing."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(19)
    b, p_len = 4, 5
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 3)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    idx = cache["index"]
    x0 = (gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]).astype(
        jnp.float32
    )

    outs = []
    for tw in (DS.TILE_W, 64):  # 64 plays the "narrow tile" role at d=32
        packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32, tw=tw)
        nxt, _, _ = DS.fused_decode_step(
            packed, x0, cache["k"], cache["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        )
        outs.append(np.asarray(nxt))
    np.testing.assert_array_equal(outs[0], outs[1])


def test_fused_decode_step_int8_close_to_f32():
    """W8A8 quantized fused step (interpret): logits within quantization
    noise of the f32 layerwise path, caches likewise."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(11)
    b, p_len = 3, 5
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 3)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed_q = DS.pack_decode_weights(params, compute_dtype=jnp.float32, quant=True)
    # int8 packing invariants
    assert packed_q["qkvw"].dtype == jnp.int8
    assert packed_q["wtet"].dtype == jnp.int8
    assert packed_q["qkvs"].shape == packed_q["attnb"].shape

    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    emb = gpt2.embed_tokens(params, tok[:, None])
    want, _ = gpt2.forward_cached(params, cfg, emb, cache, use_pallas_decode=False)

    idx = cache["index"]
    x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]
    got, kc, vc = DS.fused_decode_step(
        packed_q, x0.astype(jnp.float32), cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        emit_logits=True,
    )
    w = np.asarray(want, np.float32)
    g = np.asarray(got)
    rel = np.abs(w - g).max() / np.abs(w).max()
    cos = (w * g).sum() / (np.linalg.norm(w) * np.linalg.norm(g))
    assert rel < 0.15, rel  # int8 weight+activation quantization noise
    assert cos > 0.995, cos


def test_fused_decode_step_int8_cache_appends_and_tracks():
    """int8 KV cache: quantize_cache roundtrips within int8 noise, the kernel
    appends quantized rows + scales at idx, and chained steps stay close to
    the f32 path."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(vocab_size=293, n_positions=128, n_embd=32, n_layer=2, n_head=2)
    params = gpt2.init(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(13)
    b, p_len = 3, 5
    prefix = jnp.asarray(rng.normal(size=(b, p_len, cfg.n_embd)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 4)
    logits0, cache = gpt2.forward_cached(params, cfg, prefix, cache)

    kq, vq, ks, vs = DS.quantize_cache(cache["k"], cache["v"])
    # roundtrip within int8 quantization noise on the valid prefix
    k_rt = np.asarray(kq, np.float32) * np.asarray(ks)[..., None]
    k_ref = np.asarray(cache["k"], np.float32)
    assert np.abs(k_rt - k_ref).max() <= np.abs(k_ref).max() / 127.0 + 1e-6

    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32, quant=True)
    tok = jnp.argmax(logits0, axis=-1).astype(jnp.int32)
    idx = cache["index"]
    x0 = gpt2.embed_tokens(params, tok[:, None])[:, 0] + params["wpe"][idx]
    got, kq2, vq2, ks2, vs2 = DS.fused_decode_step(
        packed, x0.astype(jnp.float32), kq, vq, idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        emit_logits=True, k_scale=ks, v_scale=vs,
    )
    # the appended row idx carries a real scale and nonzero int8 data
    assert np.asarray(ks2)[:, int(idx)].min() > 1e-10
    assert np.abs(np.asarray(kq2[:, int(idx)], np.int32)).max() > 0
    # rows before idx untouched
    np.testing.assert_array_equal(np.asarray(kq2[:, :int(idx)]), np.asarray(kq[:, :int(idx)]))

    emb = gpt2.embed_tokens(params, tok[:, None])
    want, _ = gpt2.forward_cached(params, cfg, emb, cache, use_pallas_decode=False)
    w = np.asarray(want, np.float32)
    g = np.asarray(got)
    cos = (w * g).sum() / (np.linalg.norm(w) * np.linalg.norm(g))
    assert cos > 0.99, cos


def test_generate_int8_decode_runs_and_tracks_f32():
    """End-to-end generate with decode_quant: runs, EOS-consistent, and the
    greedy tokens stay close to the f32 path (quantization drift only)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(np.random.default_rng(5).normal(size=(4, 16)).astype(np.float32))

    want = np.asarray(
        C.generate(trainable, frozen, ccfg, emb, max_length=10, temperature=0.0,
                   top_p=1.0, use_pallas_decode=False)
    )
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            C.generate(trainable, frozen, ccfg, emb, max_length=10, temperature=0.0,
                       top_p=1.0, use_pallas_decode=True, decode_quant=True)
        )
    assert got.shape == want.shape
    for row in got:
        hit = np.where(row == 292)[0]
        if len(hit):
            assert (row[hit[0]:] == 292).all()
    # random-init tiny logits are the adversarial case for quantization; the
    # trajectories still mostly coincide (deterministic given the seeds)
    assert (got == want).mean() > 0.5, (got, want)

    # the int8 KV-cache variant (decode_quant_cache, off by default after the
    # on-chip A/B rejected it) still produces a valid EOS-consistent decode
    with pltpu.force_tpu_interpret_mode():
        got_c = np.asarray(
            C.generate(trainable, frozen, ccfg, emb, max_length=10, temperature=0.0,
                       top_p=1.0, use_pallas_decode=True, decode_quant=True,
                       decode_quant_cache=True)
        )
    assert got_c.shape == want.shape
    for row in got_c:
        hit = np.where(row == 292)[0]
        if len(hit):
            assert (row[hit[0]:] == 292).all()
    assert (got_c == want).mean() > 0.5


def test_generate_int8_kv_cache_large_batch_runs():
    """decode_quant_cache at batch > 128: the round-4 scale-layout rework
    fixed the earlier Mosaic compile failures (on-chip witness at b=512/1024,
    docs/ab_logs/kv_quant_scale_ab3.log); the mode must stay reachable at
    large batch — this pins the wrapper/kernel plumbing at b=256 in
    interpret mode."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=300, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.zeros((256, 16), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(
            C.generate(trainable, frozen, ccfg, emb, max_length=2,
                       temperature=0.0, top_p=1.0, use_pallas_decode=True,
                       decode_quant=True, decode_quant_cache=True)
        )
    assert out.shape == (256, 2)


def test_fused_decode_step_topk_matches_topk_small():
    """The in-kernel top-k + streaming logsumexp (beam mode's vocab walk)
    reproduces topk_small/logsumexp over the emitted full logits exactly —
    values, indices (incl. tie order) and lse."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS
    from gpt2_image_captioning_tpu.ops.sampling import topk_small

    cfg = gpt2.GPT2Config(
        vocab_size=613, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    params = gpt2.init(jax.random.PRNGKey(4), cfg)
    rng = np.random.default_rng(7)
    b, p_len, k = 6, 3, 4
    prefix = jnp.asarray(rng.normal(size=(b, p_len, 32)).astype(np.float32))
    cache = gpt2.init_cache(cfg, b, p_len + 2)
    _, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(b, 32)).astype(np.float32))

    want_logits, _, _ = DS.fused_decode_step(
        packed, x0, cache["k"], cache["v"], cache["index"],
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True, emit_logits=True,
    )
    vals, idxs, lse, _, _ = DS.fused_decode_step(
        packed, x0, cache["k"], cache["v"], cache["index"],
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True, topk=k,
    )
    want_v, want_i = topk_small(jnp.asarray(want_logits), k)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_v), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_i))
    want_lse = jax.nn.logsumexp(jnp.asarray(want_logits), axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(lse), np.asarray(want_lse), rtol=1e-5)


def test_fused_decode_step_origin_indirection_matches_gather():
    """Beam-mode ancestry indirection: a step reading rows through an origin
    map == a step over the explicitly beam-gathered cache (the round-2
    design), across multiple batch blocks (block_b=8, k=4 groups)."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(
        vocab_size=307, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    params = gpt2.init(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(11)
    k, n_img, p_len = 4, 4, 5
    bk = n_img * k  # 16 rows over 2 blocks of 8
    prefix = jnp.asarray(rng.normal(size=(bk, p_len, 32)).astype(np.float32))
    cache = gpt2.init_cache(cfg, bk, p_len + 3)
    _, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(bk, 32)).astype(np.float32))
    idx = cache["index"]
    tpad = cache["k"].shape[1]

    # random ancestry: each row's history at each position comes from a
    # random beam of ITS OWN image group
    base = (np.arange(bk) // k * k)[None, :]
    origin = np.asarray(base + rng.integers(0, k, size=(tpad, bk)), np.int32)

    # reference: gather each row's cache explicitly, no indirection.
    # (per-position ancestry means each row r's gathered cache row t is
    # cache[t, origin[t, r]] — materialize exactly that)
    kg = np.asarray(cache["k"]).copy()
    vg = np.asarray(cache["v"]).copy()
    t_idx = np.arange(tpad)[:, None]
    kg = kg[:, t_idx, origin]  # (L, Tpad, BK, D)
    vg = vg[:, t_idx, origin]
    vals_g, idxs_g, lse_g, _, _ = DS.fused_decode_step(
        packed, x0, jnp.asarray(kg), jnp.asarray(vg), idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        topk=k, block_b=8,
    )

    # all three in-kernel gather implementations (VPU shifted selects, the
    # lane-concatenated single-pass variant, and the MXU one-hot permutation
    # matmul) must match the explicit gather
    for mode in ("shift", "fused_shift", "onehot"):
        vals_o, idxs_o, lse_o, _, _ = DS.fused_decode_step(
            packed, x0, cache["k"], cache["v"], idx,
            n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
            origin=jnp.asarray(origin), beam_k=k, topk=k, block_b=8,
            beam_gather=mode,
        )
        np.testing.assert_allclose(
            np.asarray(vals_o), np.asarray(vals_g), rtol=2e-5, atol=1e-5,
            err_msg=mode,
        )
        np.testing.assert_array_equal(np.asarray(idxs_o), np.asarray(idxs_g), err_msg=mode)
        np.testing.assert_allclose(
            np.asarray(lse_o), np.asarray(lse_g), rtol=2e-5, atol=1e-5,
            err_msg=mode,
        )


def test_fused_decode_step_gather_start_skips_identical_prefix():
    """``gather_start``: chunks entirely below it skip the ancestry gather.
    With group-identical prefix rows (the beam invariant — every beam
    descends from one image prefill) the skip is a numeric no-op, so the
    result must equal the full explicit gather."""
    from gpt2_image_captioning_tpu.models import gpt2
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cfg = gpt2.GPT2Config(
        vocab_size=307, n_positions=64, n_embd=32, n_layer=2, n_head=2
    )
    params = gpt2.init(jax.random.PRNGKey(6), cfg)
    rng = np.random.default_rng(12)
    k, n_img, p_len = 4, 4, 9  # p_len > CHUNK_T so chunk 0 really skips
    bk = n_img * k
    # identical prefix within each beam group (repeat each image's prefix k×)
    prefix_img = rng.normal(size=(n_img, p_len, 32)).astype(np.float32)
    prefix = jnp.asarray(np.repeat(prefix_img, k, axis=0))
    cache = gpt2.init_cache(cfg, bk, p_len + 7)
    _, cache = gpt2.forward_cached(params, cfg, prefix, cache)
    # then 3 per-row DISTINCT tokens so post-prefix gathering matters
    extra = jnp.asarray(rng.normal(size=(bk, 3, 32)).astype(np.float32))
    _, cache = gpt2.forward_cached(params, cfg, extra, cache)
    packed = DS.pack_decode_weights(params, compute_dtype=jnp.float32)
    x0 = jnp.asarray(rng.normal(size=(bk, 32)).astype(np.float32))
    idx = cache["index"]
    tpad = cache["k"].shape[1]

    base = (np.arange(bk) // k * k)[None, :]
    origin = np.asarray(base + rng.integers(0, k, size=(tpad, bk)), np.int32)

    kg = np.asarray(cache["k"]).copy()
    vg = np.asarray(cache["v"]).copy()
    t_idx = np.arange(tpad)[:, None]
    kg = kg[:, t_idx, origin]
    vg = vg[:, t_idx, origin]
    vals_g, idxs_g, lse_g, _, _ = DS.fused_decode_step(
        packed, x0, jnp.asarray(kg), jnp.asarray(vg), idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        topk=k, block_b=8,
    )

    vals_o, idxs_o, lse_o, _, _ = DS.fused_decode_step(
        packed, x0, cache["k"], cache["v"], idx,
        n_head=cfg.n_head, vocab=cfg.vocab_size, interpret=True,
        origin=jnp.asarray(origin), beam_k=k, topk=k, block_b=8,
        gather_start=p_len,
    )
    np.testing.assert_allclose(
        np.asarray(vals_o), np.asarray(vals_g), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idxs_o), np.asarray(idxs_g))
    np.testing.assert_allclose(
        np.asarray(lse_o), np.asarray(lse_g), rtol=2e-5, atol=1e-5
    )


def test_beam_generate_fused_matches_xla_path():
    """Beam search on the beam-aware fused kernel (origin indirection +
    in-kernel top-k/lse) == the per-layer XLA beam path with its per-step
    cache gather: same best-beam tokens."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(np.random.default_rng(9).normal(size=(3, 16)).astype(np.float32))

    want = C.beam_generate(
        trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
        use_pallas_decode=False,
    )
    with pltpu.force_tpu_interpret_mode():
        got = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
            use_pallas_decode=True,
        )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_beam_generate_int8_decode_runs_and_tracks_float():
    """Beam search with decode_quant (W8A8 fused beam kernel): runs, is
    EOS-consistent, and the best-beam tokens stay close to the float fused
    path (quantization drift only — same contract as greedy decode_quant)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(np.random.default_rng(9).normal(size=(3, 16)).astype(np.float32))

    with pltpu.force_tpu_interpret_mode():
        want = np.asarray(C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
            use_pallas_decode=True,
        ))
        got = np.asarray(C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=8, beam_size=4,
            use_pallas_decode=True, decode_quant=True,
        ))
    assert got.shape == want.shape
    for row in got:
        hit = np.where(row == 292)[0]
        if len(hit):
            assert (row[hit[0]:] == 292).all()
    # random-init tiny logits are the adversarial case for quantization; the
    # beams still mostly coincide (deterministic)
    assert (got == want).mean() > 0.5, (got, want)


def test_beam_generate_int8_without_fused_warns_and_falls_back():
    """decode_quant on the XLA beam path (kernel not engaged): warns loudly
    and returns the caller-precision beams (ADVICE r2 contract)."""
    import warnings as _w

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=151, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=150)
    trainable, frozen = C.init_params(jax.random.PRNGKey(2), ccfg)
    emb = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16)).astype(np.float32))

    want = C.beam_generate(
        trainable, frozen, ccfg, emb, max_length=6, beam_size=4,
        use_pallas_decode=False,
    )
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        got = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=6, beam_size=4,
            use_pallas_decode=False, decode_quant=True,
        )
    assert any("decode_quant" in str(r.message) for r in rec), (
        [str(r.message) for r in rec]
    )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_beam_generate_non_dividing_beam_falls_back():
    """beam_size=3 (does not divide the kernel block) silently uses the XLA
    path — same results with use_pallas_decode True and False."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=151, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=150)
    trainable, frozen = C.init_params(jax.random.PRNGKey(2), ccfg)
    emb = jnp.asarray(np.random.default_rng(4).normal(size=(2, 16)).astype(np.float32))

    want = C.beam_generate(
        trainable, frozen, ccfg, emb, max_length=6, beam_size=3,
        use_pallas_decode=False,
    )
    with pltpu.force_tpu_interpret_mode():
        got = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=6, beam_size=3,
            use_pallas_decode=True,
        )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))


def test_generate_fused_greedy_matches_reference_loop():
    """End-to-end generate(): fused whole-step path == per-layer XLA path,
    token-for-token, including EOS forcing and early exit."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    gcfg = G.GPT2Config(vocab_size=293, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=292)
    trainable, frozen = C.init_params(jax.random.PRNGKey(3), ccfg)
    emb = jnp.asarray(np.random.default_rng(5).normal(size=(4, 16)).astype(np.float32))

    want = C.generate(
        trainable, frozen, ccfg, emb, max_length=12, temperature=0.0, top_p=1.0,
        use_pallas_decode=False,
    )
    with pltpu.force_tpu_interpret_mode():
        got = C.generate(
            trainable, frozen, ccfg, emb, max_length=12, temperature=0.0, top_p=1.0,
            use_pallas_decode=True,
        )
    np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
