"""Unit tests for the functional NN primitives against torch references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.sampling import top_p_filter


def test_layer_norm_matches_torch():
    torch = pytest.importorskip("torch")

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 7, 16)).astype(np.float32) * 3 + 1
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    want = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), eps=1e-5
    ).numpy()
    got = np.asarray(nn.layer_norm({"scale": jnp.asarray(w), "bias": jnp.asarray(b)},
                                   jnp.asarray(x), eps=1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("name,torch_fn", [
    ("gelu_new", lambda t, x: t.nn.functional.gelu(x, approximate="tanh")),
    ("gelu", lambda t, x: t.nn.functional.gelu(x)),
])
def test_gelu_variants_match_torch(name, torch_fn):
    torch = pytest.importorskip("torch")

    x = np.linspace(-4, 4, 101, dtype=np.float32)
    want = torch_fn(torch, torch.from_numpy(x)).numpy()
    got = np.asarray(nn.ACTIVATIONS[name](jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-6, rtol=1e-5)


def test_quick_gelu():
    x = np.linspace(-4, 4, 21, dtype=np.float32)
    want = x * (1 / (1 + np.exp(-1.702 * x)))
    np.testing.assert_allclose(np.asarray(nn.quick_gelu(jnp.asarray(x))), want, atol=1e-6)


def test_dense_layouts():
    p = {"w": jnp.asarray(np.arange(6, dtype=np.float32).reshape(2, 3)),
         "b": jnp.asarray(np.ones(3, np.float32))}
    x = jnp.asarray(np.array([[1.0, 2.0]], np.float32))
    got = np.asarray(nn.dense(p, x))
    np.testing.assert_allclose(got, x @ np.arange(6, dtype=np.float32).reshape(2, 3) + 1)


def test_split_merge_heads_roundtrip():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 12)).astype(np.float32))
    h = nn.split_heads(x, 3)
    assert h.shape == (2, 3, 5, 4)
    np.testing.assert_allclose(np.asarray(nn.merge_heads(h)), np.asarray(x))


def test_top_p_properties():
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(8, 200)).astype(np.float32) * 3)
    for p in (0.1, 0.5, 0.9, 0.99):
        kept = np.asarray(top_p_filter(logits, p))
        probs = np.exp(logits - np.max(np.asarray(logits), axis=-1, keepdims=True))
        probs = probs / probs.sum(-1, keepdims=True)
        for row_kept, row_p, row_logits in zip(kept, probs, np.asarray(logits)):
            mask = np.isfinite(row_kept) & (row_kept > -1e30)
            # top-1 always kept
            assert mask[np.argmax(row_logits)]
            # kept mass reaches the threshold
            assert row_p[mask].sum() >= p - 1e-6
            # minimality: dropping the weakest kept token goes below p
            if mask.sum() > 1:
                weakest = np.where(mask)[0][np.argmin(row_logits[mask])]
                assert row_p[mask].sum() - row_p[weakest] < p


def test_top_p_bisect_mask_matches_sort_oracle():
    """The sort-free bisection nucleus mask == the sorted-cumsum oracle mask
    across sharp, flat, extreme-temperature, and single-token cases."""
    from gpt2_image_captioning_tpu.ops.sampling import top_p_filter_bisect

    rng = np.random.default_rng(4)
    cases = [
        rng.normal(size=(6, 500)).astype(np.float32) * 6,      # sharp
        rng.normal(size=(4, 300)).astype(np.float32) * 0.01,   # near-flat
        rng.normal(size=(3, 1000)).astype(np.float32) * 40,    # huge range
        rng.normal(size=(2, 7)).astype(np.float32),            # tiny vocab
    ]
    one_hot = np.full((1, 50), -30.0, np.float32)
    one_hot[0, 17] = 10.0  # nucleus = single token
    cases.append(one_hot)
    for logits in cases:
        for p in (0.1, 0.5, 0.9, 0.99):
            want = np.asarray(top_p_filter(jnp.asarray(logits), p)) > -1e30
            got = np.asarray(top_p_filter_bisect(jnp.asarray(logits), p)) > -1e30
            np.testing.assert_array_equal(want, got, err_msg=f"p={p}")
            # the multiway branch (measured-rejected as default, kept for
            # re-measurement) must produce the identical mask
            got16 = np.asarray(
                top_p_filter_bisect(jnp.asarray(logits), p, ways=16)
            ) > -1e30
            np.testing.assert_array_equal(want, got16, err_msg=f"p={p} ways=16")


def test_top_p_bisect_peaked_rows_never_empty_under_jit():
    """Regression: with a single-token nucleus (peaked logits — trained
    models, or any logits at small temperatures), the bisection's exp-space
    loop predicate and logit-space final mask can disagree by one ulp at the
    boundary τ == row-max, leaving an EMPTY keep-set under jit fusion; a
    categorical over all-NEG_INF rows then degenerates to token 0.  The mask
    must always keep the top-1 and jitted sample_token must return the
    argmax in the temperature→0 limit."""
    import functools

    from gpt2_image_captioning_tpu.ops.sampling import (
        sample_token, top_p_filter_bisect,
    )

    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.normal(size=(8, 293)).astype(np.float32))
    want = np.asarray(jnp.argmax(logits, axis=-1))
    for temp in (1e-4, 1e-2):
        scaled = logits / temp
        kept = np.asarray(
            jax.jit(lambda x: top_p_filter_bisect(x, 0.9))(scaled)
        ) > -1e30
        assert (kept.sum(-1) >= 1).all()
        assert kept[np.arange(8), want].all()
        got = np.asarray(
            jax.jit(functools.partial(sample_token, temperature=temp, top_p=0.9))(
                logits, rng=jax.random.PRNGKey(0)
            )
        )
        np.testing.assert_array_equal(got, want)


def test_sample_token_bisect_equals_sort_draws():
    """Given equal masks, the bisect and sort paths feed the same full-width
    categorical → bit-identical tokens for the same key."""
    from gpt2_image_captioning_tpu.ops.sampling import sample_token

    rng = np.random.default_rng(5)
    for scale in (6.0, 0.01):
        logits = jnp.asarray(rng.normal(size=(4, 300)).astype(np.float32) * scale)
        for seed in range(5):
            key = jax.random.PRNGKey(seed)
            fast = np.asarray(
                sample_token(logits, temperature=0.8, top_p=0.9, rng=key)
            )
            exact = np.asarray(
                sample_token(
                    logits, temperature=0.8, top_p=0.9, rng=key, exact_sort=True
                )
            )
            np.testing.assert_array_equal(fast, exact)


def test_topk_small_equals_lax_topk():
    """Sequential masked argmax == lax.top_k (values AND indices, including
    tie order) for small k."""
    from gpt2_image_captioning_tpu.ops.sampling import topk_small

    rng = np.random.default_rng(6)
    x = rng.normal(size=(5, 400)).astype(np.float32)
    x[0, 10] = x[0, 20] = x[0, 30] = 7.0  # exact ties
    x[2, :] = 1.0  # fully tied row
    xj = jnp.asarray(x)
    for k in (1, 2, 4, 6):
        wv, wi = jax.lax.top_k(xj, k)
        gv, gi = topk_small(xj, k)
        np.testing.assert_array_equal(np.asarray(wv), np.asarray(gv))
        np.testing.assert_array_equal(np.asarray(wi), np.asarray(gi))


def test_sample_token_distribution_matches_nucleus():
    """Empirical frequencies from the default (bisect) path match the nucleus
    distribution (sharp 3-token nucleus, 4000 draws)."""
    from gpt2_image_captioning_tpu.ops.sampling import sample_token

    base = np.full((1, 100), -20.0, np.float32)
    base[0, 10], base[0, 20], base[0, 30] = 3.0, 2.0, 1.0
    logits = jnp.asarray(base)
    # nucleus at top_p=0.95: tokens 10, 20, 30 (cum .665, .909, .999)
    p = np.exp([3.0, 2.0, 1.0])
    p = p / p.sum()
    counts = {10: 0, 20: 0, 30: 0}
    draws = 4000
    keys = jax.random.split(jax.random.PRNGKey(0), draws)
    sample = jax.jit(
        lambda k: sample_token(logits, temperature=1.0, top_p=0.95, rng=k)
    )
    toks = np.asarray(jax.vmap(sample)(keys)).ravel()
    for t in toks:
        assert t in counts, t
        counts[t] += 1
    freqs = np.array([counts[10], counts[20], counts[30]]) / draws
    np.testing.assert_allclose(freqs, p, atol=0.03)


def test_attention_xla_vs_manual():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 2, 4, 8)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 2, 6, 8)).astype(np.float32))
    got = np.asarray(nn.attention_xla(q, k, v))
    s = np.einsum("bhqd,bhkd->bhqk", np.asarray(q), np.asarray(k)) / np.sqrt(8)
    w = np.exp(s - s.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bhkd->bhqd", w, np.asarray(v))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


# ---------------------------------------------------------------------------
# Vocab-chunked cross-entropy (ops/xent.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("chunk", [7, 64, 293, 500])
def test_xent_sum_matches_dense_oracle(chunk):
    """Chunked value + dh + dwte == the dense logsumexp formulation, across
    chunk sizes below/at/above the vocab size (tail masking included)."""
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.ops.xent import xent_sum

    rng = np.random.default_rng(0)
    n, d, v = 18, 16, 293
    h = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    wte = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    labels = rng.integers(0, v, size=(n,)).astype(np.int32)
    labels[::5] = -100  # ignore rows
    labels = jnp.asarray(labels)

    def dense(h, wte):
        logits = (h @ wte.T).astype(jnp.float32)
        valid = labels != -100
        safe = jnp.where(valid, labels, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        return jnp.sum((logz - gold) * valid)

    want, (dh_w, dw_w) = jax.value_and_grad(dense, argnums=(0, 1))(h, wte)
    got, (dh_g, dw_g) = jax.value_and_grad(
        lambda h, w: xent_sum(h, w, labels, chunk), argnums=(0, 1)
    )(h, wte)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dh_g), np.asarray(dh_w), atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_g), np.asarray(dw_w), atol=1e-5, rtol=1e-5)


def test_xent_sum_all_ignored_is_zero():
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.ops.xent import xent_sum

    h = jnp.ones((4, 8))
    wte = jnp.ones((11, 8))
    labels = jnp.full((4,), -100, jnp.int32)
    assert float(xent_sum(h, wte, labels, 4)) == 0.0
