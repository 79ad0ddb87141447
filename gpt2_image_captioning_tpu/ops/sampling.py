"""Token-sampling ops for autoregressive decoding, all jit-compatible.

Semantics mirror the reference's generation loop (``src/models.py:389-469``):
temperature scaling, top-p (nucleus) filtering with the keep-first-over-
threshold shift, argmax when temperature == 0, and multinomial sampling —
but expressed as fixed-shape XLA ops usable inside ``lax.while_loop``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = jnp.finfo(jnp.float32).min


def top_p_filter(logits: jnp.ndarray, top_p: float) -> jnp.ndarray:
    """Mask logits outside the nucleus: keep the smallest set of tokens whose
    cumulative probability exceeds ``top_p`` (always keeping the top-1).

    Matches the reference's sort → cumsum(softmax) → shift-right → scatter
    (``src/models.py:412-437``).  logits: (B, V) float32.
    """
    v = logits.shape[-1]
    sorted_logits, sorted_idx = jax.lax.top_k(logits, v)  # descending
    cum_probs = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove = cum_probs > top_p
    # shift right so the first token crossing the threshold is kept
    remove = jnp.concatenate([jnp.zeros_like(remove[..., :1]), remove[..., :-1]], axis=-1)
    # scatter the removal mask back to vocab order
    batch_idx = jnp.arange(logits.shape[0])[:, None]
    mask = jnp.zeros_like(remove).at[batch_idx, sorted_idx].set(remove)
    return jnp.where(mask, NEG_INF, logits)


def top_p_filter_bisect(
    logits: jnp.ndarray,
    top_p: float | jnp.ndarray,
    iters: int = 32,
    ways: int = 2,
) -> jnp.ndarray:
    """Sort-free nucleus mask: the same kept set as :func:`top_p_filter`,
    computed by per-row bisection on the logit threshold.

    ``top_p`` may be a scalar or a per-row ``(B, 1)`` array (the threshold
    search is rowwise either way — continuous serving hands every pool row
    its own request's ``top_p``).  Rows with ``top_p >= 1`` keep the whole
    vocabulary (the bracket floor ``row_min - 1`` is below every logit).

    A full-vocab descending sort costs ~60 ms per step at (128, 50257) on TPU
    (~85× the fused decode forward) and its cost is why top-p decoding is
    traditionally slow there.  The sorted-cumsum rule "remove rank j iff the
    cumulative probability of ranks < j exceeds ``top_p``" is equivalent
    (absent exactly-tied logit values) to the per-token rule

        keep t  ⟺  Σ_{t' : logit_{t'} > logit_t} p_{t'}  ≤  top_p

    whose right side is a monotone step function of the logit value.  Search
    for the threshold τ = smallest logit value still kept: shrinking the
    bracket [row_min−1, row_max] by a total factor of 2^``iters`` takes it
    below f32 spacing at the logits' magnitude (range·2⁻³² ≪ |max|·2⁻²³), so
    the final bracket isolates exactly one representable logit and the mask
    is exact.

    ``ways`` controls the search arity: each pass tests ``ways − 1`` interior
    thresholds at once and keeps the sub-interval containing τ, shrinking the
    bracket ``ways``× per pass — so only ⌈iters / log2(ways)⌉ passes run.
    **Measured REJECTION as a default** (scripts/sampled_decomp_ab.py,
    docs/PERF_NOTES.md round 3): the hoped-for sibling-reduction fusion does
    not happen — XLA lowers the ``ways − 1`` masked sums as separate probs
    traversals, so 16-ary search moves ~4× MORE HBM than binary (isolated
    tail 2.60 vs 1.84 ms incl. harness constant; full sampled decode 92.5 vs
    78.9 ms/batch at b=128, identical tokens).  Binary bisection is already
    near its floor; ``ways=2`` (the default) is the production path and the
    multiway branch stays only for re-measurement.  Either way the cost per
    pass is flat regardless of how flat the distribution is.

    Divergence from the sort path is confined to (a) tokens whose boundary
    mass lands within float-rounding of ``top_p`` (the two paths accumulate
    the same probabilities in different orders), and (b) rows with *exactly*
    equal f32 logits straddling the boundary, where the sorted path splits
    the tie class by token index and this path keeps all of it.  Real model
    logits (f32 matmul accumulations) make both vanishingly rare.
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
    probs = jnp.exp(logits - lse)
    hi = jnp.max(logits, axis=-1, keepdims=True)
    lo = jnp.min(logits, axis=-1, keepdims=True) - 1.0

    if ways == 2:
        # production path: one masked (B, V) sum per pass, where-based update

        def body(_, carry):
            lo, hi = carry
            mid = 0.5 * (lo + hi)
            # compare in prob space against the exponentiated threshold so
            # each iteration streams only the probs array (half the HBM bytes
            # of reading logits + probs); probs > exp(mid − lse) ⟺
            # logits > mid up to 1-ulp exp rounding at the bracket boundary,
            # and the final mask below uses the logits directly
            thr = jnp.exp(mid - lse)
            mass_above = jnp.sum(
                jnp.where(probs > thr, probs, 0.0), axis=-1, keepdims=True
            )
            keep_mid = mass_above <= top_p  # τ ≤ mid → tighten hi, else raise lo
            return jnp.where(keep_mid, lo, mid), jnp.where(keep_mid, mid, hi)

        lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    else:
        # multiway branch, kept for re-measurement only (see docstring)
        k = ways - 1  # interior thresholds per pass
        passes = math.ceil(iters / math.log2(ways))
        frac = (jnp.arange(1, k + 1, dtype=jnp.float32) / ways)[None, :]  # (1, k)

        def body(_, carry):
            lo, hi = carry
            mids = lo + (hi - lo) * frac  # (B, k), ascending
            thr = jnp.exp(mids - lse)  # (B, k)
            mass_above = jnp.concatenate(
                [
                    jnp.sum(jnp.where(probs > thr[:, i : i + 1], probs, 0.0), axis=-1, keepdims=True)
                    for i in range(k)
                ],
                axis=-1,
            )  # (B, k); lowered as k separate probs traversals (why ways=2 wins)
            # keep_i ⟺ τ ≤ mids_i; mass_above is non-increasing in the threshold
            # so keep is monotone in i: τ lies in (pad[first_keep], pad[first_keep+1]]
            nkeep = jnp.sum((mass_above <= top_p).astype(jnp.int32), axis=-1, keepdims=True)
            first_keep = k - nkeep  # (B, 1) in [0, k]; k ⇒ no threshold kept
            pad = jnp.concatenate([lo, mids, hi], axis=-1)  # (B, k+2)
            return (
                jnp.take_along_axis(pad, first_keep, axis=-1),
                jnp.take_along_axis(pad, first_keep + 1, axis=-1),
            )

        lo, hi = jax.lax.fori_loop(0, passes, body, (lo, hi))
    # bracket isolates τ: kept tokens are exactly those with logit > lo.
    # The loop predicate lives in exp space (probs > exp(mid − lse)) while
    # this mask lives in logit space; at the bracket boundary the two can
    # disagree by one exp ulp.  Harmless mid-distribution, but when the
    # nucleus is a single token (peaked logits, small temperatures) τ equals
    # the row max and a one-ulp slip lands ``lo`` ON it — keeping NOTHING,
    # and a categorical over all-NEG_INF rows degenerates to token 0 (the
    # gumbel noise is absorbed by finfo.min).  Keep the top-1 explicitly,
    # which is the nucleus contract ("always keeping the top-1") and makes
    # an empty keep-set impossible.
    top = jnp.max(logits, axis=-1, keepdims=True)
    return jnp.where((logits > lo) | (logits >= top), logits, NEG_INF)


def topk_small(x: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``lax.top_k`` replacement for small static k via sequential masked
    argmaxes.

    ``lax.top_k`` on TPU pays a sorting-network cost even for tiny k — ~8 ms
    for k=4 over (32, 201k) on v5e, ~25× the cost of k linear passes
    (measured, scripts/beam_ab.py).  k argmax+mask rounds return exactly the
    same (values, indices) as ``lax.top_k`` including tie order (both take
    the lowest index first).  x: (..., n) float; returns ((..., k) values
    descending, (..., k) int32 indices).
    """
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1)
    vals, idxs = [], []
    for _ in range(k):
        i = jnp.argmax(x, axis=-1).astype(jnp.int32)
        vals.append(jnp.take_along_axis(x, i[..., None], axis=-1)[..., 0])
        idxs.append(i)
        # mask with -inf, strictly below any representable candidate (NEG_INF
        # = finfo.min is a value live candidates can legitimately carry — e.g.
        # dead-beam scores — and masking with it could re-select an already
        # taken index, breaking top_k's distinct-index guarantee)
        x = jnp.where(col == i[..., None], -jnp.inf, x)
    return jnp.stack(vals, axis=-1), jnp.stack(idxs, axis=-1)


def sample_token(
    logits: jnp.ndarray,
    *,
    temperature: float,
    top_p: float,
    rng: jax.Array,
    exact_sort: bool = False,
) -> jnp.ndarray:
    """Next-token selection with the reference's exact dispatch:
    temperature == 0 → pure argmax of the raw logits; otherwise scale,
    optionally nucleus-filter, and sample.  ``temperature``/``top_p`` are
    Python floats (static under jit).

    The nucleus mask uses the sort-free :func:`top_p_filter_bisect` by
    default (flat ~few-ms cost at serving shapes); ``exact_sort=True`` forces
    the reference-shaped sorted-cumsum path (:func:`top_p_filter`).  Both
    feed the same full-width categorical, so whenever the two masks agree —
    everything but float-boundary/tied-logit edge cases — the drawn tokens
    are bit-identical.
    """
    logits = logits.astype(jnp.float32)
    if temperature == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        fil = top_p_filter if exact_sort else top_p_filter_bisect
        logits = fil(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
