"""Token-sampling ops for autoregressive decoding, all jit-compatible.

Semantics mirror the reference's generation loop (``src/models.py:389-469``):
temperature scaling, top-p (nucleus) filtering with the keep-first-over-
threshold shift, argmax when temperature == 0, and multinomial sampling —
but expressed as fixed-shape XLA ops usable inside ``lax.while_loop``.
"""

from __future__ import annotations

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


def sample_token(
    logits: jnp.ndarray,
    *,
    temperature: float,
    top_p: float,
    rng: jax.Array,
) -> jnp.ndarray:
    """Next-token selection with the reference's exact dispatch:
    temperature == 0 → pure argmax of the raw logits; otherwise scale,
    optionally nucleus-filter, and sample.  ``temperature``/``top_p`` are
    Python floats (static under jit)."""
    logits = logits.astype(jnp.float32)
    if temperature == 0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    logits = logits / temperature
    if top_p < 1.0:
        logits = top_p_filter(logits, top_p)
    return jax.random.categorical(rng, logits, axis=-1).astype(jnp.int32)
