"""Vocab-chunked softmax cross-entropy with a custom VJP.

The teacher-forcing loss is dominated by the tied-embedding logits: at the
flagship shape the (B·T, 50257) float32 logits are ~1.7 GB, and the naive
formulation pays for them three ways — the forward materializes them for
logsumexp, the backward materializes the full softmax AND lowers the
gold-logit gather's gradient to a giant scatter (measured ~38 ms of an 82 ms
fwd+bwd step at b=128, T=65; docs/PERF_NOTES.md round 2).

This op streams the vocabulary in column chunks with a running
(max, sum-exp, gold-logit) accumulator — mathematically identical NLL, no
full-width softmax tensor, and a scatter-free backward:

  forward : per chunk   logits_c = h @ wte_cᵀ  → online logsumexp; the gold
            logit accumulates via a ``col == label`` mask (no gather).
  backward: per chunk   p_c = exp(logits_c − logz); p_c[label] −= 1;
            dh += p_c @ wte_c ; dwte_c = p_cᵀ @ h   (no scatter — dwte is
            emitted chunk-contiguously by the scan).

When GPT-2 is frozen the dwte output is unused and XLA dead-code-eliminates
its matmul.  Numerics: logits/softmax in float32 (MXU accumulation), same
-100 ignore semantics as ``gpt2.cross_entropy_loss`` (which remains the
reference implementation and the parity oracle in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

IGNORE_INDEX = -100
NEG_INF = jnp.finfo(jnp.float32).min
DEFAULT_CHUNK = 2048  # best of the on-chip sweep 1024/2048/4096/8192 (train_ab2)


def _pad_vocab(wte: jnp.ndarray, chunk: int) -> tuple[jnp.ndarray, int]:
    v = wte.shape[0]
    nc = -(-v // chunk)
    pad = nc * chunk - v
    if pad:
        wte = jnp.pad(wte, ((0, pad), (0, 0)))
    return wte, nc


def _fwd_scan(h, wte, labels, chunk: int):
    """Returns (nll_sum, logz (N,)) — h (N, D) in compute dtype."""
    n = h.shape[0]
    v = wte.shape[0]
    wte_p, nc = _pad_vocab(wte, chunk)
    w_chunks = wte_p.reshape(nc, chunk, -1)
    valid = labels != IGNORE_INDEX
    safe = jnp.where(valid, labels, 0)

    def body(carry, w_c_off):
        m, s, gold = carry
        w_c, off = w_c_off
        logits = jax.lax.dot_general(
            h, w_c.astype(h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (N, chunk)
        col = off + jnp.arange(chunk)[None, :]
        logits = jnp.where(col < v, logits, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        s = s * jnp.exp(m - m_new) + jnp.sum(jnp.exp(logits - m_new[:, None]), axis=-1)
        gold = gold + jnp.sum(jnp.where(col == safe[:, None], logits, 0.0), axis=-1)
        return (m_new, s, gold), None

    offs = jnp.arange(nc, dtype=jnp.int32) * chunk
    m0 = jnp.full((n,), NEG_INF, jnp.float32)
    (m, s, gold), _ = jax.lax.scan(
        body, (m0, jnp.zeros((n,), jnp.float32), jnp.zeros((n,), jnp.float32)),
        (w_chunks, offs),
    )
    logz = m + jnp.log(s)
    nll_sum = jnp.sum((logz - gold) * valid)
    return nll_sum, logz


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def xent_sum(h: jnp.ndarray, wte: jnp.ndarray, labels: jnp.ndarray,
             chunk: int = DEFAULT_CHUNK) -> jnp.ndarray:
    """Σ NLL of ``labels`` under ``softmax(h @ wteᵀ)`` with -100 ignored.

    h: (N, D) compute dtype; wte: (V, D); labels: (N,) int32.
    The valid-token count (for the mean) is ``jnp.sum(labels != -100)``.
    """
    nll, _ = _fwd_scan(h, wte, labels, chunk)
    return nll


def _xent_fwd(h, wte, labels, chunk):
    nll, logz = _fwd_scan(h, wte, labels, chunk)
    return nll, (h, wte, labels, logz)


def _xent_bwd(chunk, res, g):
    h, wte, labels, logz = res
    n, d = h.shape
    v = wte.shape[0]
    wte_p, nc = _pad_vocab(wte, chunk)
    w_chunks = wte_p.reshape(nc, chunk, -1)
    valid = (labels != IGNORE_INDEX).astype(jnp.float32)
    safe = jnp.where(labels != IGNORE_INDEX, labels, 0)

    def body(dh, w_c_off):
        w_c, off = w_c_off
        logits = jax.lax.dot_general(
            h, w_c.astype(h.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        col = off + jnp.arange(chunk)[None, :]
        p = jnp.where(col < v, jnp.exp(logits - logz[:, None]), 0.0)
        p = p - jnp.where(col == safe[:, None], 1.0, 0.0)
        p = p * valid[:, None] * g  # dL/dlogits for this chunk
        p_c = p.astype(h.dtype)
        dh = dh + jnp.dot(p_c, w_c.astype(h.dtype), preferred_element_type=jnp.float32)
        dw_c = jax.lax.dot_general(
            p_c, h,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, D)
        return dh, dw_c

    offs = jnp.arange(nc, dtype=jnp.int32) * chunk
    dh, dw_chunks = jax.lax.scan(
        body, jnp.zeros((n, d), jnp.float32), (w_chunks, offs)
    )
    dwte = dw_chunks.reshape(nc * chunk, d)[:v].astype(wte.dtype)
    return dh.astype(h.dtype), dwte, None


xent_sum.defvjp(_xent_fwd, _xent_bwd)
