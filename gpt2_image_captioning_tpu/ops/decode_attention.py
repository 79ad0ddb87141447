"""Fused single-token decode attention over the valid KV-cache prefix.

This is the decode-hot-path kernel the round-1 byte accounting called for
(docs/PERF_NOTES.md): at batch 128 the KV cache, not the weights, is the
largest HBM traffic term of each decode step, and the XLA path (a) reads the
*entire padded* cache every step and (b) stores the cache as (B, H, T, 64) —
a 64-wide trailing dim that tiles to half a 128-lane register, doubling
effective cache traffic.  It replaces the reference's uncached full
re-forward decode step (reference ``src/models.py:389-469``) at the kernel
level.

Design (TPU-first):

- **Cache layout (T, B, D)** with D = n_head·head_dim = 768: the model-width
  dim is the lane dim (768 = 6 × 128 lanes, zero padding waste), and the
  c_attn projections slot straight in with **no head split/merge transposes**.
- **Valid-prefix reads only**: the cache lives in HBM, the grid walks
  CT-row chunks, and the BlockSpec index map *clamps* out-of-range chunks to
  the last valid chunk — Pallas skips the DMA when consecutive grid steps map
  to the same block, so a step at cache index ``idx`` reads ``ceil(idx/CT)``
  chunks instead of the full padded length.  ``idx`` arrives by scalar
  prefetch so the index map can depend on it.
- **One kernel per layer-step** fusing QK^T, masking, online softmax, and AV
  — no (B, H, 1, T) score tensor or probability tensor ever reaches HBM.
- The new token's K/V enter as separate (B, D) VMEM inputs; the single query
  always attends them, so the kernel never re-reads the cache row written
  this step.

Per-head math without sub-lane reshapes: with K-chunk (CT, BB, D) and query
(BB, D), scores are computed as ``(K ⊙ q) @ HS`` where HS is the (D, H)
block-diagonal head-sum matrix (ones over each head's 64 lanes) — a trivial
MXU matmul that performs the per-head contraction; the inverse expansion
(per-head scalar → its 64 lanes) is ``@ HS.T``.  Both avoid the
(…, H, 64) reshapes Mosaic cannot tile.

Numerics are float32 throughout the softmax (matching ``ops.nn.attention_xla``)
and validated in interpret mode against the XLA path (tests/test_kernels.py).
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Cache rows are walked in chunks of CT; init_cache rounds the cache length
# up to a CT multiple so wrappers never pad per step.
CHUNK_T = 16
# bf16 batch block: two double-buffered (BB, CT, D) K+V slabs ≈ 6.3 MB VMEM
BLOCK_B = 64


def _head_sum_matrix(d: int, h: int, dtype=jnp.float32) -> jnp.ndarray:
    """(D, H) block-diagonal ones: column h covers lanes [h·hd, (h+1)·hd)."""
    hd = d // h
    rows = jnp.arange(d)[:, None] // hd
    cols = jnp.arange(h)[None, :]
    return (rows == cols).astype(dtype)


def _decode_kernel(
    idx_ref,
    q_ref,
    kn_ref,
    vn_ref,
    k_hbm,
    v_hbm,
    hs_ref,
    he_ref,
    o_ref,
    kbuf,
    vbuf,
    ksem,
    vsem,
    *,
    bb: int,
    ct: int,
    n_head: int,
    scale: float,
):
    """Grid (B-blocks,).  The caches stay in HBM; the kernel walks ONLY the
    ``ceil(idx/CT)`` valid chunks with double-buffered async DMA (one program
    per batch block — per-program pipeline overhead paid ~B/BB times per
    layer-step instead of once per chunk).

    Blocks: q/kn/vn/o (BB, D) VMEM; k_hbm/v_hbm (Tpad, B, D) unblocked (ANY);
    hs (D, H) in cache dtype, he (H, D) f32.
    Scratch: kbuf/vbuf (2, CT, BB, D) cache-dtype, ksem/vsem DMA((2,)).
    """
    bi = pl.program_id(0)
    idx = idx_ref[0]  # valid cache rows (this step's new token NOT included)
    nchunks = (idx + ct - 1) // ct
    q = q_ref[...]  # (BB, D) in compute dtype

    def k_dma(slot, c):
        return pltpu.make_async_copy(
            k_hbm.at[pl.ds(c * ct, ct), pl.ds(bi * bb, bb), :], kbuf.at[slot], ksem.at[slot]
        )

    def v_dma(slot, c):
        return pltpu.make_async_copy(
            v_hbm.at[pl.ds(c * ct, ct), pl.ds(bi * bb, bb), :], vbuf.at[slot], vsem.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        k_dma(0, 0).start()
        v_dma(0, 0).start()

    def body(c, carry):
        m, l, acc = carry  # (BB, H), (BB, H), (BB, D) f32
        slot = jax.lax.rem(c, 2)
        nxt = jax.lax.rem(c + 1, 2)

        @pl.when(c + 1 < nchunks)
        def _():
            k_dma(nxt, c + 1).start()
            v_dma(nxt, c + 1).start()

        k_dma(slot, c).wait()
        v_dma(slot, c).wait()
        k = kbuf[slot]  # (CT, BB, D) cache dtype
        v = vbuf[slot]

        # per-head QK^T via the block-diagonal head-sum matmul (MXU, f32 acc)
        prod = k * q.astype(k.dtype)[None, :, :]
        s = jnp.dot(
            prod.reshape(ct * bb, -1), hs_ref[...], preferred_element_type=jnp.float32
        ).reshape(ct, bb, n_head) * scale
        kpos = c * ct + jax.lax.broadcasted_iota(jnp.int32, (ct, bb, n_head), 0)
        live = kpos < idx
        s = jnp.where(live, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=0))
        p = jnp.where(live, jnp.exp(s - m_new[None, :, :]), 0.0)  # (CT, BB, H) f32
        alpha = jnp.exp(m - m_new)  # (BB, H)
        l_new = l * alpha + jnp.sum(p, axis=0)
        pe = jnp.dot(
            p.reshape(ct * bb, n_head), he_ref[...], preferred_element_type=jnp.float32
        ).reshape(ct, bb, -1)
        av = jnp.sum(pe * v.astype(jnp.float32), axis=0)  # (BB, D)
        alpha_e = jnp.dot(alpha, he_ref[...], preferred_element_type=jnp.float32)
        return m_new, l_new, acc * alpha_e + av

    m0 = jnp.full((bb, n_head), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bb, n_head), jnp.float32)
    acc0 = jnp.zeros((bb, q.shape[1]), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nchunks, body, (m0, l0, acc0))

    # epilogue: the freshly projected token, straight from VMEM (never re-read
    # from the cache row written this step)
    kn = kn_ref[...]
    prod_n = q.astype(kn.dtype) * kn
    s_new = jnp.dot(
        prod_n, hs_ref[...], preferred_element_type=jnp.float32
    ) * scale  # (BB, H)
    m_f = jnp.maximum(m, s_new)
    p_new = jnp.exp(s_new - m_f)
    alpha = jnp.exp(m - m_f)
    l_f = l * alpha + p_new
    alpha_e = jnp.dot(alpha, he_ref[...], preferred_element_type=jnp.float32)
    pn_e = jnp.dot(p_new, he_ref[...], preferred_element_type=jnp.float32)
    acc = acc * alpha_e + pn_e * vn_ref[...].astype(jnp.float32)
    l_e = jnp.dot(l_f, he_ref[...], preferred_element_type=jnp.float32)
    o_ref[...] = (acc / l_e).astype(o_ref.dtype)


def _block_b(b: int, dtype) -> int:
    """Batch block: 2 double-buffered (BB, CT, D) K+V slabs must fit VMEM."""
    bb = BLOCK_B if dtype == jnp.bfloat16 else BLOCK_B // 2
    return min(bb, b)


def _decode_attention_pallas(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    idx: jnp.ndarray,
    n_head: int,
    interpret: bool = False,
    block_b: int | None = None,
    chunk_t: int | None = None,
) -> jnp.ndarray:
    tk, b, d = k_cache.shape
    hd = d // n_head
    bb = block_b or _block_b(b, k_cache.dtype)
    bb = min(-(-bb // 8) * 8, max(b, 8))  # batch is a tiled dim: 8-align blocks
    pad_b = (-b) % bb
    if pad_b:
        q, k_new, v_new = (jnp.pad(x, ((0, pad_b), (0, 0))) for x in (q, k_new, v_new))
        k_cache, v_cache = (
            jnp.pad(x, ((0, 0), (0, pad_b), (0, 0))) for x in (k_cache, v_cache)
        )
    ct = chunk_t or CHUNK_T
    pad_t = (-tk) % ct
    if pad_t:  # init_cache rounds up, so this only triggers for foreign callers
        k_cache, v_cache = (
            jnp.pad(x, ((0, pad_t), (0, 0), (0, 0))) for x in (k_cache, v_cache)
        )
    bp = q.shape[0]
    nb = bp // bb

    hs = _head_sum_matrix(d, n_head, k_cache.dtype)
    he = _head_sum_matrix(d, n_head, jnp.float32).T

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bb, d), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((d, n_head), lambda bi, s: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_head, d), lambda bi, s: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bb, d), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ct, bb, d), k_cache.dtype),
            pltpu.VMEM((2, ct, bb, d), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, bb=bb, ct=ct, n_head=n_head, scale=1.0 / math.sqrt(hd)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bp, d), q.dtype),
        interpret=interpret,
    )(jnp.asarray(idx, jnp.int32).reshape(1), q, k_new, v_new, k_cache, v_cache, hs, he)
    return out[:b] if pad_b else out


def _decode_attention_xla(
    q: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    idx: jnp.ndarray,
    n_head: int,
) -> jnp.ndarray:
    """Reference math on the (T, B, D) layout — the caches must already hold
    the new token at row ``idx``.  Used off-TPU and as the parity oracle."""
    tk, b, d = k_cache.shape
    hd = d // n_head
    scale = 1.0 / math.sqrt(hd)
    qh = q.reshape(b, n_head, hd).astype(jnp.float32)
    kh = k_cache.reshape(tk, b, n_head, hd).astype(jnp.float32)
    vh = v_cache.reshape(tk, b, n_head, hd).astype(jnp.float32)
    s = jnp.einsum("bhd,kbhd->bhk", qh, kh, preferred_element_type=jnp.float32) * scale
    live = (jnp.arange(tk) <= idx)[None, None, :]
    s = jnp.where(live, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhk,kbhd->bhd", p, vh, preferred_element_type=jnp.float32)
    return out.reshape(b, d).astype(q.dtype)


def decode_attention(
    q: jnp.ndarray,
    k_new: jnp.ndarray,
    v_new: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    n_head: int,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One decode step of attention, fused with the cache append.

    q/k_new/v_new: (B, D) this step's projections; k_cache/v_cache: (T, B, D)
    with rows [0, idx) valid; idx: scalar int32 cache write position.
    Returns (attn_out (B, D), k_cache', v_cache') with the new K/V written at
    row ``idx``.  ``use_pallas=None`` → the fused kernel on TPU (opt out with
    ``GIC_FORCE_XLA_DECODE_ATTENTION=1``), XLA everywhere else.
    """
    k_cache = jax.lax.dynamic_update_slice(
        k_cache, k_new[None, :, :].astype(k_cache.dtype), (idx, 0, 0)
    )
    v_cache = jax.lax.dynamic_update_slice(
        v_cache, v_new[None, :, :].astype(v_cache.dtype), (idx, 0, 0)
    )
    if use_pallas is None:
        # Measured on v5e (docs/PERF_NOTES.md round 2): each pallas_call has
        # ~100 µs fixed overhead on this backend, so a PER-LAYER decode kernel
        # (12 calls/step) loses to XLA despite reading less HBM.  The fused
        # whole-step kernel (ops/decode_step.py) is the production path; this
        # per-layer kernel stays for verification and as the building block.
        use_pallas = bool(os.environ.get("GIC_FORCE_PALLAS_DECODE_ATTENTION"))
    if use_pallas:
        out = _decode_attention_pallas(
            q, k_new, v_new, k_cache, v_cache, idx, n_head, interpret=interpret
        )
    else:
        out = _decode_attention_xla(q, k_cache, v_cache, idx, n_head)
    return out, k_cache, v_cache
