"""Fused (flash) attention as a Pallas TPU kernel, with XLA fallback.

The hot compute of every model in this stack — the vision encoders' and the
GPT-2 decoder's attention — runs through :func:`mha`.  On TPU it lowers to a
Pallas kernel that keeps the (Tq, Tk) score matrix entirely in VMEM with an
online-softmax accumulator (never materializing scores in HBM); elsewhere (or
when shapes don't fit) it falls back to the XLA einsum path in ``ops.nn``.

The backward pass is a custom VJP using the standard softmax-recompute
formulation in XLA ops — for this stack's short sequences (≤ ~260 tokens) the
forward fusion is where the HBM-bandwidth win is.

Kernel structure (per pallas_guide.md):
  grid = (batch, heads, q-blocks); K/V for the whole (small) sequence are
  resident in VMEM; an inner fori_loop walks K-blocks with running max/sum
  (online softmax) so the math is exact for any K length.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt2_image_captioning_tpu.ops import nn

NEG_INF = float(jnp.finfo(jnp.float32).min)


def _block_sizes(tq: int, tk: int) -> tuple[int, int]:
    bq = min(128, max(8, tq))
    bk = min(128, max(8, tk))
    return bq, bk


def _flash_kernel(
    q_ref, k_ref, v_ref, mask_ref, out_ref, *, causal: bool, q_offset: int, bk: int, scale: float
):
    """One (batch, head, q-block): online-softmax attention over all K blocks.

    Refs carry (1, 1, ...) leading block dims.  All slicing happens on loaded
    *arrays* (Mosaic vector ops pad the 64-wide head dim to lanes freely);
    ref-level slices with a sub-128 trailing dim would fail tiling alignment.

    q_ref: (1, 1, bq, hd); k_ref/v_ref: (1, 1, Tk, hd); mask_ref: (1, 1, Tk);
    out_ref: (1, 1, bq, hd)
    """
    bq, hd = q_ref.shape[2], q_ref.shape[3]
    tk = k_ref.shape[2]
    qi = pl.program_id(2)

    q = q_ref[...][0, 0].astype(jnp.float32) * scale
    k_all = k_ref[...][0, 0].astype(jnp.float32)
    v_all = v_ref[...][0, 0].astype(jnp.float32)
    mask_all = mask_ref[...][0]  # (1, tk)

    m = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l = jnp.zeros((bq, 1), jnp.float32)
    acc = jnp.zeros((bq, hd), jnp.float32)

    num_kb = tk // bk  # tk padded to a multiple of bk by the wrapper

    # static unrolled walk over K blocks (Mosaic lowers neither ref- nor
    # array-level dynamic slices with sub-lane trailing dims; sequences in
    # this stack are short, so unrolling is cheap)
    for kb in range(num_kb):
        k_blk = k_all[kb * bk : (kb + 1) * bk]
        v_blk = v_all[kb * bk : (kb + 1) * bk]
        s = jnp.dot(q, k_blk.T, preferred_element_type=jnp.float32)  # (bq, bk)

        kpos = kb * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
        valid = kpos < tk
        if causal:
            qpos = qi * bq + q_offset + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
            valid = jnp.logical_and(valid, kpos <= qpos)
        mask_blk = mask_all[:, kb * bk : (kb + 1) * bk]
        valid = jnp.logical_and(valid, mask_blk != 0)
        s = jnp.where(valid, s, NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.dot(p, v_blk, preferred_element_type=jnp.float32)
        m = m_new
    # rows with no valid keys (fully masked) produce l == 0; emit zeros there
    out = acc / jnp.where(l == 0.0, 1.0, l)
    out_ref[...] = out.astype(out_ref.dtype)[None, None]


_flash_kernel_wrapped = _flash_kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_attention(q, k, v, key_mask, causal: bool, q_offset: int, interpret: bool):
    b, h, tq, hd = q.shape
    tk = k.shape[2]
    bq, bk = _block_sizes(tq, tk)
    scale = 1.0 / math.sqrt(hd)
    grid = (b, h, pl.cdiv(tq, bq))
    kernel = functools.partial(
        _flash_kernel_wrapped, causal=causal, q_offset=q_offset, bk=bk, scale=scale
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bq, hd), lambda i, j, qi: (i, j, qi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, hd), lambda i, j, qi: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk, hd), lambda i, j, qi: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tk), lambda i, j, qi: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, bq, hd), lambda i, j, qi: (i, j, qi, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v, key_mask[:, None, :])


def _flash_fwd(q, k, v, key_mask, causal, q_offset, interpret):
    out = _flash_attention(q, k, v, key_mask, causal, q_offset, interpret)
    return out, (q, k, v, key_mask)


def _flash_bwd(causal, q_offset, interpret, res, g):
    """Recompute-softmax backward in XLA (exact)."""
    q, k, v, key_mask = res
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * scale
    tq, tk = q.shape[2], k.shape[2]
    valid = jnp.broadcast_to(key_mask[:, None, None, :] != 0, s.shape)
    if causal:
        qpos = jnp.arange(tq)[:, None] + q_offset
        kpos = jnp.arange(tk)[None, :]
        valid = jnp.logical_and(valid, (kpos <= qpos)[None, None])
    s = jnp.where(valid, s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf, preferred_element_type=jnp.float32)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds, k.astype(jnp.float32), preferred_element_type=jnp.float32) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds, q.astype(jnp.float32), preferred_element_type=jnp.float32) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), None


_flash_attention.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    key_mask: jnp.ndarray | None = None,
    q_offset: int = 0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas fused attention.  q: (B,H,Tq,hd), k/v: (B,H,Tk,hd),
    key_mask: (B,Tk) 1=attend (defaults to all-ones).

    Sequence lengths are padded to block multiples here (pad keys masked via
    key_mask, pad query rows sliced off) so the kernel's block walk is exact.
    """
    b, h, tq, hd = q.shape
    tk = k.shape[2]
    if key_mask is None:
        key_mask = jnp.ones((b, tk), jnp.int32)
    bq, bk = _block_sizes(tq, tk)
    pad_q = (-tq) % bq
    pad_k = (-tk) % bk
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        key_mask = jnp.pad(key_mask, ((0, 0), (0, pad_k)))
    out = _flash_attention(q, k, v, key_mask.astype(jnp.int32), causal, q_offset, interpret)
    return out[:, :, :tq] if pad_q else out


def _vmem_fits(tq: int, tk: int, hd: int) -> bool:
    # K, V, scores and accumulators for one (b, h) must fit in ~16MB VMEM.
    bytes_needed = (2 * tk * hd + min(128, tq) * (tk + 2 * hd)) * 4
    return bytes_needed < 8 * 1024 * 1024


def mha(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    key_mask: jnp.ndarray | None = None,
    q_offset=0,
    policy=None,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Attention dispatcher.

    Default is the XLA path: measured on a v5e at this stack's shapes
    (seq ≤ 257, head_dim 64), XLA's fused attention beats the Pallas flash
    kernel by 15-25% in both inference and training (docs/PERF_NOTES.md) —
    the sequences are too short for flash-style tiling to pay off.  The
    Pallas kernel stays available (``use_pallas=True`` or
    ``GIC_FORCE_PALLAS_ATTENTION=1``) as the seq-blocked extension point for
    long-context / ring-attention work, validated on-chip against XLA.
    """
    import os

    from gpt2_image_captioning_tpu.core.precision import F32

    policy = policy or F32
    static_offset = isinstance(q_offset, int)
    if use_pallas is None:
        use_pallas = (
            jax.default_backend() == "tpu"
            and static_offset
            and _vmem_fits(q.shape[2], k.shape[2], q.shape[3])
            and bool(os.environ.get("GIC_FORCE_PALLAS_ATTENTION"))
        )
    if use_pallas:
        return flash_attention(
            q, k, v, causal=causal, key_mask=key_mask, q_offset=q_offset
        ).astype(policy.compute_dtype)
    return nn.attention_xla(
        q, k, v, causal=causal, key_mask=key_mask, q_offset=q_offset, policy=policy
    )
