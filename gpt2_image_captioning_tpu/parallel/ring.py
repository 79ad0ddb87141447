"""Ring attention over a sequence-parallel mesh axis (context parallelism).

SURVEY.md §5 scoped long-context parallelism as an extension point; the
all-gather sequence-parallel path (``parallel/sequence.py``) builds the
Megatron-SP form, whose per-layer K/V all-gather materializes the FULL
(B, T, D) keys/values on every device — per-device attention memory stays
O(T).  This module adds the blockwise RING form (Liu et al., "Ring
Attention with Blockwise Transformers"): K/V blocks stay sequence-sharded
and rotate around the axis with ``ppermute`` while each device's queries
accumulate attention over every block with an online softmax — per-device
memory is O(T/S) end to end, the enabler for context lengths where even
one layer's gathered K/V would not fit.

TPU mapping: the rotation is one neighbor ``ppermute`` per step riding ICI
(bandwidth-optimal for the all-to-all attention needs), each step's compute
is a dense (B, H, Tc, Tc) block attention on the MXU, and the online-softmax
carry (m, l, acc) makes the result exact — identical math to a full softmax
over the global sequence, the same scheme the fused decode kernel's chunked
cache walk uses (ops/decode_step.py).

The loop is a ``lax.scan`` over the (static) axis size, so the whole ring is
reverse-differentiable: the backward pass rotates gradients the opposite way
through ``ppermute``'s transpose automatically — no hand-written backward.

Masking uses the finite ``NEG_INF`` (f32 min) convention of the decode
kernels: fully-masked query rows (padding) produce a uniform average instead
of NaN, and their loss rows are ignored downstream — no NaN can leak into
gradients through 0·NaN.

Used by ``parallel/sequence.py::make_sp_loss_and_grad(..., ring=True)``:
same (dp, sp) mesh, same batch contract, attention swapped from
all-gather+full to ring — parity-tested against both the all-gather path
and the single-device loss (tests/test_ring_attention.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.precision import F32, Policy

NEG_INF = float(jnp.finfo(jnp.float32).min)


def ring_attention(
    q4: jnp.ndarray,
    k4: jnp.ndarray,
    v4: jnp.ndarray,
    *,
    axis_name: str,
    q_offset,
    key_mask: jnp.ndarray | None = None,
    causal: bool = True,
    policy: Policy = F32,
) -> jnp.ndarray:
    """Exact blockwise ring attention inside ``shard_map``.

    q4/k4/v4: this rank's (B, H, Tc, hd) chunk of the sequence (device i
    owns global positions [i·Tc, (i+1)·Tc), which ``q_offset`` must equal
    i·Tc for).  ``key_mask``: optional (B, T) mask over the FULL global
    sequence, replicated on every rank (int/bool; 0 ⇒ key hidden), the same
    replicated-mask contract ``parallel/sequence.py`` uses.  Returns the
    (B, H, Tc, hd) attention output for the local queries — bitwise the
    same contract as ``nn.attention_xla`` on the gathered sequence.
    """
    n = jax.lax.axis_size(axis_name)
    i = jax.lax.axis_index(axis_name)
    b, h, tc, hd = q4.shape
    scale = 1.0 / (hd ** 0.5)
    qf = q4.astype(jnp.float32)
    qpos = q_offset + jnp.arange(tc)  # (Tc,) global query positions

    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(carry, s):
        m, l, acc, kb, vb = carry
        src = jax.lax.rem(i - s + n, n)  # original owner of the held block
        koff = src * tc
        sc = (
            jnp.einsum(
                "bhqd,bhkd->bhqk",
                qf,
                kb.astype(jnp.float32),
            )
            * scale
        )
        kpos = koff + jnp.arange(tc)
        allowed = jnp.ones((1, 1, tc, tc), bool)
        if causal:
            allowed = allowed & (kpos[None, None, None, :] <= qpos[None, None, :, None])
        if key_mask is not None:
            kmask = jax.lax.dynamic_slice_in_dim(key_mask, koff, tc, axis=1)
            allowed = allowed & (kmask[:, None, None, :] != 0)
        sc = jnp.where(allowed, sc, NEG_INF)
        bm = jnp.max(sc, axis=-1)  # (B, H, Tc)
        m_new = jnp.maximum(m, bm)
        p = jnp.exp(sc - m_new[..., None])
        p = jnp.where(allowed, p, 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(policy.compute_dtype), vb
        ).astype(jnp.float32)
        acc_new = acc * alpha[..., None] + pv
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (m_new, l_new, acc_new, kb, vb), None

    m0 = jnp.full((b, h, tc), NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, tc), jnp.float32)
    acc0 = jnp.zeros((b, h, tc, hd), jnp.float32)
    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k4, v4), jnp.arange(n)
    )
    # fully-masked query rows (padding): every p is zeroed, l stays 0, and
    # the clamped divide returns exact zeros — finite garbage the loss mask
    # drops downstream, with no NaN to leak through 0·NaN in the backward
    return (acc / jnp.maximum(l, 1e-30)[..., None]).astype(policy.compute_dtype)
