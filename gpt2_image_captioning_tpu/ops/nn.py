"""Functional neural-net building blocks over plain dict pytrees.

Models in this framework are pure ``apply(params, inputs)`` functions; params
are nested dicts of ``jnp`` arrays created by the ``*_init`` functions here.
Numerics deliberately match the PyTorch modules the reference composes
(HF ``Conv1D``/``nn.Linear`` layouts, GPT-2's tanh GELU, torch LayerNorm) so
ported checkpoints and parity tests line up exactly.

Matmuls accumulate in float32 via ``preferred_element_type`` regardless of the
compute dtype — that is the MXU-native mixed-precision recipe.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.precision import Policy, F32


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def normal(rng, shape, std: float = 0.02, dtype=jnp.float32):
    return std * jax.random.normal(rng, shape, dtype=dtype)


def kaiming_uniform(rng, shape, fan_in: int, dtype=jnp.float32):
    """torch.nn.Linear's default weight init (kaiming_uniform with a=sqrt(5)
    reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)))."""
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(rng, shape, dtype=dtype, minval=-bound, maxval=bound)


# ---------------------------------------------------------------------------
# Dense / LayerNorm / activations
# ---------------------------------------------------------------------------

def dense_init(
    rng, in_dim: int, out_dim: int, *, std: float | None = 0.02, bias: bool = True
) -> dict:
    """Weights stored ``(in, out)`` — the HF ``Conv1D`` layout GPT-2 uses, and
    the natural layout for ``x @ w`` on the MXU.  ``std=None`` selects torch
    ``nn.Linear`` default init (uniform)."""
    wk, bk = jax.random.split(rng)
    if std is None:
        w = kaiming_uniform(wk, (in_dim, out_dim), fan_in=in_dim)
        b = kaiming_uniform(bk, (out_dim,), fan_in=in_dim) if bias else None
    else:
        w = normal(wk, (in_dim, out_dim), std)
        b = jnp.zeros((out_dim,)) if bias else None
    p = {"w": w}
    if b is not None:
        p["b"] = b
    return p


def dense(params: dict, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    w = params["w"].astype(policy.compute_dtype)
    y = jnp.dot(policy.cast(x), w, preferred_element_type=jnp.float32)
    if "b" in params:
        y = y + params["b"].astype(jnp.float32)
    return y.astype(policy.compute_dtype)


def layer_norm_init(dim: int) -> dict:
    return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}


def layer_norm(params: dict, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LayerNorm with f32 statistics (torch semantics: biased variance)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * params["scale"].astype(jnp.float32) + params["bias"].astype(jnp.float32)).astype(
        dtype
    )


def gelu_new(x: jnp.ndarray) -> jnp.ndarray:
    """GPT-2's tanh-approximated GELU (HF ``gelu_new`` / torch ``gelu(tanh)``)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def gelu_exact(x: jnp.ndarray) -> jnp.ndarray:
    """erf-based GELU (torch default, used by HF ViT/CLIP-text)."""
    xf = x.astype(jnp.float32)
    return (xf * 0.5 * (1.0 + jax.lax.erf(xf / math.sqrt(2.0)))).astype(x.dtype)


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    """CLIP's sigmoid GELU approximation: x * sigmoid(1.702 x)."""
    xf = x.astype(jnp.float32)
    return (xf * jax.nn.sigmoid(1.702 * xf)).astype(x.dtype)


ACTIVATIONS = {
    "gelu_new": gelu_new,
    "gelu": gelu_exact,
    "quick_gelu": quick_gelu,
    "relu": lambda x: jnp.maximum(x, 0),
    "tanh": jnp.tanh,
}


# ---------------------------------------------------------------------------
# Attention (XLA path; the Pallas flash kernel in ops/attention.py is a
# drop-in replacement selected by ops.attention.mha)
# ---------------------------------------------------------------------------

NEG_INF = jnp.finfo(jnp.float32).min


def split_heads(x: jnp.ndarray, n_head: int) -> jnp.ndarray:
    """(B, T, D) → (B, H, T, hd)"""
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def merge_heads(x: jnp.ndarray) -> jnp.ndarray:
    """(B, H, T, hd) → (B, T, D)"""
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def attention_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    key_mask: jnp.ndarray | None = None,
    q_offset: int | jnp.ndarray = 0,
    policy: Policy = F32,
) -> jnp.ndarray:
    """Scaled-dot-product attention, f32 softmax, XLA-fused.

    q: (B, H, Tq, hd); k/v: (B, H, Tk, hd); key_mask: (B, Tk) 1=attend.
    ``q_offset`` positions the queries inside the key timeline for causal
    masking during KV-cached decode (query i attends keys ≤ q_offset + i).
    """
    hd = q.shape[-1]
    scale = 1.0 / math.sqrt(hd)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk",
        policy.cast(q),
        policy.cast(k),
        preferred_element_type=jnp.float32,
    )
    scores = scores * scale
    if causal:
        tq, tk = q.shape[2], k.shape[2]
        qpos = jnp.arange(tq)[:, None] + q_offset
        kpos = jnp.arange(tk)[None, :]
        scores = jnp.where(kpos <= qpos, scores, NEG_INF)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :].astype(bool), scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd",
        probs.astype(policy.compute_dtype),
        policy.cast(v),
        preferred_element_type=jnp.float32,
    )
    return out.astype(policy.compute_dtype)
