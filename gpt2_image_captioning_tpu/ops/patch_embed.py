"""Fused patch embedding: uint8 pixels → normalize → MXU matmul, one kernel.

The extraction pipeline's first device op (north star: "fused JPEG
decode/resize/normalize feeding Pallas patch-embed").  The XLA path
materializes the float32 normalized patches ((B·N, 3p²) f32 — 4× the uint8
bytes) between the normalize and the patch matmul; this Pallas kernel
dequantizes + normalizes **inside** the matmul tile loop, so HBM sees only
the uint8 pixels and the (B·N, D) output.

Formulation: patches are pre-unfolded to (M, K) uint8 (a pure layout op XLA
performs on copy-in), K = 3·patch²; per-element mean/inv-std vectors of
length K carry the per-channel normalization.  Standard (bm × bn) output
tiling; K is kept whole per tile (K ≤ 3072 → ≤ 0.4 MB u8 + 1.5 MB f32
weights per tile in VMEM).

Dispatch: the XLA composition is the default — measured on TPU at CLIP
extraction shapes (b=256, 224², p=32, D=768) it runs 36.2 ms/call vs the
Pallas kernel's 37.9 ms (scalar-sync timing; XLA already fuses the
dequant-normalize chain into the matmul here), with bit-identical outputs
(maxdiff 0.0e+00).  Set ``GIC_FORCE_PALLAS_PATCH_EMBED=1`` to opt into the
kernel; see docs/PERF_NOTES.md for the A/B.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpt2_image_captioning_tpu.embeddings.preprocess import PreprocessSpec


def _kernel(a_ref, w_ref, mean_ref, inv_ref, out_ref):
    """a: (1, bm, K) u8; w: (K, bn) f32; mean/inv: (1, K) f32; out: (1, bm, bn)."""
    # Mosaic lacks a direct u8→f32 cast; chain through int32
    a = a_ref[...][0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    a = (a - mean_ref[...][0][None, :]) * inv_ref[...][0][None, :]
    out = jnp.dot(a, w_ref[...], preferred_element_type=jnp.float32)
    out_ref[...] = out.astype(out_ref.dtype)[None]


def fused_patch_embed_pallas(
    patches_u8: jnp.ndarray,  # (M, K) uint8
    w: jnp.ndarray,  # (K, D)
    mean_vec: jnp.ndarray,  # (K,)
    inv_std_vec: jnp.ndarray,  # (K,)
    *,
    out_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    m, k = patches_u8.shape
    d = w.shape[1]
    bm = min(256, max(8, m))
    bn = min(256, max(128, d)) if d >= 128 else d
    pad_m = (-m) % bm
    pad_n = (-d) % bn
    if pad_m:
        patches_u8 = jnp.pad(patches_u8, ((0, pad_m), (0, 0)))
    if pad_n:
        w = jnp.pad(w, ((0, 0), (0, pad_n)))
    mp, dp = patches_u8.shape[0], w.shape[1]

    out = pl.pallas_call(
        _kernel,
        grid=(mp // bm, dp // bn),
        in_specs=[
            pl.BlockSpec((1, bm, k), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bm, bn), lambda i, j: (0, i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, mp, dp), out_dtype),
        interpret=interpret,
    )(
        patches_u8[None],
        w.astype(jnp.float32),
        mean_vec.astype(jnp.float32)[None],
        inv_std_vec.astype(jnp.float32)[None],
    )[0]
    return out[:m, :d]


def normalization_vectors(spec: PreprocessSpec, patch: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-element (K = 3·p²) mean / inv-std in the (c, py, px) patch layout
    produced by ``models.clip.extract_patches``."""
    mean = jnp.repeat(jnp.asarray(spec.mean, jnp.float32), patch * patch)
    std = jnp.repeat(jnp.asarray(spec.std, jnp.float32), patch * patch)
    return mean, 1.0 / std


def patch_embed(
    batch_u8: jnp.ndarray,  # (B, S, S, 3) uint8 host-preprocessed pixels
    w: jnp.ndarray,  # (3*p*p, D) patch kernel (matmul layout)
    spec: PreprocessSpec,
    patch: int,
    bias: jnp.ndarray | None = None,
    *,
    use_pallas: bool | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """(B, S, S, 3) u8 → (B, N, D) patch embeddings with fused normalize.

    Equivalent to ``normalize_on_device`` + ``extract_patches`` + matmul.
    """
    import os

    from gpt2_image_captioning_tpu.models.clip import extract_patches

    b, s, _, _ = batch_u8.shape
    n = (s // patch) ** 2
    # unfold to (B*N, K) uint8 — layout only, stays u8
    chw = batch_u8.transpose(0, 3, 1, 2)
    patches = extract_patches(chw, patch).reshape(b * n, -1)

    if use_pallas is None:
        use_pallas = interpret or (
            jax.default_backend() == "tpu"
            and bool(os.environ.get("GIC_FORCE_PALLAS_PATCH_EMBED"))
        )
    mean_vec, inv_vec = normalization_vectors(spec, patch)
    if use_pallas:
        out = fused_patch_embed_pallas(
            patches, w, mean_vec, inv_vec, interpret=interpret
        ).reshape(b, n, -1)
    else:
        x = patches.astype(jnp.float32) * (1.0 / 255.0)
        x = (x - mean_vec[None]) * inv_vec[None]
        out = jnp.dot(x, w.astype(jnp.float32), preferred_element_type=jnp.float32)
        out = out.reshape(b, n, -1)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out
