"""Mixed-precision policy for TPU.

Parameters live in float32; matmul-heavy compute runs in bfloat16 (the MXU's
native input type) with float32 accumulation (``preferred_element_type``).
Reductions that are numerically sensitive (LayerNorm statistics, softmax,
losses) always run in float32.

``Policy.NONE`` (all-f32) is used by the numerical-parity tests against the
PyTorch reference implementations.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        if x.dtype != self.compute_dtype and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(self.compute_dtype)
        return x

    @staticmethod
    def f32() -> "Policy":
        return Policy(jnp.float32, jnp.float32)

    @staticmethod
    def bf16() -> "Policy":
        return Policy(jnp.float32, jnp.bfloat16)


# Convenience singletons
F32 = Policy.f32()
BF16 = Policy.bf16()


def cast_floating(tree, dtype=jnp.bfloat16):
    """Cast every floating-point leaf of a param pytree to ``dtype``.

    Decode on TPU is weight-HBM-bandwidth-bound (GPT-2 124M reads ~500 MB/step
    in f32); casting the *stored* params to bfloat16 halves the bytes read —
    ``Policy.cast``-at-use cannot, since the f32 bytes are already fetched.
    Use for inference only; keep f32 masters for training.
    """
    import jax

    return jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x,
        tree,
    )
