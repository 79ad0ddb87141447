"""Explicit collective helpers over the (dp, tp) mesh.

Most of the framework's communication is *implicit* — GSPMD inserts psum /
all-gather / reduce-scatter from sharding annotations (the idiomatic
jax.sharding path; SURVEY.md §2.3).  These helpers cover the places where an
explicit collective is clearer, via ``shard_map`` over the mesh:

- :func:`psum_scalar` / :func:`pmean_scalar` — cross-replica metric
  reduction (loss/token-count sums during eval).
- :func:`all_gather_batch` — collect per-device prediction shards to every
  host (the eval-prediction gather; reference has no analog since it is
  single-device).

All ride ICI within a slice; with a DCN-spanning dp axis XLA routes the
reduction hierarchically.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from gpt2_image_captioning_tpu.core.mesh import DATA_AXIS


def psum_scalar(mesh: Mesh, x: jnp.ndarray, axis: str = DATA_AXIS) -> jnp.ndarray:
    """Sum a per-shard scalar across the ``axis`` mesh dimension."""

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False
    )
    def _psum(v):
        return jax.lax.psum(jnp.sum(v), axis)

    return _psum(x)


def pmean_scalar(mesh: Mesh, x: jnp.ndarray, axis: str = DATA_AXIS) -> jnp.ndarray:
    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False
    )
    def _pmean(v):
        return jax.lax.pmean(jnp.mean(v), axis)

    return _pmean(x)


def all_gather_batch(mesh: Mesh, x: jnp.ndarray, axis: str = DATA_AXIS) -> jnp.ndarray:
    """Gather a batch-sharded array so every device holds the full batch."""

    @functools.partial(
        jax.shard_map, mesh=mesh, in_specs=P(axis), out_specs=P(), check_vma=False
    )
    def _gather(v):
        return jax.lax.all_gather(v, axis, axis=0, tiled=True)

    return _gather(x)
