"""Device-mesh construction and the framework's communication layer.

The reference has no distribution at all (single CUDA device, SURVEY.md §2.3);
on TPU, data/tensor parallelism over ICI is first-class.  All sharding in the
framework flows through one 2-D logical mesh:

- axis ``"dp"`` — data parallel: the batch dimension is sharded here and
  gradients are reduced with ``psum`` over ICI (inserted automatically by XLA
  from sharding annotations).
- axis ``"tp"`` — tensor parallel: attention heads and MLP hidden units of the
  decoder can be sharded here (useful when GPT-2 is unfrozen or scaled up).

``create_mesh`` is DCN-aware: when multiple slices are present
(``jax.devices()`` spanning processes), the ``dp`` axis is laid out across
slices (DCN) and ``tp`` stays inside a slice (ICI), so collectives that move
weight-shard traffic ride the fast interconnect.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "dp"
MODEL_AXIS = "tp"


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``dp=-1`` means "all remaining devices"."""

    dp: int = -1
    tp: int = 1

    def resolve(self, n_devices: int) -> tuple[int, int]:
        tp = self.tp if self.tp > 0 else 1
        if n_devices % tp != 0:
            raise ValueError(f"tp={tp} does not divide device count {n_devices}")
        dp = self.dp if self.dp > 0 else n_devices // tp
        if dp * tp != n_devices:
            raise ValueError(f"mesh {dp}x{tp} != {n_devices} devices")
        return dp, tp


def create_mesh(
    spec: MeshSpec | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Create the framework's 2-D ``(dp, tp)`` mesh.

    Devices are ordered so that, under multi-process (multi-slice) execution,
    the ``dp`` axis varies across processes (DCN) and ``tp`` within a process
    (ICI).  On a single host this reduces to a plain reshape.
    """
    spec = spec or MeshSpec()
    devs = list(devices if devices is not None else jax.devices())
    # an explicit dp smaller than the device count selects a device subset
    if spec.dp > 0 and spec.tp > 0 and spec.dp * spec.tp < len(devs):
        devs = devs[: spec.dp * spec.tp]
    dp, tp = spec.resolve(len(devs))
    # Sort by (process_index, id) so tp-contiguous groups share a slice.
    devs.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devs, dtype=object).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim sharded over dp, everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded on dp."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_mesh_for_testing(n: int) -> Mesh:
    """Mesh over the first ``n`` available devices (virtual CPU devices in
    tests via ``--xla_force_host_platform_device_count``)."""
    return create_mesh(MeshSpec(dp=-1, tp=1), devices=jax.devices()[:n])
