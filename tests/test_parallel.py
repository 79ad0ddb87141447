"""Explicit collectives over the virtual 8-device mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, batch_sharding, create_mesh
from gpt2_image_captioning_tpu.parallel import all_gather_batch, pmean_scalar, psum_scalar


def _mesh(n=4):
    return create_mesh(MeshSpec(dp=n, tp=1), devices=jax.devices()[:n])


def test_psum_pmean():
    mesh = _mesh()
    x = jnp.arange(4, dtype=jnp.float32)  # one scalar per dp shard
    x = jax.device_put(x, batch_sharding(mesh))
    assert float(psum_scalar(mesh, x)) == 6.0
    assert float(pmean_scalar(mesh, x)) == 1.5


def test_all_gather_batch():
    mesh = _mesh()
    x = jnp.arange(8, dtype=jnp.float32).reshape(8, 1)
    x = jax.device_put(x, batch_sharding(mesh))
    full = all_gather_batch(mesh, x)
    np.testing.assert_allclose(np.asarray(full)[:, 0], np.arange(8))


def test_mesh_2d_shape():
    mesh = create_mesh(MeshSpec(dp=4, tp=2))
    assert mesh.shape == {"dp": 4, "tp": 2}
    assert mesh.axis_names == ("dp", "tp")
