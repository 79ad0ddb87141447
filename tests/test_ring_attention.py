"""Ring attention (context parallelism over the ``sp`` axis) parity tests.

``parallel/ring.py`` rotates K/V blocks around the mesh axis with
``ppermute`` while queries accumulate an online softmax — the result must
equal full attention over the gathered sequence exactly (up to f32
reassociation), forward AND backward, and the sequence-parallel training
loss with ``ring=True`` must match both the all-gather SP path and the
single-device loss.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from gpt2_image_captioning_tpu.core.precision import F32
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.parallel import sequence as SP
from gpt2_image_captioning_tpu.parallel.ring import ring_attention


def _ring_full(q4, k4, v4, mesh, key_mask=None, causal=True, sp=4):
    """Run ring attention on sequence-sharded inputs; return gathered out."""
    tc = q4.shape[2] // sp

    def inner(q, k, v, km):
        sid = jax.lax.axis_index(SP.SEQ_AXIS)
        return ring_attention(
            q, k, v, axis_name=SP.SEQ_AXIS, q_offset=sid * tc,
            key_mask=km, causal=causal, policy=F32,
        )

    spec = P(None, None, SP.SEQ_AXIS, None)
    km_spec = P() if key_mask is not None else None
    args = (q4, k4, v4)
    if key_mask is None:
        fn = shard_map(
            lambda q, k, v: inner(q, k, v, None), mesh=mesh,
            in_specs=(spec,) * 3, out_specs=spec, check_vma=False,
        )
        return fn(*args)
    fn = shard_map(
        inner, mesh=mesh, in_specs=(spec, spec, spec, km_spec),
        out_specs=spec, check_vma=False,
    )
    return fn(*args, key_mask)


def _qkv(b=2, h=4, t=16, hd=8, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda: jnp.asarray(rng.normal(size=(b, h, t, hd)).astype(np.float32))
    return mk(), mk(), mk()


@pytest.mark.parametrize("causal", [True, False])
def test_ring_matches_full_attention(causal):
    mesh = SP.create_sp_mesh(dp=1, sp=4)
    q, k, v = _qkv(seed=1)
    got = _ring_full(q, k, v, mesh, causal=causal)
    want = nn.attention_xla(q, k, v, causal=causal, policy=F32)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5, rtol=1e-5)


def test_ring_respects_key_mask_and_offsets():
    """Masked keys (e.g. padded rows) are invisible on every ring step, and
    causality uses GLOBAL positions (each rank's q_offset)."""
    mesh = SP.create_sp_mesh(dp=1, sp=4)
    q, k, v = _qkv(b=3, t=16, seed=2)
    km = np.ones((3, 16), np.int32)
    km[:, 13:] = 0
    km[0, 5] = 0
    got = _ring_full(q, k, v, mesh, key_mask=jnp.asarray(km))
    want = nn.attention_xla(
        q, k, v, causal=True, key_mask=jnp.asarray(km), policy=F32
    )
    np.testing.assert_allclose(np.asarray(want), np.asarray(got), atol=1e-5, rtol=1e-5)


def test_ring_gradients_match_full_attention():
    """The scan + ppermute ring is reverse-differentiable and its q/k/v
    gradients equal the full-attention gradients."""
    mesh = SP.create_sp_mesh(dp=1, sp=4)
    q, k, v = _qkv(seed=3)
    w = jnp.asarray(
        np.random.default_rng(9).normal(size=q.shape).astype(np.float32)
    )

    def loss_ring(q, k, v):
        return jnp.sum(_ring_full(q, k, v, mesh) * w)

    def loss_full(q, k, v):
        return jnp.sum(nn.attention_xla(q, k, v, causal=True, policy=F32) * w)

    gr = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    gf = jax.grad(loss_full, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gr, gf):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5)


def _cfg():
    gcfg = G.GPT2Config(vocab_size=211, n_positions=64, n_embd=32, n_layer=2, n_head=4)
    mcfg = M.MLPMappingConfig(prefix_length=3, embed_dim=16, gpt_dim=32)
    return C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=210)


def _batch(b, L, vocab=211, seed=0):
    rng = np.random.default_rng(seed)
    am = np.ones((b, L), np.int32)
    am[:, L - 2 :] = 0
    labels = rng.integers(0, vocab, (b, L)).astype(np.int32)
    labels[am == 0] = -100
    return {
        "token_ids": rng.integers(0, vocab, (b, L)).astype(np.int32),
        "labels": labels,
        "attention_mask": am,
        "image_embedding": rng.normal(size=(b, 16)).astype(np.float32),
    }


def test_ring_sp_training_matches_single_device():
    """make_sp_loss_and_grad(ring=True): loss/grads equal the single-device
    teacher-forced loss — including with sequence padding (L=11 → pad to
    16 rows for sp=4)."""
    ccfg = _cfg()
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    batch = _batch(8, L=11, seed=5)

    ref_loss, ref_g = jax.value_and_grad(
        lambda tr: C.mean_loss(tr, frozen, ccfg, batch, F32)
    )(trainable)

    mesh = SP.create_sp_mesh(dp=2, sp=4)
    fn = SP.make_sp_loss_and_grad(ccfg, mesh, F32, ring=True)
    loss, g = fn(trainable, frozen, batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5, rtol=1e-5)
    fa, fb = jax.tree.leaves(g), jax.tree.leaves(ref_g)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=2e-5, rtol=1e-5)


def test_ring_program_has_no_all_gather():
    """The point of the ring form: K/V are never gathered — the program
    contains ppermute collectives but no all-gather of the K/V chunks."""
    ccfg = _cfg()
    mesh = SP.create_sp_mesh(dp=1, sp=4)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    batch = _batch(4, L=13)

    def probe(tr, fz, b):
        nll, _ = SP._shard_loss(ccfg, F32, 4, True, tr, fz, b)
        return nll

    sm = shard_map(
        probe,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(), trainable),
            jax.tree.map(lambda _: P(), frozen),
            jax.tree.map(lambda _: P("dp"), batch),
        ),
        out_specs=P(),
        check_vma=False,
    )
    jaxpr = str(jax.make_jaxpr(sm)(trainable, frozen, batch))
    assert "ppermute" in jaxpr
    assert "all_gather" not in jaxpr
