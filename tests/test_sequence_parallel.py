"""Sequence-parallel (Megatron-SP over an ``sp`` mesh axis) parity tests.

The seq-sharded loss/gradients must equal the single-device teacher-forced
loss up to f32 reassociation — including when the sequence is padded to a
multiple of the sp size (masked rows contribute nothing).
"""

import jax
import numpy as np
import pytest

from gpt2_image_captioning_tpu.core.precision import F32
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.parallel import sequence as SP


def _cfg(freeze=False, prefix_length=3):
    gcfg = G.GPT2Config(
        vocab_size=211, n_positions=64, n_embd=32, n_layer=2, n_head=4
    )
    mcfg = M.MLPMappingConfig(prefix_length=prefix_length, embed_dim=16, gpt_dim=32)
    return C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=210, freeze_gpt_weights=freeze
    )


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


def _tree_allclose(a, b, atol):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


@pytest.mark.parametrize("freeze", [False, True])
def test_sp_loss_and_grads_match_single_device(freeze):
    # prefix 3 + caption 13 = 16 rows: divides sp=4 exactly (no padding)
    ccfg = _cfg(freeze=freeze)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    batch = _batch(8, L=13)

    ref_loss, ref_g = jax.value_and_grad(
        lambda tr: C.mean_loss(tr, frozen, ccfg, batch, F32)
    )(trainable)

    mesh = SP.create_sp_mesh(dp=2, sp=4)
    fn = SP.make_sp_loss_and_grad(ccfg, mesh, F32)
    loss, g = fn(trainable, frozen, batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5, rtol=1e-5)
    _tree_allclose(g, ref_g, atol=2e-5)


def test_sp_padding_preserves_loss_and_grads():
    # prefix 3 + caption 11 = 14 rows → padded to 16 for sp=4; the two
    # appended masked rows must change nothing
    ccfg = _cfg(freeze=False)
    trainable, frozen = C.init_params(jax.random.PRNGKey(1), ccfg)
    batch = _batch(8, L=11, seed=5)

    ref_loss, ref_g = jax.value_and_grad(
        lambda tr: C.mean_loss(tr, frozen, ccfg, batch, F32)
    )(trainable)

    mesh = SP.create_sp_mesh(dp=2, sp=4)
    fn = SP.make_sp_loss_and_grad(ccfg, mesh, F32)
    loss, g = fn(trainable, frozen, batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5, rtol=1e-5)
    _tree_allclose(g, ref_g, atol=2e-5)


def test_sp_activation_chunking_is_real():
    """Each rank's hidden-state chunk is T/sp rows: verify via a jaxpr probe
    that the sp program's block matmuls run at the chunked row count."""
    ccfg = _cfg(freeze=False)
    mesh = SP.create_sp_mesh(dp=1, sp=4)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    batch = _batch(4, L=13)
    # T = 16, sp = 4 → per-rank chunks of 4 rows
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def probe(tr, fz, b):
        nll, cnt = SP._shard_loss(ccfg, F32, 4, False, tr, fz, b)
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
    # the all-gather from (B, 4, D) chunks to the (B, 16, D) full K/V
    assert "all_gather" in jaxpr
