"""Pipeline-parallel (GPipe over a ``pp`` mesh axis) parity tests.

The pipelined loss/gradients must equal the single-device teacher-forced
loss (``captioner.loss_fn`` semantics) exactly up to f32 reassociation —
same block code, same vocab-chunked xent, just staged over the mesh.
Runs on the virtual 8-device CPU mesh (conftest).
"""

import jax
import numpy as np
import pytest

from gpt2_image_captioning_tpu.core.precision import F32
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.parallel import pipeline as PP
from gpt2_image_captioning_tpu.train import optim


def _cfg(freeze=False, n_layer=4):
    gcfg = G.GPT2Config(
        vocab_size=211, n_positions=64, n_embd=32, n_layer=n_layer, n_head=4
    )
    mcfg = M.MLPMappingConfig(prefix_length=3, embed_dim=16, gpt_dim=32)
    return C.CaptionerConfig(
        gpt2=gcfg, mapping=mcfg, eos_token_id=210, freeze_gpt_weights=freeze
    )


def _batch(b, L=10, E=16, vocab=211, seed=0):
    rng = np.random.default_rng(seed)
    am = np.ones((b, L), np.int32)
    am[:, L - 2 :] = 0  # padded tail
    labels = rng.integers(0, vocab, (b, L)).astype(np.int32)
    labels[am == 0] = -100
    return {
        "token_ids": rng.integers(0, vocab, (b, L)).astype(np.int32),
        "labels": labels,
        "attention_mask": am,
        "image_embedding": rng.normal(size=(b, E)).astype(np.float32),
    }


def _tree_allclose(a, b, atol):
    flat_a = jax.tree.leaves(a)
    flat_b = jax.tree.leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=atol, rtol=1e-5)


@pytest.mark.parametrize("freeze", [False, True])
def test_pipeline_loss_and_grads_match_single_device(freeze):
    ccfg = _cfg(freeze=freeze, n_layer=4)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    batch = _batch(8)

    ref_loss, ref_g = jax.value_and_grad(
        lambda tr: C.mean_loss(tr, frozen, ccfg, batch, F32)
    )(trainable)

    mesh = PP.create_pipeline_mesh(dp=1, pp=4)
    fn = PP.make_pipeline_loss_and_grad(ccfg, mesh, F32, num_microbatches=2)
    loss, g = fn(trainable, frozen, batch)

    np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5, rtol=1e-5)
    _tree_allclose(g, ref_g, atol=2e-5)


def test_pipeline_dp_pp_combined_and_microbatch_counts():
    ccfg = _cfg(freeze=False, n_layer=2)
    trainable, frozen = C.init_params(jax.random.PRNGKey(1), ccfg)
    batch = _batch(8, seed=3)

    ref_loss, ref_g = jax.value_and_grad(
        lambda tr: C.mean_loss(tr, frozen, ccfg, batch, F32)
    )(trainable)

    mesh = PP.create_pipeline_mesh(dp=4, pp=2)
    for n_micro in (1, 2):
        fn = PP.make_pipeline_loss_and_grad(ccfg, mesh, F32, num_microbatches=n_micro)
        loss, g = fn(trainable, frozen, batch)
        np.testing.assert_allclose(float(loss), float(ref_loss), atol=1e-5, rtol=1e-5)
        _tree_allclose(g, ref_g, atol=2e-5)


def test_pipeline_train_step_matches_plain_step():
    """Two pipeline AdamW steps == two single-device steps (params + loss)."""
    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.train.loop import make_train_step

    ccfg = _cfg(freeze=False, n_layer=4)
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3, num_training_steps=10)

    # reference: plain GSPMD step on a 1-device mesh, accum=1
    ref_mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    ref_step, _ = make_train_step(ccfg, opt_cfg, ref_mesh, F32, grad_accum_steps=1)

    pp_mesh = PP.create_pipeline_mesh(dp=2, pp=4)
    pp_step, (tr_sh, fz_sh, opt_sh, batch_sh) = PP.make_pipeline_train_step(
        ccfg, opt_cfg, pp_mesh, F32, num_microbatches=2
    )

    tr0, fz = C.init_params(jax.random.PRNGKey(2), ccfg)
    # host copies: ref_step donates its inputs, and device_put may alias an
    # existing device buffer as one shard of the replicated pp placement —
    # each path must own its buffers
    tr0 = jax.tree.map(np.asarray, tr0)
    fz = jax.tree.map(np.asarray, fz)

    ref_tr, ref_opt = jax.tree.map(np.array, tr0), optim.init(tr0)
    pp_tr = jax.device_put(tr0, tr_sh)
    pp_fz = jax.device_put(fz, fz_sh)
    pp_opt = jax.device_put(optim.init(tr0), opt_sh)

    for step_i in range(2):
        batch = _batch(8, seed=10 + step_i)
        ref_tr, ref_opt, ref_loss, _ = ref_step(ref_tr, ref_opt, fz, batch, {})
        pp_batch = jax.device_put(batch, batch_sh)
        pp_tr, pp_opt, pp_loss, _ = pp_step(pp_tr, pp_opt, pp_fz, pp_batch)
        np.testing.assert_allclose(
            float(pp_loss), float(ref_loss), atol=1e-5, rtol=1e-5
        )

    _tree_allclose(pp_tr, ref_tr, atol=3e-5)
    assert int(jax.device_get(pp_opt.step)) == 2


def test_pipeline_rejects_indivisible_layers():
    ccfg = _cfg(n_layer=3)
    mesh = PP.create_pipeline_mesh(dp=1, pp=2)
    with pytest.raises(ValueError, match="not divisible"):
        PP.make_pipeline_loss_and_grad(ccfg, mesh)
