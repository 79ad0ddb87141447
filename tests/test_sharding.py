"""Sharding correctness: the same training step computes identical numbers
under dp-only, dp×tp, and single-device meshes (GSPMD inserts the
collectives; the math must not change)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.train import optim
from gpt2_image_captioning_tpu.train.loop import make_train_step

from helpers import tiny_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = tiny_tokenizer()
    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=32, n_embd=32,
                        n_layer=2, n_head=4)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id,
                             freeze_gpt_weights=False)  # tp shards real grads
    model = C.ImageCaptioningModel(ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {
        "token_ids": rng.integers(0, tok.vocab_size - 1, size=(8, 10)).astype(np.int32),
        "labels": rng.integers(0, tok.vocab_size - 1, size=(8, 10)).astype(np.int32),
        "attention_mask": np.ones((8, 10), np.int32),
        "image_embedding": rng.normal(size=(8, 16)).astype(np.float32),
    }
    host_tr = jax.tree.map(np.asarray, model.trainable)
    return ccfg, model, host_tr, batch


def _run(ccfg, model, host_tr, batch, dp, tp):
    mesh = create_mesh(MeshSpec(dp=dp, tp=tp))
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3, num_training_steps=4)
    step, (tr_sh, fr_sh, opt_sh, b_sh) = make_train_step(ccfg, opt_cfg, mesh, model.policy)
    tr = jax.device_put(host_tr, tr_sh)
    fz = jax.device_put(model.frozen, fr_sh)
    o = jax.device_put(optim.init(tr), opt_sh)
    new_tr, _, loss, gnorm = step(tr, o, fz, jax.device_put(batch, b_sh), {})
    return float(loss), float(gnorm), jax.tree.map(np.asarray, new_tr)


@pytest.mark.parametrize("dp,tp", [(1, 1), (4, 1), (2, 2), (2, 4)])
def test_step_invariant_to_mesh(setup, dp, tp):
    ccfg, model, host_tr, batch = setup
    base = _run(ccfg, model, host_tr, batch, 1, 1)
    got = _run(ccfg, model, host_tr, batch, dp, tp)
    assert got[0] == pytest.approx(base[0], rel=1e-5), "loss differs under sharding"
    assert got[1] == pytest.approx(base[1], rel=1e-4), "grad norm differs under sharding"
    for a, b in zip(jax.tree.leaves(base[2]), jax.tree.leaves(got[2])):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_generate_invariant_to_dp_sharding(setup):
    """Greedy decode over a dp-sharded batch equals unsharded decode."""
    from gpt2_image_captioning_tpu.core.mesh import batch_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    base = np.asarray(
        C.generate(model.trainable, model.frozen, ccfg, emb,
                   max_length=6, temperature=0.0, top_p=1.0)
    )
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    got = np.asarray(
        C.generate(model.trainable, model.frozen, ccfg, emb_sharded,
                   max_length=6, temperature=0.0, top_p=1.0)
    )
    np.testing.assert_array_equal(base, got)


def test_generate_fused_kernel_dp_sharded(setup):
    """The fused whole-step decode kernel under a dp-only mesh (shard_map
    splits the batch; each shard runs the single-device kernel) produces the
    same tokens as the unsharded XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import batch_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    base = np.asarray(
        C.generate(model.trainable, model.frozen, ccfg, emb,
                   max_length=6, temperature=0.0, top_p=1.0,
                   use_pallas_decode=False)
    )
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(
            C.generate(model.trainable, model.frozen, ccfg, emb_sharded,
                       max_length=6, temperature=0.0, top_p=1.0,
                       use_pallas_decode=True, mesh=mesh)
        )
    np.testing.assert_array_equal(base, got)


def test_generate_fused_int8_dp_sharded(setup):
    """int8 W8A8 packed weights survive the shard_map dp split (the packed
    pytree, including int8 tiles + scale tiles, is replicated per shard)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import batch_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(
            C.generate(model.trainable, model.frozen, ccfg, emb,
                       max_length=6, temperature=0.0, top_p=1.0,
                       use_pallas_decode=True, decode_quant=True)
        )
        sharded = np.asarray(
            C.generate(model.trainable, model.frozen, ccfg, emb_sharded,
                       max_length=6, temperature=0.0, top_p=1.0,
                       use_pallas_decode=True, decode_quant=True, mesh=mesh)
        )
    np.testing.assert_array_equal(single, sharded)


@pytest.mark.parametrize("dp,tp", [(2, 2), (1, 4)])
def test_generate_invariant_to_tp_sharding(setup, dp, tp):
    """TP-sharded decode (params + KV cache partitioned over tp, GSPMD
    collectives) produces the same tokens as single-device decode."""
    from gpt2_image_captioning_tpu.core.mesh import batch_sharding
    from gpt2_image_captioning_tpu.train.loop import _spec_to_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    base = np.asarray(
        C.generate(model.trainable, model.frozen, ccfg, emb,
                   max_length=6, temperature=0.0, top_p=1.0)
    )
    mesh = create_mesh(MeshSpec(dp=dp, tp=tp))
    tr_specs, fr_specs = C.partition_specs(ccfg)
    tr = jax.device_put(model.trainable, _spec_to_sharding(mesh, tr_specs))
    fz = jax.device_put(model.frozen, _spec_to_sharding(mesh, fr_specs))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    got = np.asarray(
        C.generate(tr, fz, ccfg, emb_sharded,
                   max_length=6, temperature=0.0, top_p=1.0, mesh=mesh)
    )
    np.testing.assert_array_equal(base, got)


@pytest.mark.parametrize("dp,tp", [(2, 2)])
def test_beam_generate_invariant_to_tp_sharding(setup, dp, tp):
    from gpt2_image_captioning_tpu.core.mesh import batch_sharding
    from gpt2_image_captioning_tpu.train.loop import _spec_to_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    base = np.asarray(
        C.beam_generate(model.trainable, model.frozen, ccfg, emb,
                        max_length=5, beam_size=2)
    )
    mesh = create_mesh(MeshSpec(dp=dp, tp=tp))
    tr_specs, fr_specs = C.partition_specs(ccfg)
    tr = jax.device_put(model.trainable, _spec_to_sharding(mesh, tr_specs))
    fz = jax.device_put(model.frozen, _spec_to_sharding(mesh, fr_specs))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    got = np.asarray(
        C.beam_generate(tr, fz, ccfg, emb_sharded,
                        max_length=5, beam_size=2, mesh=mesh)
    )
    np.testing.assert_array_equal(base, got)


def test_beam_generate_fused_dp_sharded(setup):
    """The beam-aware fused kernel under a dp-only shard_map produces the
    same best beams as the single-device fused path (beam state, ancestry
    origin map and cache rows are all per-image-group local — the shard
    split must be invisible)."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import batch_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(
            C.beam_generate(model.trainable, model.frozen, ccfg, emb,
                            max_length=6, beam_size=4, use_pallas_decode=True)
        )
        sharded = np.asarray(
            C.beam_generate(model.trainable, model.frozen, ccfg, emb_sharded,
                            max_length=6, beam_size=4, use_pallas_decode=True,
                            mesh=mesh)
        )
    np.testing.assert_array_equal(single, sharded)


def test_beam_generate_fused_int8_dp_sharded(setup):
    """int8 W8A8 beam decode under the dp shard_map (packed int8 + scale
    tiles replicated per shard) matches the single-device int8 beam path."""
    from jax.experimental.pallas import tpu as pltpu

    from gpt2_image_captioning_tpu.core.mesh import batch_sharding

    ccfg, model, host_tr, batch = setup
    emb = jnp.asarray(batch["image_embedding"])
    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    emb_sharded = jax.device_put(emb, batch_sharding(mesh))
    with pltpu.force_tpu_interpret_mode():
        single = np.asarray(
            C.beam_generate(model.trainable, model.frozen, ccfg, emb,
                            max_length=6, beam_size=4, use_pallas_decode=True,
                            decode_quant=True)
        )
        sharded = np.asarray(
            C.beam_generate(model.trainable, model.frozen, ccfg, emb_sharded,
                            max_length=6, beam_size=4, use_pallas_decode=True,
                            decode_quant=True, mesh=mesh)
        )
    np.testing.assert_array_equal(single, sharded)
