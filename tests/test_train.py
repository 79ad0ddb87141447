"""End-to-end training on synthetic COCO over the virtual 8-device CPU mesh:
loss decreases, artifacts appear, grad accumulation matches single-step math."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.data.dataset import Batcher, CocoDataset
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.train import optim
from gpt2_image_captioning_tpu.train.loop import make_train_step, train

from helpers import make_synthetic_coco, tiny_tokenizer


@pytest.fixture(scope="module")
def tok():
    return tiny_tokenizer()


@pytest.fixture(scope="module")
def model(tok):
    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id)
    return C.ImageCaptioningModel(ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def data(tmp_path_factory, tok):
    tmp = tmp_path_factory.mktemp("traindata")
    emb_path, ann_path, _ = make_synthetic_coco(tmp, n_images=12, captions_per_image=2)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=12)
    return ds, ann_path


def test_train_end_to_end(tmp_path, model, data, tok):
    ds, ann_path = data
    mesh = create_mesh(MeshSpec(dp=4, tp=1), devices=jax.devices()[:4])
    out = str(tmp_path / "ckpt")
    history = train(
        ds,
        model,
        batch_size=8,
        num_epochs=2,
        learning_rate=1e-3,
        save_every_epoch=1,
        outputs_dir=out,
        val_dataset=ds,
        val_annotations_path=ann_path,
        eval_every_epoch=2,
        eval_batch_size=8,
        eval_max_length=8,
        mesh=mesh,
        log_dir=str(tmp_path / "logs"),
    )
    assert len(history["epoch_losses"]) == 2
    assert history["epoch_losses"][1] < history["epoch_losses"][0]
    # artifacts
    assert os.path.exists(os.path.join(out, "model_epoch_1.npz"))
    assert os.path.exists(os.path.join(out, "model_epoch_2.npz"))
    assert os.path.exists(os.path.join(out, "loss_curve.png"))
    assert os.path.exists(os.path.join(out, "eval_results", "epoch_2_val_predictions.json"))
    assert os.path.exists(os.path.join(out, "eval_results", "epoch_2_val_metrics.json"))
    assert os.path.exists(os.path.join(out, "eval_results", "val_metrics_summary.json"))
    assert os.path.exists(str(tmp_path / "logs" / "metrics.jsonl"))
    # best checkpoint tracked
    assert history["best_epoch"] == 2
    assert os.path.exists(os.path.join(out, "best_model_epoch_2.npz"))
    # predictions have the COCO schema
    preds = json.load(open(os.path.join(out, "eval_results", "epoch_2_val_predictions.json")))
    assert preds and set(preds[0]) == {"image_id", "caption"}


def test_grad_accum_equivalence(model, data):
    """accum=2 over two half-batches == one full-batch step (up to fp error)
    when both halves have equal token counts."""
    ds, _ = data
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3, num_training_steps=10)

    b = Batcher(ds, 8, seed=0)
    batch = next(iter(b.epoch()))
    batch = {k: v for k, v in batch.items() if k != "image_id"}

    step1, _ = make_train_step(model.cfg, opt_cfg, mesh, model.policy, grad_accum_steps=1)
    step2, _ = make_train_step(model.cfg, opt_cfg, mesh, model.policy, grad_accum_steps=2)

    t0 = jax.tree.map(jnp.copy, model.trainable)
    o0 = optim.init(t0)
    t1, _, loss1, _ = step1(jax.tree.map(jnp.copy, t0), optim.init(t0), model.frozen, batch, {})

    halves = {k: np.stack([v[:4], v[4:]]) for k, v in batch.items()}
    t2, _, loss2, _ = step2(jax.tree.map(jnp.copy, t0), optim.init(t0), model.frozen, halves, {})

    # micro-means average to the same value only if token counts are equal;
    # compare step outputs loosely and parameter direction tightly
    assert float(loss2) == pytest.approx(float(loss1), rel=0.05)
    for a, c in zip(jax.tree.leaves(t1), jax.tree.leaves(t2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=5e-3)


def test_pt_checkpoint_format_option(tmp_path, model, data):
    pytest.importorskip("torch")
    ds, _ = data
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    out = str(tmp_path / "ptck")
    train(
        ds,
        model,
        batch_size=12,
        num_epochs=1,
        outputs_dir=out,
        mesh=mesh,
        checkpoint_format="pt",
        log_dir=str(tmp_path / "logs2"),
    )
    assert os.path.exists(os.path.join(out, "model_epoch_1.pt"))
    import torch

    sd = torch.load(os.path.join(out, "model_epoch_1.pt"), weights_only=False)
    assert "mapping_network.model.0.weight" in sd


def test_generate_predictions_bf16_precision(model, data):
    """The eval generation pipeline accepts decode_precision='bf16' and
    produces valid COCO-schema predictions for every unique image."""
    from gpt2_image_captioning_tpu.evaluation.generation import generate_predictions

    ds, _ = data
    preds32 = generate_predictions(
        model, ds, batch_size=8, max_length=6, temperature=0.0, verbose=False
    )
    preds16 = generate_predictions(
        model, ds, batch_size=8, max_length=6, temperature=0.0, verbose=False,
        decode_precision="bf16",
    )
    assert len(preds16) == len(preds32) == 12
    assert {p["image_id"] for p in preds16} == {p["image_id"] for p in preds32}
    assert all(isinstance(p["caption"], str) for p in preds16)
    # int8 (W8A8 serving mode) is a valid precision through the pipeline too
    preds8 = generate_predictions(
        model, ds, batch_size=8, max_length=6, temperature=0.0, verbose=False,
        decode_precision="int8",
    )
    assert {p["image_id"] for p in preds8} == {p["image_id"] for p in preds32}
    with pytest.raises(ValueError, match="decode_precision"):
        generate_predictions(model, ds, batch_size=8, decode_precision="fp8", verbose=False)


def test_prefetched_preserves_order_and_propagates_errors():
    from gpt2_image_captioning_tpu.train.loop import _prefetched

    got = list(_prefetched(range(20), lambda x: x * x))
    assert got == [x * x for x in range(20)]

    def boom(x):
        if x == 3:
            raise ValueError("retrieval failed")
        return x

    it = _prefetched(range(10), boom)
    out = []
    with pytest.raises(ValueError, match="retrieval failed"):
        for v in it:
            out.append(v)
    assert out == [0, 1, 2]
