"""Mid-training resume: optimizer state persists, training continues exactly
where it left off (train 1+1 epochs resumed == 2 epochs straight)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.data.dataset import CocoDataset
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.train.loop import train

from helpers import make_synthetic_coco, tiny_tokenizer


def _model(tok, seed=0):
    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=32,
                        n_layer=1, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id)
    return C.ImageCaptioningModel(ccfg, tokenizer=tok, rng=jax.random.PRNGKey(seed))


def test_resume_matches_straight_run(tmp_path):
    tok = tiny_tokenizer()
    emb_path, ann_path, _ = make_synthetic_coco(tmp_path, n_images=8, captions_per_image=2)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    kw = dict(batch_size=8, learning_rate=1e-3, save_every_epoch=1, mesh=mesh)

    # straight 2-epoch run
    m_a = _model(tok)
    out_a = str(tmp_path / "a")
    train(ds, m_a, num_epochs=2, outputs_dir=out_a, log_dir=str(tmp_path / "la"), **kw)

    # 2-epoch run interrupted after epoch 1 (schedule still spans 2 epochs),
    # then resumed for epoch 2
    m_b = _model(tok)
    out_b = str(tmp_path / "b")
    train(ds, m_b, num_epochs=2, stop_after_epochs=1, outputs_dir=out_b,
          log_dir=str(tmp_path / "lb"), **kw)
    assert os.path.exists(os.path.join(out_b, "optimizer_epoch_1.npz"))
    m_b2 = _model(tok)  # fresh params; resume must restore everything
    hist = train(
        ds, m_b2, num_epochs=2, outputs_dir=out_b, log_dir=str(tmp_path / "lb2"),
        resume=True, **kw,
    )
    assert len(hist["epoch_losses"]) == 1  # only epoch 2 ran

    for a, b in zip(jax.tree.leaves(m_a.trainable), jax.tree.leaves(m_b2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_noop_when_complete(tmp_path):
    tok = tiny_tokenizer()
    emb_path, ann_path, _ = make_synthetic_coco(tmp_path, n_images=8)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    m = _model(tok)
    out = str(tmp_path / "c")
    train(ds, m, batch_size=8, num_epochs=1, save_every_epoch=1, outputs_dir=out,
          mesh=mesh, log_dir=str(tmp_path / "lc"))
    hist = train(ds, m, batch_size=8, num_epochs=1, save_every_epoch=1, outputs_dir=out,
                 mesh=mesh, resume=True, log_dir=str(tmp_path / "lc2"))
    assert hist["epoch_losses"] == []  # nothing left to do


def test_profile_trace_capture(tmp_path):
    """profile_dir captures a jax.profiler trace of an early step."""
    tok = tiny_tokenizer()
    emb_path, ann_path, _ = make_synthetic_coco(tmp_path, n_images=8)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    m = _model(tok)
    prof_dir = str(tmp_path / "prof")
    train(ds, m, batch_size=4, num_epochs=1, outputs_dir=str(tmp_path / "o"),
          mesh=mesh, log_dir=str(tmp_path / "l"), profile_dir=prof_dir)
    import glob

    assert glob.glob(prof_dir + "/**/*", recursive=True), "no trace files written"
