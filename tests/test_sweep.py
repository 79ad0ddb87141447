"""Sweep runner end-to-end on synthetic data: per-run artifact directory,
merged config, training info, test-split evaluation."""

import json
import os

import numpy as np
import pytest
import yaml

from gpt2_image_captioning_tpu.core.config import Config, load_config, update_cfg

from helpers import make_synthetic_coco, tiny_tokenizer


@pytest.fixture(scope="module")
def sweep_env(tmp_path_factory, monkeypatch_module=None):
    tmp = tmp_path_factory.mktemp("sweepdata")
    tok = tiny_tokenizer()
    emb_dir = tmp / "embeddings"
    ann_dir = tmp / "annotations"
    emb_dir.mkdir()
    ann_dir.mkdir()
    # train/val/test splits with the filename convention the pipeline expects
    for split, prefix, n in (("train", "train", 10), ("val", "val", 6), ("test", "test", 6)):
        e, a, _ = make_synthetic_coco(tmp, n_images=n, captions_per_image=2,
                                      prefix=prefix, fmt="pt")
        os.rename(e, emb_dir / f"{split}_clip_embeddings.pt")
        target = {
            "train": "captions_train2017.json",
            "val": "captions_val2017.json",
            "test": "captions_val2014.json",
        }[split]
        os.rename(a, ann_dir / target)
    cfg = {
        "seed": 0,
        "max_caption_length": 10,
        "vision_encoder": "clip",
        "retrieval_augmentation": False,
        "paths": {
            "data_dir": str(tmp) + "/",
            "embeddings_path": "${paths.data_dir}embeddings/",
            "annotations_path": "${paths.data_dir}annotations/",
            "checkpoints_path": "${paths.data_dir}checkpoints/",
            "vector_db_path": str(tmp / "db") + "/",
        },
        "mapping": {"type": "mlp", "embed_dim": 16, "gpt_dim": 32,
                    "prefix_length": 2, "hidden_length": 2},
        "image_captioning": {"freeze_gpt_weights": True, "prefix_task_prompt": None},
        "retrieval": {"top_k": 3, "top_i": 2, "aggregation_type": "mean", "embed_dim": 16},
        "training": {"batch_size": 8, "num_epochs": 1, "num_workers": 0,
                     "learning_rate": 1e-3, "num_warmup_steps": 0, "save_every_epoch": 1},
        "validation": {"eval_every_epoch": 1, "batch_size": 8, "temperature": 0.0, "top_p": 1.0},
        "tpu": {"mesh": {"dp": 2, "tp": 1}, "compute_dtype": "float32",
                "grad_accum_steps": 1},
    }
    cfg_path = tmp / "config.yml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    auto = {"model": {"1": {"description": "tiny mlp run", "mapping": {"type": "mlp"}}}}
    auto_path = tmp / "automation_config.yml"
    with open(auto_path, "w") as f:
        yaml.safe_dump(auto, f)
    return tmp, str(cfg_path), str(auto_path), tok


def test_select_test_checkpoint_prefers_latest_best():
    """Regression: epochs 1/3/10 on disk must select best epoch 10, not the
    lexicographically-first best (epoch 1, with 10 sorting before 2)."""
    from gpt2_image_captioning_tpu.sweep import select_test_checkpoint

    files = [
        "best_model_epoch_1.npz",
        "best_model_epoch_3.npz",
        "best_model_epoch_10.npz",
        "model_epoch_1.npz",
        "model_epoch_10.npz",
        "config_1.yml",
    ]
    assert select_test_checkpoint(files) == "best_model_epoch_10.npz"
    # no best_* checkpoints → latest regular epoch
    assert (
        select_test_checkpoint(["model_epoch_2.npz", "model_epoch_10.npz"])
        == "model_epoch_10.npz"
    )
    # .pt interchange checkpoints count too
    assert select_test_checkpoint(["best_model_epoch_2.pt"]) == "best_model_epoch_2.pt"
    assert select_test_checkpoint(["config_1.yml"]) is None


def test_sweep_run_one(sweep_env, monkeypatch):
    tmp, cfg_path, auto_path, tok = sweep_env
    # the pipeline loads the real GPT-2 tokenizer; patch in the tiny one and a
    # tiny GPT-2 so the test stays CPU-sized
    import gpt2_image_captioning_tpu.sweep as sweep_mod
    import gpt2_image_captioning_tpu.training_pipeline as tp
    from gpt2_image_captioning_tpu.models import gpt2 as G

    monkeypatch.setattr(tp, "load_gpt2_tokenizer", lambda *a, **k: tok)
    monkeypatch.setattr(sweep_mod, "load_gpt2_tokenizer", lambda *a, **k: tok)
    orig_build = tp.build_model
    monkeypatch.setattr(
        tp,
        "build_model",
        lambda cfg, tokenizer, **kw: orig_build(
            cfg,
            tokenizer,
            gpt_config=G.GPT2Config(vocab_size=tok.vocab_size, n_positions=32,
                                    n_embd=32, n_layer=1, n_head=2),
            **kw,
        ),
    )
    monkeypatch.setattr(sweep_mod, "build_model", tp.build_model)

    base = load_config(cfg_path)
    updates = load_config(auto_path)
    overrides = dict(updates.model["1"])
    desc = overrides.pop("description")
    cfg = update_cfg(base, overrides)

    out_dir = str(tmp / "sweep_out")
    history = sweep_mod.run_one(cfg, "1", out_dir, desc)
    run_dir = os.path.join(out_dir, "checkpoint_1")

    assert os.path.exists(os.path.join(run_dir, "config_1.yml"))
    assert os.path.exists(os.path.join(run_dir, "model_epoch_1.npz"))
    info = open(os.path.join(run_dir, "training_info_1.txt")).read()
    assert "training duration" in info and "trainable parameters" in info
    assert os.path.exists(os.path.join(run_dir, "test_predictions_1.json"))
    assert os.path.exists(os.path.join(run_dir, "test_metrics_1.json"))
    preds = json.load(open(os.path.join(run_dir, "test_predictions_1.json")))
    assert preds and set(preds[0]) == {"image_id", "caption"}
    metrics = json.load(open(os.path.join(run_dir, "test_metrics_1.json")))
    assert "CIDEr" in metrics
    assert len(history["epoch_losses"]) == 1
