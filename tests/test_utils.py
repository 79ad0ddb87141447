"""Utility helpers: curve PNGs, worker sizing, param counts, eval artifacts."""

import json
import os

import jax
import pytest

from gpt2_image_captioning_tpu import utils
from gpt2_image_captioning_tpu.evaluation.evaluate import (
    EvalMetrics,
    save_epoch_artifacts,
    save_eval_summary,
)


def test_save_loss_curves(tmp_path):
    pytest.importorskip("matplotlib")
    p = str(tmp_path / "loss.png")
    utils.save_loss_curves([3.2, 2.1, 1.7], p)
    assert os.path.getsize(p) > 0


def test_save_eval_metric_curves(tmp_path):
    pytest.importorskip("matplotlib")
    hist = [
        {"epoch": e, "BLEU-1": 0.5 + e / 100, "BLEU-4": 0.2, "ROUGE-L": 0.4, "CIDEr": 0.7}
        for e in (1, 2, 3)
    ]
    p = str(tmp_path / "metrics.png")
    utils.save_eval_metric_curves(hist, p)
    assert os.path.getsize(p) > 0
    # empty history is a no-op, not an error
    utils.save_eval_metric_curves([], str(tmp_path / "none.png"))
    assert not os.path.exists(str(tmp_path / "none.png"))


def test_get_max_workers():
    assert utils.get_max_workers(1) == 1
    assert utils.get_max_workers(10_000) == (os.cpu_count() or 1) * 4


def test_count_model_parameters():
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    cfg = C.CaptionerConfig(
        gpt2=G.GPT2Config.tiny(vocab_size=64),
        mapping=M.MLPMappingConfig(embed_dim=8, gpt_dim=32, prefix_length=3),
        eos_token_id=63,
    )
    model = C.ImageCaptioningModel(cfg, rng=jax.random.PRNGKey(0))
    trainable, total = utils.count_model_parameters(model)
    assert 0 < trainable < total
    flat = jax.tree.leaves(model.frozen)
    assert total - trainable == sum(x.size for x in flat)


def test_save_eval_summary_and_epoch_artifacts(tmp_path, capsys):
    metrics = EvalMetrics(
        bleu_1=0.5, bleu_2=0.4, bleu_3=0.3, bleu_4=0.2, rouge_l=0.45, cider=0.8
    )
    preds = [{"image_id": 7, "caption": "a cat"}]
    out = str(tmp_path)
    save_epoch_artifacts(preds, metrics, out, epoch=2, split_name="val", rat=True)
    with open(os.path.join(out, "epoch_2_val_predictions_rat.json")) as f:
        assert json.load(f) == preds
    with open(os.path.join(out, "epoch_2_val_metrics_rat.json")) as f:
        m = json.load(f)
    assert m["epoch"] == 2 and m["num_images"] == 1 and m["CIDEr"] == 0.8

    sp = str(tmp_path / "summary.json")
    save_eval_summary([m], sp)
    with open(sp) as f:
        assert json.load(f)[0]["split"] == "val"
