import os

import pytest
import yaml

from gpt2_image_captioning_tpu.core.config import Config, load_config, update_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_interpolation_and_access(tmp_path):
    cfg = Config(
        {
            "paths": {"data_dir": "coco_data/", "embeddings_path": "${paths.data_dir}embeddings/"},
            "training": {"batch_size": 128, "learning_rate": 1e-4},
        }
    )
    assert cfg.paths.embeddings_path == "coco_data/embeddings/"
    assert cfg["paths"]["embeddings_path"] == "coco_data/embeddings/"
    assert cfg.training.batch_size == 128
    assert isinstance(cfg.training.learning_rate, float)


def test_interpolation_sees_overrides():
    cfg = Config({"paths": {"a": "x/", "b": "${paths.a}y"}})
    cfg2 = update_cfg(cfg, {"paths": {"a": "z/"}})
    assert cfg2.paths.b == "z/y"  # lazily resolved against the merged root


def test_update_cfg_recursive_merge():
    base = Config({"a": {"x": 1, "y": 2}, "b": 3})
    out = update_cfg(base, {"a": {"y": 20}, "c": 4})
    assert out.a.x == 1 and out.a.y == 20 and out.b == 3 and out.c == 4
    # base untouched
    assert base.a.y == 2 and "c" not in base


def test_repo_config_yml_schema():
    """The shipped config.yml keeps the reference's schema."""
    cfg = load_config(os.path.join(REPO, "config.yml"))
    for key in (
        "seed",
        "max_caption_length",
        "vision_encoder",
        "retrieval_augmentation",
        "paths",
        "mapping",
        "image_captioning",
        "retrieval",
        "training",
        "validation",
    ):
        assert key in cfg, f"missing config key {key}"
    assert cfg.paths.embeddings_path.startswith(cfg.paths.data_dir)
    assert cfg.mapping.type in ("transformer", "mlp")
    assert isinstance(cfg.training.learning_rate, float)


def test_save_roundtrip(tmp_path):
    cfg = Config({"a": {"b": "${a.c}x", "c": "q"}})
    p = tmp_path / "c.yml"
    cfg.save(str(p))
    again = load_config(str(p))
    assert again.a.b == "qx"
    loaded_raw = yaml.safe_load(open(p))
    assert loaded_raw["a"]["b"] == "${a.c}x"  # saved unresolved


def test_missing_key_raises():
    cfg = Config({"a": 1})
    with pytest.raises(AttributeError):
        _ = cfg.nope
    assert cfg.get("nope", 7) == 7
