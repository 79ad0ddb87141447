import json

import numpy as np
import pytest

from gpt2_image_captioning_tpu.data.dataset import (
    IGNORE_INDEX,
    Batcher,
    CocoDataset,
    split_coco_annotations,
)
from gpt2_image_captioning_tpu.data.embeddings_io import load_embeddings, save_embeddings

from helpers import make_synthetic_coco, tiny_tokenizer


@pytest.fixture(scope="module")
def coco(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("coco")
    return make_synthetic_coco(tmp, n_images=8, captions_per_image=3), tiny_tokenizer()


def test_embeddings_io_roundtrip(tmp_path):
    emb = np.random.default_rng(0).normal(size=(4, 8)).astype(np.float32)
    names = [f"COCO_val2017_{i:012d}.jpg" for i in range(4)]
    for fmt in ("npz", "pt"):
        p = str(tmp_path / f"e.{fmt}")
        save_embeddings(p, names, emb)
        n2, e2 = load_embeddings(p)
        assert n2 == names
        np.testing.assert_allclose(e2, emb)


def test_pt_file_readable_by_torch(tmp_path):
    """Byte-compat check: the .pt artifact loads through plain torch the way
    the reference does (src/dataset.py:127-131)."""
    import torch

    emb = np.ones((2, 4), dtype=np.float32)
    p = str(tmp_path / "e.pt")
    save_embeddings(p, ["a_000000000001.jpg", "a_000000000002.jpg"], emb)
    data = torch.load(p, weights_only=False)
    assert isinstance(data["embeddings"], torch.Tensor)
    assert data["filenames"][0] == "a_000000000001.jpg"


def test_dataset_items(coco):
    (emb_path, ann_path, image_ids), tok = coco
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=12)
    assert len(ds) == 24
    item = ds[0]
    assert item["token_ids"].shape == (12,)
    assert item["attention_mask"].shape == (12,)
    # EOS explicitly appended with mask 1; padding masked out with -100 labels
    n_real = int(item["attention_mask"].sum())
    assert item["token_ids"][n_real - 1] == tok.eos_token_id
    assert (item["labels"][n_real:] == IGNORE_INDEX).all()
    assert (item["labels"][:n_real] == item["token_ids"][:n_real]).all()
    assert item["image_id"] in image_ids


def test_image_id_parsing():
    assert CocoDataset.get_image_id_from_filename("COCO_train2014_000000123456.jpg") == 123456
    assert CocoDataset.get_image_id_from_filename("000000000042.jpg") == 42


def test_batcher_covers_all_and_pads(coco):
    (emb_path, ann_path, _), tok = coco
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=12)
    b = Batcher(ds, batch_size=10, seed=0)
    assert b.steps_per_epoch == 3  # 24 captions / 10
    batches = list(b.epoch())
    assert len(batches) == 3
    for batch in batches:
        assert batch["token_ids"].shape == (10, 12)
    # last batch has padded rows fully ignored
    last = batches[-1]
    assert (last["labels"][4:] == IGNORE_INDEX).all()


def test_unique_image_batches(coco):
    (emb_path, ann_path, image_ids), tok = coco
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=12)
    seen = []
    for batch in ds.unique_image_batches(batch_size=3):
        assert batch["image_embedding"].shape == (3, 16)
        seen.extend(np.asarray(batch["image_id"])[batch["valid"]].tolist())
    assert sorted(seen) == sorted(image_ids)  # each image exactly once


def test_split_coco_annotations(tmp_path):
    emb_path, ann_path, image_ids = make_synthetic_coco(tmp_path, n_images=10)
    out = tmp_path / "splits"
    split_coco_annotations(ann_path, str(out), split_ratio=0.8, seed=42)
    train = json.load(open(out / "train_split.json"))
    val = json.load(open(out / "val_split.json"))
    assert len(train["images"]) == 8 and len(val["images"]) == 2
    train_ids = {im["id"] for im in train["images"]}
    val_ids = {im["id"] for im in val["images"]}
    assert not (train_ids & val_ids)
    # captions follow their image
    assert all(a["image_id"] in train_ids for a in train["annotations"])
    assert all(a["image_id"] in val_ids for a in val["annotations"])
    # deterministic under the same seed
    split_coco_annotations(ann_path, str(tmp_path / "splits2"), split_ratio=0.8, seed=42)
    train2 = json.load(open(tmp_path / "splits2" / "train_split.json"))
    assert {im["id"] for im in train2["images"]} == train_ids


def test_batcher_process_sharding(coco):
    """Two simulated hosts partition every global batch, same global order."""
    (emb_path, ann_path, _), tok = coco
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=12)
    full = Batcher(ds, batch_size=8, seed=3)
    p0 = Batcher(ds, batch_size=8, seed=3, process_index=0, process_count=2)
    p1 = Batcher(ds, batch_size=8, seed=3, process_index=1, process_count=2)
    for bf, b0, b1 in zip(full.epoch(0), p0.epoch(0), p1.epoch(0)):
        np.testing.assert_array_equal(
            np.concatenate([b0["token_ids"], b1["token_ids"]]), bf["token_ids"]
        )
        np.testing.assert_array_equal(
            np.concatenate([b0["labels"], b1["labels"]]), bf["labels"]
        )
    with pytest.raises(ValueError):
        Batcher(ds, batch_size=9, process_index=0, process_count=2)
