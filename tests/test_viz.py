"""Results viewer: dataset join + HTTP serving."""

import json
import urllib.request

import numpy as np
import pytest

from gpt2_image_captioning_tpu.viz import create_captioning_dataset, launch_app


@pytest.fixture()
def artifacts(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(img_dir / "000000000001.jpg")

    preds = [
        {"image_id": 1, "caption": "a black square"},
        {"image_id": 2, "caption": "missing image"},
    ]
    ann = {
        "images": [
            {"id": 1, "file_name": "000000000001.jpg"},
            {"id": 2, "file_name": "000000000002.jpg"},
        ],
        "annotations": [
            {"image_id": 1, "caption": "a dark square", "id": 0},
            {"image_id": 1, "caption": "black box", "id": 1},
            {"image_id": 2, "caption": "whatever", "id": 2},
        ],
    }
    p = tmp_path / "preds.json"
    a = tmp_path / "ann.json"
    p.write_text(json.dumps(preds))
    a.write_text(json.dumps(ann))
    return str(p), str(img_dir), str(a)


def test_create_dataset_join(artifacts):
    preds, imgs, ann = artifacts
    samples = create_captioning_dataset(preds, imgs, ann, metrics={1: {"CIDEr": 1.5}})
    assert len(samples) == 2
    s1 = next(s for s in samples if s["image_id"] == 1)
    assert s1["exists"] and s1["generated"] == "a black square"
    assert set(s1["references"]) == {"a dark square", "black box"}
    assert s1["metrics"]["CIDEr"] == 1.5
    s2 = next(s for s in samples if s["image_id"] == 2)
    assert not s2["exists"]


def test_server_serves_page_and_images(artifacts):
    preds, imgs, ann = artifacts
    samples = create_captioning_dataset(preds, imgs, ann)
    server = launch_app(samples, imgs, port=5199, blocking=False)
    try:
        html = urllib.request.urlopen("http://127.0.0.1:5199/", timeout=10).read().decode()
        assert "a black square" in html
        img = urllib.request.urlopen(
            "http://127.0.0.1:5199/images/000000000001.jpg", timeout=10
        ).read()
        assert len(img) > 100
        # missing image and path traversal → 404
        for bad in ("/images/nope.jpg", "/images/../ann.json", "/other"):
            with pytest.raises(Exception):
                urllib.request.urlopen(f"http://127.0.0.1:5199{bad}", timeout=10)
    finally:
        server.shutdown()
