"""Native C++ image pipeline vs the PIL reference path."""

import numpy as np
import pytest

from gpt2_image_captioning_tpu.data import native_pipe
from gpt2_image_captioning_tpu.embeddings.preprocess import (
    CLIP_SPEC,
    DINO_SPEC,
    VIT_SPEC,
    resize_and_crop,
)

pytestmark = pytest.mark.skipif(
    not native_pipe.available(), reason="libimagepipe.so not built"
)


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    sizes = [(320, 240), (240, 320), (500, 500), (123, 457)]
    for i, (w, h) in enumerate(sizes):
        # smooth gradient + noise: JPEG-friendly content
        x = np.linspace(0, 255, w, dtype=np.float32)[None, :, None]
        y = np.linspace(0, 255, h, dtype=np.float32)[:, None, None]
        img = (x + y) / 2 + rng.normal(0, 8, size=(h, w, 3))
        img = np.clip(img, 0, 255).astype(np.uint8)
        Image.fromarray(img).save(d / f"img_{i:012d}.jpg", quality=95)
    return str(d)


@pytest.mark.parametrize("spec", [CLIP_SPEC, VIT_SPEC, DINO_SPEC], ids=["clip", "vit", "dino"])
def test_native_matches_pil(jpeg_dir, spec):
    import os

    from PIL import Image

    for fname in sorted(os.listdir(jpeg_dir)):
        path = os.path.join(jpeg_dir, fname)
        native = native_pipe.process_one(path, spec)
        pil_rgb = np.asarray(Image.open(path).convert("RGB"))
        want = resize_and_crop(pil_rgb, spec)
        assert native.shape == want.shape
        # PIL uses fixed-point arithmetic; the C++ path uses float — allow a
        # small per-pixel delta and tight mean agreement
        diff = np.abs(native.astype(np.int16) - want.astype(np.int16))
        assert diff.mean() < 1.0, f"{fname}: mean diff {diff.mean()}"
        assert np.percentile(diff, 99) <= 3, f"{fname}: p99 {np.percentile(diff, 99)}"


def test_batch_loader(jpeg_dir):
    loader = native_pipe.NativeImageBatchLoader(jpeg_dir, CLIP_SPEC, batch_size=3)
    batches = list(loader)
    assert len(batches) == 2
    names, batch, valid = batches[0]
    assert batch.shape == (3, 224, 224, 3) and valid.all()
    names2, batch2, valid2 = batches[1]
    assert valid2.tolist() == [True, False, False]
    assert batch2.shape == (3, 224, 224, 3)


def test_batch_matches_single(jpeg_dir):
    import os

    paths = [os.path.join(jpeg_dir, f) for f in sorted(os.listdir(jpeg_dir))]
    batch = native_pipe.process_batch(paths, CLIP_SPEC, threads=2)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native_pipe.process_one(p, CLIP_SPEC))


def test_missing_file_errors(jpeg_dir):
    with pytest.raises(RuntimeError, match="failed"):
        native_pipe.process_one("/nonexistent/x.jpg", CLIP_SPEC)


def test_batch_loader_mixed_formats(tmp_path):
    """PNG files fall back to the PIL path inside the native loader."""
    from PIL import Image

    rng = np.random.default_rng(1)
    for i, ext in enumerate(["jpg", "png", "jpg"]):
        arr = rng.integers(0, 255, size=(100, 120, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i:03d}.{ext}")
    loader = native_pipe.NativeImageBatchLoader(str(tmp_path), CLIP_SPEC, batch_size=3)
    [(names, batch, valid)] = list(loader)
    assert len(names) == 3 and batch.shape == (3, 224, 224, 3) and valid.all()
    assert {n.split(".")[-1] for n in names} == {"jpg", "png"}
