"""End-to-end embedding extraction on tiny encoders (CPU): images dir →
device pipeline → .pt interchange artifact, plus caption text embeddings."""

import numpy as np
import pytest

import jax

from gpt2_image_captioning_tpu.data.embeddings_io import load_embeddings
from gpt2_image_captioning_tpu.embeddings import preprocess as PP
from gpt2_image_captioning_tpu.embeddings.extract import _run_extraction
from gpt2_image_captioning_tpu.models import clip as CL


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(5):
        arr = rng.integers(0, 255, size=(60 + i * 10, 80, 3), dtype=np.uint8)
        Image.fromarray(arr).save(d / f"COCO_val2017_{i:012d}.jpg")
    return str(d)


def test_clip_extraction_end_to_end(image_dir, tmp_path):
    import dataclasses

    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.embeddings.preprocess import normalize_on_device

    # a tiny CLIP (32px) with an adjusted spec so CPU tests stay fast
    cfg = CL.CLIPVisionConfig.tiny()
    params = CL.init_vision(jax.random.PRNGKey(0), cfg)
    spec = dataclasses.replace(PP.CLIP_SPEC, resize=32, crop=32)

    @jax.jit
    def encode(batch_u8):
        px = normalize_on_device(batch_u8, spec)
        return CL.encode_image(params, cfg, px, policy=F32, normalize=True)

    out_path = str(tmp_path / "val_clip_embeddings.pt")
    names, emb = _run_extraction(image_dir, out_path, encode, spec, 2, 2, "CLIP-tiny")
    assert len(names) == 5
    assert emb.shape == (5, cfg.projection_dim)
    np.testing.assert_allclose(np.linalg.norm(emb, axis=-1), 1.0, atol=1e-5)

    names2, emb2 = load_embeddings(out_path)
    assert names2 == names
    np.testing.assert_allclose(emb2, emb, atol=1e-6)

    # and it feeds CocoDataset directly (the interchange contract)
    import json

    ann = {
        "images": [{"id": i} for i in range(5)],
        "annotations": [{"image_id": i, "id": i, "caption": "a thing"} for i in range(5)],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))
    from helpers import tiny_tokenizer

    from gpt2_image_captioning_tpu.data.dataset import CocoDataset

    ds = CocoDataset(out_path, str(ann_path), tokenizer=tiny_tokenizer(), max_length=8)
    assert len(ds) == 5


def test_chunked_extraction_matches_per_batch(image_dir, tmp_path):
    """device_chunks>1 (scan-chunked dispatch, embeddings/extract.py) must be
    bit-identical to per-batch encoding, ragged tail block included: 5 images
    at batch 2 = 3 host batches, so chunks=2 flushes one full (2, ...) block
    plus a padded tail block."""
    import dataclasses

    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.embeddings.preprocess import normalize_on_device

    cfg = CL.CLIPVisionConfig.tiny()
    params = CL.init_vision(jax.random.PRNGKey(0), cfg)
    spec = dataclasses.replace(PP.CLIP_SPEC, resize=32, crop=32)

    def encode(batch_u8):
        px = normalize_on_device(batch_u8, spec)
        return CL.encode_image(params, cfg, px, policy=F32, normalize=True)

    names1, emb1 = _run_extraction(image_dir, None, encode, spec, 2, 2, "ctl")
    names2, emb2 = _run_extraction(
        image_dir, None, encode, spec, 2, 2, "chunked", device_chunks=2
    )
    assert names1 == names2
    np.testing.assert_array_equal(emb1, emb2)


def test_caption_word_embeddings(tmp_path):
    import json

    from gpt2_image_captioning_tpu.embeddings.word_embeddings import (
        extract_caption_embeddings,
        map_caption_id_to_caption,
    )

    cfg = CL.CLIPTextConfig.tiny(vocab_size=300)
    params = CL.init_text(jax.random.PRNGKey(1), cfg)

    ann = {
        "images": [{"id": 1, "file_name": "a.jpg"}, {"id": 2, "file_name": "b.jpg"}],
        "annotations": [
            {"image_id": 1, "id": 10, "caption": "the cat"},
            {"image_id": 1, "id": 11, "caption": "a cat on a mat"},
            {"image_id": 2, "id": 12, "caption": "the dog"},
        ],
    }
    ann_path = tmp_path / "ann.json"
    ann_path.write_text(json.dumps(ann))

    assert map_caption_id_to_caption(str(ann_path))[11] == "a cat on a mat"

    class MiniTok:
        def __call__(self, texts):
            ids = np.zeros((len(texts), cfg.max_position_embeddings), np.int32)
            for i, t in enumerate(texts):
                toks = [1 + (hash(w) % 250) for w in t.split()][: cfg.max_position_embeddings - 1]
                ids[i, : len(toks)] = toks
                ids[i, len(toks)] = cfg.eos_token_id
            return {"input_ids": ids}

    out_path = str(tmp_path / "caps.pt")
    result = extract_caption_embeddings(
        str(ann_path), out_path, params, cfg, MiniTok(), batch_size=2,
    )
    assert {r["filenames"] for r in result} == {"a.jpg", "b.jpg"}
    by_f = {r["filenames"]: r["embeddings"] for r in result}
    assert [e["caption_id"] for e in by_f["a.jpg"]] == [10, 11]
    assert by_f["a.jpg"][0]["embedding"].shape == (cfg.projection_dim,)

    # artifact loads as the grouped torch structure the stores consume
    import torch

    loaded = torch.load(out_path, weights_only=False)
    assert loaded[0]["embeddings"][0]["embedding"].shape == (cfg.projection_dim,)

    # and builds a DeviceVectorStore
    from gpt2_image_captioning_tpu.retrieval.exact import DeviceVectorStore

    emb = np.random.default_rng(0).normal(size=(2, cfg.projection_dim)).astype(np.float32)
    store = DeviceVectorStore.build(["a.jpg", "b.jpg"], emb, loaded)
    assert store.caption_table.shape == (2, 2)


def test_dp_mesh_extraction_matches_single_device(image_dir):
    """mesh= knob (SURVEY §2.3 DP extraction): a dp=4 batch-sharded run
    produces the same embeddings as the single-device run, for both the
    per-batch and the chunked-dispatch (device_chunks>1) programs."""
    import dataclasses

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.core.precision import F32
    from gpt2_image_captioning_tpu.embeddings.preprocess import normalize_on_device

    cfg = CL.CLIPVisionConfig.tiny()
    params = CL.init_vision(jax.random.PRNGKey(0), cfg)
    spec = dataclasses.replace(PP.CLIP_SPEC, resize=32, crop=32)

    def encode(batch_u8):
        px = normalize_on_device(batch_u8, spec)
        return CL.encode_image(params, cfg, px, policy=F32, normalize=True)

    names0, emb0 = _run_extraction(image_dir, None, encode, spec, 4, 2, "ref")
    mesh = create_mesh(MeshSpec(dp=4, tp=1), devices=jax.devices()[:4])
    names1, emb1 = _run_extraction(
        image_dir, None, encode, spec, 4, 2, "dp4", mesh=mesh
    )
    assert names1 == names0
    np.testing.assert_allclose(emb1, emb0, atol=1e-6)

    names2, emb2 = _run_extraction(
        image_dir, None, encode, spec, 4, 2, "dp4c2", device_chunks=2, mesh=mesh
    )
    assert names2 == names0
    np.testing.assert_allclose(emb2, emb0, atol=1e-6)

    # guard: batch must divide over dp, and tp meshes are refused
    with pytest.raises(ValueError, match="divide over dp"):
        _run_extraction(image_dir, None, encode, spec, 6, 2, "bad", mesh=mesh)
    tp_mesh = create_mesh(MeshSpec(dp=2, tp=2), devices=jax.devices()[:4])
    with pytest.raises(ValueError, match="dp-only"):
        _run_extraction(image_dir, None, encode, spec, 4, 2, "bad", mesh=tp_mesh)
