"""C++ HNSW / flat index + host vector stores: recall, persistence, parity
with the on-device exact path."""

import numpy as np
import pytest

from gpt2_image_captioning_tpu.retrieval import hnsw as H

pytestmark = pytest.mark.skipif(not H.available(), reason="libhnsw.so not built")


def _data(n=500, d=32, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=-1, keepdims=True)
    return x


def test_flat_exact_matches_numpy():
    x = _data()
    idx = H.FlatIPIndex(x.shape[1])
    idx.add(x)
    assert len(idx) == len(x)
    q = x[:7]
    scores, ids = idx.search(q, 5)
    want = np.argsort(-(q @ x.T), axis=1)[:, :5]
    np.testing.assert_array_equal(ids, want)
    np.testing.assert_allclose(scores, np.take_along_axis(q @ x.T, want, 1), atol=1e-5)


def test_hnsw_recall_vs_exact():
    x = _data(n=800)
    idx = H.HNSWIndex(x.shape[1], M=16, ef_construction=100, ef_search=64)
    idx.add(x)
    q = _data(n=50, seed=1)
    scores, ids = idx.search(q, 10)
    exact = np.argsort(-(q @ x.T), axis=1)[:, :10]
    recall = np.mean([len(set(a) & set(b)) / 10 for a, b in zip(ids, exact)])
    assert recall > 0.95, f"HNSW recall too low: {recall}"
    # scores descending
    assert all((np.diff(s) <= 1e-6).all() for s in scores)


def test_hnsw_save_load(tmp_path):
    x = _data(n=200)
    idx = H.HNSWIndex(x.shape[1], M=16)
    idx.add(x)
    p = str(tmp_path / "img.index")
    idx.save(p)
    idx2 = H.HNSWIndex.load(p, x.shape[1])
    assert len(idx2) == 200
    q = x[:3]
    s1, i1 = idx.search(q, 5)
    s2, i2 = idx2.search(q, 5)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(s1, s2)
    np.testing.assert_allclose(idx2.reconstruct(7), x[7], atol=1e-6)


def test_k_larger_than_index():
    x = _data(n=3)
    idx = H.FlatIPIndex(x.shape[1])
    idx.add(x)
    scores, ids = idx.search(x[:1], 5)
    assert (ids[0, 3:] == -1).all()


def _store_inputs(n_img=30, d=16, seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n_img, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    filenames = [f"COCO_val2017_{i:012d}.jpg" for i in range(n_img)]
    entries = []
    cid = 0
    for i, f in enumerate(filenames):
        embs = []
        for _ in range(1 + i % 3):
            v = rng.normal(size=(d,)).astype(np.float32)
            embs.append({"caption_id": cid, "embedding": v})
            cid += 1
        entries.append({"filenames": f, "embeddings": embs})
    return filenames, emb, entries


@pytest.mark.parametrize("backend", ["flat", "hnsw"])
def test_vector_store_roundtrip(tmp_path, backend):
    from gpt2_image_captioning_tpu.retrieval.store import VectorStore, create_store

    filenames, emb, entries = _store_inputs()
    store = create_store(filenames, emb, entries, backend=backend)
    results = store.retrieve_images_by_vector_similarity(emb[:4], top_i=3)
    for qi, row in enumerate(results):
        assert len(row) == 3
        assert filenames[qi] not in [f for f, _ in row]  # self-filtered
    caps = store.get_caption_embeddings(5, [[f for f, _ in r] for r in results])
    assert caps.shape == (4, 5, 16)

    store.save(str(tmp_path / "s"))
    loaded = VectorStore.load(str(tmp_path / "s"))
    results2 = loaded.retrieve_images_by_vector_similarity(emb[:4], top_i=3)
    assert [[f for f, _ in r] for r in results] == [[f for f, _ in r] for r in results2]
    caps2 = loaded.get_caption_embeddings(5, [[f for f, _ in r] for r in results2])
    np.testing.assert_allclose(caps, caps2, atol=1e-6)


def test_flat_store_matches_device_store():
    """The C++ flat backend and the on-device exact backend agree."""
    from gpt2_image_captioning_tpu.retrieval import exact
    from gpt2_image_captioning_tpu.retrieval.store import create_store

    filenames, emb, entries = _store_inputs(seed=3)
    cpp = create_store(filenames, emb, entries, backend="flat")
    dev = exact.DeviceVectorStore.build(filenames, emb, entries)

    r_cpp = cpp.retrieve_images_by_vector_similarity(emb[:5], top_i=4)
    r_dev = exact.retrieve_images_by_vector_similarity(dev, emb[:5], top_i=4)
    assert [[f for f, _ in r] for r in r_cpp] == [[f for f, _ in r] for r in r_dev]

    names = [[f for f, _ in r] for r in r_cpp]
    c_cpp = cpp.get_caption_embeddings(6, names)
    c_dev = exact.get_caption_embeddings(dev, 6, names)
    np.testing.assert_allclose(c_cpp, c_dev, atol=1e-6)


def test_persistent_store(tmp_path):
    from gpt2_image_captioning_tpu.retrieval.store import (
        PersistentVectorStore,
        create_persistent_store,
    )

    filenames, emb, entries = _store_inputs(seed=4)
    store = create_persistent_store(str(tmp_path / "db"), filenames, emb, entries)
    # reopen from disk (mmap)
    store2 = PersistentVectorStore(str(tmp_path / "db"))
    single = store2.retrieve_for_single_embedding(emb[0], top_i=2, top_k=4)
    assert single.shape == (4, 16)
    # precomputed caption↔image similarity exists and is plausible
    sims = np.asarray(store2.caption_image_similarity)
    assert sims.shape[0] == sum(1 + i % 3 for i in range(30))
    assert np.isfinite(sims).all()


def test_indexing_pipeline_cli(tmp_path):
    import torch

    from gpt2_image_captioning_tpu.data.embeddings_io import save_embeddings
    from gpt2_image_captioning_tpu.retrieval.indexing import run_indexing_pipeline

    filenames, emb, entries = _store_inputs(seed=5)
    img_path = str(tmp_path / "img.pt")
    cap_path = str(tmp_path / "cap.pt")
    save_embeddings(img_path, filenames, emb)
    torch.save(
        [
            {
                "filenames": e["filenames"],
                "embeddings": [
                    {"caption_id": x["caption_id"], "embedding": torch.from_numpy(x["embedding"])}
                    for x in e["embeddings"]
                ],
            }
            for e in entries
        ],
        cap_path,
    )
    store = run_indexing_pipeline(img_path, cap_path, str(tmp_path / "out"), backend="flat")
    assert len(store.image_index) == 30
