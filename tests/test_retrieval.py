"""On-device exact retrieval + RAT aggregation/training tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.models import rat as R
from gpt2_image_captioning_tpu.retrieval import exact


def _store(n_img=10, d=8, caps_per_img=(1, 2, 3), seed=0):
    rng = np.random.default_rng(seed)
    emb = rng.normal(size=(n_img, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    filenames = [f"COCO_val2017_{i:012d}.jpg" for i in range(n_img)]
    entries = []
    cap_id = 0
    for i, f in enumerate(filenames):
        k = caps_per_img[i % len(caps_per_img)]
        embs = []
        for _ in range(k):
            v = rng.normal(size=(d,)).astype(np.float32)
            embs.append({"caption_id": cap_id, "embedding": v})
            cap_id += 1
        entries.append({"filenames": f, "embeddings": embs})
    return exact.DeviceVectorStore.build(filenames, emb, entries), emb, entries


def test_image_search_excludes_self():
    store, emb, _ = _store()
    results = exact.retrieve_images_by_vector_similarity(store, emb[:3], top_i=3)
    for qi, row in enumerate(results):
        names = [f for f, _ in row]
        assert store.image_filenames[qi] not in names  # self filtered
        # scores sorted descending
        scores = [s for _, s in row]
        assert scores == sorted(scores, reverse=True)


def test_image_search_matches_numpy():
    store, emb, _ = _store()
    q = emb[:4]
    sims = q @ emb.T
    sims[sims > 0.9999] = -np.inf
    want = np.argsort(-sims, axis=1)[:, :3]
    results = exact.retrieve_images_by_vector_similarity(store, q, top_i=3)
    got = [[store.filename_to_index[f] for f, _ in row] for row in results]
    np.testing.assert_array_equal(np.asarray(got), want)


def test_caption_fetch_order_and_padding():
    store, emb, entries = _store()
    # fetch for image 2 (3 captions) then image 0 (1 caption), top_k = 5
    batch = [[store.image_filenames[2], store.image_filenames[0]]]
    out = exact.get_caption_embeddings(store, top_k=5, batch_filenames=batch)
    assert out.shape == (1, 5, 8)
    # first 3 rows = image 2's captions in order, then image 0's 1, then zero pad
    img2_caps = [e["embedding"] for e in entries[2]["embeddings"]]
    img0_caps = [e["embedding"] for e in entries[0]["embeddings"]]
    np.testing.assert_allclose(out[0, :3], np.stack(img2_caps))
    np.testing.assert_allclose(out[0, 3], img0_caps[0])
    np.testing.assert_allclose(out[0, 4], 0.0)


def test_fused_retrieve_matches_host_path():
    store, emb, _ = _store(n_img=12)
    q = jnp.asarray(emb[:5])
    fused = np.asarray(store.retrieve_fused(q, top_i=3, top_k=4))
    results = exact.retrieve_images_by_vector_similarity(store, emb[:5], top_i=3)
    filenames = [[f for f, _ in row] for row in results]
    host = exact.get_caption_embeddings(store, top_k=4, batch_filenames=filenames)
    np.testing.assert_allclose(fused, host, atol=1e-6)


@pytest.mark.parametrize("kind", ["mean", "max", "sum_norm", "attention"])
def test_aggregator_matches_torch_semantics(kind):
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    r = rng.normal(size=(2, 5, 8)).astype(np.float32)
    rcfg = R.RATConfig(embed_dim=8, aggregation_type=kind)
    params = R.init_aggregator(jax.random.PRNGKey(0), rcfg)

    tq, tr = torch.from_numpy(q), torch.from_numpy(r)
    if kind == "mean":
        want = tq + tr.mean(dim=1)
    elif kind == "max":
        want = tq + tr.max(dim=1)[0]
    elif kind == "sum_norm":
        s = F.normalize(tr, p=2, dim=2).sum(dim=1)
        want = tq + F.normalize(s, p=2, dim=1)
    else:  # attention with our (ported) weights
        w = torch.from_numpy(np.asarray(params["attention_proj"]["w"]))
        b = torch.from_numpy(np.asarray(params["attention_proj"]["b"]))
        scores = tr @ w + b
        weights = F.softmax(scores, dim=1)
        want = tq + (tr * weights).sum(dim=1)

    got = R.aggregate(params, rcfg, jnp.asarray(q), jnp.asarray(r))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5, rtol=1e-5)


def test_rat_training_fused_end_to_end(tmp_path):
    """RAT training with the device store: loss falls, aggregator ('attention')
    receives gradients, eval artifacts carry the _rat suffix."""
    from helpers import make_synthetic_coco, tiny_tokenizer

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.data.dataset import CocoDataset
    from gpt2_image_captioning_tpu.train.loop import train_rat

    tok = tiny_tokenizer()
    emb_path, ann_path, _ = make_synthetic_coco(tmp_path, n_images=10, captions_per_image=2)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)

    store, _, _ = _store(n_img=10, d=16, seed=1)
    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=32, n_layer=2, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id)
    rcfg = R.RATConfig(embed_dim=16, aggregation_type="attention", top_k=4, top_i=2)
    model = R.RetrievalAugmentedTransformer(
        rcfg, ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0)
    )
    assert "aggregator" in model.trainable

    before = np.asarray(model.trainable["aggregator"]["attention_proj"]["w"]).copy()
    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    hist = train_rat(
        ds, model, store, top_k=4, top_i=2,
        batch_size=10, num_epochs=2, learning_rate=3e-3,
        outputs_dir=str(tmp_path / "ck"), mesh=mesh,
        val_dataset=ds, val_annotations_path=ann_path,
        eval_every_epoch=2, eval_max_length=6,
        log_dir=str(tmp_path / "logs"),
    )
    assert hist["epoch_losses"][1] < hist["epoch_losses"][0]
    after = np.asarray(model.trainable["aggregator"]["attention_proj"]["w"])
    assert not np.allclose(before, after)  # aggregator trained
    import os

    assert os.path.exists(tmp_path / "ck" / "eval_results" / "epoch_2_val_predictions_rat.json")


def test_rat_generate_with_store():
    store, emb, _ = _store(n_img=8, d=16, seed=2)
    from helpers import tiny_tokenizer

    tok = tiny_tokenizer()
    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id)
    rcfg = R.RATConfig(embed_dim=16, aggregation_type="mean", top_k=3, top_i=2)
    model = R.RetrievalAugmentedTransformer(rcfg, ccfg, tokenizer=tok)
    out = model.generate(emb[:4, :16], db_store=store, max_length=5, temperature=0.0, top_p=1.0)
    assert np.asarray(out).shape == (4, 5)
    # augmentation changes the prefix → generally different captions than raw
    raw = C.generate(model.trainable, model.frozen, ccfg, jnp.asarray(emb[:4, :16]),
                     max_length=5, temperature=0.0, top_p=1.0)
    assert np.asarray(out).shape == np.asarray(raw).shape


def test_rat_training_host_store_path(tmp_path):
    """RAT training through a HOST store (the C++ flat index): per-batch
    retrieval feeds the step via batch['retrieved_embeddings']."""
    from gpt2_image_captioning_tpu.retrieval import hnsw as H

    if not H.available():
        pytest.skip("libhnsw.so not built")
    from helpers import make_synthetic_coco, tiny_tokenizer

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.data.dataset import CocoDataset
    from gpt2_image_captioning_tpu.retrieval.store import create_store
    from gpt2_image_captioning_tpu.train.loop import train_rat

    tok = tiny_tokenizer()
    emb_path, ann_path, _ = make_synthetic_coco(tmp_path, n_images=8, captions_per_image=2)
    ds = CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)

    # host store over the same corpus
    rng2 = np.random.default_rng(5)
    filenames = [f"COCO_val2017_{1000+i:012d}.jpg" for i in range(8)]
    emb = rng2.normal(size=(8, 16)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
    entries = [
        {"filenames": f, "embeddings": [
            {"caption_id": i, "embedding": rng2.normal(size=(16,)).astype(np.float32)}]}
        for i, f in enumerate(filenames)
    ]
    store = create_store(filenames, emb, entries, backend="flat")

    gcfg = G.GPT2Config(vocab_size=tok.vocab_size, n_positions=64, n_embd=32, n_layer=1, n_head=2)
    mcfg = M.MLPMappingConfig(prefix_length=2, embed_dim=16, gpt_dim=32)
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=tok.eos_token_id)
    rcfg = R.RATConfig(embed_dim=16, aggregation_type="mean", top_k=3, top_i=2)
    model = R.RetrievalAugmentedTransformer(rcfg, ccfg, tokenizer=tok, rng=jax.random.PRNGKey(0))

    mesh = create_mesh(MeshSpec(dp=2, tp=1), devices=jax.devices()[:2])
    hist = train_rat(
        ds, model, store, top_k=3, top_i=2, batch_size=8, num_epochs=2,
        learning_rate=3e-3, outputs_dir=str(tmp_path / "hk"), mesh=mesh,
        log_dir=str(tmp_path / "hl"),
    )
    assert hist["epoch_losses"][1] < hist["epoch_losses"][0]


def test_rat_pipeline_build_store_from_files(tmp_path):
    """rat_pipeline.build_store reads the config-convention artifact paths."""
    import torch
    import yaml

    from gpt2_image_captioning_tpu.retrieval import hnsw as H

    if not H.available():
        pytest.skip("libhnsw.so not built")

    from gpt2_image_captioning_tpu.core.config import Config
    from gpt2_image_captioning_tpu.data.embeddings_io import save_embeddings
    from gpt2_image_captioning_tpu.retrieval.rat_pipeline import build_store

    emb_dir = tmp_path / "embeddings"
    emb_dir.mkdir()
    rng = np.random.default_rng(7)
    filenames = [f"COCO_train2017_{i:012d}.jpg" for i in range(6)]
    img = rng.normal(size=(6, 8)).astype(np.float32)
    save_embeddings(str(emb_dir / "train_clip_embeddings.pt"), filenames, img)
    torch.save(
        [{"filenames": f, "embeddings": [
            {"caption_id": i, "embedding": torch.from_numpy(rng.normal(size=(8,)).astype(np.float32))}]}
         for i, f in enumerate(filenames)],
        str(emb_dir / "train_clip_caption_embeddings.pt"),
    )
    cfg = Config({
        "vision_encoder": "clip",
        "paths": {"embeddings_path": str(emb_dir) + "/", "vector_db_path": str(tmp_path / "db") + "/"},
        "retrieval": {"top_k": 3, "top_i": 2, "embed_dim": 8},
    })
    # device backend (default)
    store = build_store(cfg)
    assert store.caption_table.shape[0] == 6
    # persistent backend
    store2 = build_store(cfg, backend="persistent")
    assert store2.retrieve_for_single_embedding(img[0], 2, 3).shape == (3, 8)
