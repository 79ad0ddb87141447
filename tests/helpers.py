"""Shared test fixtures: a tiny byte-level BPE tokenizer and a synthetic COCO
dataset (embeddings file + annotations JSON), all CPU-friendly."""

from __future__ import annotations

import json

import numpy as np

from gpt2_image_captioning_tpu.data.tokenizer import GPT2BPETokenizer, bytes_to_unicode


def tiny_tokenizer(extra_merges: list[tuple[str, str]] | None = None) -> GPT2BPETokenizer:
    b2u = bytes_to_unicode()
    symbols = [b2u[i] for i in range(256)]
    merges = [
        ("Ġ", "t"), ("h", "e"), ("Ġt", "he"), ("c", "a"), ("ca", "t"),
        ("d", "o"), ("do", "g"), ("Ġ", "a"), ("o", "n"), ("a", "t"),
    ] + (extra_merges or [])
    vocab_tokens = symbols + ["".join(m) for m in merges] + ["<|endoftext|>"]
    vocab = {tok: i for i, tok in enumerate(vocab_tokens)}
    return GPT2BPETokenizer(vocab, merges)


def make_synthetic_coco(
    tmp_path,
    n_images: int = 8,
    captions_per_image: int = 3,
    embed_dim: int = 16,
    seed: int = 0,
    prefix: str = "val",
    fmt: str = "npz",
):
    """Create embeddings + annotations files in the interchange formats.

    Returns (embeddings_path, annotations_path, image_ids).
    """
    from gpt2_image_captioning_tpu.data.embeddings_io import save_embeddings

    rng = np.random.default_rng(seed)
    image_ids = [1000 + i for i in range(n_images)]
    filenames = [f"COCO_{prefix}2017_{iid:012d}.jpg" for iid in image_ids]
    emb = rng.normal(size=(n_images, embed_dim)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    emb_path = str(tmp_path / f"{prefix}_embeddings.{fmt}")
    save_embeddings(emb_path, filenames, emb)

    words = ["the", "cat", "dog", "on", "a", "he", "at"]
    anns = []
    ann_id = 0
    for iid in image_ids:
        for c in range(captions_per_image):
            rng.shuffle(words)
            caption = " ".join(words[: 3 + (c % 3)])
            anns.append({"image_id": iid, "id": ann_id, "caption": caption})
            ann_id += 1
    coco = {
        "info": {"description": "synthetic"},
        "licenses": [],
        "images": [
            {"id": iid, "file_name": fn} for iid, fn in zip(image_ids, filenames)
        ],
        "annotations": anns,
    }
    ann_path = str(tmp_path / f"captions_{prefix}.json")
    with open(ann_path, "w") as f:
        json.dump(coco, f)
    return emb_path, ann_path, image_ids
