"""COCO caption dataset + annotation splitting.

Functional parity with the reference's ``src/dataset.py`` (caption-level items
carrying ``token_ids`` / ``labels`` / ``attention_mask`` / ``image_embedding``
/ ``image_id``; image-id parsing from COCO filenames; image-id-level
train/val splitting) — but TPU-first in shape:

- The whole caption set is tokenized **once, up front**, into dense int32
  arrays (the reference re-tokenizes per item in DataLoader workers,
  ``src/dataset.py:181-188``).  Steady-state batching is pure array slicing.
- :class:`Batcher` yields fixed-shape batches (last batch padded + masked by
  a per-example weight), which is what keeps ``jit`` from recompiling.
"""

from __future__ import annotations

import json
import os
import random
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from gpt2_image_captioning_tpu.data.embeddings_io import load_embeddings
from gpt2_image_captioning_tpu.data.tokenizer import GPT2BPETokenizer, load_gpt2_tokenizer

IGNORE_INDEX = -100  # loss ignore marker, same convention as torch CE


def split_coco_annotations(
    annotations_path: str, output_dir: str, split_ratio: float = 0.8, seed: int = 42
) -> None:
    """Split a COCO annotations JSON into train/val **by image id** (an image
    and all its captions stay together; reference ``src/dataset.py:13-78``).
    Writes ``train_split.json`` / ``val_split.json`` in COCO format."""
    with open(annotations_path, "r") as f:
        coco = json.load(f)

    images = coco["images"]
    annotations = coco["annotations"]
    ids = [img["id"] for img in images]
    random.seed(seed)
    random.shuffle(ids)
    cutoff = int(len(ids) * split_ratio)
    train_ids, val_ids = set(ids[:cutoff]), set(ids[cutoff:])
    print(f"Splitting: {len(train_ids)} Train images, {len(val_ids)} Val images.")

    common = {"info": coco.get("info", {}), "licenses": coco.get("licenses", [])}
    os.makedirs(output_dir, exist_ok=True)
    for name, keep in (("train_split.json", train_ids), ("val_split.json", val_ids)):
        subset = {
            **common,
            "images": [im for im in images if im["id"] in keep],
            "annotations": [a for a in annotations if a["image_id"] in keep],
        }
        with open(os.path.join(output_dir, name), "w") as f:
            json.dump(subset, f)
    print(f"Created:\n- {output_dir}/train_split.json\n- {output_dir}/val_split.json")


@dataclass
class CaptionData:
    """One caption entry (multiple captions can share an image)."""

    image_id: int
    embedding_index: int
    caption_text: str


class CocoDataset:
    """Caption-level dataset over precomputed image embeddings.

    Construction mirrors the reference (embeddings ``.pt`` + COCO annotations
    JSON + tokenizer with pad=eos), then immediately materializes the dense
    arrays used by the TPU input pipeline.
    """

    def __init__(
        self,
        embeddings_path: str,
        annotations_path: str,
        tokenizer: GPT2BPETokenizer | None = None,
        max_length: int = 50,
        normalize_embeddings: bool = False,
    ):
        self.tokenizer = tokenizer or load_gpt2_tokenizer()
        self.max_length = max_length
        self.normalize_embeddings = normalize_embeddings

        self.image_filenames, emb = load_embeddings(embeddings_path)
        if normalize_embeddings:
            emb = emb / np.linalg.norm(emb, axis=-1, keepdims=True)
        self.image_embeddings: np.ndarray = emb

        self.image_id_to_index: dict[int, int] = {
            self.get_image_id_from_filename(f): i for i, f in enumerate(self.image_filenames)
        }

        with open(annotations_path, "r") as f:
            coco = json.load(f)
        missing = {
            a["image_id"] for a in coco["annotations"]
            if a["image_id"] not in self.image_id_to_index
        }
        if missing:
            sample = sorted(missing)[:5]
            raise KeyError(
                f"{len(missing)} annotation image ids have no embedding in "
                f"{embeddings_path} (e.g. {sample}) — did you extract embeddings "
                "for this split's image directory?"
            )
        self.captions: list[CaptionData] = [
            CaptionData(
                image_id=a["image_id"],
                embedding_index=self.image_id_to_index[a["image_id"]],
                caption_text=a["caption"],
            )
            for a in coco["annotations"]
        ]
        print(
            f"Dataset ready: {len(self.image_filenames)} images, {len(self.captions)} captions."
        )
        self._materialize()

    @staticmethod
    def get_image_id_from_filename(filename: str) -> int:
        """'COCO_train2014_000000123456.jpg' → 123456 (also plain
        '000000123456.jpg'); reference ``src/dataset.py:155-167``."""
        return int(filename.split("_")[-1].split(".")[0])

    def _materialize(self) -> None:
        """Tokenize every caption once into dense (N, L) arrays."""
        texts = [c.caption_text + self.tokenizer.eos_token for c in self.captions]
        enc = self.tokenizer(
            texts, max_length=self.max_length, padding="max_length", truncation=True
        )
        self.token_ids: np.ndarray = enc["input_ids"].astype(np.int32)
        self.attention_mask: np.ndarray = enc["attention_mask"].astype(np.int32)
        labels = self.token_ids.astype(np.int32).copy()
        labels[self.attention_mask == 0] = IGNORE_INDEX
        self.labels: np.ndarray = labels
        self.embedding_indices: np.ndarray = np.array(
            [c.embedding_index for c in self.captions], dtype=np.int32
        )
        self.image_ids: np.ndarray = np.array(
            [c.image_id for c in self.captions], dtype=np.int64
        )

    # -- reference-style item access (tests, small-scale use) ----------------
    def __len__(self) -> int:
        return len(self.captions)

    def __getitem__(self, idx: int) -> dict:
        c = self.captions[idx]
        return {
            "token_ids": self.token_ids[idx],
            "labels": self.labels[idx],
            "image_embedding": self.image_embeddings[c.embedding_index],
            "attention_mask": self.attention_mask[idx],
            "caption_text": c.caption_text,
            "image_id": c.image_id,
        }

    # -- dense batch construction --------------------------------------------
    def gather_batch(self, idx: np.ndarray) -> dict[str, np.ndarray]:
        return {
            "token_ids": self.token_ids[idx],
            "labels": self.labels[idx],
            "attention_mask": self.attention_mask[idx],
            "image_embedding": self.image_embeddings[self.embedding_indices[idx]],
            "image_id": self.image_ids[idx],
        }

    def unique_image_batches(self, batch_size: int) -> Iterator[dict[str, np.ndarray]]:
        """Batches over *unique images* (for generation/eval: the reference
        iterates caption-level and dedups first-seen, ``src/eval.py:219-224``;
        we dedup up front — identical output set, ~5x less decode work).
        Final batch is padded to full size with ``valid`` marking real rows."""
        seen: set[int] = set()
        order: list[int] = []
        for i, c in enumerate(self.captions):
            if c.image_id not in seen:
                seen.add(c.image_id)
                order.append(i)
        idx = np.array(order, dtype=np.int64)
        for start in range(0, len(idx), batch_size):
            chunk = idx[start : start + batch_size]
            valid = np.ones(batch_size, dtype=bool)
            if len(chunk) < batch_size:
                valid[len(chunk) :] = False
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], batch_size - len(chunk))])
            batch = {
                "image_embedding": self.image_embeddings[self.embedding_indices[chunk]],
                "image_id": self.image_ids[chunk],
                "valid": valid,
            }
            yield batch


class Batcher:
    """Shuffled fixed-shape training batches with pad-and-mask semantics.

    Every epoch covers all captions exactly once (like the reference's
    ``DataLoader(shuffle=True)``); the final partial batch is padded to
    ``batch_size`` and padded rows get ``example_weight`` 0 by setting their
    labels to IGNORE_INDEX, so the loss exactly equals the reference's.
    """

    def __init__(
        self,
        dataset: CocoDataset,
        batch_size: int,
        seed: int = 0,
        process_index: int | None = None,
        process_count: int | None = None,
    ):
        """``batch_size`` is GLOBAL.  Under multi-process (multi-host) JAX,
        pass ``process_index``/``process_count`` and each host yields only its
        contiguous shard of every batch — the per-epoch permutation is a pure
        function of (seed, epoch), so all hosts agree on the global order
        (feed shards to ``jax.make_array_from_process_local_data``)."""
        self.ds = dataset
        self.batch_size = batch_size
        self.seed = seed
        self.process_index = process_index or 0
        self.process_count = process_count or 1
        if batch_size % self.process_count != 0:
            raise ValueError(
                f"global batch {batch_size} not divisible by process_count {self.process_count}"
            )
        self._fallback_epoch = 0

    @property
    def steps_per_epoch(self) -> int:
        return -(-len(self.ds) // self.batch_size)

    def epoch(self, epoch_idx: int | None = None) -> Iterator[dict[str, np.ndarray]]:
        # per-epoch shuffle is a pure function of (seed, epoch) so that
        # mid-training resume replays the identical data order
        if epoch_idx is None:
            epoch_idx = self._fallback_epoch
            self._fallback_epoch += 1
        perm = np.random.default_rng([self.seed, epoch_idx]).permutation(len(self.ds))
        bs = self.batch_size
        for start in range(0, len(perm), bs):
            idx = perm[start : start + bs]
            n_real = len(idx)
            if n_real < bs:
                idx = np.concatenate([idx, np.repeat(idx[-1:], bs - n_real)])
            shard = self.batch_size // self.process_count
            lo = self.process_index * shard
            local_idx = idx[lo : lo + shard]
            batch = self.ds.gather_batch(local_idx)
            pad_start = max(0, n_real - lo)
            if pad_start < shard:
                batch["labels"] = batch["labels"].copy()
                batch["labels"][pad_start:] = IGNORE_INDEX
            yield batch
