"""On-device exact retrieval: the TPU-native vector store for RAT.

The reference bounces every training step through host FAISS/ObjectBox
(device→numpy→C++→device round trip, reference ``src/models.py:655-715``).
On TPU the whole corpus fits in HBM (COCO train2017: 118k×512 f32 ≈ 240 MB),
so exact retrieval is a single MXU matmul + ``lax.top_k`` **inside the jitted
train step** — no host boundary, exact (recall 1.0) instead of approximate.

Matches the reference stores' semantics:

- image search with self-match filtering (cosine > 0.9999 ⇒ the query image
  itself, excluded — ``faiss_store.py:132-185``),
- caption fetch walks the top-i images *in order*, concatenating their
  captions until ``top_k``, zero-padding when fewer exist
  (``faiss_store.py:188-251``).

Host-facing API (``retrieve_images_by_vector_similarity`` /
``get_caption_embeddings``) mirrors the FAISS store module so the two
backends are interchangeable.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

SELF_MATCH_THRESHOLD = 0.9999


class DeviceVectorStore:
    """Image + caption embedding matrices resident on device, plus the
    padded caption-index table that makes caption gathering one XLA gather."""

    def __init__(
        self,
        image_filenames: list[str],
        image_embeddings: np.ndarray,  # (N, D) L2-normalized
        caption_embeddings: np.ndarray,  # (M, Dc)
        caption_ids: np.ndarray,  # (M,)
        image_caption_table: np.ndarray,  # (N, C_max) int32 indices into captions, -1 pad
    ):
        self.image_filenames = list(image_filenames)
        self.filename_to_index = {f: i for i, f in enumerate(self.image_filenames)}
        self.image_embeddings = jnp.asarray(image_embeddings, jnp.float32)
        self.caption_embeddings = jnp.asarray(caption_embeddings, jnp.float32)
        self.caption_ids = np.asarray(caption_ids)
        self.caption_table = jnp.asarray(image_caption_table, jnp.int32)

    # -- construction --------------------------------------------------------
    @classmethod
    def build(
        cls,
        image_filenames: Sequence[str],
        image_embeddings: np.ndarray,
        caption_entries: Sequence[dict[str, Any]],
    ) -> "DeviceVectorStore":
        """``caption_entries`` is the grouped word-embeddings artifact:
        ``[{"filenames": fname, "embeddings": [{"caption_id", "embedding"}]}]``
        (the interchange format of ``embeddings/word_embeddings.py``)."""
        fname_to_img = {f: i for i, f in enumerate(image_filenames)}
        cap_vecs: list[np.ndarray] = []
        cap_ids: list[int] = []
        per_image: dict[int, list[int]] = {i: [] for i in range(len(image_filenames))}
        for item in caption_entries:
            img = fname_to_img.get(item["filenames"])
            if img is None:
                continue
            for e in item["embeddings"]:
                vec = e["embedding"]
                if hasattr(vec, "numpy"):
                    vec = vec.float().numpy()
                per_image[img].append(len(cap_vecs))
                cap_vecs.append(np.asarray(vec, np.float32))
                cap_ids.append(int(e["caption_id"]))
        c_max = max((len(v) for v in per_image.values()), default=1) or 1
        table = np.full((len(image_filenames), c_max), -1, np.int32)
        for img, idxs in per_image.items():
            table[img, : len(idxs)] = idxs
        cap_matrix = (
            np.stack(cap_vecs) if cap_vecs else np.zeros((1, image_embeddings.shape[1]), np.float32)
        )
        return cls(list(image_filenames), np.asarray(image_embeddings, np.float32),
                   cap_matrix, np.asarray(cap_ids, np.int64), table)

    # -- fused on-device retrieval (used inside jitted steps) ----------------
    def retrieve_fused(
        self, queries: jnp.ndarray, top_i: int, top_k: int
    ) -> jnp.ndarray:
        """(B, D) queries → (B, top_k, Dc) caption embeddings, all in XLA."""
        return fused_retrieve(
            queries, self.image_embeddings, self.caption_embeddings, self.caption_table,
            top_i=top_i, top_k=top_k,
        )

    # -- host-facing API (FAISS-store parity) --------------------------------
    def search_images(self, query_vectors: np.ndarray, top_i: int):
        sims, idx = _topk_images(
            jnp.asarray(query_vectors, jnp.float32), self.image_embeddings, top_i
        )
        return np.asarray(sims), np.asarray(idx)


@functools.partial(jax.jit, static_argnames=("top_i",))
def _topk_images(queries, image_embeddings, top_i: int):
    sims = jnp.dot(queries, image_embeddings.T, preferred_element_type=jnp.float32)
    sims = jnp.where(sims > SELF_MATCH_THRESHOLD, -jnp.inf, sims)  # drop self
    return jax.lax.top_k(sims, top_i)


@functools.partial(jax.jit, static_argnames=("top_i", "top_k"))
def fused_retrieve(
    queries: jnp.ndarray,
    image_embeddings: jnp.ndarray,
    caption_embeddings: jnp.ndarray,
    caption_table: jnp.ndarray,
    *,
    top_i: int,
    top_k: int,
) -> jnp.ndarray:
    """Exact top-i image search + ordered caption gather, one XLA program."""
    b = queries.shape[0]
    sims = jnp.dot(
        queries.astype(jnp.float32), image_embeddings.T, preferred_element_type=jnp.float32
    )
    sims = jnp.where(sims > SELF_MATCH_THRESHOLD, -jnp.inf, sims)
    _, img_idx = jax.lax.top_k(sims, top_i)  # (B, I)

    cap_rows = caption_table[img_idx]  # (B, I, C_max)
    flat = cap_rows.reshape(b, -1)  # image order preserved, -1 padding interleaved
    valid = flat >= 0
    # stable sort by invalidity keeps the reference's "walk images in order,
    # take captions until top_k" semantics while packing valid entries first
    order = jnp.argsort(jnp.logical_not(valid), axis=-1, stable=True)
    packed = jnp.take_along_axis(flat, order[:, :top_k], axis=-1)  # (B, K)
    packed_valid = jnp.take_along_axis(valid, order[:, :top_k], axis=-1)
    emb = caption_embeddings[jnp.clip(packed, 0, None)]  # (B, K, Dc)
    return jnp.where(packed_valid[..., None], emb, 0.0)  # zero-pad like the reference


# ---------------------------------------------------------------------------
# Host-facing module API (signature parity with the FAISS-store functions)
# ---------------------------------------------------------------------------

def retrieve_images_by_vector_similarity(
    store: DeviceVectorStore, query_vectors: np.ndarray, top_i: int
) -> list[list[tuple[str, float]]]:
    """Batched image search → per-query ``[(filename, score), ...]``."""
    sims, idx = store.search_images(query_vectors, top_i)
    out = []
    for row_sims, row_idx in zip(sims, idx):
        out.append(
            [
                (store.image_filenames[int(i)], float(s))
                for s, i in zip(row_sims, row_idx)
                if np.isfinite(s)
            ]
        )
    return out


def get_caption_embeddings(
    store: DeviceVectorStore,
    top_k: int,
    batch_filenames: list[list[str]],
    embed_dim: int = 512,
) -> np.ndarray:
    """Caption embeddings for retrieved images, zero-padded to ``top_k``."""
    out = np.zeros((len(batch_filenames), top_k, store.caption_embeddings.shape[1]), np.float32)
    cap_matrix = np.asarray(store.caption_embeddings)
    table = np.asarray(store.caption_table)
    for b, filenames in enumerate(batch_filenames):
        k = 0
        for fname in filenames:
            img = store.filename_to_index.get(fname)
            if img is None:
                continue
            for cap_idx in table[img]:
                if cap_idx < 0 or k >= top_k:
                    break
                out[b, k] = cap_matrix[cap_idx]
                k += 1
            if k >= top_k:
                break
    return out
