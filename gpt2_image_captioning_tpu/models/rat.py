"""Retrieval-Augmented Training (RAT): aggregator + augmented captioner.

Capability parity with the reference's ``RetrievalAggregator`` /
``RetrievalAugmentedTransformer`` (``src/models.py:550-785``): pool the
top-k retrieved caption embeddings (mean / max / sum_norm / learnable
attention) and fuse with the query image embedding by addition, then run the
standard captioner.

TPU-first difference: with a :class:`DeviceVectorStore` the retrieval itself
is *inside* the jitted step (``rat.loss_fn_fused``), so a RAT training step
has zero host round trips — versus the reference's per-step
device→numpy→FAISS→device bounce (``src/models.py:655-715``).  A host-store
path (``augment_batch``) with the same numerics exists for the persistent
C++ HNSW store.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.ops import nn

AggregationType = Literal["mean", "max", "sum_norm", "attention"]


@dataclasses.dataclass(frozen=True)
class RATConfig:
    embed_dim: int = 512
    aggregation_type: str = "mean"
    top_k: int = 10
    top_i: int = 4


# ---------------------------------------------------------------------------
# Aggregator
# ---------------------------------------------------------------------------

def init_aggregator(rng: jax.Array, cfg: RATConfig) -> dict:
    """Only the 'attention' variant has parameters (Linear(embed_dim → 1))."""
    if cfg.aggregation_type == "attention":
        return {"attention_proj": nn.dense_init(rng, cfg.embed_dim, 1, std=None)}
    return {}


def aggregate(
    params: dict,
    cfg: RATConfig,
    query_embedding: jnp.ndarray,  # (B, D)
    retrieved_embeddings: jnp.ndarray,  # (B, K, D)
    policy: Policy = F32,
) -> jnp.ndarray:
    """Pool retrieved embeddings and fuse with the query by addition
    (reference ``src/models.py:578-625``)."""
    kind = cfg.aggregation_type
    r = retrieved_embeddings.astype(jnp.float32)
    if kind == "mean":
        agg = r.mean(axis=1)
    elif kind == "max":
        agg = r.max(axis=1)
    elif kind == "sum_norm":
        norms = jnp.linalg.norm(r, axis=2, keepdims=True)
        normalized = r / jnp.maximum(norms, 1e-12)
        summed = normalized.sum(axis=1)
        agg = summed / jnp.maximum(jnp.linalg.norm(summed, axis=1, keepdims=True), 1e-12)
    elif kind == "attention":
        scores = nn.dense(params["attention_proj"], r, policy).astype(jnp.float32)  # (B, K, 1)
        weights = jax.nn.softmax(scores, axis=1)
        agg = (r * weights).sum(axis=1)
    else:
        raise ValueError(f"Unknown aggregation_type: {kind}")
    return (query_embedding.astype(jnp.float32) + agg).astype(query_embedding.dtype)


# ---------------------------------------------------------------------------
# Parameter plumbing: RAT adds an "aggregator" branch to the trainable tree
# ---------------------------------------------------------------------------

def init_params(
    rng: jax.Array, ccfg: C.CaptionerConfig, rcfg: RATConfig, gpt_params: dict | None = None
) -> tuple[dict, dict]:
    k1, k2 = jax.random.split(rng)
    trainable, frozen = C.init_params(k1, ccfg, gpt_params)
    agg = init_aggregator(k2, rcfg)
    if agg:
        trainable["aggregator"] = agg
    return trainable, frozen


def partition_specs(ccfg: C.CaptionerConfig, rcfg: RATConfig) -> tuple[dict, dict]:
    from jax.sharding import PartitionSpec as P

    trainable, frozen = C.partition_specs(ccfg)
    if rcfg.aggregation_type == "attention":
        trainable["aggregator"] = {"attention_proj": {"w": P(), "b": P()}}
    return trainable, frozen


# ---------------------------------------------------------------------------
# Loss / generation
# ---------------------------------------------------------------------------

def _augmented(trainable, rcfg, image_embeddings, retrieved, policy):
    return aggregate(
        trainable.get("aggregator", {}), rcfg, image_embeddings, retrieved, policy
    )


def loss_fn(
    trainable: dict,
    frozen: dict,
    ccfg: C.CaptionerConfig,
    rcfg: RATConfig,
    batch: dict,
    policy: Policy = F32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Host-store path: ``batch['retrieved_embeddings']`` (B, K, D) provided."""
    aug = _augmented(trainable, rcfg, batch["image_embedding"], batch["retrieved_embeddings"], policy)
    return C.loss_fn(trainable, frozen, ccfg, dict(batch, image_embedding=aug), policy)


def loss_fn_fused(
    trainable: dict,
    frozen: dict,
    ccfg: C.CaptionerConfig,
    rcfg: RATConfig,
    batch: dict,
    store_arrays: dict,
    policy: Policy = F32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused path: exact retrieval inside the jitted step.

    ``store_arrays``: {"image_embeddings", "caption_embeddings",
    "caption_table"} device arrays from a DeviceVectorStore.
    """
    from gpt2_image_captioning_tpu.retrieval.exact import fused_retrieve

    retrieved = fused_retrieve(
        batch["image_embedding"].astype(jnp.float32),
        store_arrays["image_embeddings"],
        store_arrays["caption_embeddings"],
        store_arrays["caption_table"],
        top_i=rcfg.top_i,
        top_k=rcfg.top_k,
    )
    aug = _augmented(trainable, rcfg, batch["image_embedding"], retrieved, policy)
    return C.loss_fn(trainable, frozen, ccfg, dict(batch, image_embedding=aug), policy)


def augment_batch(
    trainable: dict,
    rcfg: RATConfig,
    db_store,
    image_embeddings: np.ndarray,
    policy: Policy = F32,
) -> jnp.ndarray:
    """Host-store retrieval (FAISS-parity API) → augmented embeddings.

    Works with any store exposing ``retrieve_images_by_vector_similarity`` +
    ``get_caption_embeddings`` module semantics (DeviceVectorStore, the C++
    HNSW store, or the persistent store).
    """
    from gpt2_image_captioning_tpu.retrieval import exact as device_backend

    if isinstance(db_store, device_backend.DeviceVectorStore):
        retrieved = np.asarray(
            db_store.retrieve_fused(jnp.asarray(image_embeddings), rcfg.top_i, rcfg.top_k)
        )
    else:
        results = db_store.retrieve_images_by_vector_similarity(
            np.asarray(image_embeddings, np.float32), rcfg.top_i
        )
        filenames = [[f for f, _ in row] for row in results]
        retrieved = db_store.get_caption_embeddings(rcfg.top_k, filenames)
    return _augmented(
        trainable, rcfg, jnp.asarray(image_embeddings), jnp.asarray(retrieved), policy
    )


class RetrievalAugmentedTransformer(C.ImageCaptioningModel):
    """API-parity wrapper: captioner + aggregator + store-driven augment."""

    def __init__(self, rcfg: RATConfig, *args, rng: jax.Array | None = None, **kwargs):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        super().__init__(*args, rng=rng, **kwargs)
        self.rcfg = rcfg
        agg = init_aggregator(jax.random.fold_in(rng, 1), rcfg)
        if agg:
            self.trainable["aggregator"] = agg

    def generate(
        self,
        image_embeddings,
        db_store=None,
        top_k: int | None = None,
        top_i: int | None = None,
        **kw,
    ):
        if db_store is not None:
            rcfg = dataclasses.replace(
                self.rcfg, top_k=top_k or self.rcfg.top_k, top_i=top_i or self.rcfg.top_i
            )
            image_embeddings = augment_batch(
                self.trainable, rcfg, db_store, np.asarray(image_embeddings), self.policy
            )
        return super().generate(image_embeddings, **kw)
