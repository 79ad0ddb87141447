"""RAT training pipeline: config → vector store → retrieval-augmented train.

The path the sweep/driver takes when ``retrieval_augmentation: true``
(reference ``sweep.py:116-141``): build a vector store from the extracted
image + caption embeddings, wrap the captioner in the aggregator, and run
``train_rat``.  Store backend by ``retrieval.backend``:

- ``device`` (default) — on-device exact top-k fused into the train step,
- ``hnsw`` / ``flat`` — the first-party C++ index via the host API,
- ``persistent`` — the mmap-backed persistent store (ObjectBox-parity).
"""

from __future__ import annotations

import os

from gpt2_image_captioning_tpu.data.embeddings_io import load_embeddings
from gpt2_image_captioning_tpu.models.rat import RATConfig


def load_caption_entries(path: str):
    """Load the grouped caption-embeddings artifact (.pt list)."""
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)


def build_store(cfg, backend: str | None = None):
    """``config.yml`` paths → a vector store of the requested backend."""
    from gpt2_image_captioning_tpu.training_pipeline import embeddings_file

    backend = backend or cfg.retrieval.get("backend", "device")
    image_path = embeddings_file(cfg, "train")
    caption_path = os.path.join(
        cfg.paths.embeddings_path, f"train_{cfg.vision_encoder}_caption_embeddings.pt"
    )
    filenames, image_emb = load_embeddings(image_path)
    caption_entries = load_caption_entries(caption_path)

    if backend == "device":
        from gpt2_image_captioning_tpu.retrieval.exact import DeviceVectorStore

        return DeviceVectorStore.build(filenames, image_emb, caption_entries)
    if backend in ("hnsw", "flat"):
        from gpt2_image_captioning_tpu.retrieval.store import create_store

        return create_store(filenames, image_emb, caption_entries, backend=backend)
    if backend == "persistent":
        from gpt2_image_captioning_tpu.retrieval.store import create_persistent_store

        return create_persistent_store(
            cfg.paths.vector_db_path, filenames, image_emb, caption_entries
        )
    raise ValueError(f"Unknown retrieval backend: {backend!r}")


def run_rat_training(cfg, model, train_ds, val_ds, mesh, save_dir: str):
    """Called by training_pipeline.run for retrieval_augmentation configs."""
    from gpt2_image_captioning_tpu.models.rat import RetrievalAugmentedTransformer
    from gpt2_image_captioning_tpu.train.loop import train_rat

    rcfg = RATConfig(
        embed_dim=cfg.retrieval.embed_dim,
        aggregation_type=cfg.retrieval.get("aggregation_type", "mean"),
        top_k=cfg.retrieval.top_k,
        top_i=cfg.retrieval.top_i,
    )
    # upgrade the plain captioner façade into the RAT wrapper, reusing params
    rat_model = RetrievalAugmentedTransformer.__new__(RetrievalAugmentedTransformer)
    rat_model.__dict__.update(model.__dict__)
    rat_model.rcfg = rcfg
    from gpt2_image_captioning_tpu.models.rat import init_aggregator
    import jax

    agg = init_aggregator(jax.random.PRNGKey(cfg.get("seed", 42) + 1), rcfg)
    if agg:
        rat_model.trainable["aggregator"] = agg

    store = build_store(cfg)
    return train_rat(
        train_ds,
        rat_model,
        store,
        top_k=rcfg.top_k,
        top_i=rcfg.top_i,
        batch_size=cfg.training.batch_size,
        num_epochs=cfg.training.num_epochs,
        learning_rate=cfg.training.learning_rate,
        num_warmup_steps=cfg.training.num_warmup_steps,
        save_every_epoch=cfg.training.save_every_epoch,
        outputs_dir=save_dir,
        val_dataset=val_ds,
        val_annotations_path=os.path.join(
            cfg.paths.annotations_path, "captions_val2017.json"
        ),
        eval_every_epoch=cfg.validation.eval_every_epoch,
        eval_batch_size=cfg.validation.batch_size,
        eval_max_length=cfg.max_caption_length,
        eval_temperature=cfg.validation.temperature,
        eval_top_p=cfg.validation.top_p,
        mesh=mesh,
        seed=cfg.get("seed", 42),
    )
