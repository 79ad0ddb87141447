"""gpt2_image_captioning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A from-scratch rebuild of the capabilities of the PyTorch reference
``thenoobychocobo/gpt2-image-captioning`` (see SURVEY.md at the repo root):

- Vision-encoder embedding extraction (CLIP ViT-B/32, HF ViT-base, DINOv3+dino.txt)
  as batched, jit-compiled on-device pipelines.
- An embedding-to-prefix mapping network (MLP or Transformer) conditioning a
  GPT-2 (124M) decoder, with KV-cached greedy / top-p / beam decoding compiled
  end-to-end under ``jax.jit``.
- Teacher-forced caption fine-tuning (frozen or unfrozen GPT-2) running
  data-parallel (and optionally tensor-parallel) over a ``jax.sharding.Mesh``.
- Retrieval-augmented training (RAT) backed by a first-party vector store
  (on-device exact top-k, or a persistent C++ HNSW index).
- COCO caption metrics (BLEU-1..4, ROUGE-L, CIDEr) re-implemented to match
  pycocoevalcap, a YAML config/sweep system mirroring the reference's
  ``config.yml`` schema, and the same artifact formats (``.pt`` embedding
  files, ``results.json`` prediction dumps, checkpoint naming).

Public API intentionally mirrors the reference's shapes so a user of the
reference can switch with minimal friction, while every internal is TPU-first.
"""

__version__ = "0.1.0"

from gpt2_image_captioning_tpu.core.config import Config, load_config, update_cfg  # noqa: F401
