"""Retrieval-augmented training — the role of the reference's
``notebooks/train_rat.ipynb``:

1. CLIP-text-encode every training caption (word embeddings artifact),
2. build the on-device exact vector store (or the C++ HNSW store),
3. train with retrieval fused into the step.
"""

from safetensors.numpy import load_file

from gpt2_image_captioning_tpu.core.config import load_config, update_cfg
from gpt2_image_captioning_tpu.data.tokenizer import load_clip_tokenizer
from gpt2_image_captioning_tpu.embeddings.word_embeddings import extract_caption_embeddings
from gpt2_image_captioning_tpu.models import clip as CL
from gpt2_image_captioning_tpu.models.porting import port_clip_text
from gpt2_image_captioning_tpu.training_pipeline import run

# 1. caption text embeddings (reference: notebooks feeding the vector DB)
text_cfg = CL.CLIPTextConfig()
text_params = port_clip_text(
    load_file("assets/checkpoints/clip-vit-base-patch32.safetensors"), text_cfg
)
extract_caption_embeddings(
    "coco_data/annotations/captions_train2017.json",
    "coco_data/embeddings/train_clip_caption_embeddings.pt",
    text_params,
    text_cfg,
    load_clip_tokenizer(),
)

# 2+3. RAT training (store backend from config: device | hnsw | persistent)
cfg = update_cfg(load_config("config.yml"), {"retrieval_augmentation": True})
history = run(cfg)
print("best CIDEr:", history["best_val_cider"])
