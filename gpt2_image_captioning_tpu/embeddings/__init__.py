from gpt2_image_captioning_tpu.embeddings.extract import (  # noqa: F401
    extract_clip_embeddings,
    extract_dino_embeddings,
    extract_vit_embeddings,
)
