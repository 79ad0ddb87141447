from gpt2_image_captioning_tpu.ops import nn  # noqa: F401
