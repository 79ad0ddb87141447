from gpt2_image_captioning_tpu.train.optim import AdamWConfig, linear_warmup_schedule  # noqa: F401
from gpt2_image_captioning_tpu.train import checkpoint  # noqa: F401
