from gpt2_image_captioning_tpu.ops import nn  # noqa: F401
from gpt2_image_captioning_tpu.ops import attention  # noqa: F401
from gpt2_image_captioning_tpu.ops import sampling  # noqa: F401
