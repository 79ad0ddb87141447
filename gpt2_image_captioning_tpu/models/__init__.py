from gpt2_image_captioning_tpu.models.gpt2 import GPT2Config  # noqa: F401
from gpt2_image_captioning_tpu.models.mapping import (  # noqa: F401
    MLPMappingConfig,
    TransformerMappingConfig,
)
from gpt2_image_captioning_tpu.models.captioner import ImageCaptioningModel  # noqa: F401
