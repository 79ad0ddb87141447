from gpt2_image_captioning_tpu.core.config import Config, load_config, update_cfg  # noqa: F401
from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh  # noqa: F401
from gpt2_image_captioning_tpu.core.precision import Policy  # noqa: F401
