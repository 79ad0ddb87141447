"""Fine-tune the prefix captioner on COCO — the role of the reference's
``notebooks/train.ipynb`` as a script.  Everything is driven by config.yml;
this is equivalent to ``python -m gpt2_image_captioning_tpu.training_pipeline``.

Loads pretrained GPT-2 weights from the downloaded safetensors; prints
per-epoch loss + COCO metrics and writes checkpoints/eval artifacts.
"""

from safetensors.numpy import load_file

from gpt2_image_captioning_tpu.core.config import load_config
from gpt2_image_captioning_tpu.models.gpt2 import GPT2Config
from gpt2_image_captioning_tpu.models.porting import port_gpt2
from gpt2_image_captioning_tpu.training_pipeline import run

cfg = load_config("config.yml")
gpt_params = port_gpt2(load_file("assets/checkpoints/gpt2.safetensors"), GPT2Config.gpt2_124m())
history = run(cfg, gpt_params=gpt_params)
print("best CIDEr:", history["best_val_cider"], "at epoch", history["best_epoch"])
