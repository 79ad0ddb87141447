"""Evaluate a trained checkpoint on the held-out split and dump COCO-format
``results.json`` — the role of the reference's ``notebooks/eval.ipynb`` +
``src/test.py``.
"""

from safetensors.numpy import load_file

from gpt2_image_captioning_tpu.core.config import load_config
from gpt2_image_captioning_tpu.data.dataset import CocoDataset
from gpt2_image_captioning_tpu.data.tokenizer import load_gpt2_tokenizer
from gpt2_image_captioning_tpu.evaluation.evaluate import evaluate_captions
from gpt2_image_captioning_tpu.evaluation.generation import generate_test_caption_predictions
from gpt2_image_captioning_tpu.models.gpt2 import GPT2Config
from gpt2_image_captioning_tpu.models.porting import port_gpt2
from gpt2_image_captioning_tpu.training_pipeline import build_model, embeddings_file

cfg = load_config("config.yml")
tokenizer = load_gpt2_tokenizer()
gpt_params = port_gpt2(load_file("assets/checkpoints/gpt2.safetensors"), GPT2Config.gpt2_124m())
model = build_model(cfg, tokenizer, gpt_params=gpt_params)
model.load_saved_parameters("coco_data/checkpoints/best_model_epoch_3.npz")

test_ds = CocoDataset(
    embeddings_file(cfg, "test"),
    "coco_data/annotations/captions_val2014.json",
    tokenizer=tokenizer,
    max_length=cfg.max_caption_length,
)
predictions = generate_test_caption_predictions(
    model, test_ds, output_path="results.json",
    batch_size=cfg.validation.batch_size,
    temperature=cfg.validation.temperature, top_p=cfg.validation.top_p,
)
print(evaluate_captions(predictions, "coco_data/annotations/captions_val2014.json"))
