"""Serve image → caption over HTTP with the end-to-end pipeline: C++/PIL
decode + CLIP encode + fused GPT-2 decode per request, one compiled program
per stage (``serving.py``).  A capability the reference lacks (its flow stops
at offline scripts).

  curl -X POST --data-binary @photo.jpg http://localhost:5152/caption
"""

from safetensors.numpy import load_file

from gpt2_image_captioning_tpu.core.config import load_config
from gpt2_image_captioning_tpu.data.tokenizer import load_gpt2_tokenizer
from gpt2_image_captioning_tpu.models.clip import CLIPVisionConfig
from gpt2_image_captioning_tpu.models.gpt2 import GPT2Config
from gpt2_image_captioning_tpu.models.porting import port_clip_vision, port_gpt2
from gpt2_image_captioning_tpu.serving import CaptionService, serve_http
from gpt2_image_captioning_tpu.training_pipeline import build_model

cfg = load_config("config.yml")
tokenizer = load_gpt2_tokenizer()
gpt_params = port_gpt2(
    load_file("assets/checkpoints/gpt2.safetensors"), GPT2Config.gpt2_124m()
)
model = build_model(cfg, tokenizer, gpt_params=gpt_params)
model.load_saved_parameters("coco_data/checkpoints/best_model_epoch_3.npz")

vcfg = CLIPVisionConfig.vit_b32()
vparams = port_clip_vision(
    load_file("assets/checkpoints/clip_vit_b32.safetensors"), vcfg
)

service = CaptionService(
    model, vparams, vcfg, encoder="clip", batch_size=64,
    temperature=cfg.validation.temperature, top_p=cfg.validation.top_p,
    decode_precision="bf16",  # or "int8" for max throughput
)
server = serve_http(service, port=5152)
print("captioning at http://localhost:5152/caption  (POST image bytes)")
server.serve_forever()

# Alternative: rolling admission — a fixed pool of decode rows stays live
# across requests and each freed row admits the next queued request
# mid-flight, all inside ONE on-device macro-step program (greedy or
# sampled; see models/continuous.py and docs/PERF_NOTES.md for when this
# beats fixed batches):
#
#   from gpt2_image_captioning_tpu.serving import (
#       ContinuousCaptionService, serve_http_continuous,
#   )
#   service = ContinuousCaptionService(
#       model, vparams, vcfg, encoder="clip", slots=128, segment=4,
#       bursts=8, max_length=50, decode_precision="bf16",
#       per_request_sampling=True,   # every request may carry its own
#       sample_in_kernel=True,       # temperature/top_p (0 = greedy);
#   )                                # in-kernel draw: +16% sampled
#                                    # throughput, needs top_p >= 0.5
#   ids = [service.submit_array(img) for img in images]   # or submit_embedding
#   ids += [service.submit_array(img, temperature=0.9, top_p=0.8)]
#   service.drain()
#   captions = [service.pop_result(i) for i in ids]
#
#   # Sustained-load sizing: keep queued+live at or above
#   # service.recommended_inflight() — an under-populated pool equilibrates
#   # at partial occupancy with no restoring force (watch
#   # service.stats["occupancy"]; docs/SERVING.md "Population sizing")
#
#   # or over HTTP — each request completes at its own length:
#   server = serve_http_continuous(service, port=5152)
#   # POST /caption?max_length=20&temperature=0.9&top_p=0.8
#   server.serve_forever()
