#!/usr/bin/env bash
# Fetch the public tokenizer assets and pretrained checkpoints this framework
# builds on.  Run on a machine WITH network access; the build/test environment
# itself is offline (weight porting is exercised against randomly initialized
# models there).
#
# Layout produced:
#   assets/gpt2/{vocab.json,merges.txt}            - GPT-2 BPE tokenizer
#   assets/clip/{vocab.json,merges.txt}            - CLIP BPE tokenizer
#   assets/checkpoints/gpt2.safetensors            - GPT-2 124M LM weights
#   assets/checkpoints/clip-vit-base-patch32.safetensors
#   assets/checkpoints/vit-base-patch16-224.safetensors
#   assets/checkpoints/dinov3_vitl16_dinotxt.pth   - (license-gated; manual)
set -euo pipefail

mkdir -p assets/gpt2 assets/clip assets/checkpoints

HF=https://huggingface.co

echo "== GPT-2 tokenizer =="
curl -fL "$HF/gpt2/resolve/main/vocab.json"  -o assets/gpt2/vocab.json
curl -fL "$HF/gpt2/resolve/main/merges.txt"  -o assets/gpt2/merges.txt

echo "== CLIP tokenizer =="
curl -fL "$HF/openai/clip-vit-base-patch32/resolve/main/vocab.json" -o assets/clip/vocab.json
curl -fL "$HF/openai/clip-vit-base-patch32/resolve/main/merges.txt" -o assets/clip/merges.txt

echo "== GPT-2 124M weights =="
curl -fL "$HF/gpt2/resolve/main/model.safetensors" \
     -o assets/checkpoints/gpt2.safetensors

echo "== CLIP ViT-B/32 weights =="
curl -fL "$HF/openai/clip-vit-base-patch32/resolve/main/model.safetensors" \
     -o assets/checkpoints/clip-vit-base-patch32.safetensors

echo "== ViT-base-patch16-224 weights =="
curl -fL "$HF/google/vit-base-patch16-224/resolve/main/model.safetensors" \
     -o assets/checkpoints/vit-base-patch16-224.safetensors

cat <<'EOF'

== DINOv3 (manual step) ==
The DINOv3 ViT-L/16 + dino.txt checkpoint is license-gated; request access at
https://github.com/facebookresearch/dinov3 and place the weights at
  assets/checkpoints/dinov3_vitl16_dinotxt.pth
Port with gpt2_image_captioning_tpu.models.porting.port_dinov3_backbone /
port_dinotxt_head.

Done.
EOF
