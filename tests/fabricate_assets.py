"""Fabricate a full-scale, HF-format asset bundle so the asset-gated test
tier (tests/test_assets.py) can be REHEARSED today, offline.

Everything matches the real artifacts structurally — file names, formats,
key names, shapes, vocab size — with random values where the real assets
have pretrained weights:

- ``gpt2/vocab.json`` + ``gpt2/merges.txt``: a genuine 50,257-token GPT-2
  byte-level BPE table (256 byte symbols + 50,000 synthetic merges +
  ``<|endoftext|>``) in HF's exact file format.
- ``checkpoints/gpt2.safetensors``: the state dict of a randomly
  initialized ``transformers.GPT2LMHeadModel().transformer`` — real key
  names and 124M shapes by construction.
- ``checkpoints/clip-vit-base-patch32.safetensors``: random
  ``transformers.CLIPModel`` state dict (ViT-B/32 dims).
- ``checkpoints/dinov3_vitl16_dinotxt.pth``: hub-structured state dict at
  ViT-L/16 scale (``patch_embed.proj``, ``storage_tokens``, per-block
  ``attn.qkv``/``ls1.gamma``/…, ``visual_head``), reference
  ``src/embeddings/dino.py:19-82``.

The moment real weights land, the same tests run unchanged against them —
this module only de-risks the plumbing (file loading, key mapping, shapes,
end-to-end decode), not the numerics.
"""

from __future__ import annotations

import json
import os


def fabricate_gpt2_vocab(dirpath: str) -> None:
    from gpt2_image_captioning_tpu.data.tokenizer import bytes_to_unicode

    os.makedirs(dirpath, exist_ok=True)
    symbols = [bytes_to_unicode()[i] for i in range(256)]
    merges: list[tuple[str, str]] = []
    for a in symbols:
        for b in symbols:
            merges.append((a, b))
            if len(merges) == 50000:
                break
        if len(merges) == 50000:
            break
    vocab_tokens = symbols + ["".join(m) for m in merges] + ["<|endoftext|>"]
    assert len(vocab_tokens) == 50257
    with open(os.path.join(dirpath, "vocab.json"), "w") as f:
        json.dump({t: i for i, t in enumerate(vocab_tokens)}, f, ensure_ascii=False)
    with open(os.path.join(dirpath, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")


def fabricate_gpt2_ckpt(path: str) -> None:
    import torch
    from safetensors.torch import save_file
    from transformers import GPT2Config, GPT2LMHeadModel

    torch.manual_seed(0)
    model = GPT2LMHeadModel(GPT2Config())  # 124M, real key names/shapes
    sd = {k: v.contiguous() for k, v in model.transformer.state_dict().items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(sd, path)


def fabricate_clip_ckpt(path: str) -> None:
    import torch
    from safetensors.torch import save_file
    from transformers import CLIPConfig, CLIPModel

    torch.manual_seed(0)
    model = CLIPModel(CLIPConfig())  # defaults == ViT-B/32 tower dims
    sd = {k: v.contiguous() for k, v in model.state_dict().items()}
    # safetensors forbids shared storage; clone any aliased tensors
    sd = {k: v.clone() for k, v in sd.items()}
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_file(sd, path)


def fabricate_dinov3_ckpt(path: str) -> None:
    import torch

    from gpt2_image_captioning_tpu.models.dino import DINOv3Config

    cfg = DINOv3Config.vitl16()
    d, m = cfg.hidden_size, cfg.intermediate_size
    g = torch.Generator().manual_seed(0)

    def w(*shape, std=0.02):
        return (torch.randn(*shape, generator=g) * std).float()

    sd: dict = {
        "patch_embed.proj.weight": w(d, 3, cfg.patch_size, cfg.patch_size),
        "patch_embed.proj.bias": torch.zeros(d),
        "cls_token": w(1, 1, d),
        "storage_tokens": w(1, cfg.num_register_tokens, d),
        "norm.weight": torch.ones(d),
        "norm.bias": torch.zeros(d),
        "visual_head.weight": w(cfg.text_embed_dim, 2 * d),
    }
    for i in range(cfg.num_hidden_layers):
        p = f"blocks.{i}"
        sd.update(
            {
                f"{p}.norm1.weight": torch.ones(d),
                f"{p}.norm1.bias": torch.zeros(d),
                f"{p}.attn.qkv.weight": w(3 * d, d),
                f"{p}.attn.qkv.bias": torch.zeros(3 * d),
                f"{p}.attn.proj.weight": w(d, d),
                f"{p}.attn.proj.bias": torch.zeros(d),
                f"{p}.ls1.gamma": torch.full((d,), cfg.layerscale_init),
                f"{p}.norm2.weight": torch.ones(d),
                f"{p}.norm2.bias": torch.zeros(d),
                f"{p}.mlp.fc1.weight": w(m, d),
                f"{p}.mlp.fc1.bias": torch.zeros(m),
                f"{p}.mlp.fc2.weight": w(d, m),
                f"{p}.mlp.fc2.bias": torch.zeros(d),
                f"{p}.ls2.gamma": torch.full((d,), cfg.layerscale_init),
            }
        )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # hub checkpoints wrap the weights under "model" (handled by the test)
    torch.save({"model": sd}, path)


def fabricate_bundle(root: str) -> str:
    """Build the full bundle under ``root`` (idempotent); returns ``root``."""
    fabricate_gpt2_vocab(os.path.join(root, "gpt2"))
    fabricate_gpt2_ckpt(os.path.join(root, "checkpoints", "gpt2.safetensors"))
    fabricate_clip_ckpt(
        os.path.join(root, "checkpoints", "clip-vit-base-patch32.safetensors")
    )
    fabricate_dinov3_ckpt(
        os.path.join(root, "checkpoints", "dinov3_vitl16_dinotxt.pth")
    )
    return root
