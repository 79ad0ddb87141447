"""Checkpoint porting: PyTorch/HF state_dicts → framework param pytrees.

The pretrained weights this stack builds on (GPT-2 124M, CLIP ViT-B/32,
HF ViT-base, DINOv3) are published as torch checkpoints; these converters map
them into our functional pytrees with exact numerics.  Layout rules:

- HF GPT-2 ``Conv1D`` weights are already ``(in, out)`` — copied as-is.
- torch ``nn.Linear`` weights are ``(out, in)`` — transposed.
- LayerNorm ``weight``/``bias`` → ``scale``/``bias``.

Each converter is validated in tests against a randomly-initialized torch
model (logit/feature parity), so a real pretrained checkpoint ports exactly
the same way.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.models.gpt2 import GPT2Config
from gpt2_image_captioning_tpu.models.mapping import (
    MLPMappingConfig,
    TransformerMappingConfig,
)


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    return np.asarray(t, dtype=np.float32)


def _strip_prefix(sd: Mapping[str, object], prefix: str) -> dict[str, object]:
    if any(k.startswith(prefix) for k in sd):
        return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    return dict(sd)


def _ln(sd: Mapping, name: str) -> dict:
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])), "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _linear(sd: Mapping, name: str, transpose: bool) -> dict:
    w = _np(sd[f"{name}.weight"])
    p = {"w": jnp.asarray(w.T if transpose else w)}
    bkey = f"{name}.bias"
    if bkey in sd and sd[bkey] is not None:
        p["b"] = jnp.asarray(_np(sd[bkey]))
    return p


# ---------------------------------------------------------------------------
# GPT-2
# ---------------------------------------------------------------------------

def port_gpt2(state_dict: Mapping[str, object], cfg: GPT2Config) -> dict:
    """HF ``GPT2LMHeadModel``/``GPT2Model`` state_dict → gpt2 params.

    Accepts keys with or without the ``transformer.`` prefix; ``lm_head`` is
    tied to ``wte`` and ignored; the causal-mask buffers (``attn.bias``,
    ``attn.masked_bias``) are dropped.
    """
    from gpt2_image_captioning_tpu.models.gpt2 import stack_blocks

    sd = _strip_prefix(dict(state_dict), "transformer.")
    blocks = []
    for i in range(cfg.n_layer):
        h = f"h.{i}"
        blocks.append(
            {
                "ln_1": _ln(sd, f"{h}.ln_1"),
                "attn": {
                    # HF Conv1D stores (in, out): no transpose
                    "c_attn": _linear(sd, f"{h}.attn.c_attn", transpose=False),
                    "c_proj": _linear(sd, f"{h}.attn.c_proj", transpose=False),
                },
                "ln_2": _ln(sd, f"{h}.ln_2"),
                "mlp": {
                    "c_fc": _linear(sd, f"{h}.mlp.c_fc", transpose=False),
                    "c_proj": _linear(sd, f"{h}.mlp.c_proj", transpose=False),
                },
            }
        )
    return {
        "wte": jnp.asarray(_np(sd["wte.weight"])),
        "wpe": jnp.asarray(_np(sd["wpe.weight"])),
        "ln_f": _ln(sd, "ln_f"),
        # stacked along a leading layer dim for scan-over-layers
        "blocks": stack_blocks(blocks),
    }


def export_gpt2(params: dict) -> dict[str, np.ndarray]:
    """Inverse of :func:`port_gpt2` (HF-keyed numpy state_dict, with
    ``transformer.`` prefix and tied ``lm_head.weight``)."""
    out: dict[str, np.ndarray] = {
        "transformer.wte.weight": np.asarray(params["wte"]),
        "transformer.wpe.weight": np.asarray(params["wpe"]),
        "transformer.ln_f.weight": np.asarray(params["ln_f"]["scale"]),
        "transformer.ln_f.bias": np.asarray(params["ln_f"]["bias"]),
        "lm_head.weight": np.asarray(params["wte"]),
    }
    from gpt2_image_captioning_tpu.models.gpt2 import unstack_blocks

    n_layer = params["blocks"]["ln_1"]["scale"].shape[0]
    for i, bp in enumerate(unstack_blocks(params["blocks"], n_layer)):
        h = f"transformer.h.{i}"
        out[f"{h}.ln_1.weight"] = np.asarray(bp["ln_1"]["scale"])
        out[f"{h}.ln_1.bias"] = np.asarray(bp["ln_1"]["bias"])
        out[f"{h}.attn.c_attn.weight"] = np.asarray(bp["attn"]["c_attn"]["w"])
        out[f"{h}.attn.c_attn.bias"] = np.asarray(bp["attn"]["c_attn"]["b"])
        out[f"{h}.attn.c_proj.weight"] = np.asarray(bp["attn"]["c_proj"]["w"])
        out[f"{h}.attn.c_proj.bias"] = np.asarray(bp["attn"]["c_proj"]["b"])
        out[f"{h}.ln_2.weight"] = np.asarray(bp["ln_2"]["scale"])
        out[f"{h}.ln_2.bias"] = np.asarray(bp["ln_2"]["bias"])
        out[f"{h}.mlp.c_fc.weight"] = np.asarray(bp["mlp"]["c_fc"]["w"])
        out[f"{h}.mlp.c_fc.bias"] = np.asarray(bp["mlp"]["c_fc"]["b"])
        out[f"{h}.mlp.c_proj.weight"] = np.asarray(bp["mlp"]["c_proj"]["w"])
        out[f"{h}.mlp.c_proj.bias"] = np.asarray(bp["mlp"]["c_proj"]["b"])
    return out


# ---------------------------------------------------------------------------
# Mapping networks (reference checkpoints: src/models.py naming)
# ---------------------------------------------------------------------------

def port_mlp_mapping(state_dict: Mapping[str, object], cfg: MLPMappingConfig) -> dict:
    """Reference ``MLPMappingNetwork`` state_dict (``model.0/model.2`` Linear
    layers inside an nn.Sequential) → mlp mapper params."""
    sd = _strip_prefix(dict(state_dict), "mapping_network.")
    return {
        "fc1": _linear(sd, "model.0", transpose=True),
        "fc2": _linear(sd, "model.2", transpose=True),
    }


def port_transformer_mapping(
    state_dict: Mapping[str, object], cfg: TransformerMappingConfig
) -> dict:
    """Reference ``TransformerMappingNetwork`` state_dict → transformer mapper.

    torch naming: ``linear``, ``prefix_const``,
    ``transformer.layers.{i}.self_attn.in_proj_weight/in_proj_bias/out_proj.*``,
    ``linear1/linear2``, ``norm1/norm2``.
    """
    sd = _strip_prefix(dict(state_dict), "mapping_network.")
    params: dict = {
        "linear": _linear(sd, "linear", transpose=True),
        "prefix_const": jnp.asarray(_np(sd["prefix_const"])),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        t = f"transformer.layers.{i}"
        params["layers"].append(
            {
                "ln1": _ln(sd, f"{t}.norm1"),
                "attn": {
                    "in_proj": {
                        "w": jnp.asarray(_np(sd[f"{t}.self_attn.in_proj_weight"]).T),
                        "b": jnp.asarray(_np(sd[f"{t}.self_attn.in_proj_bias"])),
                    },
                    "out_proj": _linear(sd, f"{t}.self_attn.out_proj", transpose=True),
                },
                "ln2": _ln(sd, f"{t}.norm2"),
                "fc1": _linear(sd, f"{t}.linear1", transpose=True),
                "fc2": _linear(sd, f"{t}.linear2", transpose=True),
            }
        )
    return params


def export_mlp_mapping(params: dict, prefix: str = "mapping_network.") -> dict[str, np.ndarray]:
    return {
        f"{prefix}model.0.weight": np.asarray(params["fc1"]["w"]).T,
        f"{prefix}model.0.bias": np.asarray(params["fc1"]["b"]),
        f"{prefix}model.2.weight": np.asarray(params["fc2"]["w"]).T,
        f"{prefix}model.2.bias": np.asarray(params["fc2"]["b"]),
    }


def export_transformer_mapping(
    params: dict, prefix: str = "mapping_network."
) -> dict[str, np.ndarray]:
    out = {
        f"{prefix}linear.weight": np.asarray(params["linear"]["w"]).T,
        f"{prefix}linear.bias": np.asarray(params["linear"]["b"]),
        f"{prefix}prefix_const": np.asarray(params["prefix_const"]),
    }
    for i, lp in enumerate(params["layers"]):
        t = f"{prefix}transformer.layers.{i}"
        out[f"{t}.self_attn.in_proj_weight"] = np.asarray(lp["attn"]["in_proj"]["w"]).T
        out[f"{t}.self_attn.in_proj_bias"] = np.asarray(lp["attn"]["in_proj"]["b"])
        out[f"{t}.self_attn.out_proj.weight"] = np.asarray(lp["attn"]["out_proj"]["w"]).T
        out[f"{t}.self_attn.out_proj.bias"] = np.asarray(lp["attn"]["out_proj"]["b"])
        out[f"{t}.norm1.weight"] = np.asarray(lp["ln1"]["scale"])
        out[f"{t}.norm1.bias"] = np.asarray(lp["ln1"]["bias"])
        out[f"{t}.norm2.weight"] = np.asarray(lp["ln2"]["scale"])
        out[f"{t}.norm2.bias"] = np.asarray(lp["ln2"]["bias"])
        out[f"{t}.linear1.weight"] = np.asarray(lp["fc1"]["w"]).T
        out[f"{t}.linear1.bias"] = np.asarray(lp["fc1"]["b"])
        out[f"{t}.linear2.weight"] = np.asarray(lp["fc2"]["w"]).T
        out[f"{t}.linear2.bias"] = np.asarray(lp["fc2"]["b"])
    return out


# ---------------------------------------------------------------------------
# CLIP (HF CLIPVisionModelWithProjection / CLIPTextModelWithProjection)
# ---------------------------------------------------------------------------

def _clip_encoder_layers(sd: Mapping, prefix: str, n_layers: int) -> dict:
    layers = []
    for i in range(n_layers):
        p = f"{prefix}encoder.layers.{i}"
        layers.append(
            {
                "ln1": _ln(sd, f"{p}.layer_norm1"),
                "attn": {
                    "q": _linear(sd, f"{p}.self_attn.q_proj", transpose=True),
                    "k": _linear(sd, f"{p}.self_attn.k_proj", transpose=True),
                    "v": _linear(sd, f"{p}.self_attn.v_proj", transpose=True),
                    "out": _linear(sd, f"{p}.self_attn.out_proj", transpose=True),
                },
                "ln2": _ln(sd, f"{p}.layer_norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1", transpose=True),
                    "fc2": _linear(sd, f"{p}.mlp.fc2", transpose=True),
                },
            }
        )
    from gpt2_image_captioning_tpu.models.clip import _stack

    return _stack(layers)


def port_clip_vision(state_dict: Mapping[str, object], cfg) -> dict:
    """HF CLIP vision tower + visual projection → clip.init_vision pytree.

    Accepts full ``CLIPModel`` or ``CLIPVisionModelWithProjection``
    state_dicts (keys under ``vision_model.`` + ``visual_projection``).
    The stride=patch conv weight (D, 3, P, P) flattens to the framework's
    matmul layout (3*P*P, D).  Note HF's historical key typo ``pre_layrnorm``.
    """
    sd = dict(state_dict)
    conv = _np(sd["vision_model.embeddings.patch_embedding.weight"])
    d = conv.shape[0]
    pre_key = (
        "vision_model.pre_layrnorm"
        if "vision_model.pre_layrnorm.weight" in sd
        else "vision_model.pre_layernorm"
    )
    return {
        "class_embedding": jnp.asarray(_np(sd["vision_model.embeddings.class_embedding"])),
        "patch_embedding": jnp.asarray(conv.reshape(d, -1).T),
        "position_embedding": jnp.asarray(
            _np(sd["vision_model.embeddings.position_embedding.weight"])
        ),
        "pre_layernorm": _ln(sd, pre_key),
        "layers": _clip_encoder_layers(sd, "vision_model.", cfg.num_hidden_layers),
        "post_layernorm": _ln(sd, "vision_model.post_layernorm"),
        "visual_projection": {"w": jnp.asarray(_np(sd["visual_projection.weight"]).T)},
    }


def port_clip_text(state_dict: Mapping[str, object], cfg) -> dict:
    """HF CLIP text tower + text projection → clip.init_text pytree."""
    sd = dict(state_dict)
    return {
        "token_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.token_embedding.weight"])
        ),
        "position_embedding": jnp.asarray(
            _np(sd["text_model.embeddings.position_embedding.weight"])
        ),
        "layers": _clip_encoder_layers(sd, "text_model.", cfg.num_hidden_layers),
        "final_layernorm": _ln(sd, "text_model.final_layer_norm"),
        "text_projection": {"w": jnp.asarray(_np(sd["text_projection.weight"]).T)},
    }


# ---------------------------------------------------------------------------
# HF ViT
# ---------------------------------------------------------------------------

def port_vit(state_dict: Mapping[str, object], cfg) -> dict:
    """HF ``ViTModel`` state_dict → vit.init pytree."""
    sd = _strip_prefix(dict(state_dict), "vit.")
    conv = _np(sd["embeddings.patch_embeddings.projection.weight"])
    d = conv.shape[0]
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layer.{i}"
        layers.append(
            {
                "ln_before": _ln(sd, f"{p}.layernorm_before"),
                "attn": {
                    "q": _linear(sd, f"{p}.attention.attention.query", transpose=True),
                    "k": _linear(sd, f"{p}.attention.attention.key", transpose=True),
                    "v": _linear(sd, f"{p}.attention.attention.value", transpose=True),
                    "out": _linear(sd, f"{p}.attention.output.dense", transpose=True),
                },
                "ln_after": _ln(sd, f"{p}.layernorm_after"),
                "mlp": {
                    "fc1": _linear(sd, f"{p}.intermediate.dense", transpose=True),
                    "fc2": _linear(sd, f"{p}.output.dense", transpose=True),
                },
            }
        )
    from gpt2_image_captioning_tpu.models.clip import _stack

    return {
        "cls_token": jnp.asarray(_np(sd["embeddings.cls_token"])),
        "patch_embedding": {
            "w": jnp.asarray(conv.reshape(d, -1).T),
            "b": jnp.asarray(_np(sd["embeddings.patch_embeddings.projection.bias"])),
        },
        "position_embeddings": jnp.asarray(_np(sd["embeddings.position_embeddings"])),
        "layers": _stack(layers),
        "final_layernorm": _ln(sd, "layernorm"),
        "pooler": _linear(sd, "pooler.dense", transpose=True),
    }


# ---------------------------------------------------------------------------
# DINOv3 + dino.txt (torch hub checkpoint naming, best-effort documented map)
# ---------------------------------------------------------------------------

def port_dinov3_backbone(state_dict: Mapping[str, object], cfg) -> dict:
    """facebookresearch/dinov3 hub backbone state_dict → dino.init pytree.

    Expected key families (``backbone.`` prefix stripped if present):
    ``patch_embed.proj.{weight,bias}``, ``cls_token``,
    ``storage_tokens``/``register_tokens``, per block ``blocks.{i}.norm1 /
    attn.qkv / attn.proj / ls1.gamma / norm2 / mlp.fc1 / mlp.fc2 / ls2.gamma``,
    final ``norm``.  The dino.txt vision head is ported separately by
    :func:`port_dinotxt_head`.  (No network egress in the build environment —
    this mapping follows the published repo's module naming and is exercised
    against a structurally identical torch module in tests.)
    """
    sd = _strip_prefix(dict(state_dict), "backbone.")
    conv = _np(sd["patch_embed.proj.weight"])
    d = conv.shape[0]
    reg_key = "storage_tokens" if "storage_tokens" in sd else "register_tokens"
    blocks = []
    for i in range(cfg.num_hidden_layers):
        p = f"blocks.{i}"
        blocks.append(
            {
                "ln1": _ln(sd, f"{p}.norm1"),
                "attn": {
                    "qkv": _linear(sd, f"{p}.attn.qkv", transpose=True),
                    "proj": _linear(sd, f"{p}.attn.proj", transpose=True),
                },
                "gamma1": jnp.asarray(_np(sd[f"{p}.ls1.gamma"])),
                "ln2": _ln(sd, f"{p}.norm2"),
                "mlp": {
                    "fc1": _linear(sd, f"{p}.mlp.fc1", transpose=True),
                    "fc2": _linear(sd, f"{p}.mlp.fc2", transpose=True),
                },
                "gamma2": jnp.asarray(_np(sd[f"{p}.ls2.gamma"])),
            }
        )
    from gpt2_image_captioning_tpu.models.clip import _stack

    return {
        "patch_embedding": {
            "w": jnp.asarray(conv.reshape(d, -1).T),
            "b": jnp.asarray(_np(sd["patch_embed.proj.bias"])),
        },
        "cls_token": jnp.asarray(_np(sd["cls_token"]).reshape(1, 1, d)),
        "register_tokens": jnp.asarray(_np(sd[reg_key]).reshape(1, -1, d)),
        "blocks": _stack(blocks),
        "norm": _ln(sd, "norm"),
        # head filled in by port_dinotxt_head; placeholder keeps tree shape
        "head": {"w": jnp.zeros((2 * d, cfg.text_embed_dim), jnp.float32)},
    }


def port_dinotxt_head(params: dict, state_dict: Mapping[str, object], cfg) -> dict:
    """Attach the dino.txt vision head (``visual_head``/``image_projection``
    linear) to a ported backbone pytree."""
    sd = dict(state_dict)
    for key in ("visual_head.weight", "image_projection.weight", "vision_head.weight"):
        if key in sd:
            return dict(params, head={"w": jnp.asarray(_np(sd[key]).T)})
    raise KeyError(
        "dino.txt vision head weight not found; expected one of visual_head/"
        f"image_projection/vision_head among {sorted(k for k in sd if 'head' in k or 'proj' in k)[:20]}"
    )
