"""Embedding→prefix mapping networks.

Projects one image-embedding vector into a sequence of "prefix tokens" in the
decoder's embedding space — the trainable heart of the captioner (ClipCap-style
prefix conditioning).  Two variants, functionally identical to the reference:

- :func:`mlp` — ``embed_dim → (prefix_len·gpt_dim)/2 → prefix_len·gpt_dim``
  with Tanh, reshaped to ``(B, prefix_len, gpt_dim)``
  (reference ``src/models.py:14-74``).
- :func:`transformer` — linear to ``hidden_length`` image tokens ⧺ a learned
  constant prefix, through an 8-layer pre-norm Transformer encoder
  (8 heads, 4× FFN, ReLU, bidirectional self-attention, *no* final norm —
  exactly torch's ``TransformerEncoderLayer(norm_first=True)`` stack), keeping
  the last ``prefix_length`` tokens (reference ``src/models.py:77-174``).

Parameter layouts are chosen so reference checkpoints port by transposing
torch's ``(out, in)`` Linear weights; see ``models/porting.py``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.attention import mha


@dataclasses.dataclass(frozen=True)
class MLPMappingConfig:
    prefix_length: int = 10
    embed_dim: int = 512
    gpt_dim: int = 768
    bias: bool = True

    type: str = dataclasses.field(default="mlp", init=False)


@dataclasses.dataclass(frozen=True)
class TransformerMappingConfig:
    embed_dim: int = 512
    gpt_dim: int = 768
    prefix_length: int = 15
    hidden_length: int = 10
    num_layers: int = 8
    num_heads: int = 8
    layer_norm_eps: float = 1e-5  # torch TransformerEncoderLayer default

    type: str = dataclasses.field(default="transformer", init=False)


MappingConfig = MLPMappingConfig | TransformerMappingConfig


def make_mapping_config(cfg_block) -> MappingConfig:
    """Build a mapping config from the ``mapping:`` block of config.yml."""
    kind = cfg_block["type"]
    if kind == "mlp":
        return MLPMappingConfig(
            prefix_length=cfg_block["prefix_length"],
            embed_dim=cfg_block["embed_dim"],
            gpt_dim=cfg_block["gpt_dim"],
        )
    if kind == "transformer":
        return TransformerMappingConfig(
            embed_dim=cfg_block["embed_dim"],
            gpt_dim=cfg_block["gpt_dim"],
            prefix_length=cfg_block["prefix_length"],
            hidden_length=cfg_block["hidden_length"],
        )
    raise ValueError(f"Unknown mapping type: {kind!r} (expected 'mlp' or 'transformer')")


# ---------------------------------------------------------------------------
# MLP mapper
# ---------------------------------------------------------------------------

def init_mlp(rng: jax.Array, cfg: MLPMappingConfig) -> dict:
    out_dim = cfg.prefix_length * cfg.gpt_dim
    hidden = out_dim // 2
    k1, k2 = jax.random.split(rng)
    return {
        "fc1": nn.dense_init(k1, cfg.embed_dim, hidden, std=None, bias=cfg.bias),
        "fc2": nn.dense_init(k2, hidden, out_dim, std=None, bias=cfg.bias),
    }


def mlp(params: dict, cfg: MLPMappingConfig, x: jnp.ndarray, policy: Policy = F32) -> jnp.ndarray:
    """(B, embed_dim) → (B, prefix_length, gpt_dim)"""
    h = jnp.tanh(nn.dense(params["fc1"], x, policy).astype(jnp.float32)).astype(
        policy.compute_dtype
    )
    out = nn.dense(params["fc2"], h, policy)
    return out.reshape(x.shape[0], cfg.prefix_length, cfg.gpt_dim)


# ---------------------------------------------------------------------------
# Transformer mapper
# ---------------------------------------------------------------------------

def init_transformer(rng: jax.Array, cfg: TransformerMappingConfig) -> dict:
    d = cfg.gpt_dim
    keys = jax.random.split(rng, 2 + cfg.num_layers)
    params: dict = {
        "linear": nn.dense_init(keys[0], cfg.embed_dim, cfg.hidden_length * d, std=None),
        # learned constant prefix, N(0,1) like torch.randn (src/models.py:124-126)
        "prefix_const": jax.random.normal(keys[1], (cfg.prefix_length, d)),
        "layers": [],
    }
    for i in range(cfg.num_layers):
        k1, k2, k3, k4 = jax.random.split(keys[2 + i], 4)
        # torch MultiheadAttention uses xavier_uniform for in_proj; the exact
        # init only matters for from-scratch training, not ported checkpoints.
        bound = (6.0 / (d + 3 * d)) ** 0.5
        params["layers"].append(
            {
                "ln1": nn.layer_norm_init(d),
                "attn": {
                    "in_proj": {
                        "w": jax.random.uniform(k1, (d, 3 * d), minval=-bound, maxval=bound),
                        "b": jnp.zeros((3 * d,)),
                    },
                    "out_proj": nn.dense_init(k2, d, d, std=None),
                },
                "ln2": nn.layer_norm_init(d),
                "fc1": nn.dense_init(k3, d, 4 * d, std=None),
                "fc2": nn.dense_init(k4, 4 * d, d, std=None),
            }
        )
    return params


def _encoder_layer(
    lp: dict, cfg: TransformerMappingConfig, x: jnp.ndarray, policy: Policy
) -> jnp.ndarray:
    """Pre-norm torch TransformerEncoderLayer: x += MHA(LN(x)); x += FFN(LN(x))."""
    h = nn.layer_norm(lp["ln1"], x, cfg.layer_norm_eps)
    qkv = nn.dense(lp["attn"]["in_proj"], h, policy)
    q, k, v = (nn.split_heads(t, cfg.num_heads) for t in jnp.split(qkv, 3, axis=-1))
    a = mha(q, k, v, causal=False, policy=policy)  # bidirectional
    x = x + nn.dense(lp["attn"]["out_proj"], nn.merge_heads(a), policy)
    h = nn.layer_norm(lp["ln2"], x, cfg.layer_norm_eps)
    h = jnp.maximum(nn.dense(lp["fc1"], h, policy), 0)  # relu
    return x + nn.dense(lp["fc2"], h, policy)


def transformer(
    params: dict,
    cfg: TransformerMappingConfig,
    x: jnp.ndarray,
    policy: Policy = F32,
) -> jnp.ndarray:
    """(B, embed_dim) → (B, prefix_length, gpt_dim)"""
    b = x.shape[0]
    img_tokens = nn.dense(params["linear"], x, policy).reshape(b, cfg.hidden_length, cfg.gpt_dim)
    prefix = jnp.broadcast_to(
        params["prefix_const"].astype(policy.compute_dtype),
        (b, cfg.prefix_length, cfg.gpt_dim),
    )
    h = jnp.concatenate([img_tokens, prefix], axis=1)
    for lp in params["layers"]:
        h = _encoder_layer(lp, cfg, h, policy)
    return h[:, cfg.hidden_length :, :]


# ---------------------------------------------------------------------------
# Unified entry points
# ---------------------------------------------------------------------------

def init_mapping(rng: jax.Array, cfg: MappingConfig) -> dict:
    if isinstance(cfg, MLPMappingConfig):
        return init_mlp(rng, cfg)
    return init_transformer(rng, cfg)


def apply_mapping(
    params: dict, cfg: MappingConfig, x: jnp.ndarray, policy: Policy = F32
) -> jnp.ndarray:
    if isinstance(cfg, MLPMappingConfig):
        return mlp(params, cfg, x, policy)
    return transformer(params, cfg, x, policy)


def mapping_partition_specs(cfg: MappingConfig) -> dict:
    """Mapper params are small (≤30M); replicate across the mesh."""

    def rep(tree):
        if isinstance(tree, dict):
            return {k: rep(v) for k, v in tree.items()}
        if isinstance(tree, list):
            return [rep(v) for v in tree]
        return P()

    if isinstance(cfg, MLPMappingConfig):
        return {"fc1": {"w": P(), "b": P()}, "fc2": {"w": P(), "b": P()}}
    layer = {
        "ln1": {"scale": P(), "bias": P()},
        "attn": {"in_proj": {"w": P(), "b": P()}, "out_proj": {"w": P(), "b": P()}},
        "ln2": {"scale": P(), "bias": P()},
        "fc1": {"w": P(), "b": P()},
        "fc2": {"w": P(), "b": P()},
    }
    return {
        "linear": {"w": P(), "b": P()},
        "prefix_const": P(),
        "layers": [layer] * cfg.num_layers,
    }
