"""HF ViT-base encoder (``google/vit-base-patch16-224``) in functional JAX.

The second vision-encoder family (reference ``src/embeddings/vit.py:10-35``):
patch conv (with bias) as an unfold+matmul, CLS token + learned position
embeddings, post-norm-free encoder layers (``layernorm_before``/``after``,
exact-erf GELU), final LayerNorm, and the tanh pooler — the extractor uses
``pooler_output`` ([CLS] → dense → tanh, 768-d) like the reference
(``src/embeddings/vit.py:123``).

Numerics match HF ``ViTModel`` (tests on random-init); weights port via
``porting.port_vit``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models.clip import _stack, extract_patches
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.attention import mha


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 16
    layer_norm_eps: float = 1e-12  # HF ViT default

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def base_patch16_224() -> "ViTConfig":
        return ViTConfig()

    @staticmethod
    def tiny() -> "ViTConfig":
        return ViTConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        )


def _init_layer(rng, d: int, inter: int) -> dict:
    ks = jax.random.split(rng, 6)
    return {
        "ln_before": nn.layer_norm_init(d),
        "attn": {
            "q": nn.dense_init(ks[0], d, d, std=None),
            "k": nn.dense_init(ks[1], d, d, std=None),
            "v": nn.dense_init(ks[2], d, d, std=None),
            "out": nn.dense_init(ks[3], d, d, std=None),
        },
        "ln_after": nn.layer_norm_init(d),
        "mlp": {
            "fc1": nn.dense_init(ks[4], d, inter, std=None),
            "fc2": nn.dense_init(ks[5], inter, d, std=None),
        },
    }


def init(rng: jax.Array, cfg: ViTConfig) -> dict:
    d = cfg.hidden_size
    ks = jax.random.split(rng, 4 + cfg.num_hidden_layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "cls_token": nn.normal(ks[0], (1, 1, d), 0.02),
        "patch_embedding": {
            "w": nn.normal(ks[1], (patch_dim, d), 0.02),
            "b": jnp.zeros((d,)),
        },
        "position_embeddings": nn.normal(ks[2], (1, cfg.num_patches + 1, d), 0.02),
        "layers": _stack(
            [_init_layer(ks[4 + i], d, cfg.intermediate_size)
             for i in range(cfg.num_hidden_layers)]
        ),
        "final_layernorm": nn.layer_norm_init(d),
        "pooler": nn.dense_init(ks[3], d, d, std=None),
    }


def _layer(lp: dict, x: jnp.ndarray, n_head: int, eps: float, policy: Policy) -> jnp.ndarray:
    h = nn.layer_norm(lp["ln_before"], x, eps)
    q = nn.dense(lp["attn"]["q"], h, policy)
    k = nn.dense(lp["attn"]["k"], h, policy)
    v = nn.dense(lp["attn"]["v"], h, policy)
    q, k, v = (nn.split_heads(t, n_head) for t in (q, k, v))
    a = mha(q, k, v, causal=False, policy=policy)
    x = x + nn.dense(lp["attn"]["out"], nn.merge_heads(a), policy)
    h = nn.layer_norm(lp["ln_after"], x, eps)
    h = nn.gelu_exact(nn.dense(lp["mlp"]["fc1"], h, policy))
    return x + nn.dense(lp["mlp"]["fc2"], h, policy)


def forward(
    params: dict, cfg: ViTConfig, pixel_values: jnp.ndarray, policy: Policy = F32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 3, H, W) → (last_hidden (B, N+1, D), pooler_output (B, D))."""
    b = pixel_values.shape[0]
    patches = extract_patches(pixel_values.astype(policy.compute_dtype), cfg.patch_size)
    x = nn.dense(params["patch_embedding"], patches, policy)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = (x.astype(jnp.float32) + params["position_embeddings"].astype(jnp.float32)).astype(
        policy.compute_dtype
    )
    def body(x, lp):
        return _layer(lp, x, cfg.num_attention_heads, cfg.layer_norm_eps, policy), None

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = nn.layer_norm(params["final_layernorm"], x, cfg.layer_norm_eps)
    pooled = jnp.tanh(nn.dense(params["pooler"], x[:, 0], policy).astype(jnp.float32))
    return x, pooled.astype(policy.compute_dtype)


def encode_image(
    params: dict,
    cfg: ViTConfig,
    pixel_values: jnp.ndarray,
    policy: Policy = F32,
    normalize: bool = True,
) -> jnp.ndarray:
    """pooler_output ([CLS]) features, L2-normalized like the reference's
    extractor (``src/embeddings/vit.py:118-128``) → (B, hidden)."""
    _, pooled = forward(params, cfg, pixel_values, policy)
    if normalize:
        pooled = pooled / jnp.linalg.norm(pooled.astype(jnp.float32), axis=-1, keepdims=True)
    return pooled
