"""CLIP (ViT-B/32) vision + text encoders in pure-functional JAX.

Replaces the reference's HF ``CLIPModel`` dependency (reference
``src/embeddings/clip.py:10-35`` loads ``openai/clip-vit-base-patch32``) for
both directions used by the stack:

- :func:`encode_image` — ``get_image_features``: patch-embed (stride=patch
  conv expressed as an MXU matmul over unfolded patches), CLS + learned
  position embeddings, pre-LN, N transformer layers (quick-GELU MLP),
  post-LN on CLS, linear projection to the shared space (512-d).
- :func:`encode_text` — ``get_text_features``: token + position embeddings,
  *causal* transformer, final LN, features taken at the EOT position
  (argmax of token ids, since EOT is the highest id), text projection.

Numerics match HF's ``CLIPVisionModelWithProjection`` /
``CLIPTextModelWithProjection`` exactly (validated in tests on random-init
models); weights port via ``porting.port_clip_vision`` / ``port_clip_text``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.attention import mha


def _stack(layers: list[dict]) -> dict:
    """Per-layer param dicts → one stacked pytree (scan-over-layers)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @staticmethod
    def vit_b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig()

    @staticmethod
    def tiny() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8, projection_dim=16,
        )


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    projection_dim: int = 512
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407  # openai/clip-vit-base-patch32's EOT id

    @staticmethod
    def tiny(vocab_size: int = 99) -> "CLIPTextConfig":
        return CLIPTextConfig(
            vocab_size=vocab_size, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4, max_position_embeddings=16,
            projection_dim=16, eos_token_id=vocab_size - 1,
        )


# ---------------------------------------------------------------------------
# Shared transformer encoder layer (CLIP style: LN → attn, LN → quickgelu MLP)
# ---------------------------------------------------------------------------

def _clip_layer(
    lp: dict,
    x: jnp.ndarray,
    n_head: int,
    eps: float,
    *,
    causal: bool,
    policy: Policy,
) -> jnp.ndarray:
    h = nn.layer_norm(lp["ln1"], x, eps)
    q = nn.dense(lp["attn"]["q"], h, policy)
    k = nn.dense(lp["attn"]["k"], h, policy)
    v = nn.dense(lp["attn"]["v"], h, policy)
    q, k, v = (nn.split_heads(t, n_head) for t in (q, k, v))
    a = mha(q, k, v, causal=causal, policy=policy)
    x = x + nn.dense(lp["attn"]["out"], nn.merge_heads(a), policy)
    h = nn.layer_norm(lp["ln2"], x, eps)
    h = nn.quick_gelu(nn.dense(lp["mlp"]["fc1"], h, policy))
    return x + nn.dense(lp["mlp"]["fc2"], h, policy)


def _init_clip_layer(rng, d: int, inter: int) -> dict:
    ks = jax.random.split(rng, 6)
    return {
        "ln1": nn.layer_norm_init(d),
        "attn": {
            "q": nn.dense_init(ks[0], d, d, std=None),
            "k": nn.dense_init(ks[1], d, d, std=None),
            "v": nn.dense_init(ks[2], d, d, std=None),
            "out": nn.dense_init(ks[3], d, d, std=None),
        },
        "ln2": nn.layer_norm_init(d),
        "mlp": {
            "fc1": nn.dense_init(ks[4], d, inter, std=None),
            "fc2": nn.dense_init(ks[5], inter, d, std=None),
        },
    }


# ---------------------------------------------------------------------------
# Vision tower
# ---------------------------------------------------------------------------

def init_vision(rng: jax.Array, cfg: CLIPVisionConfig) -> dict:
    d = cfg.hidden_size
    ks = jax.random.split(rng, 4 + cfg.num_hidden_layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "class_embedding": nn.normal(ks[0], (d,), 0.02),
        # stored in matmul layout (patch_dim, d); no bias (CLIP conv has none)
        "patch_embedding": nn.normal(ks[1], (patch_dim, d), 0.02),
        "position_embedding": nn.normal(ks[2], (cfg.num_patches + 1, d), 0.02),
        "pre_layernorm": nn.layer_norm_init(d),
        "layers": _stack(
            [_init_clip_layer(ks[4 + i], d, cfg.intermediate_size)
             for i in range(cfg.num_hidden_layers)]
        ),
        "post_layernorm": nn.layer_norm_init(d),
        "visual_projection": {"w": nn.normal(ks[3], (d, cfg.projection_dim), 0.02)},
    }


def extract_patches(pixel_values: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, 3, H, W) → (B, N, 3*patch*patch) with torch-conv channel ordering,
    so a stride=patch convolution becomes one big MXU matmul."""
    b, c, h, w = pixel_values.shape
    hp, wp = h // patch, w // patch
    x = pixel_values.reshape(b, c, hp, patch, wp, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, hp, wp, C, p, p)
    return x.reshape(b, hp * wp, c * patch * patch)


def vision_features(
    params: dict, cfg: CLIPVisionConfig, pixel_values: jnp.ndarray, policy: Policy = F32
) -> jnp.ndarray:
    """pixel_values (B, 3, H, W) → pooled CLS features (B, hidden) (pre-projection)."""
    b = pixel_values.shape[0]
    patches = extract_patches(pixel_values.astype(policy.compute_dtype), cfg.patch_size)
    x = jnp.dot(
        patches,
        params["patch_embedding"].astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    cls = jnp.broadcast_to(
        params["class_embedding"].astype(jnp.float32), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    x = x + params["position_embedding"].astype(jnp.float32)[None]
    x = x.astype(policy.compute_dtype)
    x = nn.layer_norm(params["pre_layernorm"], x, cfg.layer_norm_eps)

    def body(x, lp):
        return (
            _clip_layer(lp, x, cfg.num_attention_heads, cfg.layer_norm_eps,
                        causal=False, policy=policy),
            None,
        )

    x, _ = jax.lax.scan(body, x, params["layers"])
    return nn.layer_norm(params["post_layernorm"], x[:, 0], cfg.layer_norm_eps)


def encode_image(
    params: dict,
    cfg: CLIPVisionConfig,
    pixel_values: jnp.ndarray,
    policy: Policy = F32,
    normalize: bool = True,
) -> jnp.ndarray:
    """``CLIPModel.get_image_features`` + the extractor's L2 normalization
    (reference ``src/embeddings/clip.py:132-137``) → (B, projection_dim)."""
    pooled = vision_features(params, cfg, pixel_values, policy)
    feats = jnp.dot(
        pooled.astype(policy.compute_dtype),
        params["visual_projection"]["w"].astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats


# ---------------------------------------------------------------------------
# Text tower (caption embeddings for retrieval; src/embeddings/word_embeddings.py)
# ---------------------------------------------------------------------------

def init_text(rng: jax.Array, cfg: CLIPTextConfig) -> dict:
    d = cfg.hidden_size
    ks = jax.random.split(rng, 3 + cfg.num_hidden_layers)
    return {
        "token_embedding": nn.normal(ks[0], (cfg.vocab_size, d), 0.02),
        "position_embedding": nn.normal(ks[1], (cfg.max_position_embeddings, d), 0.02),
        "layers": _stack(
            [_init_clip_layer(ks[3 + i], d, cfg.intermediate_size)
             for i in range(cfg.num_hidden_layers)]
        ),
        "final_layernorm": nn.layer_norm_init(d),
        "text_projection": {"w": nn.normal(ks[2], (d, cfg.projection_dim), 0.02)},
    }


def encode_text(
    params: dict,
    cfg: CLIPTextConfig,
    input_ids: jnp.ndarray,
    policy: Policy = F32,
    normalize: bool = True,
) -> jnp.ndarray:
    """``CLIPModel.get_text_features``: causal transformer, features at the
    first EOT position (HF pools at ``(ids == eos_token_id).argmax()``),
    projection → (B, projection_dim)."""
    b, t = input_ids.shape
    x = jnp.take(params["token_embedding"], input_ids, axis=0).astype(jnp.float32)
    x = x + params["position_embedding"][:t].astype(jnp.float32)[None]
    x = x.astype(policy.compute_dtype)

    def body(x, lp):
        return (
            _clip_layer(lp, x, cfg.num_attention_heads, cfg.layer_norm_eps,
                        causal=True, policy=policy),
            None,
        )

    x, _ = jax.lax.scan(body, x, params["layers"])
    x = nn.layer_norm(params["final_layernorm"], x, cfg.layer_norm_eps)
    eot = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
    pooled = x[jnp.arange(b), eot]
    feats = jnp.dot(
        pooled.astype(policy.compute_dtype),
        params["text_projection"]["w"].astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats
