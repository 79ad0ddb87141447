"""DINOv3 ViT-L/16 backbone + dino.txt text-alignment head, functional JAX.

The reference's third encoder loads
``torch.hub.load("facebookresearch/dinov3", "dinov3_vitl16_dinotxt_tet1280d20h24l")``
and calls ``encode_image`` (reference ``src/embeddings/dino.py:19-82,173``).
That model has no HF port; this is a from-the-papers implementation of the
architecture with a torch-hub-checkpoint key mapping in
``porting.port_dinov3_backbone`` / ``port_dinotxt_head``:

Backbone (DINOv3, arXiv:2508.10104 lineage):
- patch-embed 16×16 (unfold+matmul), a CLS token and ``num_register_tokens``
  learned registers (no positional embedding added to them),
- **axial RoPE** applied to q/k of *patch* tokens only (CLS/registers keep
  raw q/k),
- pre-norm blocks with **LayerScale** on both residual branches, exact-erf
  GELU MLP.

dino.txt head (vision side): concat(CLS, mean(patch tokens)) → linear
projection into the text-aligned space; the extractor L2-normalizes
(reference ``src/embeddings/dino.py:173-176``).

Real-weight numerical parity cannot be machine-verified here (the checkpoint
is not redistributable and this environment has no egress).  The translation
itself IS machine-verified: an independent torch implementation of the same
documented architecture agrees with this forward to f32 accumulation noise
through the real port path (tests/test_vision_parity.py::
test_dinov3_twin_numeric_parity), alongside shape/invariance tests; the
asset-gated tier (tests/test_assets.py) validates against the published
checkpoint the moment it lands.
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
class DINOv3Config:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 224
    patch_size: int = 16
    num_register_tokens: int = 4
    layer_norm_eps: float = 1e-6
    layerscale_init: float = 1e-5
    rope_base: float = 100.0
    # dino.txt head
    text_embed_dim: int = 2048

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @staticmethod
    def vitl16() -> "DINOv3Config":
        return DINOv3Config()

    @staticmethod
    def tiny() -> "DINOv3Config":
        return DINOv3Config(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            num_register_tokens=2, text_embed_dim=16,
        )


# ---------------------------------------------------------------------------
# Axial RoPE over the 2-D patch grid
# ---------------------------------------------------------------------------

def rope_angles(cfg: DINOv3Config, grid_h: int, grid_w: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N, head_dim/2) cos/sin tables: first half of the dim rotates with the
    normalized row coordinate, second half with the column coordinate."""
    d4 = cfg.head_dim // 4
    freqs = cfg.rope_base ** (-jnp.arange(d4, dtype=jnp.float32) / d4)
    ys = (jnp.arange(grid_h, dtype=jnp.float32) + 0.5) / grid_h * 2 - 1
    xs = (jnp.arange(grid_w, dtype=jnp.float32) + 0.5) / grid_w * 2 - 1
    ang_y = ys[:, None] * freqs[None, :]  # (H, d4)
    ang_x = xs[:, None] * freqs[None, :]  # (W, d4)
    ang = jnp.concatenate(
        [
            jnp.broadcast_to(ang_y[:, None, :], (grid_h, grid_w, d4)),
            jnp.broadcast_to(ang_x[None, :, :], (grid_h, grid_w, d4)),
        ],
        axis=-1,
    ).reshape(grid_h * grid_w, 2 * d4)
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope(x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray) -> jnp.ndarray:
    """Rotate pairs (x1, x2) per position.  x: (B, H, N, hd); cos/sin: (N, hd/2)."""
    x1, x2 = jnp.split(x, 2, axis=-1)
    c = cos[None, None]
    s = sin[None, None]
    return jnp.concatenate([x1 * c - x2 * s, x1 * s + x2 * c], axis=-1)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def _init_block(rng, cfg: DINOv3Config) -> dict:
    d, inter = cfg.hidden_size, cfg.intermediate_size
    ks = jax.random.split(rng, 4)
    return {
        "ln1": nn.layer_norm_init(d),
        "attn": {
            "qkv": nn.dense_init(ks[0], d, 3 * d, std=None),
            "proj": nn.dense_init(ks[1], d, d, std=None),
        },
        "gamma1": jnp.full((d,), cfg.layerscale_init),
        "ln2": nn.layer_norm_init(d),
        "mlp": {
            "fc1": nn.dense_init(ks[2], d, inter, std=None),
            "fc2": nn.dense_init(ks[3], inter, d, std=None),
        },
        "gamma2": jnp.full((d,), cfg.layerscale_init),
    }


def init(rng: jax.Array, cfg: DINOv3Config) -> dict:
    d = cfg.hidden_size
    ks = jax.random.split(rng, 4 + cfg.num_hidden_layers)
    patch_dim = 3 * cfg.patch_size * cfg.patch_size
    return {
        "patch_embedding": {
            "w": nn.normal(ks[0], (patch_dim, d), 0.02),
            "b": jnp.zeros((d,)),
        },
        "cls_token": nn.normal(ks[1], (1, 1, d), 0.02),
        "register_tokens": nn.normal(ks[2], (1, cfg.num_register_tokens, d), 0.02),
        "blocks": _stack([_init_block(ks[4 + i], cfg) for i in range(cfg.num_hidden_layers)]),
        "norm": nn.layer_norm_init(d),
        # dino.txt vision head: concat(CLS, mean-patch) -> text space
        "head": {"w": nn.normal(ks[3], (2 * d, cfg.text_embed_dim), 0.02)},
    }


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _block(bp: dict, cfg: DINOv3Config, x, cos, sin, n_special: int, policy: Policy):
    h = nn.layer_norm(bp["ln1"], x, cfg.layer_norm_eps)
    qkv = nn.dense(bp["attn"]["qkv"], h, policy)
    q, k, v = (nn.split_heads(t, cfg.num_attention_heads) for t in jnp.split(qkv, 3, -1))
    # RoPE on patch tokens only; CLS + registers untouched
    q_sp, q_patch = q[:, :, :n_special], q[:, :, n_special:]
    k_sp, k_patch = k[:, :, :n_special], k[:, :, n_special:]
    q = jnp.concatenate([q_sp, apply_rope(q_patch, cos, sin).astype(q.dtype)], axis=2)
    k = jnp.concatenate([k_sp, apply_rope(k_patch, cos, sin).astype(k.dtype)], axis=2)
    a = mha(q, k, v, causal=False, policy=policy)
    x = x + bp["gamma1"].astype(jnp.float32) * nn.dense(
        bp["attn"]["proj"], nn.merge_heads(a), policy
    ).astype(jnp.float32)
    x = x.astype(policy.compute_dtype)
    h = nn.layer_norm(bp["ln2"], x, cfg.layer_norm_eps)
    h = nn.gelu_exact(nn.dense(bp["mlp"]["fc1"], h, policy))
    x = x + bp["gamma2"].astype(jnp.float32) * nn.dense(bp["mlp"]["fc2"], h, policy).astype(
        jnp.float32
    )
    return x.astype(policy.compute_dtype)


def forward(
    params: dict, cfg: DINOv3Config, pixel_values: jnp.ndarray, policy: Policy = F32
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(B, 3, H, W) → (cls (B, D), patch_tokens (B, N, D)), post-final-norm."""
    b, _, h, w = pixel_values.shape
    gh, gw = h // cfg.patch_size, w // cfg.patch_size
    patches = extract_patches(pixel_values.astype(policy.compute_dtype), cfg.patch_size)
    x = nn.dense(params["patch_embedding"], patches, policy)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.hidden_size))
    regs = jnp.broadcast_to(
        params["register_tokens"].astype(x.dtype),
        (b, cfg.num_register_tokens, cfg.hidden_size),
    )
    x = jnp.concatenate([cls, regs, x], axis=1)
    n_special = 1 + cfg.num_register_tokens
    cos, sin = rope_angles(cfg, gh, gw)

    def body(x, bp):
        return _block(bp, cfg, x, cos, sin, n_special, policy), None

    x, _ = jax.lax.scan(body, x, params["blocks"])
    x = nn.layer_norm(params["norm"], x, cfg.layer_norm_eps)
    return x[:, 0], x[:, n_special:]


def encode_image(
    params: dict,
    cfg: DINOv3Config,
    pixel_values: jnp.ndarray,
    policy: Policy = F32,
    normalize: bool = True,
) -> jnp.ndarray:
    """dino.txt ``encode_image``: concat(CLS, mean-patch) → head, then the
    extractor's L2 norm (reference ``src/embeddings/dino.py:173-176``)."""
    cls, patches = forward(params, cfg, pixel_values, policy)
    pooled = jnp.concatenate([cls, patches.mean(axis=1)], axis=-1)
    feats = jnp.dot(
        pooled.astype(policy.compute_dtype),
        params["head"]["w"].astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    if normalize:
        feats = feats / jnp.linalg.norm(feats, axis=-1, keepdims=True)
    return feats
