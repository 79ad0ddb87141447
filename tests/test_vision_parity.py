"""Vision encoders vs randomly-initialized HF models (exact-numerics ports),
and DINOv3 port-mapping structure vs a torch twin module."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.models import clip as CL
from gpt2_image_captioning_tpu.models import dino as DN
from gpt2_image_captioning_tpu.models import vit as VT
from gpt2_image_captioning_tpu.models.porting import (
    port_clip_text,
    port_clip_vision,
    port_dinov3_backbone,
    port_vit,
)


def _px(b=2, size=32, seed=0):
    return np.random.default_rng(seed).normal(size=(b, 3, size, size)).astype(np.float32)


def test_clip_vision_matches_hf():
    torch.manual_seed(0)
    cfg = CL.CLIPVisionConfig.tiny()
    hf = transformers.CLIPVisionModelWithProjection(
        transformers.CLIPVisionConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            projection_dim=cfg.projection_dim,
            attention_dropout=0.0,
        )
    ).eval()
    params = port_clip_vision(hf.state_dict(), cfg)
    x = _px()
    with torch.no_grad():
        want = hf(pixel_values=torch.from_numpy(x)).image_embeds.numpy()
    got = np.asarray(CL.encode_image(params, cfg, jnp.asarray(x), normalize=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
    # and the extractor normalization produces unit vectors
    got_n = np.asarray(CL.encode_image(params, cfg, jnp.asarray(x), normalize=True))
    np.testing.assert_allclose(np.linalg.norm(got_n, axis=-1), 1.0, atol=1e-6)


def test_clip_text_matches_hf():
    torch.manual_seed(1)
    cfg = CL.CLIPTextConfig.tiny()
    hf = transformers.CLIPTextModelWithProjection(
        transformers.CLIPTextConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            max_position_embeddings=cfg.max_position_embeddings,
            projection_dim=cfg.projection_dim,
            attention_dropout=0.0,
            eos_token_id=cfg.eos_token_id,
            bos_token_id=0,
        )
    ).eval()
    params = port_clip_text(hf.state_dict(), cfg)
    ids = np.random.default_rng(2).integers(1, cfg.vocab_size - 1, size=(2, 9))
    ids[:, -1] = cfg.vocab_size - 1  # EOT = max id at the last position
    with torch.no_grad():
        want = hf(input_ids=torch.from_numpy(ids)).text_embeds.numpy()
    got = np.asarray(CL.encode_text(params, cfg, jnp.asarray(ids), normalize=False))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_vit_matches_hf():
    torch.manual_seed(2)
    cfg = VT.ViTConfig.tiny()
    hf = transformers.ViTModel(
        transformers.ViTConfig(
            hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
    ).eval()
    params = port_vit(hf.state_dict(), cfg)
    x = _px(seed=3)
    with torch.no_grad():
        out = hf(pixel_values=torch.from_numpy(x))
        want_hidden = out.last_hidden_state.numpy()
        want_pooled = out.pooler_output.numpy()
    got_hidden, got_pooled = VT.forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got_hidden), want_hidden, atol=2e-5, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(got_pooled), want_pooled, atol=2e-5, rtol=2e-5)


class _TorchDinoTwin(torch.nn.Module):
    """Twin of the dinov3 hub backbone's module naming with an independent
    torch forward implementing the same documented architecture (axial RoPE
    on patch tokens, LayerScale residuals, exact-erf GELU).  Used to exercise
    the port mapping AND cross-check the JAX forward's translation numerics
    (real-weight parity stays license-gated — tests/test_assets.py)."""

    def __init__(self, cfg: DN.DINOv3Config):
        super().__init__()
        self.cfg = cfg
        d = cfg.hidden_size

        class PatchEmbed(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.proj = torch.nn.Conv2d(3, d, cfg.patch_size, cfg.patch_size)

        class LS(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.gamma = torch.nn.Parameter(torch.full((d,), 1e-5))

        class MLP(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.fc1 = torch.nn.Linear(d, cfg.intermediate_size)
                self.fc2 = torch.nn.Linear(cfg.intermediate_size, d)

        class Attn(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.qkv = torch.nn.Linear(d, 3 * d)
                self.proj = torch.nn.Linear(d, d)

        class Block(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.norm1 = torch.nn.LayerNorm(d)
                self.attn = Attn()
                self.ls1 = LS()
                self.norm2 = torch.nn.LayerNorm(d)
                self.mlp = MLP()
                self.ls2 = LS()

        self.patch_embed = PatchEmbed()
        self.cls_token = torch.nn.Parameter(torch.randn(1, 1, d))
        self.storage_tokens = torch.nn.Parameter(torch.randn(1, cfg.num_register_tokens, d))
        self.blocks = torch.nn.ModuleList([Block() for _ in range(cfg.num_hidden_layers)])
        self.norm = torch.nn.LayerNorm(d)

    @staticmethod
    def _rope_tables(cfg, grid_h, grid_w):
        """Axial RoPE angle tables, written independently of the JAX version:
        first half of the rotated dim follows the normalized row coordinate,
        second half the column coordinate; pairs are (i, i + head_dim/2)."""
        d4 = cfg.head_dim // 4
        inv = cfg.rope_base ** (-torch.arange(d4, dtype=torch.float32) / d4)
        rows = ((torch.arange(grid_h, dtype=torch.float32) + 0.5) / grid_h) * 2.0 - 1.0
        cols = ((torch.arange(grid_w, dtype=torch.float32) + 0.5) / grid_w) * 2.0 - 1.0
        ang_rows = torch.einsum("h,f->hf", rows, inv)  # (gh, d4)
        ang_cols = torch.einsum("w,f->wf", cols, inv)  # (gw, d4)
        full = torch.cat(
            [
                ang_rows[:, None, :].expand(grid_h, grid_w, d4),
                ang_cols[None, :, :].expand(grid_h, grid_w, d4),
            ],
            dim=-1,
        ).reshape(grid_h * grid_w, 2 * d4)
        return torch.cos(full), torch.sin(full)

    @staticmethod
    def _rotate(t, cos, sin):
        half = t.shape[-1] // 2
        a, b = t[..., :half], t[..., half:]
        return torch.cat([a * cos - b * sin, a * sin + b * cos], dim=-1)

    def forward(self, px):
        cfg = self.cfg
        bsz = px.shape[0]
        gh, gw = px.shape[2] // cfg.patch_size, px.shape[3] // cfg.patch_size
        x = self.patch_embed.proj(px).flatten(2).transpose(1, 2)  # (B, N, D)
        x = torch.cat(
            [
                self.cls_token.expand(bsz, -1, -1),
                self.storage_tokens.expand(bsz, -1, -1),
                x,
            ],
            dim=1,
        )
        n_sp = 1 + cfg.num_register_tokens
        heads, hd = cfg.num_attention_heads, cfg.head_dim
        cos, sin = self._rope_tables(cfg, gh, gw)
        for blk in self.blocks:
            h = blk.norm1(x)
            qkv = blk.attn.qkv(h)
            q, k, v = (
                t.reshape(bsz, -1, heads, hd).transpose(1, 2)
                for t in qkv.chunk(3, dim=-1)
            )
            q = torch.cat([q[:, :, :n_sp], self._rotate(q[:, :, n_sp:], cos, sin)], dim=2)
            k = torch.cat([k[:, :, :n_sp], self._rotate(k[:, :, n_sp:], cos, sin)], dim=2)
            att = torch.softmax(q @ k.transpose(-1, -2) / hd**0.5, dim=-1) @ v
            att = att.transpose(1, 2).reshape(bsz, -1, cfg.hidden_size)
            x = x + blk.ls1.gamma * blk.attn.proj(att)
            h = blk.norm2(x)
            x = x + blk.ls2.gamma * blk.mlp.fc2(
                torch.nn.functional.gelu(blk.mlp.fc1(h))
            )
        x = self.norm(x)
        return x[:, 0], x[:, n_sp:]


def test_dinov3_port_mapping_and_forward():
    torch.manual_seed(3)
    cfg = DN.DINOv3Config.tiny()
    twin = _TorchDinoTwin(cfg)
    params = port_dinov3_backbone(twin.state_dict(), cfg)
    # ported leaves land where the forward expects them
    assert params["patch_embedding"]["w"].shape == (3 * cfg.patch_size**2, cfg.hidden_size)
    assert params["register_tokens"].shape == (1, cfg.num_register_tokens, cfg.hidden_size)
    # blocks are stacked (leading layer dim) for scan-over-layers
    np.testing.assert_allclose(
        np.asarray(params["blocks"]["gamma1"][0]),
        twin.blocks[0].ls1.gamma.detach().numpy(),
    )
    x = _px(seed=4)
    cls, patches = DN.forward(params, cfg, jnp.asarray(x))
    assert cls.shape == (2, cfg.hidden_size)
    assert patches.shape == (2, 16, cfg.hidden_size)
    # the backbone port leaves a zero placeholder head (the dino.txt head is
    # attached by port_dinotxt_head) — borrow a random head for encode_image
    params = dict(params, head=DN.init(jax.random.PRNGKey(1), cfg)["head"])
    feats = DN.encode_image(params, cfg, jnp.asarray(x))
    assert feats.shape == (2, cfg.text_embed_dim)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5)


def test_dinov3_twin_numeric_parity():
    """Port the torch twin's weights and compare full forwards numerically.

    Real-weight parity is license-gated (tests/test_assets.py); this pins the
    *translation*: patch ordering, qkv split, RoPE orientation/normalization,
    LayerScale placement, GELU variant, LN eps — two independent
    implementations of the documented architecture must agree on every
    output (tolerance 5e-4 abs: the residual is f32 accumulation-order noise
    between XLA and torch matmul lowerings, observed max ~1e-4)."""
    torch.manual_seed(7)
    cfg = DN.DINOv3Config.tiny()
    twin = _TorchDinoTwin(cfg).eval()
    params = port_dinov3_backbone(twin.state_dict(), cfg)
    x = _px(b=3, size=cfg.image_size, seed=8)
    with torch.no_grad():
        want_cls, want_patches = twin(torch.from_numpy(x))
    got_cls, got_patches = DN.forward(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_cls), want_cls.numpy(), atol=5e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got_patches), want_patches.numpy(), atol=5e-4, rtol=1e-4
    )

    # dino.txt vision head through the real port path: encode_image ==
    # normalize(concat(CLS, mean-patch) @ W_head^T)
    head_w = torch.randn(cfg.text_embed_dim, 2 * cfg.hidden_size)
    from gpt2_image_captioning_tpu.models.porting import port_dinotxt_head

    params = port_dinotxt_head(params, {"visual_head.weight": head_w}, cfg)
    with torch.no_grad():
        pooled = torch.cat([want_cls, want_patches.mean(dim=1)], dim=-1)
        want_feats = pooled @ head_w.T
        want_feats = want_feats / want_feats.norm(dim=-1, keepdim=True)
    got_feats = DN.encode_image(params, cfg, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got_feats), want_feats.numpy(), atol=5e-4, rtol=1e-4
    )


def test_dinov3_rope_translation_sensitivity():
    """RoPE encodes position: permuting patch positions must change CLS."""
    cfg = DN.DINOv3Config.tiny()
    params = DN.init(jax.random.PRNGKey(0), cfg)
    x = _px(seed=5)
    cls1, _ = DN.forward(params, cfg, jnp.asarray(x))
    # flip the image spatially: same patch multiset, different positions
    cls2, _ = DN.forward(params, cfg, jnp.asarray(x[:, :, ::-1, ::-1].copy()))
    assert not np.allclose(np.asarray(cls1), np.asarray(cls2), atol=1e-4)
