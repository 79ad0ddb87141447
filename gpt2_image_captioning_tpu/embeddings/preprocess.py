"""Per-encoder image preprocessing — the contracts the reference's HF/torch
processors implement:

- CLIP (``openai/clip-vit-base-patch32`` processor): resize shortest side to
  224 **bicubic**, center-crop 224, scale 1/255, normalize with CLIP stats.
- ViT (``google/vit-base-patch16-224`` processor): resize to exactly 224×224
  **bilinear**, scale 1/255, normalize mean=std=0.5.
- DINOv3 (hand-copied eval transform, reference
  ``src/embeddings/dino.py:87-135``): resize shortest side 256 bicubic,
  center-crop 224, ImageNet normalize.

Split host/device: the geometric part (decode+resize+crop, variable input
shapes) runs host-side per image (PIL here, the C++ ``imagepipe`` when
built); the arithmetic part (scale+normalize+CHW) is vectorized and fused
into the device program by XLA.  PIL resampling matches torchvision/HF to
within ~1e-2 per pixel (antialiased kernels), far below embedding tolerance.
"""

from __future__ import annotations

import dataclasses

import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


@dataclasses.dataclass(frozen=True)
class PreprocessSpec:
    resize: int            # target of the resize step
    crop: int | None       # center-crop size (None = resize is exact WxH)
    interpolation: str     # "bicubic" | "bilinear"
    mean: tuple[float, float, float]
    std: tuple[float, float, float]
    resize_shortest: bool = True  # shortest-side resize vs exact square


CLIP_SPEC = PreprocessSpec(224, 224, "bicubic", CLIP_MEAN, CLIP_STD)
VIT_SPEC = PreprocessSpec(224, None, "bilinear", (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                          resize_shortest=False)
DINO_SPEC = PreprocessSpec(256, 224, "bicubic", IMAGENET_MEAN, IMAGENET_STD)

SPECS = {"clip": CLIP_SPEC, "vit": VIT_SPEC, "dino": DINO_SPEC}


def resize_and_crop(rgb: np.ndarray, spec: PreprocessSpec) -> np.ndarray:
    """uint8 (H, W, 3) → uint8 (S, S, 3) host-side geometry (PIL backend)."""
    from PIL import Image

    resample = Image.BICUBIC if spec.interpolation == "bicubic" else Image.BILINEAR
    im = Image.fromarray(rgb)
    if spec.resize_shortest:
        w, h = im.size
        short = min(w, h)
        scale = spec.resize / short
        im = im.resize((max(1, round(w * scale)), max(1, round(h * scale))), resample)
        if spec.crop:
            w, h = im.size
            left = (w - spec.crop) // 2
            top = (h - spec.crop) // 2
            im = im.crop((left, top, left + spec.crop, top + spec.crop))
    else:
        im = im.resize((spec.resize, spec.resize), resample)
    return np.asarray(im, dtype=np.uint8)


def make_host_preprocess(spec: PreprocessSpec):
    """Per-image host fn for ImageBatchLoader: geometry only, uint8 HWC out."""
    return lambda rgb: resize_and_crop(rgb, spec)


def normalize_on_device(batch_u8, spec: PreprocessSpec):
    """uint8 (B, S, S, 3) → float (B, 3, S, S) scaled+normalized.  Runs under
    jit inside the extraction step so XLA fuses it with patch embedding."""
    import jax.numpy as jnp

    x = batch_u8.astype(jnp.float32) / 255.0
    mean = jnp.asarray(spec.mean, jnp.float32)
    std = jnp.asarray(spec.std, jnp.float32)
    x = (x - mean) / std
    return x.transpose(0, 3, 1, 2)
