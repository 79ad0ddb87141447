"""On-chip end-to-end serving smoke: JPEG files → captions via
serving.CaptionService at flagship scale (CLIP ViT-B/32 + GPT-2 124M,
random-init bf16).

Measures the true request path: host JPEG decode + resize (C++ imagepipe /
PIL), device encode + fused decode, BPE detokenize.  On this 1-core host
the pipeline is host-decode-bound (imagepipe ~187 img/s/core, PERF_NOTES);
the point is that the END-TO-END path runs on real hardware.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/serving_smoke.py \
      > /tmp/serving_smoke.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.data.tokenizer import GPT2BPETokenizer, bytes_to_unicode
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.serving import CaptionService

    assert jax.default_backend() != "cpu", "run on the TPU"

    # synthetic byte-level tokenizer (no downloaded assets; vocab-size match)
    b2u = bytes_to_unicode()
    symbols = [b2u[i] for i in range(256)]
    vocab = {t: i for i, t in enumerate(symbols)}
    vocab["<|endoftext|>"] = len(vocab)
    # pad ids up to the GPT-2 vocab so decode ids always map somewhere
    tok = GPT2BPETokenizer(vocab, [], eos_token="<|endoftext|>")

    class WideTok:
        """Maps any id < 50257 into the tiny decoder (mod vocab)."""

        eos_token_id = 50256

        def batch_decode(self, ids, skip_special_tokens=True):
            ids = np.asarray(ids) % len(vocab)
            return tok.batch_decode(ids, skip_special_tokens=False)

    log("init CLIP ViT-B/32 + GPT-2 124M (random, bf16)...")
    vcfg = CL.CLIPVisionConfig.vit_b32()
    vparams = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
    )
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    model = C.ImageCaptioningModel(ccfg, tokenizer=WideTok(), policy=BF16)
    model.trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.trainable)
    model.frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), model.frozen)

    svc = CaptionService(
        model, vparams, vcfg, encoder="clip", batch_size=64, max_length=50,
        temperature=0.0, top_p=1.0, decode_precision="bf16", policy=BF16,
    )

    n = 128
    log(f"writing {n} synthetic JPEGs...")
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp()
    for i in range(n):
        arr = rng.integers(0, 255, size=(480, 640, 3)).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"img_{i:04d}.jpg"), quality=90)

    log("captioning (compile + run)...")
    t0 = time.perf_counter()
    caps = svc.caption_dir(d)
    dt = time.perf_counter() - t0
    assert len(caps) == n
    log(f"first caption bytes: {list(caps.values())[0][:40]!r}")
    log(f"cold end-to-end: {n / dt:.1f} img/s (incl. compile)")

    t0 = time.perf_counter()
    caps = svc.caption_dir(d)
    dt = time.perf_counter() - t0
    log(f"warm end-to-end: {n / dt:.1f} img/s (host JPEG decode + device)")
    log(f"service stats: {svc.stats}")
    log("done")


if __name__ == "__main__":
    main()
