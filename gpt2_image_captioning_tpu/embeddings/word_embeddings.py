"""Caption text-embedding extraction (feeds the retrieval vector stores).

The reference CLIP-text-encodes every COCO caption and groups results by
image filename into ``.pt`` artifacts shaped
``[{"filenames": fname, "embeddings": [{"caption_id", "embedding"}]}]``
(reference ``src/embeddings/word_embeddings.py:85-171``).  Here the encode is
one jit-compiled batched program over the CLIP text tower; the artifact
format is kept byte-compatible.
"""

from __future__ import annotations

import json
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.core.precision import BF16, Policy


def map_caption_id_to_caption(annotations_path: str) -> dict[int, str]:
    """caption_id → caption text (reference ``word_embeddings.py:39-45``)."""
    with open(annotations_path, "r") as f:
        coco = json.load(f)
    return {a["id"]: a["caption"] for a in coco["annotations"]}


def extract_caption_embeddings(
    annotations_path: str,
    output_path: str | None,
    text_params: dict,
    text_cfg,
    tokenizer,
    batch_size: int = 256,
    policy: Policy = BF16,
) -> list[dict[str, Any]]:
    """Encode every caption, grouped by image filename.

    Returns (and optionally saves as ``.pt``) the reference's grouped
    structure.  Image filenames are reconstructed from the annotations'
    ``images`` entries (``file_name``), falling back to the COCO zero-padded
    convention.
    """
    from gpt2_image_captioning_tpu.models import clip as CL

    with open(annotations_path, "r") as f:
        coco = json.load(f)
    id_to_fname = {im["id"]: im.get("file_name", f"{im['id']:012d}.jpg") for im in coco["images"]}
    anns = coco["annotations"]

    @jax.jit
    def encode(ids):
        return CL.encode_text(text_params, text_cfg, ids, policy=policy, normalize=True)

    # one fixed-shape compiled program; tail batch padded
    texts = [a["caption"] for a in anns]
    n = len(texts)
    feats = np.zeros((n, text_cfg.projection_dim), np.float32)
    t0 = time.perf_counter()
    for start in range(0, n, batch_size):
        chunk = texts[start : start + batch_size]
        pad = batch_size - len(chunk)
        enc = tokenizer(chunk + [""] * pad)
        ids = jnp.asarray(enc["input_ids"][:, : text_cfg.max_position_embeddings])
        out = np.asarray(encode(ids))
        feats[start : start + len(chunk)] = out[: len(chunk)]
    dt = time.perf_counter() - t0
    print(f"Encoded {n} captions in {dt:.1f}s ({n / max(dt, 1e-9):.1f} cap/s)")

    grouped: dict[str, list[dict[str, Any]]] = {}
    for a, vec in zip(anns, feats):
        fname = id_to_fname[a["image_id"]]
        grouped.setdefault(fname, []).append({"caption_id": a["id"], "embedding": vec})

    result = [{"filenames": f, "embeddings": entries} for f, entries in grouped.items()]
    if output_path:
        import torch

        torch_result = [
            {
                "filenames": item["filenames"],
                "embeddings": [
                    {"caption_id": e["caption_id"], "embedding": torch.from_numpy(np.array(e["embedding"]))}
                    for e in item["embeddings"]
                ],
            }
            for item in result
        ]
        torch.save(torch_result, output_path)
        print(f"Saved caption embeddings for {len(result)} images to {output_path}")
    return result


def main() -> None:
    """CLI: ``python -m gpt2_image_captioning_tpu.embeddings.word_embeddings``
    — encode all captions of an annotations file (the reference's
    word-embeddings notebook flow, ``src/embeddings/word_embeddings.py:85-171``)."""
    import argparse

    from gpt2_image_captioning_tpu.data.tokenizer import load_clip_tokenizer
    from gpt2_image_captioning_tpu.models import clip as CL
    from gpt2_image_captioning_tpu.models.porting import port_clip_text

    p = argparse.ArgumentParser(description="Extract caption text embeddings (CLIP)")
    p.add_argument("--annotations", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", default=None, help="CLIP safetensors (full model)")
    p.add_argument("--batch-size", type=int, default=256)
    args = p.parse_args()

    cfg = CL.CLIPTextConfig()
    if args.checkpoint:
        from safetensors.numpy import load_file

        params = port_clip_text(load_file(args.checkpoint), cfg)
    else:
        import jax

        params = CL.init_text(jax.random.PRNGKey(0), cfg)
    extract_caption_embeddings(
        args.annotations, args.output, params, cfg, load_clip_tokenizer(),
        batch_size=args.batch_size,
    )


if __name__ == "__main__":
    main()
