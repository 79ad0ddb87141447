"""Batched caption generation + evaluation driver.

The reference iterates caption-level batches, generates with an uncached
Python loop, and dedups first-seen image ids (``src/eval.py:160-229``).  Here:

- batches are built over **unique images** up front (identical output set,
  ~5× less decode work on COCO's ~5 captions/image),
- every batch has the same static shape (last batch padded + ``valid`` mask),
  so the whole decode loop is **one compiled XLA program** reused across
  batches — KV-cached, early-exiting (``models.captioner.generate``),
- decoding modes: greedy / top-p sampling (reference semantics) and beam
  search (capability add).

Also provides ``generate_test_caption_predictions`` (the reference's
``src/test.py:11-82``): dump COCO-format ``results.json``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np

from gpt2_image_captioning_tpu.evaluation.evaluate import (
    EvalMetrics,
    evaluate_captions,
    save_epoch_artifacts,
)
from gpt2_image_captioning_tpu.models import captioner as C


def generate_predictions(
    model,
    dataset,
    *,
    batch_size: int = 32,
    max_length: int = 50,
    temperature: float = 0.0,
    top_p: float = 0.9,
    decode: str = "sample",
    beam_size: int = 4,
    rng: jax.Array | None = None,
    verbose: bool = True,
    db_store=None,
    top_k: int | None = None,
    top_i: int | None = None,
    mesh=None,
    decode_precision: str | None = None,
) -> list[dict[str, Any]]:
    """Generate one caption per unique image → ``[{"image_id", "caption"}]``.

    ``decode="sample"`` reproduces the reference's temperature/top-p dispatch
    (greedy when temperature == 0); ``decode="beam"`` uses beam search.
    With ``db_store`` set (RAT models) image embeddings are retrieval-
    augmented before decoding (reference ``src/eval.py:232-308``).
    ``decode_precision="bf16"`` decodes with bfloat16-stored weights
    (+25-32% throughput; retrieval augmentation stays at model precision);
    ``"int8"`` uses the W8A8 quantized fused kernel (docs/PERF_NOTES.md).
    """
    tokenizer = dataset.tokenizer
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    # "int8" = bf16-stored weights + int8 W8A8 packed tiles for the fused
    # kernel (the facade does the same mapping)
    quant = decode_precision == "int8"
    dec_tr, dec_fz, dec_pol = model.decode_params(
        "bf16" if quant else decode_precision
    )
    predictions: list[dict[str, Any]] = []
    n_batches = 0
    t0 = time.perf_counter()
    augment = None
    if db_store is not None:
        import dataclasses as _dc

        from gpt2_image_captioning_tpu.models import rat as R

        rcfg = _dc.replace(
            model.rcfg,
            top_k=top_k or model.rcfg.top_k,
            top_i=top_i or model.rcfg.top_i,
        )
        augment = lambda emb: R.augment_batch(
            model.trainable, rcfg, db_store, emb, model.policy
        )
    shard = None
    if mesh is not None and mesh.shape.get("dp", 1) > 1:
        from gpt2_image_captioning_tpu.core.mesh import batch_sharding

        sharding = batch_sharding(mesh)
        shard = lambda emb: jax.device_put(np.asarray(emb), sharding)
    packed = None
    fused_ok = (
        mesh is None
        and C.DS.fused_greedy_enabled(model.cfg.gpt2, dec_pol, None)
    )
    if quant and not fused_ok:
        # int8 is a property of the fused kernel's packed W8A8 tiles; without
        # it the decode actually runs the bf16 XLA path.  Be loud rather than
        # mislabeling results (ADVICE r2).  Beam batches whose row count falls
        # off the kernel's 128-row grid fall back inside beam_generate with
        # the same warning.
        import warnings

        warnings.warn(
            "decode_precision='int8' requested but the fused decode kernel is "
            "not engaged (non-TPU backend, GIC_DISABLE_FUSED_DECODE, or mesh) "
            "— decoding at bf16 instead.",
            RuntimeWarning,
            stacklevel=2,
        )
        quant = False
    if fused_ok and decode != "beam":
        # pre-tile the weights for the fused decode kernel once per eval pass
        # (greedy AND top-p sampled decode both ride the fused kernel now);
        # 256-divisible batches pack narrow tiles for 256-row kernel blocks
        packed = C.prepare_decode_weights(
            dec_tr, dec_fz, model.cfg, dec_pol, quant=quant,
            tw=384 if batch_size % 256 == 0 else None,
        )

    def dispatch(i, batch):
        if decode == "beam":
            return C.beam_generate(
                dec_tr, dec_fz, model.cfg, batch["image_embedding"],
                max_length=max_length, beam_size=beam_size, policy=dec_pol,
                mesh=mesh, decode_quant=quant,
            )
        return C.generate(
            dec_tr, dec_fz, model.cfg, batch["image_embedding"],
            max_length=max_length, temperature=temperature, top_p=top_p,
            rng=jax.random.fold_in(rng, i), policy=dec_pol, packed=packed,
            mesh=mesh, decode_quant=quant,
        )

    def consume(batch, ids):
        captions = tokenizer.batch_decode(np.asarray(ids), skip_special_tokens=True)
        for img_id, caption, valid in zip(batch["image_id"], captions, batch["valid"]):
            if valid:
                predictions.append({"image_id": int(img_id), "caption": caption})

    # one-deep pipeline: while the device decodes batch i, the host BPE-decodes
    # and collects batch i-1 (np.asarray is the sync point on this backend)
    pending = None
    for i, batch in enumerate(dataset.unique_image_batches(batch_size)):
        if augment is not None:
            batch = dict(batch, image_embedding=augment(batch["image_embedding"]))
        if shard is not None:
            batch = dict(batch, image_embedding=shard(batch["image_embedding"]))
        ids = dispatch(i, batch)
        if pending is not None:
            consume(*pending)
        pending = (batch, ids)
        n_batches += 1
    if pending is not None:
        consume(*pending)
    if verbose:
        dt = time.perf_counter() - t0
        eff = "int8" if quant else (decode_precision or "model")
        print(
            f"Generated {len(predictions)} captions in {dt:.1f}s "
            f"({len(predictions) / max(dt, 1e-9):.1f} img/s, {n_batches} batches, "
            f"precision={eff})"
        )
    return predictions


def generate_and_evaluate(
    model,
    dataset,
    annotations_path: str,
    batch_size: int = 32,
    max_length: int = 50,
    temperature: float = 1.0,
    top_p: float = 0.9,
    decode: str = "sample",
    beam_size: int = 4,
    rng: jax.Array | None = None,
    db_store=None,
    top_k: int | None = None,
    top_i: int | None = None,
    mesh=None,
    decode_precision: str | None = None,
    **_ignored,
) -> tuple[list[dict[str, Any]], EvalMetrics]:
    """Generate for the whole dataset, then score (reference
    ``src/eval.py:160-229``; RAT variant :232-308 via ``db_store``)."""
    predictions = generate_predictions(
        model,
        dataset,
        batch_size=batch_size,
        max_length=max_length,
        temperature=temperature,
        top_p=top_p,
        decode=decode,
        beam_size=beam_size,
        rng=rng,
        db_store=db_store,
        top_k=top_k,
        top_i=top_i,
        mesh=mesh,
        decode_precision=decode_precision,
    )
    metrics = evaluate_captions(predictions, annotations_path)
    return predictions, metrics


def evaluate_epoch(
    model,
    dataset,
    annotations_path: str,
    epoch: int,
    split_name: str,
    batch_size: int = 32,
    max_length: int = 50,
    temperature: float = 1.0,
    top_p: float = 0.9,
    output_dir: str = "eval_results",
    decode: str = "sample",
    beam_size: int = 4,
    rat: bool = False,
    db_store=None,
    top_k: int | None = None,
    top_i: int | None = None,
    mesh=None,
    decode_precision: str | None = None,
    **_ignored,
) -> EvalMetrics:
    """Per-epoch eval with the reference's artifact naming
    (``epoch_{n}_{split}_predictions[_rat].json`` etc., ``src/eval.py:368-386``)."""
    print(f"\n{'=' * 60}\nEpoch {epoch} | {split_name.upper()} Evaluation\n{'=' * 60}")
    predictions, metrics = generate_and_evaluate(
        model,
        dataset,
        annotations_path,
        batch_size=batch_size,
        max_length=max_length,
        temperature=temperature,
        top_p=top_p,
        decode=decode,
        beam_size=beam_size,
        db_store=db_store,
        top_k=top_k,
        top_i=top_i,
        mesh=mesh,
        decode_precision=decode_precision,
    )
    print(f"\nResults: {metrics}")
    save_epoch_artifacts(predictions, metrics, output_dir, epoch, split_name, rat=rat)
    return metrics


def generate_test_caption_predictions(
    model,
    dataset,
    output_path: str = "results.json",
    batch_size: int = 32,
    max_length: int = 50,
    temperature: float = 0.0,
    top_p: float = 0.9,
    decode: str = "sample",
    beam_size: int = 4,
    db_store=None,
    top_k: int | None = None,
    top_i: int | None = None,
    decode_precision: str | None = None,
) -> list[dict[str, Any]]:
    """Dump COCO-schema predictions ``[{"image_id": int, "caption": str}]``
    (reference ``src/test.py:11-82``; RAT variant :85-165 via ``db_store``;
    same schema as ``sample_output/results.json``)."""
    predictions = generate_predictions(
        model,
        dataset,
        batch_size=batch_size,
        max_length=max_length,
        temperature=temperature,
        top_p=top_p,
        decode=decode,
        beam_size=beam_size,
        db_store=db_store,
        top_k=top_k,
        top_i=top_i,
        decode_precision=decode_precision,
    )
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    with open(output_path, "w") as f:
        json.dump(predictions, f, indent=2)
    print(f"Predictions saved to: {output_path}")
    return predictions
