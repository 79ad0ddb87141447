"""Hyperparameter sweep runner: ``python -m gpt2_image_captioning_tpu.sweep``.

Capability parity with the reference's ``sweep.py`` orchestration
(``sweep.py:172-262``): for every ``model.<id>`` override block in
``automation_config.yml``, recursively merge onto ``config.yml``, train +
validate, record timing/parameter counts, and run a final test evaluation on
the held-out split — with per-run artifacts under
``checkpoints/checkpoint_<id>/``:

- ``config_<id>.yml`` (the merged run config)
- ``model_epoch_{n}`` checkpoints + ``eval_results/`` epoch JSONs
- ``training_info_<id>.txt`` (duration, parameter counts, description)
- ``test_predictions_<id>.json`` + ``test_metrics_<id>.json``
"""

from __future__ import annotations

import argparse
import logging
import os
import time

from gpt2_image_captioning_tpu.core.config import Config, load_config, update_cfg
from gpt2_image_captioning_tpu.core.tree import count_model_parameters
from gpt2_image_captioning_tpu.data.dataset import CocoDataset
from gpt2_image_captioning_tpu.data.tokenizer import load_gpt2_tokenizer
from gpt2_image_captioning_tpu.evaluation.evaluate import evaluate_captions
from gpt2_image_captioning_tpu.evaluation.generation import generate_test_caption_predictions
from gpt2_image_captioning_tpu.training_pipeline import build_model, embeddings_file, run

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")
log = logging.getLogger("sweep")


def select_test_checkpoint(filenames) -> str | None:
    """Pick the checkpoint the final test pass should load.

    Matches the reference's intent (``sweep.py:219-259``: evaluate the model
    that training produced): the *highest-epoch* ``best_model_epoch_{n}``
    if any best-by-CIDEr checkpoint exists, otherwise the highest-epoch
    ``model_epoch_{n}``.  Epoch numbers are parsed numerically — plain
    lexicographic sorting would pick epoch 1 over epoch 3 and sort 10
    before 2.
    """
    import re

    pat = re.compile(r"^(best_)?model_epoch_(\d+)\.(npz|pt)$")
    candidates = []
    for f in filenames:
        if m := pat.match(f):
            candidates.append((bool(m.group(1)), int(m.group(2)), f))
    if not candidates:
        return None
    # best checkpoints first, then highest epoch
    return max(candidates, key=lambda t: (t[0], t[1]))[2]


def run_one(cfg: Config, run_id: str, base_dir: str, description: str = "") -> dict:
    save_dir = os.path.join(base_dir, f"checkpoint_{run_id}")
    os.makedirs(save_dir, exist_ok=True)
    cfg.save(os.path.join(save_dir, f"config_{run_id}.yml"))

    t0 = time.perf_counter()
    history = run(cfg, save_dir=save_dir)
    duration = time.perf_counter() - t0

    # parameter counts on a freshly-built model (same config)
    tokenizer = load_gpt2_tokenizer()
    model = build_model(cfg, tokenizer)
    db_store = None
    if cfg.get("retrieval_augmentation", False):
        # the reference reuses the training store for the RAT test pass
        # (sweep.py:241-251); rebuild it and wrap the model
        from gpt2_image_captioning_tpu.models.rat import (
            RATConfig,
            RetrievalAugmentedTransformer,
            init_aggregator,
        )
        from gpt2_image_captioning_tpu.retrieval.rat_pipeline import build_store

        rcfg = RATConfig(
            embed_dim=cfg.retrieval.embed_dim,
            aggregation_type=cfg.retrieval.get("aggregation_type", "mean"),
            top_k=cfg.retrieval.top_k,
            top_i=cfg.retrieval.top_i,
        )
        rat_model = RetrievalAugmentedTransformer.__new__(RetrievalAugmentedTransformer)
        rat_model.__dict__.update(model.__dict__)
        rat_model.rcfg = rcfg
        import jax as _jax

        agg = init_aggregator(_jax.random.PRNGKey(cfg.get("seed", 42) + 1), rcfg)
        if agg:
            rat_model.trainable["aggregator"] = agg
        model = rat_model
        db_store = build_store(cfg)
    trainable, total = count_model_parameters(model.trainable, model.frozen)
    # reload the best/latest trained weights for the test pass
    best = select_test_checkpoint(os.listdir(save_dir))
    if best:
        model.load_saved_parameters(os.path.join(save_dir, best))
        log.info("Loaded %s for test evaluation", best)

    with open(os.path.join(save_dir, f"training_info_{run_id}.txt"), "w") as f:
        f.write(f"run id: {run_id}\n")
        f.write(f"description: {description}\n")
        f.write(f"training duration (s): {duration:.1f}\n")
        f.write(f"trainable parameters: {trainable}\n")
        f.write(f"total parameters: {total}\n")
        f.write(f"best val CIDEr: {history.get('best_val_cider')}\n")
        f.write(f"best epoch: {history.get('best_epoch')}\n")

    # Final test evaluation on the held-out split (reference: val2014,
    # sweep.py:219-259)
    test_emb = embeddings_file(cfg, "test")
    test_ann = os.path.join(cfg.paths.annotations_path, "captions_val2014.json")
    if os.path.exists(test_emb) and os.path.exists(test_ann):
        test_ds = CocoDataset(
            test_emb, test_ann, tokenizer=tokenizer, max_length=cfg.max_caption_length
        )
        tpu_block = cfg.get("tpu", {})
        preds = generate_test_caption_predictions(
            model,
            test_ds,
            output_path=os.path.join(save_dir, f"test_predictions_{run_id}.json"),
            batch_size=cfg.validation.batch_size,
            max_length=cfg.max_caption_length,
            temperature=cfg.validation.temperature,
            top_p=cfg.validation.top_p,
            decode="beam" if tpu_block.get("decode") == "beam" else "sample",
            beam_size=tpu_block.get("beam_size", 4),
            decode_precision=cfg.validation.get("decode_precision", None),
            db_store=db_store,
            top_k=cfg.retrieval.top_k if db_store is not None else None,
            top_i=cfg.retrieval.top_i if db_store is not None else None,
        )
        metrics = evaluate_captions(preds, test_ann)
        import json

        with open(os.path.join(save_dir, f"test_metrics_{run_id}.json"), "w") as f:
            json.dump(metrics.to_dict(), f, indent=2)
        log.info("Test metrics [%s]: %s", run_id, metrics)
    else:
        log.info("Test split not found (%s) — skipping test evaluation", test_emb)
    return history


def main() -> None:
    parser = argparse.ArgumentParser(description="Run the config sweep")
    parser.add_argument("--config", default="config.yml")
    parser.add_argument("--automation", default="automation_config.yml")
    parser.add_argument("--output-dir", default="checkpoints")
    parser.add_argument("--only", nargs="*", help="subset of model ids to run")
    args = parser.parse_args()

    base = load_config(args.config)
    updates = load_config(args.automation)
    model_updates = updates.get("model", {})
    ids = [str(i) for i in (args.only or model_updates.keys())]

    for run_id in ids:
        overrides = model_updates.get(run_id) or model_updates.get(int(run_id))
        if overrides is None:
            log.warning("No overrides for model id %s — skipping", run_id)
            continue
        overrides = overrides.to_dict(resolve=False) if isinstance(overrides, Config) else dict(overrides)
        description = overrides.pop("description", "")
        cfg = update_cfg(base, overrides)
        log.info("=== Sweep run %s: %s ===", run_id, description)
        run_one(cfg, run_id, args.output_dir, description)


if __name__ == "__main__":
    main()
