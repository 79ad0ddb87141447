"""Config-driven training entry point: ``python -m gpt2_image_captioning_tpu.training_pipeline``.

The working equivalent of the reference's ``src/training_pipeline.py`` driver
(which, as committed, is broken: it reads the nonexistent ``mapping_network``
config key and never resolves ``${...}`` interpolation —
``src/training_pipeline.py:21-24`` vs ``config.yml:14``).  This driver uses
the same ``config.yml`` schema via the framework's interpolating loader.

Builds: datasets from the ``{split}_{encoder}_embeddings.pt`` convention →
mapping network by ``mapping.type`` → captioner (frozen/unfrozen GPT-2,
optional task prompt) → ``train()`` (and the RAT variant when
``retrieval_augmentation: true``).
"""

from __future__ import annotations

import argparse
import os

import jax

from gpt2_image_captioning_tpu.core.config import Config, load_config
from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.core.precision import BF16, F32
from gpt2_image_captioning_tpu.data.dataset import CocoDataset
from gpt2_image_captioning_tpu.data.tokenizer import load_gpt2_tokenizer
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models.mapping import make_mapping_config


def build_model(cfg: Config, tokenizer, gpt_params=None, gpt_config=None) -> C.ImageCaptioningModel:
    """config.yml blocks → ImageCaptioningModel (mapping net by
    ``mapping.type``, freeze/prompt by ``image_captioning.*``)."""
    mapping_cfg = make_mapping_config(cfg.mapping)
    prompt = cfg.image_captioning.get("prefix_task_prompt")
    task_ids = tuple(tokenizer.encode(prompt)) if prompt else None
    ccfg = C.CaptionerConfig(
        gpt2=gpt_config or G.GPT2Config.gpt2_124m(),
        mapping=mapping_cfg,
        task_prompt_ids=task_ids,
        freeze_gpt_weights=cfg.image_captioning.get("freeze_gpt_weights", True),
        eos_token_id=tokenizer.eos_token_id,
        remat=bool(cfg.get("tpu", {}).get("remat", False)),
    )
    policy = BF16 if cfg.get("tpu", {}).get("compute_dtype", "bfloat16") == "bfloat16" else F32
    return C.ImageCaptioningModel(
        ccfg,
        tokenizer=tokenizer,
        rng=jax.random.PRNGKey(cfg.get("seed", 42)),
        gpt_params=gpt_params,
        policy=policy,
    )


def embeddings_file(cfg: Config, split: str) -> str:
    """``{embeddings_path}/{split}_{vision_encoder}_embeddings.pt`` — the
    layout the sweep runner uses (reference ``sweep.py:59-76``)."""
    return os.path.join(
        cfg.paths.embeddings_path, f"{split}_{cfg.vision_encoder}_embeddings.pt"
    )


def build_datasets(cfg: Config, tokenizer) -> tuple[CocoDataset, CocoDataset]:
    train_ds = CocoDataset(
        embeddings_file(cfg, "train"),
        os.path.join(cfg.paths.annotations_path, "captions_train2017.json"),
        tokenizer=tokenizer,
        max_length=cfg.max_caption_length,
    )
    val_ds = CocoDataset(
        embeddings_file(cfg, "val"),
        os.path.join(cfg.paths.annotations_path, "captions_val2017.json"),
        tokenizer=tokenizer,
        max_length=cfg.max_caption_length,
    )
    return train_ds, val_ds


def run(cfg: Config, save_dir: str | None = None, gpt_params=None) -> dict:
    from gpt2_image_captioning_tpu.train.loop import train

    tokenizer = load_gpt2_tokenizer()
    train_ds, val_ds = build_datasets(cfg, tokenizer)
    model = build_model(cfg, tokenizer, gpt_params=gpt_params)
    mesh_cfg = cfg.get("tpu", {}).get("mesh", {})
    mesh = create_mesh(MeshSpec(dp=mesh_cfg.get("dp", -1), tp=mesh_cfg.get("tp", 1)))

    if cfg.get("retrieval_augmentation", False):
        from gpt2_image_captioning_tpu.retrieval.rat_pipeline import run_rat_training

        return run_rat_training(
            cfg, model, train_ds, val_ds, mesh=mesh, save_dir=save_dir or cfg.paths.checkpoints_path
        )

    return train(
        train_ds,
        model,
        batch_size=cfg.training.batch_size,
        num_epochs=cfg.training.num_epochs,
        num_workers=cfg.training.num_workers,
        learning_rate=cfg.training.learning_rate,
        num_warmup_steps=cfg.training.num_warmup_steps,
        save_every_epoch=cfg.training.save_every_epoch,
        outputs_dir=save_dir or cfg.paths.checkpoints_path,
        grad_accum_steps=cfg.get("tpu", {}).get("grad_accum_steps", 1),
        val_dataset=val_ds,
        val_annotations_path=os.path.join(cfg.paths.annotations_path, "captions_val2017.json"),
        eval_every_epoch=cfg.validation.eval_every_epoch,
        eval_batch_size=cfg.validation.batch_size,
        eval_max_length=cfg.max_caption_length,
        eval_temperature=cfg.validation.temperature,
        eval_top_p=cfg.validation.top_p,
        eval_decode_precision=cfg.validation.get("decode_precision", None),
        mesh=mesh,
        seed=cfg.get("seed", 42),
    )


def main() -> None:
    parser = argparse.ArgumentParser(description="Train the TPU captioner from config.yml")
    parser.add_argument("--config", default="config.yml")
    parser.add_argument("--save-dir", default=None)
    args = parser.parse_args()
    run(load_config(args.config), save_dir=args.save_dir)


if __name__ == "__main__":
    main()
