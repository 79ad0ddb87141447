"""The training loop: data-parallel (optionally tensor-parallel) caption
fine-tuning compiled end-to-end under ``jax.jit`` over a device mesh.

Capability parity with the reference's ``train()`` (``src/train.py:20-254``):
AdamW(wd=0.01) + HF linear-warmup schedule, gradient accumulation with
1/accum loss scaling, global-norm clipping at 1.0, per-epoch checkpointing
(``model_epoch_{n}``), per-epoch COCO evaluation with best-by-CIDEr
checkpoints (``best_model_epoch_{n}``), TensorBoard scalars, loss/metric
curves, ``val_metrics_summary.json``, and the same returned history dict.

TPU-first differences:

- One **jitted train step** consumes ``grad_accum_steps`` micro-batches via
  ``lax.scan`` (no Python-level autograd bookkeeping); parameters and
  optimizer state are donated, so the step is allocation-free at steady state.
- The batch is sharded over the mesh's ``dp`` axis; gradients are reduced by
  XLA-inserted collectives over ICI (no NCCL/DDP analog — SURVEY.md §2.3).
- The loss is exact-parity with torch: mean over non-ignored tokens per
  micro-batch, averaged over accumulation steps.
"""

from __future__ import annotations

import os
import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from gpt2_image_captioning_tpu.core.logging import MetricsLogger, StepTimer
from gpt2_image_captioning_tpu.core.mesh import DATA_AXIS, create_mesh
from gpt2_image_captioning_tpu.data.dataset import Batcher, CocoDataset
from gpt2_image_captioning_tpu.evaluation.generation import evaluate_epoch
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.train import checkpoint, optim
from gpt2_image_captioning_tpu.utils import save_eval_metric_curves, save_loss_curves


def _spec_to_sharding(mesh, tree):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s), tree, is_leaf=lambda x: isinstance(x, P)
    )


def make_train_step(
    cfg: C.CaptionerConfig,
    opt_cfg: optim.AdamWConfig,
    mesh,
    policy,
    grad_accum_steps: int = 1,
    remat: bool = False,
    rat_cfg=None,
    fused_retrieval: bool = False,
):
    """Build the jitted, sharded train step.

    Step signature: (trainable, opt_state, frozen, batch, extra) →
    (trainable, opt_state, loss, grad_norm).  With accumulation the batch
    leaves carry a leading (accum, micro, ...) shape.  ``extra`` carries
    replicated side inputs — the DeviceVectorStore arrays for fused RAT
    retrieval — and is empty otherwise.
    """
    if rat_cfg is None:
        def loss_inner(trainable, frozen, batch, extra):
            return C.loss_fn(trainable, frozen, cfg, batch, policy)
    elif fused_retrieval:
        from gpt2_image_captioning_tpu.models import rat as R

        def loss_inner(trainable, frozen, batch, extra):
            return R.loss_fn_fused(trainable, frozen, cfg, rat_cfg, batch, extra, policy)
    else:
        from gpt2_image_captioning_tpu.models import rat as R

        def loss_inner(trainable, frozen, batch, extra):
            return R.loss_fn(trainable, frozen, cfg, rat_cfg, batch, policy)

    if remat:
        loss_inner = jax.checkpoint(loss_inner)

    def micro_loss(trainable, frozen, batch, extra):
        s, c = loss_inner(trainable, frozen, batch, extra)
        return s / jnp.maximum(c, 1.0)

    def step(trainable, opt_state, frozen, batch, extra):
        if grad_accum_steps == 1:
            loss, grads = jax.value_and_grad(micro_loss)(trainable, frozen, batch, extra)
        else:
            def body(carry, micro):
                loss_acc, grads_acc = carry
                l, g = jax.value_and_grad(micro_loss)(trainable, frozen, micro, extra)
                return (loss_acc + l, jax.tree.map(jnp.add, grads_acc, g)), None

            zeros = jax.tree.map(lambda p: jnp.zeros_like(p, jnp.float32), trainable)
            (loss_sum, grads_sum), _ = jax.lax.scan(body, (jnp.zeros(()), zeros), batch)
            # the reference scales each micro loss by 1/accum and sums
            # (src/train.py:142-148) — identical to this average
            loss = loss_sum / grad_accum_steps
            grads = jax.tree.map(lambda g: g / grad_accum_steps, grads_sum)
        trainable, opt_state, gnorm = optim.step(opt_cfg, trainable, grads, opt_state)
        return trainable, opt_state, loss, gnorm

    if rat_cfg is None:
        tr_specs, fr_specs = C.partition_specs(cfg)
    else:
        from gpt2_image_captioning_tpu.models import rat as R

        tr_specs, fr_specs = R.partition_specs(cfg, rat_cfg)
    tr_sh = _spec_to_sharding(mesh, tr_specs)
    fr_sh = _spec_to_sharding(mesh, fr_specs)
    opt_sh = optim.AdamWState(step=NamedSharding(mesh, P()), mu=tr_sh, nu=tr_sh)
    if grad_accum_steps == 1:
        batch_spec = P(DATA_AXIS)
    else:
        batch_spec = P(None, DATA_AXIS)
    batch_sh = NamedSharding(mesh, batch_spec)
    extra_sh = NamedSharding(mesh, P())  # store arrays replicated

    return jax.jit(
        step,
        in_shardings=(tr_sh, opt_sh, fr_sh, batch_sh, extra_sh),
        out_shardings=(tr_sh, opt_sh, NamedSharding(mesh, P()), NamedSharding(mesh, P())),
        donate_argnums=(0, 1),
    ), (tr_sh, fr_sh, opt_sh, batch_sh)


def _put_global_batch(group: dict, batch_sh) -> dict:
    """Host batch → device arrays under ``batch_sh``.

    Single-process: a plain sharded ``device_put``.  Multi-process
    (multi-host), where each host's Batcher yields only its contiguous shard
    of the global batch, every leaf is assembled into a global jax.Array via
    ``jax.make_array_from_process_local_data`` — the multihost ingestion path
    (SURVEY.md §2.3's DCN-aware plan).
    """
    if jax.process_count() == 1:
        return jax.device_put(group, batch_sh)
    return {
        k: jax.make_array_from_process_local_data(batch_sh, np.asarray(v))
        for k, v in group.items()
    }


def _prefetched(iterable, transform, depth: int = 2):
    """Apply ``transform`` in a background thread, ``depth`` items ahead.

    Overlaps host-side work (C++ HNSW / persistent-store RAT retrieval) with
    the device running the previous step — the reference's thread pool did
    per-item lookups inside the step instead (``src/models.py:697-715``);
    here the whole NEXT batch's retrieval runs while the TPU computes.
    Exceptions from the worker re-raise in the consumer; order is preserved.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=depth)
    sentinel = object()
    err: list[BaseException] = []

    def worker():
        try:
            for item in iterable:
                q.put(transform(item))
        except BaseException as e:  # noqa: BLE001 — propagated to consumer
            err.append(e)
        finally:
            q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            if err:
                raise err[0]
            return
        yield item


def _group_microbatches(batches: list[dict], accum: int) -> dict:
    """Stack ``accum`` micro-batches along a new leading axis, padding the
    final group with all-ignored dummies (zero loss and gradient)."""
    while len(batches) < accum:
        dummy = {k: np.copy(v) for k, v in batches[-1].items()}
        dummy["labels"] = np.full_like(dummy["labels"], -100)
        batches.append(dummy)
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def train(
    train_dataset: CocoDataset,
    model: C.ImageCaptioningModel,
    batch_size: int,
    num_epochs: int,
    num_workers: int = 4,  # accepted for API parity; host batching is vectorized
    learning_rate: float = 1e-4,
    num_warmup_steps: int = 0,
    save_every_epoch: int = 5,
    outputs_dir: str = "checkpoints",
    grad_accum_steps: int = 1,
    # Evaluation parameters (reference parity)
    val_dataset: CocoDataset | None = None,
    val_annotations_path: str | None = None,
    eval_every_epoch: int = 1,
    eval_batch_size: int | None = None,
    eval_max_length: int = 50,
    eval_temperature: float = 0.0,
    eval_top_p: float = 0.9,
    eval_decode_precision: str | None = None,
    # TPU-specific
    mesh=None,
    seed: int = 0,
    checkpoint_format: str = "npz",  # "npz" (native) or "pt" (reference interchange)
    log_dir: str = "logs",
    remat: bool = False,
    rat_cfg=None,
    db_store=None,
    save_optimizer_state: bool = True,
    resume: bool = False,
    stop_after_epochs: int | None = None,
    profile_dir: str | None = None,
) -> dict[str, Any]:
    """Train the captioner; returns the reference's history dict
    (``epoch_losses`` / ``val_metrics`` / ``best_val_cider`` / ``best_epoch``).

    With ``rat_cfg`` + ``db_store`` set this is retrieval-augmented training:
    a DeviceVectorStore retrieves fused inside the jitted step; any host store
    (C++ HNSW / persistent) retrieves per micro-batch through the store API.

    ``resume=True`` continues from the latest ``model_epoch_{n}`` +
    ``optimizer_epoch_{n}`` pair in ``outputs_dir`` (optimizer state included
    — a capability the reference lacks, its checkpoints being model-only;
    SURVEY.md §5).  ``stop_after_epochs`` bounds how many epochs THIS
    invocation runs while the LR schedule still spans the full ``num_epochs``
    (budgeted runs / crash-resume testing).  ``profile_dir`` captures a jax.profiler trace of the first
    post-warmup training step.
    """
    os.makedirs(outputs_dir, exist_ok=True)
    eval_dir = os.path.join(outputs_dir, "eval_results")
    os.makedirs(eval_dir, exist_ok=True)
    if val_dataset is not None and val_annotations_path is None:
        raise ValueError("val_annotations_path is required when val_dataset is provided")
    eval_batch_size = eval_batch_size or batch_size

    mesh = mesh or create_mesh()
    batcher = Batcher(train_dataset, batch_size, seed=seed)
    steps_per_epoch = batcher.steps_per_epoch  # micro-batches per epoch

    from gpt2_image_captioning_tpu.retrieval.exact import DeviceVectorStore

    fused_retrieval = isinstance(db_store, DeviceVectorStore)
    extra: dict = {}
    if rat_cfg is not None and fused_retrieval:
        extra = {
            "image_embeddings": db_store.image_embeddings,
            "caption_embeddings": db_store.caption_embeddings,
            "caption_table": db_store.caption_table,
        }

    def host_retrieve(batch: dict) -> dict:
        """Host-store RAT: attach retrieved caption embeddings to the batch."""
        results = db_store.retrieve_images_by_vector_similarity(
            np.asarray(batch["image_embedding"], np.float32), rat_cfg.top_i
        )
        filenames = [[f for f, _ in row] for row in results]
        retrieved = db_store.get_caption_embeddings(rat_cfg.top_k, filenames)
        return dict(batch, retrieved_embeddings=np.asarray(retrieved, np.float32))

    opt_cfg = optim.AdamWConfig(
        learning_rate=learning_rate,
        num_warmup_steps=num_warmup_steps,
        # reference passes len(dataloader)*num_epochs (src/train.py:99-103)
        num_training_steps=steps_per_epoch * num_epochs,
    )
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(
        model.cfg, opt_cfg, mesh, model.policy, grad_accum_steps,
        remat=remat, rat_cfg=rat_cfg, fused_retrieval=fused_retrieval,
    )

    start_epoch = 0
    init_opt = optim.init(model.trainable)
    if resume:
        import re as _re

        found = sorted(
            (int(m.group(1)), f)
            for f in os.listdir(outputs_dir)
            if (m := _re.match(r"model_epoch_(\d+)\.(npz|pt)$", f))
        )
        if found:
            last_epoch, ckpt_file = found[-1]
            model.trainable = checkpoint.load_captioner(
                os.path.join(outputs_dir, ckpt_file), model.trainable, model.cfg
            )
            opt_file = os.path.join(outputs_dir, f"optimizer_epoch_{last_epoch}.npz")
            if os.path.exists(opt_file):
                loaded = checkpoint.load_pytree(opt_file)
                init_opt = optim.AdamWState(
                    step=loaded["step"], mu=loaded["mu"], nu=loaded["nu"]
                )
            start_epoch = last_epoch
            print(f"Resumed from epoch {last_epoch} ({ckpt_file})")

    trainable = jax.device_put(model.trainable, tr_sh)
    frozen = jax.device_put(model.frozen, fr_sh)
    opt_state = jax.device_put(init_opt, opt_sh)

    logger = MetricsLogger(log_dir)
    timer = StepTimer()
    epoch_loss_values: list[float] = []
    val_metrics_history: list[dict[str, Any]] = []
    best_val_cider, best_epoch = -1.0, 0
    global_step = 0

    ckpt_ext = "pt" if checkpoint_format == "pt" else "npz"

    end_epoch = num_epochs
    if stop_after_epochs is not None:
        end_epoch = min(num_epochs, start_epoch + stop_after_epochs)
    for epoch in range(start_epoch, end_epoch):
        # losses stay on device during the epoch (no per-step host sync, so
        # dispatch runs ahead of the TPU); synced once per epoch for logging.
        losses: list[jax.Array] = []
        group_real_micro: list[int] = []  # real (non-padded) micro-batches per group
        pending: list[dict] = []
        t_epoch = time.perf_counter()

        def run_group(group, trainable, opt_state):
            group = {k: v for k, v in group.items() if k != "image_id"}
            group = _put_global_batch(group, batch_sh)
            timer.start()
            trainable, opt_state, loss, _gnorm = step_fn(
                trainable, opt_state, frozen, group, extra
            )
            timer.stop()
            losses.append(loss)
            return trainable, opt_state

        # profile exactly one post-warmup optimizer step of the first epoch
        profiling = [False]

        def maybe_start_profile(group_idx: int) -> None:
            if profile_dir and epoch == start_epoch and group_idx == 1:
                import jax.profiler as _prof

                _prof.start_trace(profile_dir)
                profiling[0] = True

        def maybe_stop_profile() -> None:
            if profiling[0]:
                import jax.profiler as _prof

                jax.tree.map(lambda x: x, trainable)
                _prof.stop_trace()
                profiling[0] = False

        group_idx = 0
        batch_iter = batcher.epoch(epoch)
        if rat_cfg is not None and not fused_retrieval:
            # prefetch host-store retrieval one batch ahead of the device
            batch_iter = _prefetched(batch_iter, host_retrieve)
        for batch in batch_iter:
            if grad_accum_steps == 1:
                group = batch
            else:
                pending.append(batch)
                if len(pending) < grad_accum_steps:
                    continue
                group = _group_microbatches(pending, grad_accum_steps)
                pending = []
            maybe_start_profile(group_idx)
            trainable, opt_state = run_group(group, trainable, opt_state)
            maybe_stop_profile()
            group_real_micro.append(grad_accum_steps)
            group_idx += 1
            global_step += 1
        if pending:  # trailing partial accumulation group
            n_real = len(pending)
            trainable, opt_state = run_group(
                _group_microbatches(pending, grad_accum_steps), trainable, opt_state
            )
            group_real_micro.append(n_real)
            global_step += 1

        losses_np = [float(l) for l in losses]
        for i, lf in enumerate(losses_np):
            logger.add_scalar("loss/train_step", lf, global_step - len(losses_np) + i + 1)
        n_groups = len(losses_np)
        # exact per-micro-batch epoch average: each group's loss is
        # sum(real micro losses)/accum, and the padded tail of the final
        # group contributes zero loss — undo the 1/accum scaling and divide
        # by the number of REAL micro-batches so the tail doesn't deflate it.
        total_micro = sum(group_real_micro)
        avg_loss = sum(losses_np) * grad_accum_steps / max(total_micro, 1)
        epoch_loss_values.append(avg_loss)
        dt = time.perf_counter() - t_epoch
        print(
            f"Epoch {epoch + 1} completed. Average Loss: {avg_loss:.4f} "
            f"({n_groups} steps, {dt:.1f}s)"
        )
        logger.add_scalar("loss/train_epoch", avg_loss, epoch + 1)

        # expose updated params to the model façade for eval/checkpoint
        model.trainable = trainable

        if (save_every_epoch > 0 and (epoch + 1) % save_every_epoch == 0) or (
            epoch + 1
        ) == num_epochs:
            path = os.path.join(outputs_dir, f"model_epoch_{epoch + 1}.{ckpt_ext}")
            checkpoint.save_captioner(path, trainable, model.cfg)
            print(f"Model checkpoint saved at {path}")
            if save_optimizer_state:
                checkpoint.save_pytree(
                    os.path.join(outputs_dir, f"optimizer_epoch_{epoch + 1}.npz"),
                    {"step": opt_state.step, "mu": opt_state.mu, "nu": opt_state.nu},
                )

        if eval_every_epoch > 0 and (epoch + 1) % eval_every_epoch == 0 and val_dataset is not None:
            metrics = evaluate_epoch(
                model,
                val_dataset,
                val_annotations_path,
                epoch=epoch + 1,
                split_name="val",
                batch_size=eval_batch_size,
                max_length=eval_max_length,
                temperature=eval_temperature,
                top_p=eval_top_p,
                output_dir=eval_dir,
                rat=rat_cfg is not None,
                db_store=db_store,
                top_k=getattr(rat_cfg, "top_k", None),
                top_i=getattr(rat_cfg, "top_i", None),
                mesh=mesh,
                decode_precision=eval_decode_precision,
            )
            val_metrics_history.append({"epoch": epoch + 1, "loss": avg_loss, **metrics.to_dict()})
            logger.add_scalars(
                {
                    "CIDEr/val": metrics.cider,
                    "BLEU-1/val": metrics.bleu_1,
                    "BLEU-4/val": metrics.bleu_4,
                    "ROUGE-L/val": metrics.rouge_l,
                },
                epoch + 1,
            )
            if metrics.cider > best_val_cider:
                best_val_cider, best_epoch = metrics.cider, epoch + 1
                best_path = os.path.join(outputs_dir, f"best_model_epoch_{best_epoch}.{ckpt_ext}")
                checkpoint.save_captioner(best_path, trainable, model.cfg)
                print(f"New best model! CIDEr: {best_val_cider:.4f} (saved to {best_path})")

    save_loss_curves(epoch_loss_values, os.path.join(outputs_dir, "loss_curve.png"))
    if val_metrics_history:
        from gpt2_image_captioning_tpu.evaluation.evaluate import save_eval_summary

        save_eval_summary(
            val_metrics_history, os.path.join(eval_dir, "val_metrics_summary.json")
        )
        save_eval_metric_curves(
            val_metrics_history,
            os.path.join(eval_dir, "val_metrics_curve.png"),
            title="Validation Metrics Over Epochs",
        )
    logger.close()

    print("\n" + "=" * 60)
    print("Training complete.")
    print(f"Best validation CIDEr: {best_val_cider:.4f} at epoch {best_epoch}")
    print(f"Step timing: {timer.summary()}")
    print("=" * 60)
    return {
        "epoch_losses": epoch_loss_values,
        "val_metrics": val_metrics_history,
        "best_val_cider": best_val_cider,
        "best_epoch": best_epoch,
        "step_timing": timer.summary(),
    }


def train_rat(
    train_dataset: CocoDataset,
    model,
    db_store,
    top_k: int,
    top_i: int,
    batch_size: int,
    num_epochs: int,
    **kwargs,
) -> dict[str, Any]:
    """Retrieval-augmented training — API parity with the reference's
    ``train_rat`` (``src/train.py:257-483``): same loop with the store and
    retrieval depths threaded through.  ``model`` is a
    ``RetrievalAugmentedTransformer`` (its ``rcfg`` provides the aggregation
    type; ``top_k``/``top_i`` here override the retrieval depths)."""
    import dataclasses as _dc

    rcfg = _dc.replace(model.rcfg, top_k=top_k, top_i=top_i)
    return train(
        train_dataset,
        model,
        batch_size=batch_size,
        num_epochs=num_epochs,
        rat_cfg=rcfg,
        db_store=db_store,
        **kwargs,
    )
