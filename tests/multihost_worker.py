"""True multi-process worker for test_multihost_two_process.

Spawned N times (jax.distributed over CPU, 4 local devices each) to execute
the branches that single-process tests can only simulate:

- ``train/loop._put_global_batch``'s ``jax.make_array_from_process_local_data``
  multihost ingestion path (each process feeds only its Batcher shard),
- a real sharded train step over a process-spanning (dp=N*4) mesh,
- the orbax save/restore path with ``jax.process_count() > 1``.

Writes ``{losses, fingerprint}`` JSON from process 0 for the parent test to
compare against its single-process run of the same seeds/data.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nprocs", type=int, required=True)
    ap.add_argument("--port", type=int, required=True)
    ap.add_argument("--tmp", required=True)
    ap.add_argument("--steps", type=int, default=2)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.nprocs,
        process_id=args.pid,
    )
    assert jax.process_count() == args.nprocs, jax.process_count()

    import numpy as np

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.data.dataset import Batcher, CocoDataset
    from gpt2_image_captioning_tpu.train import optim
    from gpt2_image_captioning_tpu.train.checkpoint import (
        load_pytree_orbax,
        save_pytree_orbax,
    )
    from gpt2_image_captioning_tpu.train.loop import _put_global_batch, make_train_step

    from helpers import tiny_tokenizer
    from multihost_common import make_model, put_tree

    n_global = args.nprocs * len(jax.local_devices())
    mesh = create_mesh(MeshSpec(dp=n_global, tp=1))
    model = make_model()
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3)
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(
        model.cfg, opt_cfg, mesh, model.policy
    )

    trainable = put_tree(model.trainable, tr_sh)
    frozen = put_tree(model.frozen, fr_sh)
    opt_state = put_tree(optim.init(model.trainable), opt_sh)
    extra = put_tree({}, None)

    tok = tiny_tokenizer()
    ds = CocoDataset(
        os.path.join(args.tmp, "val_embeddings.npz"),
        os.path.join(args.tmp, "captions_val.json"),
        tokenizer=tok,
        max_length=10,
    )
    batcher = Batcher(
        ds, 8, seed=5, process_index=args.pid, process_count=args.nprocs
    )

    losses = []
    it = iter(batcher.epoch(0))
    for _ in range(args.steps):
        group = dict(next(it))
        group.pop("image_id", None)
        # each process holds ONLY its shard → the multihost assembly branch
        group = _put_global_batch(group, batch_sh)
        trainable, opt_state, loss, _ = step_fn(
            trainable, opt_state, frozen, group, extra
        )
        losses.append(float(np.asarray(loss)))

    # orbax multihost save/restore roundtrip on the post-step params
    ckpt = os.path.join(args.tmp, "ckpt_mh")
    save_pytree_orbax(ckpt, trainable)
    restored = load_pytree_orbax(ckpt, trainable)
    for a, b in zip(jax.tree.leaves(trainable), jax.tree.leaves(restored)):
        for sa, sb in zip(a.addressable_shards, b.addressable_shards):
            np.testing.assert_array_equal(np.asarray(sa.data), np.asarray(sb.data))

    fingerprint = jax.jit(
        lambda t: sum(jax.numpy.sum(jax.numpy.abs(x)) for x in jax.tree.leaves(t)),
        out_shardings=jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec()),
    )(trainable)
    if args.pid == 0:
        out = {"losses": losses, "fingerprint": float(np.asarray(fingerprint))}
        with open(os.path.join(args.tmp, "worker0.json"), "w") as f:
            json.dump(out, f)
    # all processes must reach the barrier before exiting so the coordinator
    # doesn't tear down while peers are mid-collective
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("done")


if __name__ == "__main__":
    main()
