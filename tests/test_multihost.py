"""Multi-host execution and readiness.

Simulated on one process:

- Batcher process sharding: the union of every process's shard reconstructs
  the exact global batch order, padded tails are label-masked only on the
  owning shard, and all processes agree on the permutation.
- Orbax checkpoint: save/restore roundtrip of a pytree sharded over the
  8-device mesh preserves values and shardings.
- _put_global_batch: the single-process path matches a plain device_put.

Executed for REAL (test_two_process_training_matches_single): two spawned
``jax.distributed`` CPU processes (4 local devices each) run Batcher shards
→ ``_put_global_batch``'s ``make_array_from_process_local_data`` branch →
sharded train steps over a process-spanning dp=8 mesh → orbax multihost
save/restore, and the losses/params must match this process's
single-process run bit-for-bit-close.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
from gpt2_image_captioning_tpu.data.dataset import IGNORE_INDEX, Batcher, CocoDataset

from helpers import make_synthetic_coco, tiny_tokenizer


@pytest.fixture(scope="module")
def ds(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mh")
    emb_path, ann_path, _ = make_synthetic_coco(tmp, n_images=9, captions_per_image=3)
    tok = tiny_tokenizer()
    return CocoDataset(emb_path, ann_path, tokenizer=tok, max_length=10)


@pytest.mark.parametrize("process_count", [2, 4])
def test_batcher_shards_union_to_global_order(ds, process_count):
    global_bs = 8
    ref = Batcher(ds, global_bs, seed=3)
    shards = [
        Batcher(ds, global_bs, seed=3, process_index=p, process_count=process_count)
        for p in range(process_count)
    ]
    for step, (gbatch, *pbatches) in enumerate(
        zip(ref.epoch(0), *(s.epoch(0) for s in shards))
    ):
        # concatenating the per-process shards reconstructs the global batch
        for key in ("token_ids", "image_embedding", "attention_mask", "image_id"):
            got = np.concatenate([pb[key] for pb in pbatches], axis=0)
            np.testing.assert_array_equal(got, gbatch[key], err_msg=f"{key}@{step}")
        # labels: identical except padded-tail masking must MATCH the global
        got_labels = np.concatenate([pb["labels"] for pb in pbatches], axis=0)
        np.testing.assert_array_equal(got_labels, gbatch["labels"])


def test_batcher_shards_cover_padded_tail(ds):
    """27 captions, batch 8 → final batch has 3 real rows; with 4 processes
    the pad masking lands on the right shards."""
    shards = [Batcher(ds, 8, seed=0, process_index=p, process_count=4) for p in range(4)]
    last = [list(s.epoch(0))[-1] for s in shards]
    # rows 0..2 real (process 0 gets 2 real + 0 pad? shard=2: p0 rows 0-1 real,
    # p1 row 2 real + 1 pad, p2/p3 all pad)
    assert (last[0]["labels"] != IGNORE_INDEX).any()
    assert (last[2]["labels"] == IGNORE_INDEX).all()
    assert (last[3]["labels"] == IGNORE_INDEX).all()


def test_orbax_sharded_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gpt2_image_captioning_tpu.train.checkpoint import (
        load_pytree_orbax,
        save_pytree_orbax,
    )

    mesh = create_mesh(MeshSpec(dp=4, tp=2))
    rng = np.random.default_rng(0)
    tree = {
        "w": jax.device_put(
            rng.normal(size=(16, 8)).astype(np.float32),
            NamedSharding(mesh, P("dp", "tp")),
        ),
        "b": jax.device_put(
            rng.normal(size=(8,)).astype(np.float32), NamedSharding(mesh, P())
        ),
        "step": jnp.asarray(7, jnp.int32),
    }
    save_pytree_orbax(str(tmp_path / "ckpt"), tree)
    restored = load_pytree_orbax(str(tmp_path / "ckpt"), tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert restored["w"].sharding.spec == tree["w"].sharding.spec


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training_matches_single(tmp_path):
    """Spawn 2 real jax.distributed CPU processes; their sharded training
    (each feeding only its Batcher shard through _put_global_batch's
    multihost branch) must reproduce the single-process losses and params."""
    from helpers import make_synthetic_coco, tiny_tokenizer
    from multihost_common import make_model, put_tree

    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.data.dataset import Batcher, CocoDataset
    from gpt2_image_captioning_tpu.train import optim
    from gpt2_image_captioning_tpu.train.loop import _put_global_batch, make_train_step

    make_synthetic_coco(tmp_path, n_images=9, captions_per_image=3)
    steps = 2

    # ---- reference: single-process, same dp=8 mesh/global data ----
    mesh = create_mesh(MeshSpec(dp=8, tp=1))
    model = make_model()
    opt_cfg = optim.AdamWConfig(learning_rate=1e-3)
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(
        model.cfg, opt_cfg, mesh, model.policy
    )
    trainable = put_tree(model.trainable, tr_sh)
    frozen = put_tree(model.frozen, fr_sh)
    opt_state = put_tree(optim.init(model.trainable), opt_sh)
    ds2 = CocoDataset(
        str(tmp_path / "val_embeddings.npz"),
        str(tmp_path / "captions_val.json"),
        tokenizer=tiny_tokenizer(),
        max_length=10,
    )
    it = iter(Batcher(ds2, 8, seed=5).epoch(0))
    want_losses = []
    for _ in range(steps):
        group = dict(next(it))
        group.pop("image_id", None)
        group = _put_global_batch(group, batch_sh)
        trainable, opt_state, loss, _ = step_fn(
            trainable, opt_state, frozen, group, {}
        )
        want_losses.append(float(np.asarray(loss)))
    # same jitted reduction as the worker → identical accumulation order
    from jax.sharding import NamedSharding, PartitionSpec as P

    want_fp = float(
        np.asarray(
            jax.jit(
                lambda t: sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(t)),
                out_shardings=NamedSharding(mesh, P()),
            )(trainable)
        )
    )

    # ---- 2 real processes ----
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        f"{os.path.dirname(os.path.dirname(os.path.abspath(__file__)))}:"
        f"{os.path.dirname(os.path.abspath(__file__))}:"
        + env.get("PYTHONPATH", "")
    )
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--pid", str(p), "--nprocs", "2",
             "--port", str(port), "--tmp", str(tmp_path), "--steps", str(steps)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for p in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()  # by Popen handle (never by pattern)
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    with open(tmp_path / "worker0.json") as f:
        got = json.load(f)
    np.testing.assert_allclose(got["losses"], want_losses, rtol=1e-6)
    assert got["fingerprint"] == pytest.approx(want_fp, rel=1e-5)


def test_put_global_batch_single_process(ds):
    from gpt2_image_captioning_tpu.core.mesh import batch_sharding
    from gpt2_image_captioning_tpu.train.loop import _put_global_batch

    mesh = create_mesh(MeshSpec(dp=4, tp=1))
    b = next(iter(Batcher(ds, 8, seed=1).epoch(0)))
    b.pop("image_id")
    got = _put_global_batch(b, batch_sharding(mesh))
    want = jax.device_put(b, batch_sharding(mesh))
    for k in b:
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(want[k]))
        assert got[k].sharding == want[k].sharding
