"""Multi-host readiness (simulated on one process).

- Batcher process sharding: the union of every process's shard reconstructs
  the exact global batch order, padded tails are label-masked only on the
  owning shard, and all processes agree on the permutation.
- Orbax checkpoint: save/restore roundtrip of a pytree sharded over the
  8-device mesh preserves values and shardings.
- _put_global_batch: the single-process path matches a plain device_put.
"""

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
