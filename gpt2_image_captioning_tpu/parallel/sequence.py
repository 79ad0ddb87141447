"""Sequence-parallel training over an ``sp`` mesh axis (Megatron-SP style).

SURVEY.md §2.3 scoped sequence parallelism as an extension point (the
reference's sequences are ≤65 tokens); this module builds it, for long-
context fine-tuning where per-device activation memory — O(L·B·T·D) through
the unfrozen backward — is the binding constraint, not FLOPs.

Design (shard_map over a 2-D ``(dp, sp)`` mesh):

- the **sequence dim of every activation** is sharded over ``sp``: each rank
  runs LayerNorm / MLP / QKV projections / the loss head on its own T/S
  chunk of rows (position-independent ops need no communication at all);
- **attention** is the only mixing op: queries stay local, and each block
  all-gathers the (B, T/S, D) K/V chunks over ``sp`` into the full (B, T, D)
  keys/values (one ``all_gather`` per tensor per layer, riding ICI; its
  autodiff transpose is the matching ``psum_scatter``).  Causality is a
  ``q_offset`` of ``rank·T/S`` into the standard masked attention — the same
  primitive the KV-cached decode path uses (``ops/nn.py::attention_xla``);
- the **shifted teacher-forcing loss** crosses chunk boundaries: rank r's
  hidden rows predict global labels ``[r·T/S + 1, (r+1)·T/S + 1)``.  Labels
  and masks are replicated over ``sp`` (they are int32 — trivial next to
  activations), so every rank slices its own shifted window locally and no
  halo exchange is needed;
- parameters are replicated over ``sp``; gradients psum over ``(dp, sp)``.
  As in the pipeline module, the psums stay OUT of the differentiated
  function (with vma tracking off, psum transposes to psum — an axis-size
  gradient overcount otherwise; see ``parallel/pipeline.py``).

The total sequence (prefix + caption) is padded up to a multiple of the sp
size with masked-out rows (label −100, attention-mask 0) — identical loss,
identical gradients, static shapes.

Numerics: parity-tested against the single-device ``captioner.loss_fn``
(loss and grads at f32).  Composes with data parallelism on the same mesh;
pp/tp remain separate programs (``parallel/pipeline.py``, ``train/loop.py``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.xent import xent_sum

DATA_AXIS = "dp"
SEQ_AXIS = "sp"


def create_sp_mesh(dp: int, sp: int, devices: list | None = None) -> Mesh:
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < dp * sp:
        raise ValueError(f"mesh {dp}x{sp} needs {dp * sp} devices, have {len(devs)}")
    devs = devs[: dp * sp]
    devs.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devs, dtype=object).reshape(dp, sp)
    return Mesh(grid, (DATA_AXIS, SEQ_AXIS))


def _sp_block(
    bp: dict,
    cfg: G.GPT2Config,
    x: jnp.ndarray,
    *,
    key_mask: jnp.ndarray,
    q_offset: int | jnp.ndarray,
    policy: Policy,
    ring: bool = False,
) -> jnp.ndarray:
    """One transformer block over a local (B, T/S, D) sequence chunk.
    Identical math to ``gpt2._block``; the only collective is in attention:
    either a K/V all-gather over ``sp`` (queries never move; per-device
    attention memory O(T)) or, with ``ring=True``, blockwise ring attention
    (``parallel/ring.py``: K/V stay sharded and rotate via neighbor
    ppermute; per-device memory O(T/S) — the long-context form)."""
    h = nn.layer_norm(bp["ln_1"], x, cfg.layer_norm_epsilon)
    qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
    q3, k3, v3 = jnp.split(qkv, 3, axis=-1)  # each (B, Tc, D)
    if ring:
        from gpt2_image_captioning_tpu.parallel.ring import ring_attention

        a4 = ring_attention(
            nn.split_heads(q3, cfg.n_head),
            nn.split_heads(k3, cfg.n_head),
            nn.split_heads(v3, cfg.n_head),
            axis_name=SEQ_AXIS,
            q_offset=q_offset,
            key_mask=key_mask,
            causal=True,
            policy=policy,
        )
    else:
        # gather the full sequence's keys/values: (B, Tc, D) → (B, T, D)
        k_full = jax.lax.all_gather(k3, SEQ_AXIS, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v3, SEQ_AXIS, axis=1, tiled=True)
        a4 = nn.attention_xla(
            nn.split_heads(q3, cfg.n_head),
            nn.split_heads(k_full, cfg.n_head),
            nn.split_heads(v_full, cfg.n_head),
            causal=True,
            key_mask=key_mask,
            q_offset=q_offset,
            policy=policy,
        )
    x = x + nn.dense(bp["attn"]["c_proj"], nn.merge_heads(a4), policy)
    h = nn.layer_norm(bp["ln_2"], x, cfg.layer_norm_epsilon)
    h = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h, policy))
    return x + nn.dense(bp["mlp"]["c_proj"], h, policy)


def _shard_loss(
    ccfg: C.CaptionerConfig,
    policy: Policy,
    n_shard: int,
    ring: bool,
    trainable: dict,
    frozen: dict,
    batch: dict,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(dp, sp)-shard loss pieces: this rank's nll over its sequence
    chunk, and the global token count.  Batch sequences arrive replicated
    over sp (sharded over dp only); activations live sharded."""
    cfg = ccfg.gpt2
    sid = jax.lax.axis_index(SEQ_AXIS)

    caption_embeds = G.embed_tokens(
        frozen["gpt"] if "gpt" in frozen else trainable["gpt"], batch["token_ids"]
    )
    gpt = frozen["gpt"] if "gpt" in frozen else trainable["gpt"]
    prefix = C.build_prefix(trainable, ccfg, batch["image_embedding"], policy)
    p_len = prefix.shape[1]
    b = prefix.shape[0]
    inputs = jnp.concatenate(
        [prefix.astype(caption_embeds.dtype), caption_embeds], axis=1
    )
    labels = jnp.concatenate(
        [jnp.full((b, p_len), G.IGNORE_INDEX, dtype=jnp.int32), batch["labels"]],
        axis=1,
    )
    mask = jnp.concatenate(
        [
            jnp.ones((b, p_len), dtype=batch["attention_mask"].dtype),
            batch["attention_mask"],
        ],
        axis=1,
    )

    t_len = inputs.shape[1]
    if t_len % n_shard:
        raise ValueError(
            f"sequence length {t_len} not divisible by sp={n_shard}; "
            "pad the batch (make_sp_loss_and_grad does this automatically)"
        )
    tc = t_len // n_shard
    offset = sid * tc

    # this rank's sequence chunk of the embedded input (+ its positions)
    x_local = jax.lax.dynamic_slice_in_dim(inputs, offset, tc, axis=1)
    pos = jax.lax.dynamic_slice_in_dim(gpt["wpe"], offset, tc, axis=0)
    x = (x_local.astype(jnp.float32) + pos[None].astype(jnp.float32)).astype(
        policy.compute_dtype
    )

    def body(x, bp):
        return (
            _sp_block(
                bp, cfg, x, key_mask=mask, q_offset=offset, policy=policy,
                ring=ring,
            ),
            None,
        )

    x, _ = jax.lax.scan(body, x, gpt["blocks"])
    h = nn.layer_norm(gpt["ln_f"], x, cfg.layer_norm_epsilon)

    # shifted CE across the chunk boundary: local row j (global r = offset+j)
    # predicts global label r+1; rows past T−2 or labeled −100 are ignored.
    # labels are replicated over sp, so the shifted window is a local slice.
    shifted = jnp.pad(labels[:, 1:], ((0, 0), (0, 1)), constant_values=G.IGNORE_INDEX)
    lab_local = jax.lax.dynamic_slice_in_dim(shifted, offset, tc, axis=1)
    h2 = policy.cast(h).reshape(-1, h.shape[-1])
    lab2 = lab_local.reshape(-1)
    nll = xent_sum(h2, gpt["wte"].astype(policy.compute_dtype), lab2)
    cnt = jnp.sum(lab2 != G.IGNORE_INDEX)
    cnt = jax.lax.psum(cnt, (DATA_AXIS, SEQ_AXIS))
    return nll, cnt


def _loss_and_grad(ccfg, policy, n_shard, ring, trainable, frozen, batch):
    def local_loss(tr):
        nll, cnt = _shard_loss(ccfg, policy, n_shard, ring, tr, frozen, batch)
        return nll / jnp.maximum(cnt, 1).astype(nll.dtype)

    lval, g = jax.value_and_grad(local_loss)(trainable)
    loss = jax.lax.psum(lval, (DATA_AXIS, SEQ_AXIS))
    g = jax.tree.map(lambda x: jax.lax.psum(x, (DATA_AXIS, SEQ_AXIS)), g)
    return loss, g


def pad_batch_for_sp(batch: dict, p_len: int, sp: int) -> dict:
    """Pad caption length so prefix+caption divides sp: appended rows carry
    label −100 and attention-mask 0 — zero loss, zero attention weight."""
    L = batch["token_ids"].shape[1]
    total = p_len + L
    padded = -(-total // sp) * sp
    extra = padded - total
    if extra == 0:
        return batch
    def pad(x, value):
        return jnp.pad(x, ((0, 0), (0, extra)), constant_values=value)
    return {
        **batch,
        "token_ids": pad(batch["token_ids"], 0),
        "labels": pad(batch["labels"], G.IGNORE_INDEX),
        "attention_mask": pad(batch["attention_mask"], 0),
    }


def make_sp_loss_and_grad(
    ccfg: C.CaptionerConfig, mesh: Mesh, policy: Policy = F32, ring: bool = False
):
    """Jitted ``(trainable, frozen, batch) → (loss, grads)`` over a
    ``(dp, sp)`` mesh.  Parameters replicated; batch sharded over dp with
    sequences replicated over sp; activations sequence-sharded inside.
    ``ring=True`` swaps the per-layer K/V all-gather for blockwise ring
    attention (parallel/ring.py) — same math, O(T/S) attention memory."""
    n_shard = mesh.shape[SEQ_AXIS]
    p_len = ccfg.total_prefix_length

    tr_t, fz_t = jax.eval_shape(lambda: C.init_params(jax.random.PRNGKey(0), ccfg))
    tr_spec = jax.tree.map(lambda _: P(), tr_t)
    fz_spec = jax.tree.map(lambda _: P(), fz_t)
    batch_spec = {
        "token_ids": P(DATA_AXIS),
        "labels": P(DATA_AXIS),
        "attention_mask": P(DATA_AXIS),
        "image_embedding": P(DATA_AXIS),
    }

    lg = functools.partial(_loss_and_grad, ccfg, policy, n_shard, ring)
    sm = shard_map(
        lg,
        mesh=mesh,
        in_specs=(tr_spec, fz_spec, batch_spec),
        out_specs=(P(), tr_spec),
        check_vma=False,
    )

    @jax.jit
    def fn(trainable, frozen, batch):
        return sm(trainable, frozen, pad_batch_for_sp(batch, p_len, n_shard))

    return fn
