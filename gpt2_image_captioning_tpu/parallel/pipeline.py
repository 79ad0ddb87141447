"""Pipeline-parallel training over a ``pp`` mesh axis (GPipe schedule).

The reference trains on a single CUDA device (SURVEY.md §2.3 — no
distribution of any kind); this module is the framework's pipeline-parallel
capability for scaling decoder *depth* across chips.  GPT-2's transformer
blocks are already stored stacked with a leading layer dim
(``models/gpt2.py::stack_blocks``), so stage ``s`` of ``S`` simply owns the
layer slice ``[s·L/S, (s+1)·L/S)`` — sharding the stacked pytree over a
``pp`` mesh axis IS the stage assignment, no repacking.

TPU-first design (scaling-book pipeline recipe, built with
``shard_map`` + ``lax.ppermute``):

- the whole GPipe schedule is ONE ``lax.scan`` over ``M + S − 1`` ticks
  compiled into a single XLA program.  Every tick, all stages run one
  microbatch through their local layer slice in SPMD and hand the activation
  to the next stage with a ``ppermute`` — a single-hop ICI collective, no
  host involvement, no data-dependent control flow;
- the backward schedule is NOT hand-written: ``jax.value_and_grad``
  differentiates through the scan + ppermute (the transpose of a ppermute is
  the inverse ppermute), so XLA emits the reverse pipeline automatically;
- stage-local block gradients need NO collective over ``pp`` (each stage
  owns its layers and is the only rank whose loss path touches them); only
  the replicated leaves (mapping network, wte/wpe, final LayerNorm, task
  prefix) are ``psum``-ed over ``pp``, and everything is ``psum``-ed over
  ``dp``;
- the pipeline bubble is the standard GPipe ``(S−1)/(M+S−1)`` — raise
  ``num_microbatches`` to amortize it.

Composes with data parallelism on the same 2-D ``(dp, pp)`` mesh: the batch
dim is sharded on ``dp``, stages on ``pp``.  Tensor parallelism stays on the
GSPMD ``(dp, tp)`` path (``train/loop.py``) — pp targets depth scaling, tp
width scaling; the two address different regimes and are deliberately
separate programs.

Numerics: identical math to ``captioner.loss_fn`` (same block code, same
vocab-chunked xent) — the parity tests compare losses and gradients against
the single-device step at f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.xent import xent_sum
from gpt2_image_captioning_tpu.train import optim

DATA_AXIS = "dp"
PIPE_AXIS = "pp"


def create_pipeline_mesh(
    dp: int, pp: int, devices: list | None = None
) -> Mesh:
    """2-D ``(dp, pp)`` mesh.  Stages are laid out contiguously in device
    order so stage-to-stage ppermute hops ride neighboring ICI links."""
    devs = list(devices if devices is not None else jax.devices())
    if len(devs) < dp * pp:
        raise ValueError(f"mesh {dp}x{pp} needs {dp * pp} devices, have {len(devs)}")
    devs = devs[: dp * pp]
    devs.sort(key=lambda d: (d.process_index, d.id))
    grid = np.array(devs, dtype=object).reshape(dp, pp)
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS))


# ---------------------------------------------------------------------------
# Partition specs
# ---------------------------------------------------------------------------

def pipeline_param_specs(ccfg: C.CaptionerConfig) -> tuple[dict, dict]:
    """(trainable, frozen) spec pytrees for the (dp, pp) mesh: GPT-2's stacked
    blocks shard their leading layer dim over ``pp``; everything else is
    replicated (the mapper and embeddings are tiny next to the blocks)."""
    tr_t, fz_t = jax.eval_shape(
        lambda: C.init_params(jax.random.PRNGKey(0), ccfg)
    )
    tr = jax.tree.map(lambda _: P(), tr_t)
    fz = jax.tree.map(lambda _: P(), fz_t)
    for tree in (tr, fz):
        if "gpt" in tree:
            tree["gpt"]["blocks"] = jax.tree.map(
                lambda _: P(PIPE_AXIS), tree["gpt"]["blocks"]
            )
    return tr, fz


def pipeline_batch_specs() -> dict:
    return {
        "token_ids": P(DATA_AXIS),
        "labels": P(DATA_AXIS),
        "attention_mask": P(DATA_AXIS),
        "image_embedding": P(DATA_AXIS),
    }


# ---------------------------------------------------------------------------
# The per-shard pipelined loss
# ---------------------------------------------------------------------------

def _shard_loss(
    ccfg: C.CaptionerConfig,
    policy: Policy,
    n_micro: int,
    n_stage: int,
    trainable: dict,
    frozen: dict,
    batch: dict,
) -> jnp.ndarray:
    """Caption loss pieces, computed per (dp, pp) shard with a GPipe pipeline
    over the stage-local layer slice.  Runs inside shard_map: ``trainable``/
    ``frozen`` hold the LOCAL block slice (L/S layers), ``batch`` the local
    dp shard.  Returns ``(nll_local, cnt_global)``: this shard's nll sum
    (nonzero only on the last stage) and the globally psum-ed token count —
    the caller differentiates the local term and psums values/grads itself
    (see ``_loss_and_grad`` for why the psum must stay out of the grad path).
    """
    cfg = ccfg.gpt2
    sid = jax.lax.axis_index(PIPE_AXIS)
    gpt = frozen["gpt"] if "gpt" in frozen else trainable["gpt"]

    # Embedding-side compute runs on every stage (SPMD — same program
    # everywhere), but only stage 0's result is injected into the pipeline,
    # so its parameter gradients are nonzero only on stage 0 (the
    # ``jnp.where`` below kills the cotangent elsewhere) and the pp-psum in
    # the caller combines them exactly.
    caption_embeds = G.embed_tokens(gpt, batch["token_ids"])
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
    pos = gpt["wpe"][:t_len].astype(jnp.float32)
    x = (inputs.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

    if b % n_micro:
        raise ValueError(f"local batch {b} not divisible by microbatches {n_micro}")
    mb = b // n_micro
    micro = x.reshape(n_micro, mb, t_len, x.shape[-1])
    masks = mask.reshape(n_micro, mb, t_len)

    local_blocks = gpt["blocks"]  # leading dim = n_layer // n_stage

    def stage_fwd(x: jnp.ndarray, km: jnp.ndarray) -> jnp.ndarray:
        def body(x, bp):
            return G._block(bp, cfg, x, key_mask=km, policy=policy), None

        x, _ = jax.lax.scan(body, x, local_blocks)
        return x

    perm = [(i, (i + 1) % n_stage) for i in range(n_stage)]

    def tick(carry, t):
        # microbatch this stage works on at tick t is m = t − sid; clip keeps
        # the bubble ticks in-range (their outputs are never counted, and the
        # loss masking below zeroes their cotangents)
        inj = micro[jnp.clip(t, 0, n_micro - 1)]
        x_in = jnp.where(sid == 0, inj, carry)
        m_idx = jnp.clip(t - sid, 0, n_micro - 1)
        y = stage_fwd(x_in, masks[m_idx])
        send = jax.lax.ppermute(y, PIPE_AXIS, perm)
        return send, y

    carry0 = jnp.zeros((mb, t_len, x.shape[-1]), x.dtype)
    _, ys = jax.lax.scan(tick, carry0, jnp.arange(n_micro + n_stage - 1))

    # the LAST stage's outputs at ticks S−1 … S−1+M−1 are microbatches 0…M−1
    outs = ys[n_stage - 1 :].reshape(b, t_len, x.shape[-1])

    h = nn.layer_norm(gpt["ln_f"], outs, cfg.layer_norm_epsilon)
    # identical slicing to captioner.loss_fn: shifted CE over caption rows
    h2 = policy.cast(h[:, p_len - 1 : -1, :]).reshape(-1, h.shape[-1])
    lab2 = labels[:, p_len:].reshape(-1)
    nll = xent_sum(h2, gpt["wte"].astype(policy.compute_dtype), lab2)
    cnt = jnp.sum(lab2 != G.IGNORE_INDEX)

    # every stage ran the loss head in SPMD; only the last stage's is real
    is_last = sid == n_stage - 1
    nll = jnp.where(is_last, nll, 0.0)
    cnt = jnp.where(is_last, cnt, 0)
    # the token count is data, not a differentiated value — safe to psum here
    cnt = jax.lax.psum(cnt, (DATA_AXIS, PIPE_AXIS))
    return nll, cnt


def _loss_and_grad(ccfg, policy, n_micro, n_stage, trainable, frozen, batch):
    # Differentiate the LOCAL per-shard loss term (this dp shard's nll on the
    # last stage, over the global token count) and combine shards with
    # explicit psums afterwards.  Putting the psum inside the differentiated
    # function would be wrong here: with vma tracking off (check_vma=False),
    # shard_map transposes psum to psum, so a replicated cotangent of 1 would
    # arrive as axis_size — an exact S× (and dp×) gradient overcount.
    def local_loss(tr):
        nll, cnt = _shard_loss(ccfg, policy, n_micro, n_stage, tr, frozen, batch)
        return nll / jnp.maximum(cnt, 1).astype(nll.dtype)

    lval, g = jax.value_and_grad(local_loss)(trainable)
    loss = jax.lax.psum(lval, (DATA_AXIS, PIPE_AXIS))

    # stage-local block grads stay local over pp (each stage owns its layers);
    # replicated leaves sum their per-stage contributions; everything sums
    # over dp (params are replicated across dp)
    def psum_pp(tree):
        return jax.tree.map(lambda x: jax.lax.psum(x, PIPE_AXIS), tree)

    if "gpt" in g:
        gpt_g = dict(g["gpt"])
        blocks_g = gpt_g.pop("blocks")
        gpt_g = psum_pp(gpt_g)
        gpt_g["blocks"] = blocks_g
        g = {**psum_pp({k: v for k, v in g.items() if k != "gpt"}), "gpt": gpt_g}
    else:
        g = psum_pp(g)
    g = jax.tree.map(lambda x: jax.lax.psum(x, DATA_AXIS), g)
    return loss, g


def make_pipeline_loss_and_grad(
    ccfg: C.CaptionerConfig,
    mesh: Mesh,
    policy: Policy = F32,
    num_microbatches: int = 4,
):
    """Jitted ``(trainable, frozen, batch) → (loss, grads)`` over a
    ``(dp, pp)`` mesh — the train step's inner product, exposed for parity
    tests and custom training loops."""
    n_stage = mesh.shape[PIPE_AXIS]
    if ccfg.gpt2.n_layer % n_stage:
        raise ValueError(
            f"n_layer={ccfg.gpt2.n_layer} not divisible by pp={n_stage}"
        )
    tr_spec, fz_spec = pipeline_param_specs(ccfg)
    lg = functools.partial(_loss_and_grad, ccfg, policy, num_microbatches, n_stage)
    sm = shard_map(
        lg,
        mesh=mesh,
        in_specs=(tr_spec, fz_spec, pipeline_batch_specs()),
        out_specs=(P(), tr_spec),
        check_vma=False,
    )
    return jax.jit(sm)


# ---------------------------------------------------------------------------
# The jitted train step
# ---------------------------------------------------------------------------

def make_pipeline_train_step(
    ccfg: C.CaptionerConfig,
    opt_cfg: optim.AdamWConfig,
    mesh: Mesh,
    policy: Policy = F32,
    num_microbatches: int = 4,
):
    """Jitted pipeline-parallel AdamW train step over a ``(dp, pp)`` mesh.

    Returns ``(step_fn, (tr_sh, fz_sh, opt_sh, batch_sh))`` with the same
    calling convention as ``train.loop.make_train_step``:
    ``step_fn(trainable, opt_state, frozen, batch) →
    (new_trainable, new_opt_state, loss, grad_norm)``.

    The global batch (axis 0 sharded over dp) must be divisible by
    ``dp · num_microbatches``; ``n_layer`` must be divisible by the pp size.
    """
    n_stage = mesh.shape[PIPE_AXIS]
    if ccfg.gpt2.n_layer % n_stage:
        raise ValueError(
            f"n_layer={ccfg.gpt2.n_layer} not divisible by pp={n_stage}"
        )

    tr_spec, fz_spec = pipeline_param_specs(ccfg)
    batch_spec = pipeline_batch_specs()

    lg = functools.partial(_loss_and_grad, ccfg, policy, num_microbatches, n_stage)
    sm = shard_map(
        lg,
        mesh=mesh,
        in_specs=(tr_spec, fz_spec, batch_spec),
        out_specs=(P(), tr_spec),
        check_vma=False,
    )

    def to_sh(spec_tree):
        return jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            spec_tree,
            is_leaf=lambda x: isinstance(x, P),
        )

    tr_sh = to_sh(tr_spec)
    fz_sh = to_sh(fz_spec)
    opt_sh = optim.AdamWState(step=NamedSharding(mesh, P()), mu=tr_sh, nu=tr_sh)
    batch_sh = to_sh(batch_spec)
    repl = NamedSharding(mesh, P())

    def step(trainable, opt_state, frozen, batch):
        loss, grads = sm(trainable, frozen, batch)
        new_tr, new_opt, gnorm = optim.step(opt_cfg, trainable, grads, opt_state)
        return new_tr, new_opt, loss, gnorm

    step_fn = jax.jit(
        step,
        in_shardings=(tr_sh, opt_sh, fz_sh, batch_sh),
        out_shardings=(tr_sh, opt_sh, repl, repl),
        donate_argnums=(0, 1),
    )
    return step_fn, (tr_sh, fz_sh, opt_sh, batch_sh)
