"""The end-to-end image-captioning model: mapping network + GPT-2 decoder.

Capability-parity with the reference's ``ImageCaptioningModel``
(``src/models.py:177-547``) — prefix conditioning, optional learnable
task-prompt prefix, frozen/unfrozen GPT-2, teacher-forced loss, generation,
partial checkpointing — re-designed TPU-first:

- Parameters are split into a **trainable** pytree and a **frozen** pytree
  (instead of ``requires_grad`` flags); ``jax.grad`` differentiates only the
  trainable side, and checkpoints store exactly the trainable side plus any
  non-GPT extras — the same artifact semantics as the reference's
  ``save_parameters`` (``src/models.py:489-519``).
- ``generate`` compiles the **whole decode loop** into one XLA program:
  KV-cached prefill + ``lax.while_loop`` with early exit when every sequence
  has emitted EOS — versus the reference's per-step Python loop that
  re-forwards the full sequence without a cache (``src/models.py:389-469``).
- Beam search (a capability the reference lacks; driver config ③) runs as a
  ``lax.scan`` with per-step beam gathering of the KV cache.

The class is a thin stateful façade for API familiarity; all compute lives in
pure jittable functions that the training loop uses directly.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.ops import decode_step as DS
from gpt2_image_captioning_tpu.ops import prefill_step as PS
from gpt2_image_captioning_tpu.ops.sampling import sample_token, topk_small
from gpt2_image_captioning_tpu.ops.xent import xent_sum

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class CaptionerConfig:
    gpt2: G.GPT2Config
    mapping: M.MappingConfig
    # token ids of the optional task prompt (tokenized once at construction;
    # the embeddings become trainable parameters initialized from wte)
    task_prompt_ids: tuple[int, ...] | None = None
    freeze_gpt_weights: bool = True
    eos_token_id: int = 50256
    # per-layer jax.checkpoint in the training forward: trades one extra
    # block forward for O(1)-in-depth activation memory — the standard TPU
    # remat lever for scaling UNFROZEN fine-tuning to batch/sequence sizes
    # that would not otherwise fit HBM.  Identical loss/gradients.
    remat: bool = False

    @property
    def image_prefix_length(self) -> int:
        return self.mapping.prefix_length

    @property
    def total_prefix_length(self) -> int:
        extra = len(self.task_prompt_ids) if self.task_prompt_ids else 0
        return self.mapping.prefix_length + extra


# ---------------------------------------------------------------------------
# Init / parameter partitioning
# ---------------------------------------------------------------------------

def init_params(
    rng: jax.Array, cfg: CaptionerConfig, gpt_params: dict | None = None
) -> tuple[dict, dict]:
    """Returns (trainable, frozen) pytrees.

    ``gpt_params`` carries pretrained GPT-2 weights (ported via
    models/porting.py); if None the decoder is randomly initialized (tests,
    from-scratch runs).
    """
    k_map, k_gpt = jax.random.split(rng)
    mapping_params = M.init_mapping(k_map, cfg.mapping)
    gpt_params = gpt_params if gpt_params is not None else G.init(k_gpt, cfg.gpt2)

    trainable: dict[str, Any] = {"mapping": mapping_params}
    if cfg.task_prompt_ids:
        # learnable task prefix initialized from the prompt's token embeddings
        # (reference src/models.py:219-235)
        ids = jnp.asarray(cfg.task_prompt_ids, dtype=jnp.int32)
        trainable["task_prefix"] = jnp.take(gpt_params["wte"], ids, axis=0)

    frozen: dict[str, Any] = {}
    if cfg.freeze_gpt_weights:
        frozen["gpt"] = gpt_params
    else:
        trainable["gpt"] = gpt_params
    return trainable, frozen


def partition_specs(cfg: CaptionerConfig) -> tuple[dict, dict]:
    """(trainable, frozen) PartitionSpec pytrees matching init_params."""
    from jax.sharding import PartitionSpec as P

    trainable: dict[str, Any] = {"mapping": M.mapping_partition_specs(cfg.mapping)}
    if cfg.task_prompt_ids:
        trainable["task_prefix"] = P()
    frozen: dict[str, Any] = {}
    gpt_specs = G.partition_specs(cfg.gpt2)
    if cfg.freeze_gpt_weights:
        frozen["gpt"] = gpt_specs
    else:
        trainable["gpt"] = gpt_specs
    return trainable, frozen


def _gpt(trainable: dict, frozen: dict) -> dict:
    return frozen["gpt"] if "gpt" in frozen else trainable["gpt"]


# ---------------------------------------------------------------------------
# Forward (teacher forcing)
# ---------------------------------------------------------------------------

def build_prefix(
    trainable: dict,
    cfg: CaptionerConfig,
    image_embeddings: jnp.ndarray,
    policy: Policy = F32,
) -> jnp.ndarray:
    """Image embeddings → (B, total_prefix_length, gpt_dim) prefix tokens
    (mapping output ⧺ broadcast task prefix, reference order
    ``src/models.py:277-280``)."""
    prefix = M.apply_mapping(trainable["mapping"], cfg.mapping, image_embeddings, policy)
    if "task_prefix" in trainable:
        b = image_embeddings.shape[0]
        task = jnp.broadcast_to(
            trainable["task_prefix"].astype(prefix.dtype),
            (b, *trainable["task_prefix"].shape),
        )
        prefix = jnp.concatenate([prefix, task], axis=1)
    return prefix


def loss_fn(
    trainable: dict,
    frozen: dict,
    cfg: CaptionerConfig,
    batch: dict,
    policy: Policy = F32,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Teacher-forced caption loss → (nll_sum, token_count).

    batch: token_ids (B, L) int32, labels (B, L) int32 with -100 on padding,
    attention_mask (B, L), image_embedding (B, E).
    Equivalent to the reference forward (``src/models.py:237-325``): prefix
    gets dummy -100 labels and mask 1; GPT computes shifted CE.
    """
    gpt_params = _gpt(trainable, frozen)
    caption_embeds = G.embed_tokens(gpt_params, batch["token_ids"])
    prefix = build_prefix(trainable, cfg, batch["image_embedding"], policy)
    p_len = prefix.shape[1]
    b = prefix.shape[0]

    inputs = jnp.concatenate([prefix.astype(caption_embeds.dtype), caption_embeds], axis=1)
    labels = jnp.concatenate(
        [jnp.full((b, p_len), IGNORE_INDEX, dtype=jnp.int32), batch["labels"]], axis=1
    )
    mask = jnp.concatenate(
        [jnp.ones((b, p_len), dtype=batch["attention_mask"].dtype), batch["attention_mask"]],
        axis=1,
    )
    # python-unrolled layers when the decoder is frozen: grad tracing then
    # skips the unused weight-gradient matmuls that scan's transpose would
    # compute and discard (docs/PERF_NOTES.md round 2)
    hidden = G.forward_hidden(
        gpt_params, cfg.gpt2, inputs, mask, policy,
        unroll_layers=cfg.freeze_gpt_weights,
        remat=cfg.remat,
    )
    # shifted next-token CE via the vocab-chunked op (ops/xent.py) — the
    # (B·T, V) logits/softmax never materialize and the backward is
    # scatter-free; numerics match G.cross_entropy_loss (the test oracle).
    # The first p_len-1 shifted positions predict prefix tokens, whose labels
    # are -100 BY CONSTRUCTION above — slice them off statically (identical
    # nll and gradients: ignored rows contribute 0 to both) so the vocab
    # matmuls run over caption positions only (~22% fewer rows at the
    # flagship shape).
    h2 = policy.cast(hidden[:, p_len - 1 : -1, :]).reshape(-1, hidden.shape[-1])
    lab2 = labels[:, p_len:].reshape(-1)
    nll = xent_sum(h2, gpt_params["wte"].astype(policy.compute_dtype), lab2)
    return nll, jnp.sum(lab2 != IGNORE_INDEX)


def mean_loss(
    trainable: dict, frozen: dict, cfg: CaptionerConfig, batch: dict, policy: Policy = F32
) -> jnp.ndarray:
    s, c = loss_fn(trainable, frozen, cfg, batch, policy)
    return s / jnp.maximum(c, 1)


# ---------------------------------------------------------------------------
# Generation — greedy / top-p, KV-cached, early-exit while_loop
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_length", "temperature", "top_p", "policy", "unroll_decode",
        "use_pallas_decode", "mesh", "decode_quant", "decode_quant_cache",
        "sample_in_kernel", "sample_k",
    ),
)
def generate(
    trainable: dict,
    frozen: dict,
    cfg: CaptionerConfig,
    image_embeddings: jnp.ndarray,
    *,
    max_length: int = 50,
    temperature: float = 1.0,
    top_p: float = 0.9,
    rng: jax.Array | None = None,
    policy: Policy = F32,
    unroll_decode: bool = True,
    use_pallas_decode: bool | None = None,
    packed: dict | None = None,
    mesh=None,
    decode_quant: bool = False,
    decode_quant_cache: bool = False,
    sample_in_kernel: bool = False,
    sample_k: int = 3,
) -> jnp.ndarray:
    """Autoregressive caption generation → token ids (B, max_length).

    Finished sequences are padded with EOS (stripped by
    ``batch_decode(skip_special_tokens=True)``), matching the reference's
    output contract (``src/models.py:451-477``).

    ``packed`` — pre-tiled weights from :func:`prepare_decode_weights`; pass
    it to amortize the fused kernel's weight re-layout across calls (the
    model facade caches it automatically).

    ``mesh`` — a ``(dp, tp)`` Mesh for sharded decode: the KV cache is
    constrained to ``cache_partition_specs`` (batch over dp, model width over
    tp).  With tp > 1 the layerwise XLA path runs (GSPMD partitions it; the
    fused Pallas kernel is single-device).

    ``sample_in_kernel`` — serving opt-in: temperature/top-p token selection
    runs INSIDE the fused step kernel (speculative-accept nucleus sampling,
    ops/decode_step.py) instead of the emit_logits → XLA tail.  Exact
    nucleus semantics, but the noise is the TPU hardware PRNG — sampled
    tokens differ stream-wise from the ``jax.random.categorical`` path, so
    evaluation parity surfaces keep the default.  Requires top_p ≥ 0.5 (or
    1.0) — smaller nuclei reject too many speculative candidates and belong
    on the XLA bisection tail — plus the fused kernel, no mesh, no int8 KV.
    """
    gpt_params = _gpt(trainable, frozen)
    eos = cfg.eos_token_id
    if rng is None:
        rng = jax.random.PRNGKey(0)
    # decode_quant_cache (int8 KV) is witnessed to COMPILE AND RUN at HEAD at
    # b=128/512/1024 with both kernel block widths (the round-4 chunk-major-
    # scale + nsk/nsv rework fixed the earlier Mosaic failures at b>128 —
    # docs/ab_logs/kv_quant_scale_ab3.log).  It measures slower than the
    # bf16 cache at every batch, so it stays an opt-in, never a default
    # (docs/PERF_NOTES.md round 5).

    prefix = build_prefix(trainable, cfg, image_embeddings, policy)
    b, p_len, _ = prefix.shape
    cache = G.init_cache(cfg.gpt2, b, p_len + max_length, dtype=policy.compute_dtype)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as _P

        cache_sh = jax.tree.map(
            lambda s: NamedSharding(mesh, s),
            G.cache_partition_specs(cfg.gpt2),
            is_leaf=lambda x: isinstance(x, _P),
        )
        cache = jax.lax.with_sharding_constraint(cache, cache_sh)

    # dp-only meshes keep the fused kernel: shard_map splits the batch and
    # each device runs the single-device kernel on its shard (per-shard EOS
    # early exit included).  tp>1 falls through to the GSPMD XLA path (the
    # kernel's weight walk can't be partitioned).
    fused_enabled = DS.fused_greedy_enabled(cfg.gpt2, policy, use_pallas_decode)

    # Prefill: the fused whole-prefill kernel (ops/prefill_step.py) is an
    # opt-in (GIC_ENABLE_FUSED_PREFILL=1) — the on-chip A/B measured it at
    # parity-to-slightly-slower vs the XLA chain (prefill is shape-bound,
    # not dispatch-bound; PERF_NOTES round 3), so the gate defaults off.
    # int8 packs carry no float tiles and meshes partition the XLA path, so
    # both always keep forward_cached.
    prefill_fused = (
        PS.fused_prefill_enabled(cfg.gpt2, policy, use_pallas_decode)
        and mesh is None
        and not decode_quant
        and (packed is None or "qkvs" not in packed)
        and p_len <= 32
    )
    if prefill_fused:
        if packed is None:
            packed = DS.pack_decode_weights(
                gpt_params, policy.compute_dtype,
                tw=384 if b % 256 == 0 else DS.TILE_W,
            )
        logits, cache = PS.prefill_into_cache(
            packed, gpt_params, cfg.gpt2, prefix, cache, policy
        )
    else:
        logits, cache = G.forward_cached(
            gpt_params, cfg.gpt2, prefix, cache, policy, fresh_prefill=True
        )

    tokens0 = jnp.full((b, max_length), eos, dtype=jnp.int32)
    finished0 = jnp.zeros((b,), dtype=bool)
    fused_ok = temperature == 0.0 and fused_enabled
    dp_fused = (
        mesh is not None
        and mesh.shape.get("tp", 1) == 1
        and b % mesh.shape.get("dp", 1) == 0
    )
    if fused_ok and (mesh is None or dp_fused):
        # The flagship serving path: ONE Pallas kernel per decode step runs
        # all layers + cached attention + logits argmax (ops/decode_step.py).
        if packed is None:
            # 256-row-divisible batches pack narrow (tw=384) weight tiles so
            # the kernel can run 256-row blocks (halved weight reads)
            packed = DS.pack_decode_weights(
                gpt_params, policy.compute_dtype, quant=decode_quant,
                tw=384 if b % 256 == 0 else DS.TILE_W,
            )

        def step_kernel(packed, x0, cache_state, index):
            """One fused step over the (k, v[, k_scale, v_scale]) state."""
            if decode_quant_cache:
                nxt, kc, vc, ks, vs = DS.fused_decode_step(
                    packed, x0, cache_state[0], cache_state[1], index,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon,
                    k_scale=cache_state[2], v_scale=cache_state[3],
                )
                return nxt, (kc, vc, ks, vs)
            nxt, kc, vc = DS.fused_decode_step(
                packed, x0, cache_state[0], cache_state[1], index,
                n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                eps=cfg.gpt2.layer_norm_epsilon,
            )
            return nxt, (kc, vc)

        def fused_loop(wte, wpe, packed, logits, cache_state, index0):
            bs = logits.shape[0]
            nxt0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            finished0 = nxt0 == eos
            toks0 = jnp.full((bs, max_length), eos, dtype=jnp.int32).at[:, 0].set(nxt0)

            def f_cond(state):
                step, _, _, finished, _, _ = state
                return jnp.logical_and(
                    step < max_length, jnp.logical_not(jnp.all(finished))
                )

            def f_body(state):
                step, tokens, prev, finished, cache_state, index = state
                x0 = (
                    jnp.take(wte, prev, axis=0)
                    + jax.lax.dynamic_slice_in_dim(wpe, index, 1, 0)[0]
                ).astype(policy.compute_dtype)
                nxt, cache_state = step_kernel(packed, x0, cache_state, index)
                finished = jnp.logical_or(finished, nxt == eos)
                nxt = jnp.where(finished, eos, nxt)
                tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
                return step + 1, tokens, nxt, finished, cache_state, index + 1

            _, tokens, _, _, _, _ = jax.lax.while_loop(
                f_cond,
                f_body,
                (jnp.ones((), jnp.int32), toks0, nxt0, finished0, cache_state, index0),
            )
            return tokens

        wte, wpe = gpt_params["wte"], gpt_params["wpe"]
        if decode_quant_cache:
            # int8 KV cache: one-time quantization of the prefilled cache;
            # the kernel appends quantized rows + per-row scales thereafter.
            # OFF by default even under decode_quant: measured on-chip it
            # does NOT pay (37.8 vs 37.0 ms/batch) — the chunked attention
            # loop is DMA-latency/VPU-bound, so the dequant multiplies eat
            # the bandwidth saving (docs/PERF_NOTES.md).
            kq, vq, ks, vs = DS.quantize_cache(cache["k"], cache["v"])
            cache_state0 = (kq, vq, ks, vs)
        else:
            cache_state0 = (cache["k"], cache["v"])
        if mesh is None:
            return fused_loop(wte, wpe, packed, logits, cache_state0, cache["index"])
        from jax import shard_map
        from jax.sharding import PartitionSpec as _P

        cache_specs = (_P(None, None, "dp", None),) * 2 + (
            (_P(None, None, "dp"),) * 2 if decode_quant_cache else ()
        )
        fn = shard_map(
            fused_loop,
            mesh=mesh,
            in_specs=(
                _P(), _P(), jax.tree.map(lambda _: _P(), packed),
                _P("dp", None),
                cache_specs, _P(),
            ),
            out_specs=_P("dp", None),
            check_vma=False,
        )
        return fn(wte, wpe, packed, logits, cache_state0, cache["index"])

    sk_ok = (
        sample_in_kernel
        and temperature != 0.0
        and fused_enabled
        and mesh is None
        and not decode_quant_cache
        and (top_p >= 0.5 or top_p >= 1.0)
    )
    if sample_in_kernel and not sk_ok and temperature != 0.0:
        import warnings

        warnings.warn(
            "sample_in_kernel requested but unsupported here (needs the fused "
            "kernel, no mesh, no int8 KV cache, top_p >= 0.5) — falling back "
            "to the XLA sampling tail",
            stacklevel=2,
        )
    if sk_ok:
        # Serving path: token selection fused into the decode kernel
        # (speculative-accept nucleus sampling — ops/decode_step.py sample
        # mode).  The first token still samples from the prefill logits in
        # XLA (the kernel only runs from step 1), with the same rng fold as
        # the XLA tail path.
        if packed is None:
            packed = DS.pack_decode_weights(
                gpt_params, policy.compute_dtype, quant=decode_quant,
                tw=384 if b % 256 == 0 else DS.TILE_W,
            )
        wte, wpe = gpt_params["wte"], gpt_params["wpe"]
        temps = jnp.full((b,), temperature, jnp.float32)
        topps = jnp.full((b,), top_p, jnp.float32)
        # independent per-step hardware-PRNG seeds derived from the caller's
        # key (one threefry draw, outside the loop)
        seeds = jax.lax.bitcast_convert_type(
            jax.random.bits(
                jax.random.fold_in(rng, max_length + 1), (max_length,), jnp.uint32
            ),
            jnp.int32,
        )

        nxt0 = sample_token(
            logits.astype(jnp.float32), temperature=temperature, top_p=top_p,
            rng=jax.random.fold_in(rng, 0),
        )
        finished0 = nxt0 == eos
        toks0 = tokens0.at[:, 0].set(nxt0)

        def sk_cond(state):
            step, _, _, finished, _, _ = state
            return jnp.logical_and(
                step < max_length, jnp.logical_not(jnp.all(finished))
            )

        def sk_body(state):
            step, tokens, prev, finished, cache_state, index = state
            x0 = (
                jnp.take(wte, prev, axis=0)
                + jax.lax.dynamic_slice_in_dim(wpe, index, 1, 0)[0]
            ).astype(policy.compute_dtype)
            nxt, _, _, kc, vc = DS.fused_decode_step(
                packed, x0, cache_state[0], cache_state[1], index,
                n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                eps=cfg.gpt2.layer_norm_epsilon,
                sample={"temp": temps, "top_p": topps, "seed": seeds[step]},
                sample_k=sample_k,
            )
            finished = jnp.logical_or(finished, nxt == eos)
            nxt = jnp.where(finished, eos, nxt)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
            return step + 1, tokens, nxt, finished, (kc, vc), index + 1

        _, tokens, _, _, _, _ = jax.lax.while_loop(
            sk_cond,
            sk_body,
            (
                jnp.ones((), jnp.int32), toks0, nxt0, finished0,
                (cache["k"], cache["v"]), cache["index"],
            ),
        )
        return tokens

    if temperature != 0.0 and fused_enabled and mesh is None:
        # Sampled decode on the same one-kernel-per-step serving path: the
        # kernel emits full logits (streamed to HBM, ~16 µs at b=128) and the
        # temperature/top-p/categorical selection runs outside in XLA —
        # identical sampling semantics (same rng folding) as the layerwise
        # path below.  Under a mesh this falls through to GSPMD: a per-shard
        # categorical would draw different noise than the global one, so the
        # sharded sampled path keeps the XLA loop for mesh-size invariance.
        if packed is None:
            packed = DS.pack_decode_weights(
                gpt_params, policy.compute_dtype, quant=decode_quant,
                tw=384 if b % 256 == 0 else DS.TILE_W,
            )
        wte, wpe = gpt_params["wte"], gpt_params["wpe"]

        def fs_step(packed, x0, cache_state, index):
            if decode_quant_cache:
                lg, kc, vc, ks, vs = DS.fused_decode_step(
                    packed, x0, cache_state[0], cache_state[1], index,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon, emit_logits=True,
                    k_scale=cache_state[2], v_scale=cache_state[3],
                )
                return lg, (kc, vc, ks, vs)
            lg, kc, vc = DS.fused_decode_step(
                packed, x0, cache_state[0], cache_state[1], index,
                n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                eps=cfg.gpt2.layer_norm_epsilon, emit_logits=True,
            )
            return lg, (kc, vc)

        def fs_cond(state):
            step, _, _, finished, _, _, _ = state
            return jnp.logical_and(step < max_length, jnp.logical_not(jnp.all(finished)))

        def fs_body(state):
            step, tokens, logits, finished, cache_state, index, rng = state
            step_rng = jax.random.fold_in(rng, step)
            nxt = sample_token(logits, temperature=temperature, top_p=top_p, rng=step_rng)
            finished = jnp.logical_or(finished, nxt == eos)
            nxt = jnp.where(finished, eos, nxt)
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
            x0 = (
                jnp.take(wte, nxt, axis=0)
                + jax.lax.dynamic_slice_in_dim(wpe, index, 1, 0)[0]
            ).astype(policy.compute_dtype)
            logits, cache_state = fs_step(packed, x0, cache_state, index)
            return step + 1, tokens, logits, finished, cache_state, index + 1, rng

        if decode_quant_cache:
            kq, vq, ks, vs = DS.quantize_cache(cache["k"], cache["v"])
            cache_state0 = (kq, vq, ks, vs)
        else:
            cache_state0 = (cache["k"], cache["v"])
        _, tokens, _, _, _, _, _ = jax.lax.while_loop(
            fs_cond,
            fs_body,
            (
                jnp.zeros((), jnp.int32), tokens0, logits.astype(jnp.float32),
                finished0, cache_state0, cache["index"], rng,
            ),
        )
        return tokens

    def cond(state):
        step, _, _, finished, _, _ = state
        return jnp.logical_and(step < max_length, jnp.logical_not(jnp.all(finished)))

    def body(state):
        step, tokens, logits, finished, cache, rng = state
        step_rng = jax.random.fold_in(rng, step)
        nxt = sample_token(logits, temperature=temperature, top_p=top_p, rng=step_rng)
        finished = jnp.logical_or(finished, nxt == eos)
        nxt = jnp.where(finished, eos, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, step))
        embed = G.embed_tokens(gpt_params, nxt[:, None]).astype(policy.compute_dtype)
        logits, cache = G.forward_cached(
            gpt_params, cfg.gpt2, embed, cache, policy,
            unroll=unroll_decode, use_pallas_decode=use_pallas_decode,
        )
        return step + 1, tokens, logits, finished, cache, rng

    _, tokens, _, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros((), jnp.int32), tokens0, logits, finished0, cache, rng)
    )
    return tokens


@functools.partial(jax.jit, static_argnames=("cfg", "policy", "quant", "tw"))
def prepare_decode_weights(trainable: dict, frozen: dict, cfg: CaptionerConfig,
                           policy: Policy = F32, quant: bool = False,
                           tw: int | None = None) -> dict:
    """Pre-tile the GPT-2 weights for the fused greedy decode kernel.

    The fused step kernel streams weights as contiguous column tiles
    (ops/decode_step.py); this re-layout costs a few ms on device — compute
    it once per weight set and pass to :func:`generate` as ``packed``.
    ``quant=True`` packs the int8 W8A8 serving tiles instead; ``tw=384``
    packs narrow tiles that let the kernel run 256-row batch blocks
    (pick it when the serving batch is a multiple of 256)."""
    return DS.pack_decode_weights(
        _gpt(trainable, frozen), policy.compute_dtype, quant=quant,
        tw=tw or DS.TILE_W,
    )


# ---------------------------------------------------------------------------
# Continuous batching (rolling admission) — segment decode + admission prefill
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "policy"),
    donate_argnums=(3, 4),
)
def decode_segment(
    packed: dict,
    wte: jnp.ndarray,
    wpe: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    idx: jnp.ndarray,
    start: jnp.ndarray,
    prev: jnp.ndarray,
    finished: jnp.ndarray,
    *,
    cfg: CaptionerConfig,
    steps: int,
    policy: Policy,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run ``steps`` fused decode steps on a live continuous-serving batch.

    The serving state lives on device between calls: caches ``k``/``v``
    ((L, Tmax, S, D), donated — updated in place), the global append
    position ``idx``, per-row admission offsets ``start`` (each row attends
    only to its window ``[start_r, idx)``), previous tokens ``prev`` and the
    EOS mask ``finished``.  Rows whose requests already ended keep stepping
    on EOS padding until the service swaps a queued request into them
    (ContinuousCaptionService in ``serving.py``) — the same finished-row
    semantics as :func:`generate`'s fused loop, minus the early exit (the
    batch never drains as a whole).

    Returns ``(tokens (S, steps) int32, k, v, idx', prev', finished')``.
    Extends the reference's notebook decode loop
    (/root/reference/src/models.py:389-469) to rolling-admission serving —
    a mode the reference does not have.
    """
    eos = cfg.eos_token_id

    def body(carry, _):
        k, v, idx, prev, finished = carry
        local = idx - start  # per-row position for the learned absolute PE
        x0 = (
            jnp.take(wte, prev, axis=0) + jnp.take(wpe, local, axis=0)
        ).astype(policy.compute_dtype)
        nxt, k, v = DS.fused_decode_step(
            packed, x0, k, v, idx,
            n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
            eps=cfg.gpt2.layer_norm_epsilon, start=start,
        )
        finished = jnp.logical_or(finished, nxt == eos)
        nxt = jnp.where(finished, eos, nxt)
        return (k, v, idx + 1, nxt, finished), nxt

    (k, v, idx, prev, finished), toks = jax.lax.scan(
        body, (k, v, idx, prev, finished), None, length=steps
    )
    return toks.T, k, v, idx, prev, finished


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy"),
    donate_argnums=(4, 5),
)
def admit_prefill(
    trainable: dict,
    frozen: dict,
    cfg: CaptionerConfig,
    emb: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    idx: jnp.ndarray,
    rows: jnp.ndarray,
    valid: jnp.ndarray,
    *,
    policy: Policy,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Admit up to ``n`` requests into freed rows of a live decode batch.

    ``emb`` (n, E) image embeddings → mapper prefix (n, P, D) → XLA prefill
    with LOCAL positions → the K/V rows land in cache positions
    ``[idx-P, idx)`` of the freed rows (dead history of the replaced
    requests), so the admitted rows join the uniform append position
    ``idx``; their ``start`` is ``idx - P``.  ``rows`` (n,) int32 slot
    indices; ``valid`` masks padding entries (callers pad ``n`` up to a
    small set of bucket sizes to bound compile count).  Padding entries
    must duplicate ``rows[0]`` — they then write row 0's own new values, so
    duplicate-index scatter stays deterministic.  At least one entry must
    be valid.

    Returns ``(first_token (n,) int32, k, v)`` — the argmax over the last
    prefix position's logits, i.e. each admitted request's first generated
    token (mirrors the prefill step of :func:`generate`).
    """
    gpt_params = _gpt(trainable, frozen)
    prefix = build_prefix(trainable, cfg, emb, policy)
    n, p, d = prefix.shape
    n_layer = k.shape[0]

    cache_n = G.init_cache(cfg.gpt2, n, p, dtype=policy.compute_dtype)
    logits, cache_n = G.forward_cached(
        gpt_params, cfg.gpt2, prefix, cache_n, policy, fresh_prefill=True
    )
    k_rows = cache_n["k"][:, :p].astype(k.dtype)  # (L, P, n, D)
    v_rows = cache_n["v"][:, :p].astype(v.dtype)
    # padding entries re-write rows[0] with rows[0]'s own new values
    k_rows = jnp.where(valid[None, None, :, None], k_rows, k_rows[:, :, :1])
    v_rows = jnp.where(valid[None, None, :, None], v_rows, v_rows[:, :, :1])

    def scatter(cache, rows_new):
        win = jax.lax.dynamic_slice(
            cache, (0, idx - p, 0, 0),
            (n_layer, p, cache.shape[2], cache.shape[3]),
        )
        win = win.at[:, :, rows, :].set(rows_new)
        return jax.lax.dynamic_update_slice(cache, win, (0, idx - p, 0, 0))

    first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return first, scatter(k, k_rows), scatter(v, v_rows)


# (Cache compaction — the uniform roll-down of every live window when the
# append position nears capacity — lives INSIDE the on-device macro engine,
# at macro entry: models/continuous.py.  The host-driven compact_cache
# helper it replaced was dead code once the engine landed.)


# ---------------------------------------------------------------------------
# Beam search (capability add over the reference; driver config ③)
# ---------------------------------------------------------------------------

@functools.partial(
    jax.jit,
    static_argnames=(
        "cfg", "max_length", "beam_size", "length_penalty", "policy",
        "use_pallas_decode", "mesh", "decode_quant",
    ),
)
def beam_generate(
    trainable: dict,
    frozen: dict,
    cfg: CaptionerConfig,
    image_embeddings: jnp.ndarray,
    *,
    max_length: int = 50,
    beam_size: int = 4,
    length_penalty: float = 1.0,
    policy: Policy = F32,
    use_pallas_decode: bool | None = None,
    mesh=None,
    decode_quant: bool = False,
) -> jnp.ndarray:
    """Length-normalized beam search → best beam's token ids (B, max_length).

    Runs a fixed ``lax.scan`` of ``max_length`` steps.  Score =
    sum-logprob / (length ** length_penalty), lengths counting tokens up to
    and including EOS.

    On TPU (single device, beam_size dividing the 128-row kernel block) the
    default path is the **beam-aware fused kernel**: one pallas_call per
    step runs the whole forward with ancestry-indirected attention (an
    (Tpad, B·K) origin map replaces the two full-cache beam gathers that
    dominated the round-2 beam profile — ~0.6 GB/step of HBM movement at
    512 rows) and emits each row's top-k (logit, token) pairs + logsumexp
    in-kernel, so the (B·K, V) logits tensor never exists either
    (ops/decode_step.py beam mode).  Elsewhere (CPU, meshes, non-dividing
    beam sizes) the XLA path gathers the cache per step as before.  Both
    paths share the same union-of-per-beam-top-k selection math and return
    identical beams (modulo 1-ulp logsumexp rounding on near-ties).

    ``decode_quant=True`` streams the fused kernel's weight tiles as
    per-column int8 (W8A8, same serving mode as ``generate``): halves the
    dominant weight-bandwidth term of every beam step; tokens drift from the
    float path only by quantization noise.  Requires the fused path — falls
    back (loudly) to the caller's precision otherwise.
    """
    gpt_params = _gpt(trainable, frozen)
    eos = cfg.eos_token_id
    k = beam_size

    prefix = build_prefix(trainable, cfg, image_embeddings, policy)
    b, p_len, d = prefix.shape

    # TPU default: the beam-aware fused kernel (ancestry-indirected
    # attention + in-kernel per-row top-k/logsumexp — see docstring).  The
    # round-2 opt-in fused forward (emit_logits + per-step cache gather)
    # measured no better than XLA because the gather/bookkeeping dominated;
    # the beam-aware kernel removes exactly those terms.  Requires beam
    # groups that don't straddle the kernel's batch blocks (k | 128) and a
    # single device OR a dp-only mesh (shard_map splits the image axis and
    # each device runs the kernel on its shard — beam state, ancestry and
    # cache rows are all per-image-group local, exactly like generate's
    # fused dp path).  use_pallas_decode=False opts out.
    dp_fused = (
        mesh is not None
        and mesh.shape.get("tp", 1) == 1
        and b % mesh.shape.get("dp", 1) == 0
    )
    b_shard = b // mesh.shape["dp"] if dp_fused else b
    fused = (
        DS.fused_greedy_enabled(cfg.gpt2, policy, use_pallas_decode)
        and (mesh is None or dp_fused)
        and DS.BLOCK_B % k == 0
        # Mosaic constraint: the kernel's per-block slice of the chunk-major
        # origin map cuts the row dim, and HBM memref slices must be
        # 128-aligned there — row counts off the 128 grid fail to compile on
        # real TPUs (found by scripts/tpu_validation.py at 16 rows).  Small
        # batches take the XLA path by default; explicit use_pallas_decode=
        # True still opts in (interpret-mode tests, where tiling is not
        # enforced).  Under a dp mesh the PER-SHARD row count is what hits
        # the kernel grid.
        and ((b_shard * k) % DS.BLOCK_B == 0 or use_pallas_decode is True)
    )
    if decode_quant and not fused:
        # int8 is a property of the fused kernel's packed W8A8 tiles; the XLA
        # beam path would silently run at the caller's precision.  Be loud
        # rather than mislabeling results (same contract as generate /
        # evaluation.generation — ADVICE r2).  NB: this runs at TRACE time,
        # so a long-lived process warns once per (shape, config) — later
        # same-shape calls run silently at caller precision; the un-jitted
        # serving/evaluation wrappers surface their own loud fallbacks.
        import warnings

        warnings.warn(
            "decode_quant requested but the beam-aware fused kernel is not "
            "engaged (non-TPU backend, mesh, or beam/batch shape off the "
            "128-row grid) — beam decoding at the caller's precision instead.",
            RuntimeWarning,
            stacklevel=2,
        )
    # narrow (tw=384) weight tiles unconditionally: beam mode's ancestry
    # gather needs the VMEM headroom even at 128-row blocks, and 256-row
    # blocks (b·k % 256 == 0) halve the weight stream on top.  quant=True
    # streams the same tiles as per-column int8 (W8A8 — halves the dominant
    # weight-bandwidth term; prefill stays at compute precision, exactly like
    # generate's decode_quant mode).
    packed = (
        DS.pack_decode_weights(
            gpt_params, policy.compute_dtype, tw=384, quant=decode_quant
        )
        if fused
        else None
    )

    prefill_fused = (
        fused
        and mesh is None  # prefill under a mesh is GSPMD-partitioned XLA
        # the prefill kernel streams float tiles only — under decode_quant the
        # pack is int8, so prefill keeps the XLA path (prefill is at compute
        # precision in W8A8 mode anyway, matching generate's contract)
        and not decode_quant
        and PS.fused_prefill_enabled(cfg.gpt2, policy, use_pallas_decode)
        and p_len <= 32
    )
    if prefill_fused:
        # opt-in fused prefill (GIC_ENABLE_FUSED_PREFILL=1; default-off
        # after the on-chip A/B — see generate()): all K beams of an image
        # are identical before the first token, so prefill only the B unique
        # rows and replicate the cache rows K× (measured a wash end-to-end:
        # beam time is decode-dominated).
        cache_b = G.init_cache(
            cfg.gpt2, b, p_len + max_length, dtype=policy.compute_dtype
        )
        logits_b, cache_b = PS.prefill_into_cache(
            packed, gpt_params, cfg.gpt2, prefix, cache_b, policy
        )
        cache = {
            "k": jnp.repeat(cache_b["k"], k, axis=2),
            "v": jnp.repeat(cache_b["v"], k, axis=2),
            "index": cache_b["index"],
        }
        logits = jnp.repeat(logits_b, k, axis=0)
    else:
        # expand to (B*K, ...) beams
        prefix_k = jnp.repeat(prefix, k, axis=0)
        cache = G.init_cache(
            cfg.gpt2, b * k, p_len + max_length, dtype=policy.compute_dtype
        )
        if mesh is not None:
            from jax.sharding import NamedSharding
            from jax.sharding import PartitionSpec as _P

            cache_sh = jax.tree.map(
                lambda s: NamedSharding(mesh, s),
                G.cache_partition_specs(cfg.gpt2),
                is_leaf=lambda x: isinstance(x, _P),
            )
            cache = jax.lax.with_sharding_constraint(cache, cache_sh)
        logits, cache = G.forward_cached(
            gpt_params, cfg.gpt2, prefix_k, cache, policy, fresh_prefill=True
        )

    neg_inf = jnp.finfo(jnp.float32).min
    # only beam 0 is live initially so the first step doesn't duplicate beams
    scores0 = jnp.tile(jnp.array([0.0] + [neg_inf] * (k - 1), jnp.float32), (b, 1))
    tokens0 = jnp.full((b, k, max_length), eos, dtype=jnp.int32)
    finished0 = jnp.zeros((b, k), dtype=bool)
    lengths0 = jnp.zeros((b, k), dtype=jnp.int32)

    def select(bb, scores, finished, vals, tok_k, lse):
        """Union-of-per-beam-top-k candidate selection (shared by both
        paths): every global top-k candidate is in its own beam's top-k
        (within a beam, ranking by score+logp == ranking by raw logits), so
        instead of materializing the (B, K·V) candidate tensor and top-k'ing
        201k entries — several wide HBM passes — combine each beam's k best
        tokens into K·K survivors.  Tie order matches the flat (beam-major,
        then vocab) rule exactly: candidates are laid out beam-major and
        both top-k stages break ties toward lower index.  ``bb`` is the
        local image count (the full batch, or this device's shard under the
        dp shard_map path)."""
        logp_k = (vals - lse).reshape(bb, k, k)
        tok_k = tok_k.reshape(bb, k, k)

        # finished beams may only "continue" with EOS at no score change
        logp_k = jnp.where(finished[:, :, None], neg_inf, logp_k)
        logp_k = logp_k.at[:, :, 0].set(
            jnp.where(finished, 0.0, logp_k[:, :, 0])
        )
        tok_k = tok_k.at[:, :, 0].set(
            jnp.where(finished, eos, tok_k[:, :, 0])
        )
        cand = (scores[..., None] + logp_k).reshape(bb, k * k)
        new_scores, ci = topk_small(cand, k)  # (B, K) over K·K entries
        parent = ci // k  # (B, K) beam index
        tok = jnp.take_along_axis(tok_k.reshape(bb, k * k), ci, axis=-1).astype(
            jnp.int32
        )
        return new_scores, parent, tok

    def reorder(bb, tokens, finished, lengths, parent, tok, step):
        """Carry beam state along the chosen parents and append tok."""
        batch_idx = jnp.arange(bb)[:, None]
        tokens = tokens[batch_idx, parent]
        finished = finished[batch_idx, parent]
        lengths = lengths[batch_idx, parent]
        tokens = jax.lax.dynamic_update_slice(tokens, tok[..., None], (0, 0, step))
        newly_finished = jnp.logical_or(finished, tok == eos)
        lengths = jnp.where(finished, lengths, step + 1)
        return tokens, newly_finished, lengths, batch_idx

    if fused:
        tpad = cache["k"].shape[1]
        # NB: GIC_BEAM_PREFIX_SKIP is read at TRACE time — it binds when a
        # (shape, config) first compiles and is NOT part of the jit cache
        # key, so it is a process-level switch: set it before the first
        # beam_generate call (A/B scripts clear jax caches when flipping it).
        gather_start = (
            p_len if os.environ.get("GIC_BEAM_PREFIX_SKIP", "1") != "0" else 0
        )

        def beam_scan(wte, wpe, packed, logits, kc, vc):
            """Whole beam decode from post-prefill state → best-beam tokens.

            Pure function of its arrays so the dp shard_map path can run it
            per device shard (beam selection, ancestry and cache rows never
            cross image groups); ``mesh is None`` calls it directly."""
            bb = logits.shape[0] // k

            def step_fn(carry, step):
                scores, tokens, finished, lengths, vals, tok_k, lse, kc, vc, origin = carry
                new_scores, parent, tok = select(bb, scores, finished, vals, tok_k, lse)
                tokens, newly_finished, lengths, batch_idx = reorder(
                    bb, tokens, finished, lengths, parent, tok, step
                )
                idx = p_len + step
                # ancestry bookkeeping instead of a cache gather: new row r
                # descends from flat_parent[r], whose history (positions <
                # idx) it inherits through the kernel's origin indirection;
                # its own K/V row is written at (idx, r) by the step below
                flat_parent = (batch_idx * k + parent).reshape(-1)
                origin = origin[:, flat_parent]
                origin = jax.lax.dynamic_update_slice(
                    origin, jnp.arange(bb * k, dtype=jnp.int32)[None, :], (idx, 0)
                )
                x0 = (
                    jnp.take(wte, tok.reshape(bb * k), axis=0)
                    + jax.lax.dynamic_slice_in_dim(wpe, idx, 1, 0)[0]
                ).astype(policy.compute_dtype)
                vals, tok_k, lse, kc, vc = DS.fused_decode_step(
                    packed, x0, kc, vc, idx,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon,
                    # prefix rows are identical across each beam group (all
                    # k beams descend from one image prefill), so ancestry
                    # gathering below p_len is a numeric no-op — skip it
                    # (GIC_BEAM_PREFIX_SKIP=0 re-enables the full gather,
                    # for A/Bs and as a safety valve like GIC_BEAM_GATHER)
                    origin=origin, beam_k=k, topk=k,
                    gather_start=gather_start,
                )
                return (
                    new_scores, tokens, newly_finished, lengths,
                    vals, tok_k, lse, kc, vc, origin,
                ), None

            lf = logits.astype(jnp.float32)
            vals0, tok_k0 = topk_small(lf, k)
            lse0 = jax.nn.logsumexp(lf, axis=-1, keepdims=True)
            origin0 = jnp.broadcast_to(
                jnp.arange(bb * k, dtype=jnp.int32)[None, :], (tpad, bb * k)
            )
            carry = (
                jnp.tile(jnp.array([0.0] + [neg_inf] * (k - 1), jnp.float32), (bb, 1)),
                jnp.full((bb, k, max_length), eos, dtype=jnp.int32),
                jnp.zeros((bb, k), dtype=bool),
                jnp.zeros((bb, k), dtype=jnp.int32),
                vals0, tok_k0, lse0, kc, vc, origin0,
            )
            (scores, tokens, finished, lengths, *_), _ = jax.lax.scan(
                step_fn, carry, jnp.arange(max_length)
            )
            lengths = jnp.where(finished, lengths, max_length)
            norm = jnp.power(
                jnp.maximum(lengths, 1).astype(jnp.float32), length_penalty
            )
            best = jnp.argmax(scores / norm, axis=1)
            return tokens[jnp.arange(bb), best]

        wte, wpe = gpt_params["wte"], gpt_params["wpe"]
        if mesh is None:
            return beam_scan(wte, wpe, packed, logits, cache["k"], cache["v"])
        # dp shard_map: image groups split over dp, weights/packed tiles
        # replicated — each device runs the beam-aware kernel on its shard
        # (same pattern as generate's fused dp path)
        from jax import shard_map
        from jax.sharding import PartitionSpec as _P

        fn = shard_map(
            beam_scan,
            mesh=mesh,
            in_specs=(
                _P(), _P(), jax.tree.map(lambda _: _P(), packed),
                _P("dp", None),
                _P(None, None, "dp", None), _P(None, None, "dp", None),
            ),
            out_specs=_P("dp", None),
            check_vma=False,
        )
        return fn(wte, wpe, packed, logits, cache["k"], cache["v"])

    else:
        def step_fn(carry, step):
            scores, tokens, finished, lengths, logits, cache = carry
            lf = logits.astype(jnp.float32)  # (B·K, V)
            vals, tok_k = topk_small(lf, k)  # (B·K, k) raw logits descending
            lse = jax.nn.logsumexp(lf, axis=-1, keepdims=True)
            new_scores, parent, tok = select(b, scores, finished, vals, tok_k, lse)
            tokens, newly_finished, lengths, batch_idx = reorder(
                b, tokens, finished, lengths, parent, tok, step
            )
            # gather the KV cache along beams: flat index = batch*k + parent
            # (cache layout (L, T, B·K, D) — batch is axis 2)
            flat_parent = (batch_idx * k + parent).reshape(-1)
            cache = dict(
                cache,
                k=cache["k"][:, :, flat_parent],
                v=cache["v"][:, :, flat_parent],
            )
            embed = G.embed_tokens(gpt_params, tok.reshape(b * k, 1)).astype(
                policy.compute_dtype
            )
            logits, cache = G.forward_cached(
                gpt_params, cfg.gpt2, embed, cache, policy,
                unroll=True, use_pallas_decode=use_pallas_decode,
            )
            return (new_scores, tokens, newly_finished, lengths, logits, cache), None

        carry = (scores0, tokens0, finished0, lengths0, logits, cache)
        (scores, tokens, finished, lengths, _, _), _ = jax.lax.scan(
            step_fn, carry, jnp.arange(max_length)
        )
    lengths = jnp.where(finished, lengths, max_length)
    norm = jnp.power(jnp.maximum(lengths, 1).astype(jnp.float32), length_penalty)
    best = jnp.argmax(scores / norm, axis=1)
    return tokens[jnp.arange(b), best]


# ---------------------------------------------------------------------------
# Stateful façade (reference-style API)
# ---------------------------------------------------------------------------

class ImageCaptioningModel:
    """API-parity wrapper: forward/generate/generate_captions/save_parameters/
    load_saved_parameters, like the reference model class."""

    def __init__(
        self,
        cfg: CaptionerConfig,
        tokenizer=None,
        rng: jax.Array | None = None,
        gpt_params: dict | None = None,
        policy: Policy = F32,
    ):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.policy = policy
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.trainable, self.frozen = init_params(rng, cfg, gpt_params)

    # -- compute ------------------------------------------------------------
    def forward(
        self,
        batch: dict | None = None,
        *,
        caption_token_ids=None,
        image_embeddings=None,
        attention_mask=None,
        labels=None,
    ) -> jnp.ndarray:
        """Teacher-forced mean loss.  Accepts either a batch dict or the
        reference's keyword signature (``src/models.py:237-243``)."""
        if batch is None:
            if attention_mask is None:
                attention_mask = jnp.ones_like(jnp.asarray(caption_token_ids))
            if labels is None:
                labels = jnp.asarray(caption_token_ids)
            batch = {
                "token_ids": jnp.asarray(caption_token_ids),
                "labels": jnp.asarray(labels),
                "attention_mask": jnp.asarray(attention_mask),
                "image_embedding": jnp.asarray(image_embeddings),
            }
        return mean_loss(self.trainable, self.frozen, self.cfg, batch, self.policy)

    def generate(
        self,
        image_embeddings,
        max_length: int = 50,
        temperature: float = 1.0,
        top_p: float = 0.9,
        rng: jax.Array | None = None,
        decode_precision: str | None = None,
        mesh=None,
    ) -> jnp.ndarray:
        """``decode_precision="bf16"`` stores the weights in bfloat16 for the
        decode (half the HBM bytes/step → +25% throughput measured at b=128);
        ``"int8"`` additionally streams the fused kernel's weight tiles as
        per-column-quantized int8 (W8A8: activations quantized per row in
        kernel) — halving the dominant weight-traffic term again (see
        docs/PERF_NOTES.md; token drift vs f32 is quantization noise,
        serving opt-in).  Default keeps full f32 reference parity.

        ``mesh`` — a ``(dp, tp)`` Mesh for multi-chip decode (see the
        module-level :func:`generate`): dp-only meshes with
        ``b % dp == 0`` keep the fused kernel (shard_map over the batch);
        anything else partitions the XLA path via GSPMD."""
        quant = decode_precision == "int8"
        tr, fz, pol = self.decode_params("bf16" if quant else decode_precision)
        packed = None
        if DS.fused_greedy_enabled(self.cfg.gpt2, pol, None):
            tw = 384 if jnp.asarray(image_embeddings).shape[0] % 256 == 0 else None
            # cache the kernel's pre-tiled weights per (quant, tw) so a
            # serving mix alternating bf16/int8 or 256-multiple/odd batches
            # keeps every packing warm; a weight swap invalidates all entries
            cache = getattr(self, "_packed_cache", None)
            if cache is None or cache[0] is not tr or cache[1] is not fz or cache[2] is not pol:
                cache = (tr, fz, pol, {})
                self._packed_cache = cache
            packings = cache[3]
            if (quant, tw) not in packings:
                packings[(quant, tw)] = prepare_decode_weights(
                    tr, fz, self.cfg, pol, quant=quant, tw=tw
                )
            packed = packings[(quant, tw)]
        return generate(
            tr,
            fz,
            self.cfg,
            jnp.asarray(image_embeddings),
            max_length=max_length,
            temperature=temperature,
            top_p=top_p,
            rng=rng,
            policy=pol,
            packed=packed,
            decode_quant=quant,
            mesh=mesh,
        )

    def decode_params(self, decode_precision: str | None = None):
        """(trainable, frozen, policy) for inference at the given precision.

        ``"bf16"`` returns a cached bfloat16 copy of the weights (half the
        HBM bytes/decode-step); ``None``/``"f32"`` returns the live params."""
        if decode_precision in (None, "f32"):
            return self.trainable, self.frozen, self.policy
        if decode_precision != "bf16":
            raise ValueError(
                f"decode_precision must be 'f32' or 'bf16', got {decode_precision!r}"
            )
        from gpt2_image_captioning_tpu.core.precision import BF16, cast_floating

        # keyed on the live pytrees' identity: a weight swap (checkpoint load,
        # train loop publishing updated params) invalidates the cast copy
        cache = getattr(self, "_bf16_cache", None)
        if (
            cache is None
            or cache[0] is not self.trainable
            or cache[1] is not self.frozen
        ):
            self._bf16_cache = (
                self.trainable,
                self.frozen,
                cast_floating(self.trainable),
                cast_floating(self.frozen),
            )
        return self._bf16_cache[2], self._bf16_cache[3], BF16

    def generate_captions(self, image_embeddings, **kw) -> list[str]:
        ids = self.generate(image_embeddings, **kw)
        return self.tokenizer.batch_decode(np.asarray(ids), skip_special_tokens=True)

    # -- checkpointing --------------------------------------------------------
    def save_parameters(self, output_path: str) -> None:
        from gpt2_image_captioning_tpu.train import checkpoint

        checkpoint.save_captioner(output_path, self.trainable, self.cfg)

    def load_saved_parameters(self, checkpoint_path: str) -> None:
        from gpt2_image_captioning_tpu.train import checkpoint

        self.trainable = checkpoint.load_captioner(
            checkpoint_path, self.trainable, self.cfg
        )
        self._bf16_cache = None  # stale after a weight swap
