"""GPT-2 (124M) decoder as pure-functional JAX, TPU-first.

Replaces the reference's HF ``GPT2LMHeadModel`` dependency (reference
``src/models.py:7,211-213,321-325``) with a from-scratch implementation:

- full-sequence causal forward over ``inputs_embeds`` (prefix conditioning
  needs embedding-level input, so that is the primary interface),
- teacher-forcing loss with shifted labels and ``-100`` ignore semantics
  identical to torch ``CrossEntropyLoss``,
- an **incremental KV-cached decode path** (``init_cache`` / ``forward_cached``)
  — the reference re-forwards the whole sequence every generated token
  (``src/models.py:389-395``, O(L²·model)); here each step is O(L·model) and
  the whole loop compiles into one XLA program,
- **scan-over-layers**: block parameters are stored *stacked* (leading layer
  dim) and the layer loop is a ``lax.scan``, so trace/compile time is O(1) in
  depth — the graph contains one block, not ``n_layer`` copies,
- tensor-parallel partition specs over the ``tp`` mesh axis (heads/MLP
  sharded; XLA inserts the collectives).

Weight layout matches HF's on purpose (``Conv1D`` = ``(in, out)`` matmul
weights); porting stacks the per-layer tensors (``models/porting.py``),
validated numerically in tests against randomly-initialized HF models.
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.ops import decode_attention as DA
from gpt2_image_captioning_tpu.ops import nn
from gpt2_image_captioning_tpu.ops.attention import mha

IGNORE_INDEX = -100


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5

    @property
    def head_dim(self) -> int:
        return self.n_embd // self.n_head

    @staticmethod
    def gpt2_124m() -> "GPT2Config":
        return GPT2Config()

    @staticmethod
    def gpt2_medium() -> "GPT2Config":
        """355M.  The reference hardcodes the 124M checkpoint
        (``src/models.py:211``) but accepts any injected ``GPT2LMHeadModel``
        via its ``gpt`` argument; these constructors are the equivalent
        surface.  Larger sizes decode on the layerwise XLA cached path (the
        fused kernel's VMEM budget is tuned for the 768-wide flagship —
        ``ops/decode_step.py::fused_greedy_enabled`` gates them out)."""
        return GPT2Config(n_embd=1024, n_layer=24, n_head=16)

    @staticmethod
    def gpt2_large() -> "GPT2Config":
        """774M — see :meth:`gpt2_medium` for the decode-path note."""
        return GPT2Config(n_embd=1280, n_layer=36, n_head=20)

    @staticmethod
    def gpt2_xl() -> "GPT2Config":
        """1.5B — see :meth:`gpt2_medium` for the decode-path note."""
        return GPT2Config(n_embd=1600, n_layer=48, n_head=25)

    @staticmethod
    def tiny(vocab_size: int = 293) -> "GPT2Config":
        """Small config for CPU tests."""
        return GPT2Config(vocab_size=vocab_size, n_positions=128, n_embd=32, n_layer=2, n_head=2)


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def stack_blocks(blocks: list[dict]) -> dict:
    """List of per-layer param dicts → one stacked pytree (leading L dim)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)


def unstack_blocks(blocks: dict, n_layer: int) -> list[dict]:
    return [jax.tree.map(lambda x: x[i], blocks) for i in range(n_layer)]


def init(rng: jax.Array, cfg: GPT2Config) -> dict:
    """HF GPT-2 init scheme: N(0, 0.02) embeddings/weights, zero biases,
    residual projections scaled by 1/sqrt(2*n_layer)."""
    keys = jax.random.split(rng, 2 + cfg.n_layer)
    proj_std = 0.02 / (2 * cfg.n_layer) ** 0.5
    blocks = []
    for i in range(cfg.n_layer):
        k1, k2, k3, k4 = jax.random.split(keys[2 + i], 4)
        d = cfg.n_embd
        blocks.append(
            {
                "ln_1": nn.layer_norm_init(d),
                "attn": {
                    "c_attn": nn.dense_init(k1, d, 3 * d, std=0.02),
                    "c_proj": nn.dense_init(k2, d, d, std=proj_std),
                },
                "ln_2": nn.layer_norm_init(d),
                "mlp": {
                    "c_fc": nn.dense_init(k3, d, 4 * d, std=0.02),
                    "c_proj": nn.dense_init(k4, 4 * d, d, std=proj_std),
                },
            }
        )
    return {
        "wte": nn.normal(keys[0], (cfg.vocab_size, cfg.n_embd), 0.02),
        "wpe": nn.normal(keys[1], (cfg.n_positions, cfg.n_embd), 0.01),
        "ln_f": nn.layer_norm_init(cfg.n_embd),
        "blocks": stack_blocks(blocks),
    }


def partition_specs(cfg: GPT2Config) -> dict:
    """Tensor-parallel PartitionSpecs over the ``tp`` mesh axis.

    QKV/MLP-up shard their output features; the down-projections shard their
    input features (XLA then reduces partial sums with a psum over tp).  The
    embedding table shards its vocab rows.  Stacked blocks carry a leading
    (unsharded) layer dim.  With tp=1 everything is replicated.
    """
    blocks = {
        "ln_1": {"scale": P(), "bias": P()},
        "attn": {
            "c_attn": {"w": P(None, None, "tp"), "b": P(None, "tp")},
            "c_proj": {"w": P(None, "tp", None), "b": P()},
        },
        "ln_2": {"scale": P(), "bias": P()},
        "mlp": {
            "c_fc": {"w": P(None, None, "tp"), "b": P(None, "tp")},
            "c_proj": {"w": P(None, "tp", None), "b": P()},
        },
    }
    return {
        # vocab (50257) is odd → shard the feature dim; row gathers stay
        # local and the logits matmul psums over tp
        "wte": P(None, "tp"),
        "wpe": P(),
        "ln_f": {"scale": P(), "bias": P()},
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# Blocks
# ---------------------------------------------------------------------------

def _block(
    bp: dict,
    cfg: GPT2Config,
    x: jnp.ndarray,
    *,
    key_mask: jnp.ndarray | None,
    policy: Policy,
) -> jnp.ndarray:
    h = nn.layer_norm(bp["ln_1"], x, cfg.layer_norm_epsilon)
    qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
    q, k, v = (nn.split_heads(t, cfg.n_head) for t in jnp.split(qkv, 3, axis=-1))
    a = mha(q, k, v, causal=True, key_mask=key_mask, policy=policy)
    x = x + nn.dense(bp["attn"]["c_proj"], nn.merge_heads(a), policy)
    h = nn.layer_norm(bp["ln_2"], x, cfg.layer_norm_epsilon)
    h = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h, policy))
    return x + nn.dense(bp["mlp"]["c_proj"], h, policy)


def forward_hidden(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    policy: Policy = F32,
    unroll_layers: bool = False,
    remat: bool = False,
) -> jnp.ndarray:
    """Full-sequence causal forward → final-LayerNorm hidden states (B, T, D).

    ``attention_mask`` is the HF-style key padding mask (B, T), 1 = attend.
    Position embeddings are absolute from 0 (HF's default when only
    ``inputs_embeds`` is given).

    ``unroll_layers=False`` runs the layer loop as a ``lax.scan`` (O(1) trace
    size in depth).  ``unroll_layers=True`` uses a python loop: under
    ``jax.grad`` with a FROZEN decoder, partial evaluation then drops the
    (unused) weight-gradient matmuls, which scan's transpose computes and
    discards — use it for frozen-backbone training.

    ``remat=True`` wraps each transformer block in ``jax.checkpoint``
    (per-layer rematerialization): the backward recomputes block activations
    instead of keeping them live, cutting peak activation memory from
    O(n_layer·B·T·D) to O(B·T·D) at the cost of one extra forward — the
    standard TPU trade for scaling unfrozen training to batch/sequence sizes
    that would not otherwise fit HBM.  Identical loss and gradients.
    """
    b, t, d = inputs_embeds.shape
    pos = params["wpe"][:t].astype(jnp.float32)
    x = (inputs_embeds.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

    if remat:
        ckpt = jax.checkpoint(
            lambda bp, x, m: _block(bp, cfg, x, key_mask=m, policy=policy),
            # inside lax.scan the loop boundary already blocks CSE; in the
            # python-unrolled branch XLA CSE could silently undo the remat,
            # so keep the guard on there (ADVICE r2)
            prevent_cse=unroll_layers,
        )
        block = lambda bp, c, x, key_mask, policy: ckpt(bp, x, key_mask)  # noqa: E731
    else:
        block = _block

    if unroll_layers:
        for i in range(cfg.n_layer):
            bp = jax.tree.map(lambda p: p[i], params["blocks"])
            x = block(bp, cfg, x, key_mask=attention_mask, policy=policy)
    else:
        def body(x, bp):
            return block(bp, cfg, x, key_mask=attention_mask, policy=policy), None

        x, _ = jax.lax.scan(body, x, params["blocks"])
    return nn.layer_norm(params["ln_f"], x, cfg.layer_norm_epsilon)


def forward(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray | None = None,
    policy: Policy = F32,
) -> jnp.ndarray:
    """Full-sequence causal LM forward over embeddings → logits (B, T, V)."""
    x = forward_hidden(params, cfg, inputs_embeds, attention_mask, policy)
    logits = jnp.dot(
        policy.cast(x),
        params["wte"].T.astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits  # float32


def embed_tokens(params: dict, token_ids: jnp.ndarray) -> jnp.ndarray:
    """wte lookup — the reference calls ``gpt.transformer.wte`` directly to
    build mixed prefix+caption inputs (``src/models.py:261``)."""
    return jnp.take(params["wte"], token_ids, axis=0)


def cross_entropy_loss(
    logits: jnp.ndarray, labels: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shifted next-token CE with -100 ignore; returns (sum, count) so callers
    can combine across microbatches/devices before dividing (keeps the mean
    identical to torch's CrossEntropyLoss over the global batch)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, shift_labels, 0)
    logz = jax.nn.logsumexp(shift_logits.astype(jnp.float32), axis=-1)
    gold = jnp.take_along_axis(
        shift_logits.astype(jnp.float32), safe_labels[..., None], axis=-1
    )[..., 0]
    nll = (logz - gold) * valid
    return jnp.sum(nll), jnp.sum(valid)


# ---------------------------------------------------------------------------
# KV-cached decode
# ---------------------------------------------------------------------------

def init_cache(cfg: GPT2Config, batch: int, max_len: int, dtype=jnp.float32) -> dict:
    """Per-layer KV cache, laid out (L, T, B, D).

    D = n_head·head_dim is the lane dim (768 = 6×128 lanes — no tile-padding
    waste, unlike a trailing head_dim of 64 which tiles to half a register and
    doubles effective cache traffic), and the c_attn projections append with
    no head split/merge transposes.  T leads B so T is NOT a tiled dim —
    single-row cache appends are then legal in-kernel DMA writes
    (ops/decode_step.py).  The time dim is rounded up to the decode kernel's
    chunk size so the chunk walk never pads per step; rows beyond ``index``
    are masked everywhere.
    """
    max_len = -(-max_len // DA.CHUNK_T) * DA.CHUNK_T
    shape = (cfg.n_layer, max_len, batch, cfg.n_embd)
    return {
        "k": jnp.zeros(shape, dtype),
        "v": jnp.zeros(shape, dtype),
        "index": jnp.zeros((), jnp.int32),
    }


def cache_partition_specs(cfg: GPT2Config) -> dict:
    """(L, T, B, D): batch on dp, model width on tp (heads are contiguous
    64-lane groups of D, so a tp shard holds whole heads)."""
    return {
        "k": P(None, None, "dp", "tp"),
        "v": P(None, None, "dp", "tp"),
        "index": P(),
    }


def forward_cached(
    params: dict,
    cfg: GPT2Config,
    inputs_embeds: jnp.ndarray,
    cache: dict,
    policy: Policy = F32,
    unroll: bool = False,
    use_pallas_decode: bool | None = None,
    fresh_prefill: bool = False,
) -> tuple[jnp.ndarray, dict]:
    """Forward ``inputs_embeds`` (B, T, D) starting at position
    ``cache['index']``; returns (last-position logits (B, V), updated cache).

    T is the prefix length at prefill time and 1 per decode step.  The
    single-token step routes through the fused decode-attention kernel
    (``ops.decode_attention`` — cache append + valid-prefix attention in one
    Pallas call on TPU; ``use_pallas_decode`` overrides the dispatch).  Two
    layer iteration modes with identical numerics:

    - ``unroll=False`` (default) — ``lax.scan`` threading each layer's cache
      slice (compact graph; scan restacks the cache ys each call),
    - ``unroll=True`` — python loop with per-layer ``.at[i]`` in-place cache
      updates (XLA elides the copies; cheaper per decode step where the call
      runs every generated token).
    """
    b, t, d = inputs_embeds.shape
    idx = cache["index"]
    # dynamic_slice clamps the start index, so idx + t <= n_positions must
    # hold in valid use (enforced by callers' max_length).
    pos = jax.lax.dynamic_slice_in_dim(params["wpe"], idx, t, axis=0).astype(jnp.float32)
    x = (inputs_embeds.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

    tk = cache["k"].shape[1]
    key_valid = (jnp.arange(tk)[None, :] < idx + t).astype(jnp.int32)
    key_valid = jnp.broadcast_to(key_valid, (b, tk))

    def layer(x, bp, k_cache, v_cache):
        """One block over (x, this layer's (T, B, D) cache slabs)."""
        h = nn.layer_norm(bp["ln_1"], x, cfg.layer_norm_epsilon)
        qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
        q3, k3, v3 = jnp.split(qkv, 3, axis=-1)  # each (B, T, D)
        if t == 1:
            a_flat, k_cache, v_cache = DA.decode_attention(
                q3[:, 0],
                k3[:, 0],
                v3[:, 0],
                k_cache,
                v_cache,
                idx,
                n_head=cfg.n_head,
                use_pallas=use_pallas_decode,
            )
            a = a_flat[:, None, :].astype(policy.compute_dtype)
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, k3.transpose(1, 0, 2).astype(k_cache.dtype), (idx, 0, 0)
            )
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, v3.transpose(1, 0, 2).astype(v_cache.dtype), (idx, 0, 0)
            )
            if fresh_prefill:
                # cache rows before idx are empty (idx == 0): attend the
                # prefix directly — no padded-cache readback or transposes
                a4 = mha(
                    nn.split_heads(q3, cfg.n_head),
                    nn.split_heads(k3, cfg.n_head),
                    nn.split_heads(v3, cfg.n_head),
                    causal=True,
                    policy=policy,
                )
            else:
                hd = d // cfg.n_head
                k4 = k_cache.reshape(tk, b, cfg.n_head, hd).transpose(1, 2, 0, 3)
                v4 = v_cache.reshape(tk, b, cfg.n_head, hd).transpose(1, 2, 0, 3)
                a4 = nn.attention_xla(
                    nn.split_heads(q3, cfg.n_head),
                    k4.astype(policy.compute_dtype),
                    v4.astype(policy.compute_dtype),
                    causal=True,
                    key_mask=key_valid,
                    q_offset=idx,
                    policy=policy,
                )
            a = nn.merge_heads(a4)
        x = x + nn.dense(bp["attn"]["c_proj"], a, policy)
        h = nn.layer_norm(bp["ln_2"], x, cfg.layer_norm_epsilon)
        h = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h, policy))
        x = x + nn.dense(bp["mlp"]["c_proj"], h, policy)
        return x, k_cache, v_cache

    if unroll:
        k_all, v_all = cache["k"], cache["v"]
        for i in range(cfg.n_layer):
            bp = jax.tree.map(lambda p: p[i], params["blocks"])
            x, k_i, v_i = layer(x, bp, k_all[i], v_all[i])
            k_all = k_all.at[i].set(k_i)
            v_all = v_all.at[i].set(v_i)
        cache = {"k": k_all, "v": v_all, "index": idx + t}
    else:
        def body(x, layer_in):
            bp, k_cache, v_cache = layer_in
            x, k_cache, v_cache = layer(x, bp, k_cache, v_cache)
            return x, (k_cache, v_cache)

        x, (new_k, new_v) = jax.lax.scan(
            body, x, (params["blocks"], cache["k"], cache["v"])
        )
        cache = {"k": new_k, "v": new_v, "index": idx + t}

    x = nn.layer_norm(params["ln_f"], x[:, -1:, :], cfg.layer_norm_epsilon)
    logits = jnp.dot(
        policy.cast(x[:, 0, :]),
        params["wte"].T.astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, cache
