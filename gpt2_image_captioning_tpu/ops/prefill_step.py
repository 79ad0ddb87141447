"""Fused GPT-2 prefill as ONE Pallas TPU kernel — built, measured, and
REJECTED as the default (opt-in via ``GIC_ENABLE_FUSED_PREFILL=1``).

Why it was built: the decode loop already runs one kernel per token
(``ops/decode_step.py``), and the prefill phase (mapper output → 12 layers
over the T=15 prefix → first logits) remained a ~32-dot XLA chain sitting
~1.6× above its MXU floor.  Row-scaling experiments
(scripts/prefill_mm_floor.py) suggested a ~2.7 ms fixed per-op term that a
single-kernel rewrite would amortize, like one-kernel-per-token did for
decode (XLA step 2.5 ms → kernel 0.71 ms at b=128).

What the measurement showed (scripts/prefill_kernel_ab.py,
scripts/prefill_kernel_decomp.py; docs/PERF_NOTES.md round 3): the
hypothesis was WRONG — this kernel runs the identical chain with zero
per-op dispatch and lands at 6.5–6.8 ms vs XLA's 6.3 ms (b=128, T=15,
bf16).  The inefficiency is the matmul *shape* (1920-row dots over
768-wide weights run at ~30–40% MXU everywhere), not op overhead.  The
kernel and its interpret-mode parity tests stay in-tree: the design is
sound (it may pay at larger serving batches), and the A/B is the evidence
the default must cite.

Design (mirrors ops/decode_step.py; reference behavior at
``/root/reference/src/models.py:389-400`` — the prefix forward that seeds
generation):

- **Rows are image-major**: the (B, T, D) prefix flattens to (B·T, D) with
  image ``g`` occupying rows ``[g·T, (g+1)·T)``.  The grid blocks rows in
  whole-image groups (``bb = g_block·T``, 8-aligned), so attention never
  crosses a block.
- **Same packed weights as decode**: the kernel streams the identical
  ``pack_decode_weights`` column tiles (L, nc·nr, D, TW) through a
  double-buffered DMA walk — packing is paid once per weight set and shared
  by prefill AND every decode step.
- **Causal intra-image attention as T static shifted passes**: position t
  attends positions t−s for s ∈ [0, t].  Pass s computes the rowwise
  per-head dots ``q[r]·k[r−s]`` via one elementwise multiply of the
  s-shifted K block and the block-diagonal head-sum matmul
  (ops/decode_attention.py trick), accumulated with an online softmax —
  ~4 VPU passes + 2 skinny matmuls per offset, no (rows × rows) score
  matrix, no sub-lane reshapes.  The static shifted-copy pattern is the
  one ``_beam_gather`` already lowers.
- **K/V rows exit via DMA per layer** into (L, B·T, D) outputs, staged
  through double-buffered VMEM so layer l+1's compute overlaps layer l's
  cache write.  The caller transposes once to the (L, T, B, D) cache
  layout and computes the first-token logits with one XLA dot (a single
  op boundary costs ~0.1 ms; streaming 50k-wide logits for T positions
  in-kernel would not pay).

Numerics: identical recipe to the decode kernel — bf16 matmul inputs, f32
accumulation, f32 residual stream and LayerNorm/softmax statistics;
interpret-mode tests compare against ``gpt2.forward_cached`` with
``fresh_prefill=True``.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# target rows per grid block: large enough to amortize the weight stream
# (each block re-reads all layer weights), small enough that the row
# buffers fit scoped VMEM next to the weight tiles.  At 480 rows the
# compiler-measured peak (qkv staging + K/V staging + f32 residual and
# attention temporaries) was 18.4 MB vs the 16.0 MB scope — 240-row blocks
# (g=16 at T=15, zero batch padding at b=128) measure ~half that.
_TARGET_BLOCK_ROWS = 256


def _ln(x32, scale, bias, eps):
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _gelu_new(x32):
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 * x32 * x32)))


def _prefill_kernel(
    # VMEM inputs
    x_ref,            # (BB, D) cdt — prefix embeddings + wpe, image-major rows
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,      # (L, D) f32
    attnb_ref, projb_ref, fcb_ref, cprojb_ref,   # (L, nc, 1, TW) f32 tiles
    hs_ref,           # (D, H) cdt  block-diagonal head-sum
    he_ref,           # (H, D) f32  head-expand
    # HBM inputs (pre-tiled weight streams, same packing as decode)
    qkvw_ref, projw_ref, fcw_ref, cprojw_ref,    # (L, nc·nr, D, TW)
    # outputs
    xo_ref,           # (BB, D) cdt VMEM block — residual stream after layer L
    ko_ref, vo_ref,   # (L, R, D) cdt HBM — per-layer K/V rows, image-major
    # scratch
    qkvbuf,           # (BB, QKV_PAD) cdt — per-layer QKV staging
    wbuf,             # (2, D, TW) cdt — weight tile double buffer
    kstage, vstage,   # (2, BB, D) cdt — K/V out staging (slot = layer % 2)
    wsem, ksem, vsem, # DMA semaphores
    *,
    n_layer: int,
    d: int,
    f: int,
    n_head: int,
    t_group: int,
    tw: int,
    eps: float,
    debug_max_shift: int | None = None,
    debug_skip_kv_dma: bool = False,
):
    bi = pl.program_id(0)
    bb = x_ref.shape[0]
    cdt = x_ref.dtype
    scale = 1.0 / math.sqrt(d // n_head)

    def stream_matmul(x_in, w_hbm, l, d_in, out_w, bias_ref, post=None, out_ref=None):
        """x_in (BB, d_in) cdt @ w[l] + bias → (BB, out_w) f32 (or write each
        column tile into ``out_ref`` when given).  Same double-buffered walk
        as the decode kernel's stream_matmul (decode_step.py)."""
        nr = d_in // d
        nc = out_w // tw
        nt = nr * nc

        def dma(slot, t):
            return pltpu.make_async_copy(w_hbm.at[l, t], wbuf.at[slot], wsem.at[slot])

        dma(0, 0).start()
        outs = []
        t = 0
        for c in range(nc):
            acc = None
            for r in range(nr):
                if t + 1 < nt:
                    dma((t + 1) % 2, t + 1).start()
                dma(t % 2, t).wait()
                xr = x_in if nr == 1 else x_in[:, r * d : (r + 1) * d]
                part = jnp.dot(xr, wbuf[t % 2], preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
                t += 1
            acc = acc + bias_ref[l, c]
            acc = post(acc) if post else acc
            if out_ref is not None:
                out_ref[:, c * tw : (c + 1) * tw] = acc
            else:
                outs.append(acc)
        if out_ref is not None:
            return None
        return outs[0] if nc == 1 else jnp.concatenate(outs, axis=-1)

    to_cdt = lambda t: t.astype(cdt)  # noqa: E731
    gelu_cdt = lambda t: _gelu_new(t).astype(cdt)  # noqa: E731

    qkv_pad = qkvbuf.shape[1]
    proj_pad = projw_ref.shape[1] * tw
    f_pad = fcw_ref.shape[1] * tw
    cproj_pad = cprojw_ref.shape[1] // (f // d) * tw

    # position-within-image of each row, broadcast per head: rows are
    # image-major so the local position is just row % T
    rpos = jax.lax.broadcasted_iota(jnp.int32, (bb, n_head), 0) % t_group

    x32 = x_ref[...].astype(jnp.float32)
    for l in range(n_layer):
        xln = _ln(x32, ln1s_ref[l], ln1b_ref[l], eps).astype(cdt)
        stream_matmul(xln, qkvw_ref, l, d, qkv_pad, attnb_ref, post=to_cdt, out_ref=qkvbuf)
        qkv = qkvbuf[...]
        q = qkv[:, :d]
        kn = qkv[:, d : 2 * d]
        vn = qkv[:, 2 * d : 3 * d]

        # ship this layer's K/V rows while attention runs (slot l%2; the
        # wait below protects the slot from being overwritten mid-flight)
        slot = l % 2
        if l >= 2 and not debug_skip_kv_dma:
            pltpu.make_async_copy(
                kstage.at[slot], ko_ref.at[l - 2, pl.ds(bi * bb, bb), :], ksem.at[slot]
            ).wait()
            pltpu.make_async_copy(
                vstage.at[slot], vo_ref.at[l - 2, pl.ds(bi * bb, bb), :], vsem.at[slot]
            ).wait()
        kstage[slot] = kn
        vstage[slot] = vn
        if not debug_skip_kv_dma:
            pltpu.make_async_copy(
                kstage.at[slot], ko_ref.at[l, pl.ds(bi * bb, bb), :], ksem.at[slot]
            ).start()
            pltpu.make_async_copy(
                vstage.at[slot], vo_ref.at[l, pl.ds(bi * bb, bb), :], vsem.at[slot]
            ).start()

        # causal intra-image attention: T static shifted passes with an
        # online softmax.  Offset s: row r attends row r−s (same image iff
        # local position ≥ s).
        m = jnp.full((bb, n_head), NEG_INF, jnp.float32)
        l_run = jnp.zeros((bb, n_head), jnp.float32)
        acc = jnp.zeros((bb, d), jnp.float32)
        for s in range(t_group if debug_max_shift is None else debug_max_shift):
            if s == 0:
                ks_, vs_ = kn, vn
            else:
                zs = jnp.zeros((s, d), cdt)
                ks_ = jnp.concatenate([zs, kn[: bb - s]], axis=0)
                vs_ = jnp.concatenate([zs, vn[: bb - s]], axis=0)
            sc = jnp.dot(q * ks_, hs_ref[...], preferred_element_type=jnp.float32) * scale
            valid = rpos >= s
            sc = jnp.where(valid, sc, NEG_INF)
            m_new = jnp.maximum(m, sc)
            p = jnp.where(valid, jnp.exp(sc - m_new), 0.0)
            alpha = jnp.exp(m - m_new)
            l_run = l_run * alpha + p
            pe = (
                jnp.dot(p.astype(cdt), he_ref[...].astype(cdt),
                        preferred_element_type=jnp.float32)
                .astype(cdt)
            )
            alpha_e = jnp.dot(alpha, he_ref[...], preferred_element_type=jnp.float32)
            acc = acc * alpha_e + (pe * vs_).astype(jnp.float32)
            m = m_new
        l_e = jnp.dot(l_run, he_ref[...], preferred_element_type=jnp.float32)
        a = acc / l_e

        x32 = x32 + stream_matmul(
            a.astype(cdt), projw_ref, l, d, proj_pad, projb_ref
        )[:, :d]
        xln2 = _ln(x32, ln2s_ref[l], ln2b_ref[l], eps).astype(cdt)
        h = stream_matmul(xln2, fcw_ref, l, d, f_pad, fcb_ref, post=gelu_cdt)[:, :f]
        x32 = x32 + stream_matmul(h, cprojw_ref, l, f, cproj_pad, cprojb_ref)[:, :d]

    # drain the trailing K/V writes
    for l in (n_layer - 2, n_layer - 1):
        if l < 0 or debug_skip_kv_dma:
            continue
        slot = l % 2
        pltpu.make_async_copy(
            kstage.at[slot], ko_ref.at[l, pl.ds(bi * bb, bb), :], ksem.at[slot]
        ).wait()
        pltpu.make_async_copy(
            vstage.at[slot], vo_ref.at[l, pl.ds(bi * bb, bb), :], vsem.at[slot]
        ).wait()

    xo_ref[...] = x32.astype(cdt)


def _block_rows(b: int, t: int, target: int = _TARGET_BLOCK_ROWS) -> tuple[int, int]:
    """Pick (images per block, padded batch): block rows = g·t must be
    8-aligned.  Prefer zero batch padding, then rows near ``target`` (each
    grid block re-streams every weight tile, so bigger blocks amortize the
    stream; padded images are pure wasted rows).  g=8 always aligns, so a
    candidate always exists within the search range."""
    best = None
    for g in range(1, max(8, (2 * target) // t) + 1):
        if (g * t) % 8:
            continue
        b_pad = -(-b // g) * g
        key = (b_pad - b, abs(g * t - target))
        if best is None or key < best[:2]:
            best = (*key, g, b_pad)
    return best[2], best[3]


def fused_prefill_enabled(gpt_cfg, policy, use_pallas_decode: bool | None) -> bool:
    """Dispatch gate: **default OFF** — opt in via ``GIC_ENABLE_FUSED_PREFILL=1``.

    The on-chip A/B (scripts/prefill_kernel_ab.py + prefill_kernel_decomp.py,
    docs/PERF_NOTES.md round 3) REJECTED this kernel as a default: 6.5–6.8 ms
    vs the XLA chain's 6.3 ms at b=128/T=15, end-to-end greedy −1.6%, beam
    ±0.1%.  The decomposition shows prefill is *shape-bound*, not
    dispatch-bound — removing all per-op overhead (one pallas_call for the
    whole 12-layer stack) changed nothing, and neither did halving the
    weight re-stream (480- vs 240-row blocks: −0.35 ms) or dropping 14/15
    attention passes (−1.1 ms).  The 1920-row dependent matmul chain runs at
    ~30–40% MXU on either path; only a different *shape* (bigger batch)
    would move it.  Kept as an opt-in for future larger-batch serving."""
    import os

    from gpt2_image_captioning_tpu.ops.decode_step import fused_greedy_enabled

    if os.environ.get("GIC_ENABLE_FUSED_PREFILL") in (None, "", "0"):
        return False
    return fused_greedy_enabled(gpt_cfg, policy, use_pallas_decode)


def fused_prefill(
    packed: dict,
    x: jnp.ndarray,
    *,
    n_head: int,
    eps: float = 1e-5,
    interpret: bool = False,
    target_rows: int = _TARGET_BLOCK_ROWS,
    debug_max_shift: int | None = None,
    debug_skip_kv_dma: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Run the full GPT-2 stack over a fresh prefix in one kernel.

    x: (B, T, D) prefix embeddings in the compute dtype, position embeddings
    already added.  ``packed`` is the bf16 ``pack_decode_weights`` dict (the
    int8 W8A8 pack has no float tiles — callers keep the XLA prefill there).

    Returns ``(x_out (B, T, D) [pre-ln_f residual stream], k_rows, v_rows
    (L, T, B, D))`` — cache rows in the decode layout, logits left to the
    caller (one XLA dot on the last position; cheaper than streaming the
    50k-wide vocab for T positions in-kernel).
    """
    from gpt2_image_captioning_tpu.ops.decode_attention import _head_sum_matrix

    assert "qkvs" not in packed, "fused prefill needs the float weight pack"
    b, t, d = x.shape
    cdt = x.dtype
    n_layer = packed["ln1s"].shape[0]
    f = 4 * d
    tw = packed["qkvw"].shape[3]
    qkv_pad = packed["qkvw"].shape[1] * tw

    g, b_pad = _block_rows(b, t, target_rows)
    xr = x.reshape(b * t, d)
    if b_pad != b:
        xr = jnp.pad(xr, ((0, (b_pad - b) * t), (0, 0)))
    rows = b_pad * t
    bb = g * t
    nb = rows // bb

    hs = _head_sum_matrix(d, n_head, cdt)
    he = _head_sum_matrix(d, n_head, jnp.float32).T

    kernel = functools.partial(
        _prefill_kernel,
        n_layer=n_layer,
        d=d,
        f=f,
        n_head=n_head,
        t_group=t,
        tw=tw,
        eps=eps,
        debug_max_shift=debug_max_shift,
        debug_skip_kv_dma=debug_skip_kv_dma,
    )
    vm = lambda s: pl.BlockSpec(s, lambda bi: (0,) * len(s), memory_space=pltpu.VMEM)  # noqa: E731
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda bi: (bi, 0), memory_space=pltpu.VMEM),
            vm(packed["ln1s"].shape),
            vm(packed["ln1b"].shape),
            vm(packed["ln2s"].shape),
            vm(packed["ln2b"].shape),
            vm(packed["attnb"].shape),
            vm(packed["projb"].shape),
            vm(packed["fcb"].shape),
            vm(packed["cprojb"].shape),
            vm(hs.shape),
            vm(he.shape),
            pl.BlockSpec(memory_space=pl.ANY),  # qkvw
            pl.BlockSpec(memory_space=pl.ANY),  # projw
            pl.BlockSpec(memory_space=pl.ANY),  # fcw
            pl.BlockSpec(memory_space=pl.ANY),  # cprojw
        ],
        out_specs=(
            pl.BlockSpec((bb, d), lambda bi: (bi, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((bb, qkv_pad), cdt),
            pltpu.VMEM((2, d, tw), cdt),
            pltpu.VMEM((2, bb, d), cdt),
            pltpu.VMEM((2, bb, d), cdt),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    xo, ko, vo = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((rows, d), cdt),
            jax.ShapeDtypeStruct((n_layer, rows, d), cdt),
            jax.ShapeDtypeStruct((n_layer, rows, d), cdt),
        ),
        interpret=interpret,
    )(
        xr,
        packed["ln1s"], packed["ln1b"], packed["ln2s"], packed["ln2b"],
        packed["attnb"], packed["projb"], packed["fcb"], packed["cprojb"],
        hs, he,
        packed["qkvw"], packed["projw"], packed["fcw"], packed["cprojw"],
    )
    x_out = xo[: b * t].reshape(b, t, d)
    k_rows = ko.reshape(n_layer, b_pad, t, d)[:, :b].transpose(0, 2, 1, 3)
    v_rows = vo.reshape(n_layer, b_pad, t, d)[:, :b].transpose(0, 2, 1, 3)
    return x_out, k_rows, v_rows


def prefill_into_cache(
    packed: dict,
    gpt_params: dict,
    gpt_cfg,
    prefix: jnp.ndarray,
    cache: dict,
    policy,
    *,
    interpret: bool = False,
    target_rows: int = _TARGET_BLOCK_ROWS,
) -> tuple[jnp.ndarray, dict]:
    """Drop-in for ``gpt2.forward_cached(..., fresh_prefill=True)`` on the
    fused path: adds position embeddings, runs the kernel, writes the cache
    rows, and computes the last-position logits with one XLA dot."""
    b, t, d = prefix.shape
    pos = gpt_params["wpe"][:t].astype(jnp.float32)
    x0 = (prefix.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)
    x_out, k_rows, v_rows = fused_prefill(
        packed, x0, n_head=gpt_cfg.n_head, eps=gpt_cfg.layer_norm_epsilon,
        interpret=interpret, target_rows=target_rows,
    )
    new_k = jax.lax.dynamic_update_slice(
        cache["k"], k_rows.astype(cache["k"].dtype), (0, 0, 0, 0)
    )
    new_v = jax.lax.dynamic_update_slice(
        cache["v"], v_rows.astype(cache["v"].dtype), (0, 0, 0, 0)
    )
    from gpt2_image_captioning_tpu.ops import nn

    xl = nn.layer_norm(
        {"scale": gpt_params["ln_f"]["scale"], "bias": gpt_params["ln_f"]["bias"]},
        x_out[:, -1:, :].astype(jnp.float32),
        gpt_cfg.layer_norm_epsilon,
    )
    logits = jnp.dot(
        policy.cast(xl[:, 0, :]),
        gpt_params["wte"].T.astype(policy.compute_dtype),
        preferred_element_type=jnp.float32,
    )
    return logits, {"k": new_k, "v": new_v, "index": cache["index"] + t}
