"""The fused GPT-2 decode STEP as one Pallas TPU kernel.

Modes: greedy (in-kernel streamed argmax — the default serving path),
``emit_logits`` (full logits streamed to HBM for top-p sampling / beam
search), ``sample`` (in-kernel temperature/top-p token draw by speculative-
accept nucleus sampling — per-row params, hardware PRNG, the logits never
leave the chip), beam ``topk``/ancestry modes, int8 W8A8 weights
(``pack_decode_weights(quant=True)``), optional int8 KV cache, and
128/256-row batch blocks (wide blocks need the narrow tw=384 weight packing
for VMEM).  Measured trade-offs in docs/PERF_NOTES.md.

Round-2 on-chip measurements (docs/PERF_NOTES.md) showed each ``pallas_call``
carries ~100 µs fixed overhead on this backend, so per-op kernels can never
beat XLA on a 2.5 ms decode step — but ONE kernel per step amortizes that
overhead across the whole transformer.  This kernel runs the entire
single-token decode — for every layer: LayerNorm → QKV matmul → KV-cache
append → valid-prefix cached attention → output projection → LayerNorm →
MLP (gelu) — then the final LayerNorm, the tied-embedding logits matmul and
the greedy argmax, without materializing logits in HBM.  It replaces the
reference's per-token full re-forward + host top-p loop
(``/root/reference/src/models.py:389-469``) at speed-of-light ambitions:
per-step HBM traffic ≈ weights (streamed once) + the VALID prefix of the KV
cache + nothing else.

TPU mapping:

- **Weights stream through VMEM**: every weight matrix is pre-tiled to
  (L, n_tiles, d_in, TW) contiguous column tiles; a double-buffered DMA walk
  overlaps each tile's fetch with the previous tile's MXU matmul.  VMEM holds
  ~2 tiles (≤ 3 MB), never a whole layer.
- **KV cache (L, T, B, D) stays in HBM**; per layer the kernel walks only
  ``ceil(idx/CT)`` chunks with double-buffered DMA and an online softmax
  (same scheme as ops/decode_attention.py, which remains the unit-testable
  building block).  The new token's K/V are written back by DMA into row
  ``idx`` (caches are input/output-aliased — updated in place).
- **Per-head math without sub-lane reshapes** via the block-diagonal
  head-sum matmul trick (see ops/decode_attention.py docstring).
- **Greedy argmax fused into the logits stream**: the (V, D) tied embedding
  is walked in (D, VW) tiles with a running (max, argmax) per row — the
  (B, 50257) logits tensor never exists.  First-occurrence tie-breaking
  matches ``jnp.argmax``.

Numerics: bf16 matmul inputs with float32 accumulation (MXU-native), f32
LayerNorm/softmax statistics — the same recipe as the XLA path; interpret-
mode tests compare against ``gpt2.forward_cached`` + argmax exactly.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(jnp.finfo(jnp.float32).min)

# Buffer sizing: v5e scoped VMEM is 16 MB and XLA places the kernel's outputs
# there too, so the double-buffered KV chunks + weight tiles must stay ~12 MB.
# CHUNK_T must be a multiple of 8 (the cache's sublane tiling).
CHUNK_T = 8  # cache rows per attention DMA chunk
TILE_W = 768  # weight-matrix column tile (all GPT-2 dims divide by 768 — no pad)
VOCAB_W = 512  # logits tile width
BLOCK_B = 128  # batch rows per program


def _ln(x32: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float) -> jnp.ndarray:
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * scale[None, :] + bias[None, :]


def _gelu_new(x32: jnp.ndarray) -> jnp.ndarray:
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x32 * (1.0 + jnp.tanh(c * (x32 + 0.044715 * x32 * x32 * x32)))


def _beam_gather(x3: jnp.ndarray, delta: jnp.ndarray, k: int) -> jnp.ndarray:
    """``out[t, r] = x3[t, r + delta[t, r]]`` for ``delta ∈ (-k, k)``.

    The beam-ancestry row indirection: beams mix only inside their image's
    ``k``-aligned row group, so the gather is a group-local permutation.
    Mosaic has no dynamic row gather — build it as ``2k-1`` statically
    shifted copies of the (CT, BB, D) chunk selected by per-``(t, r)``
    masks.  Pure VPU work (~2k passes over the chunk).  NON-DEFAULT: the
    on-chip A/B (scripts/beam_gather_ab.py, docs/PERF_NOTES.md) measured
    the one-hot MXU permutation matmul 1.65× faster for the whole beam
    step (3.54 vs 5.84 ms at 512 rows) — the weight stream is HBM-bound,
    so the MXU slots the one-hot variant uses were idle, while these VPU
    relayout passes were the serial bottleneck.  Kept as the
    ``GIC_BEAM_GATHER=shift`` fallback and interpret-mode cross-check.
    """
    bb = x3.shape[1]
    out = None
    for s in range(-(k - 1), k):
        # minor-dim insertion only lowers for 32-bit types: build the mask in
        # f32, expand, then cast to the chunk dtype
        mask = (delta == s).astype(jnp.float32)[:, :, None].astype(x3.dtype)
        if s == 0:
            shifted = x3
        else:
            sh = s % bb
            shifted = jnp.concatenate([x3[:, sh:], x3[:, :sh]], axis=1)
        term = shifted * mask
        out = term if out is None else out + term
    return out


def _step_kernel(
    # scalar prefetch: [idx, c0, seed, blk_c0[0..nb)] — c0 = first attention
    # chunk with any live row pool-wide; blk_c0[bi] = the same bound PER
    # BATCH BLOCK (continuous batching skips chunks older than every
    # block-row's start — with age-affine admission, blocks of similar-age
    # rows walk ~their own window instead of the pool-wide one, and
    # all-dead blocks skip the cache walk entirely); seed feeds the
    # hardware PRNG (sample mode only, else 0)
    idx_ref,
    # VMEM inputs
    x_ref,          # (BB, D) compute dtype — wte[token] + wpe[local position]
    start_ref,      # (1, BB) int32 — per-row first valid cache position
                    # (all-zeros outside continuous serving)
    ln1s_ref, ln1b_ref, ln2s_ref, ln2b_ref,          # (L, D) f32
    attnb_ref, projb_ref, fcb_ref, cprojb_ref,       # (L, nc, 1, TW) f32 tiles
    *rest,
    # rest (order fixed by fused_decode_step's in_specs):
    #   [qkvs, projs, fcs, cprojs, wtes]  — (quant mode only) per-output-
    #       column dequant scales, tiled like the biases / (NT_v, 1, VW)
    #   [temp, topp] — (sample mode only) (BB, 1) f32 per-row temperature
    #       and nucleus mass; outputs then [tok, round, lse] (BB, 1) each,
    #       with 3·cand_k small VMEM scratch bufs after the semaphores
    #   [origin] — (beam mode only) (Tpad/CT, CT, B) int32 ancestry map:
    #       attention over position c*CT+t for decode row r reads cache row
    #       origin[c, t, r].  Chunk-major 3D so the per-chunk DMA slices
    #       only the untiled leading dim (a (ct<8, bb) 2D slice violates
    #       the (8, 128) HBM tiling — Mosaic rejects it even in HBM)
    #   lnf (2, D) f32; hs (D, H) cdt; he (H, D) f32
    #   HBM weights (pre-tiled): qkvw (L, NT_qkv, D, TW), projw, fcw,
    #       cprojw (tiles int8 in quant mode), wtet (NT_v, D, VW)
    #   kc_in, vc_in — (L, Tpad, B, D) caches, aliased to the outputs
    #   [ks_in, vs_in] — (cache_quant only) (L, Tpad/CT, CT, B) f32 KV
    #       scales, chunk-major like origin (same tiled-slice rules)
    #   outputs: tok (BB, 1) int32 — or (NT_v, BP, VW) f32 when emit_logits —
    #       or [vals (BB, K) f32, idxs (BB, K) i32, lse (BB, 1) f32] when
    #       topk > 0; then kc, vc aliased caches (row idx written in place);
    #       then (cache_quant only) nsk, nsv (L, BB) f32 new-row scales
    #       (folded into the scale arrays by the wrapper's XLA DUS)
    #   scratch: wbuf (2, D, TW) int8|cdt; vwbuf (2, D, VW) int8|cdt;
    #       kbuf, vbuf (2, CT, BB, D) cache dtype; knbuf, vnbuf (BB, D);
    #       lbuf (2, BB, VW) f32; 6 DMA semaphore pairs
    n_layer: int,
    d: int,
    f: int,
    n_head: int,
    ct: int,
    tw: int,
    vw: int,
    vocab: int,
    eps: float,
    emit_logits: bool,
    quant: bool,
    cache_quant: bool,
    beam_k: int,
    beam_gather: str,
    gather_start: int,
    topk: int,
    sample: bool,
    cand_k: int,
    rounds: int,
):
    it = iter(rest)
    qkvs_ref = projs_ref = fcs_ref = cprojs_ref = wtes_ref = None
    if quant:
        qkvs_ref, projs_ref, fcs_ref, cprojs_ref, wtes_ref = (
            next(it), next(it), next(it), next(it), next(it)
        )
    temp_ref = topp_ref = None
    if sample:
        temp_ref, topp_ref = next(it), next(it)
    origin_ref = next(it) if beam_k else None
    lnf_ref, hs_ref, he_ref = next(it), next(it), next(it)
    qkvw_ref, projw_ref, fcw_ref, cprojw_ref, wtet_ref = (
        next(it), next(it), next(it), next(it), next(it)
    )
    kc_in, vc_in = next(it), next(it)
    ks_in = vs_in = None
    if cache_quant:
        ks_in, vs_in = next(it), next(it)
    rnd_ref = None
    if topk:
        tok_ref, tki_ref, lse_ref = next(it), next(it), next(it)
    elif sample:
        tok_ref, rnd_ref, lse_ref = next(it), next(it), next(it)
        tki_ref = None
    else:
        tok_ref, tki_ref, lse_ref = next(it), None, None
    kc_ref, vc_ref = next(it), next(it)
    nsk_ref = nsv_ref = None
    if cache_quant:
        nsk_ref, nsv_ref = next(it), next(it)  # (L, BB) new-row scale outs
    wbuf, vwbuf, kbuf, vbuf, knbuf, vnbuf, lbuf = (
        next(it), next(it), next(it), next(it), next(it), next(it), next(it)
    )
    wsem, vwsem, ksem, vsem, wrsem, lsem = (
        next(it), next(it), next(it), next(it), next(it), next(it)
    )
    massb = fcolb = flogb = None
    if sample:
        massb = [next(it) for _ in range(cand_k)]
        fcolb = [next(it) for _ in range(cand_k)]
        flogb = [next(it) for _ in range(cand_k)]
    obuf = osem = None
    if beam_k:
        obuf, osem = next(it), next(it)
    ksbuf = vsbuf = kssem = vssem = None
    if cache_quant:
        ksbuf, vsbuf, kssem, vssem = (
            next(it), next(it), next(it), next(it)
        )

    bi = pl.program_id(0)
    bb = x_ref.shape[0]
    idx = idx_ref[0]
    # per-block chunk skip: blk_c0[bi] >= the pool-wide c0 (idx_ref[1]) by
    # construction in the wrapper, and chunks below a block's min(start) are
    # fully masked for every row of the block — skipping them is exact
    c0 = idx_ref[3 + bi]
    nchunks = (idx + ct - 1) // ct
    scale = 1.0 / math.sqrt(d // n_head)
    cdt = x_ref.dtype

    def rowquant(x_in):
        """Per-row symmetric int8 quantization (W8A8 activation side)."""
        xf = x_in.astype(jnp.float32)
        sx = jnp.maximum(
            jnp.max(jnp.abs(xf), axis=1, keepdims=True) * (1.0 / 127.0), 1e-12
        )
        return jnp.round(xf / sx).astype(jnp.int8), sx

    def stream_matmul(x_in, w_hbm, l, d_in, out_w, bias_ref, post=None, scale_ref=None):
        """x_in (BB, d_in) cdt @ w[l] + bias → (BB, out_w).

        Weights arrive pre-tiled (L, nc·nr, D, TW), column-major over (c, r)
        row/column blocks: the wbuf staging buffer holds one (D, TW) tile, so
        even the (4D, D) MLP down-projection streams through a D-row buffer
        (row blocks accumulate into the same column tile).

        ``post`` (e.g. gelu+cast) is applied per COLUMN TILE so wide f32
        results never sit on the VMEM stack at full width.  ``bias_ref`` is
        pre-tiled (L, nc, 1, TW) — offset slices of a bias row do not lower.

        In quant mode the tiles are int8: the input row is quantized once per
        call (per-row scale sx), int8×int8 MXU dots accumulate in int32
        across row blocks, and the column tile is dequantized as
        ``acc·sx·scale_ref[l, c] + bias`` before ``post``.
        """
        nr = d_in // d
        nc = out_w // tw
        nt = nr * nc
        if quant:
            xq, sx = rowquant(x_in)

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
                if quant:
                    xr = xq if nr == 1 else xq[:, r * d : (r + 1) * d]
                    part = jnp.dot(xr, wbuf[t % 2], preferred_element_type=jnp.int32)
                else:
                    xr = x_in if nr == 1 else x_in[:, r * d : (r + 1) * d]
                    part = jnp.dot(xr, wbuf[t % 2], preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
                t += 1
            if quant:
                acc = acc.astype(jnp.float32) * sx * scale_ref[l, c] + bias_ref[l, c]
            else:
                acc = acc + bias_ref[l, c]
            outs.append(post(acc) if post else acc)
        return outs[0] if nc == 1 else jnp.concatenate(outs, axis=-1)

    def attention(q, kn, vn, l):
        """Valid-prefix cached attention for layer l; writes the new K/V row
        into the cache in place.  q/kn/vn (BB, D) cdt → (BB, D) f32.

        With an int8 cache (cache_quant) rows carry a per-(position, batch)
        scale in the (L, Tpad, B) side arrays: the new row is quantized
        before its write, chunk reads DMA the matching scale chunk and fold
        the dequant multiply into the elementwise products the math already
        does.  The epilogue uses the exact (pre-quantization) kn/vn.

        The new row's SCALES are not DMA'd into the side arrays here: a
        size-1 sublane (T) slice of the tiled (L, Tpad, B) memref is only
        legal with a full lane window, so any multi-row-block batch
        (b > 128, partial ``pl.ds(bi*bb, bb)`` lane stripe) trips Mosaic's
        "slice shape along dimension 1 must be aligned to tiling (8)" —
        in either memory space.  Instead they land in the small (L, BB)
        VMEM outputs ``nsk_ref``/``nsv_ref`` and the wrapper folds them
        into the arrays with one alignment-free XLA dynamic_update_slice
        per step (also deletes two DMAs per layer)."""
        if cache_quant:
            knf = kn.astype(jnp.float32)
            vnf = vn.astype(jnp.float32)
            kns = jnp.maximum(
                jnp.max(jnp.abs(knf), axis=1) * (1.0 / 127.0), 1e-12
            )
            vns = jnp.maximum(
                jnp.max(jnp.abs(vnf), axis=1) * (1.0 / 127.0), 1e-12
            )
            knbuf[...] = jnp.round(knf / kns[:, None]).astype(jnp.int8)
            vnbuf[...] = jnp.round(vnf / vns[:, None]).astype(jnp.int8)
            nsk_ref[l, :] = kns
            nsv_ref[l, :] = vns
        else:
            knbuf[...] = kn.astype(knbuf.dtype)
            vnbuf[...] = vn.astype(vnbuf.dtype)
        kw_dma = pltpu.make_async_copy(
            knbuf, kc_ref.at[l, idx, pl.ds(bi * bb, bb), :], wrsem.at[0]
        )
        vw_out_dma = pltpu.make_async_copy(
            vnbuf, vc_ref.at[l, idx, pl.ds(bi * bb, bb), :], wrsem.at[1]
        )
        kw_dma.start()
        vw_out_dma.start()

        def k_dma(slot, c):
            return pltpu.make_async_copy(
                kc_ref.at[l, pl.ds(c * ct, ct), pl.ds(bi * bb, bb), :],
                kbuf.at[slot],
                ksem.at[slot],
            )

        def v_dma(slot, c):
            return pltpu.make_async_copy(
                vc_ref.at[l, pl.ds(c * ct, ct), pl.ds(bi * bb, bb), :],
                vbuf.at[slot],
                vsem.at[slot],
            )

        def ks_dma(slot, c):
            # reads come from the INPUT scale arrays, chunk-major 4D
            # (L, T/ct, ct, B) like the beam origin map, so each chunk is a
            # full-extent sublane plane (a (ct, bb) slice of a (L, Tpad, B)
            # layout would need ct % 8 == 0 — illegal at the 256-row
            # config's ct=4).  The walk only covers rows < idx, whose
            # scales predate this step; the new row's scale goes out via
            # nsk_ref/nsv_ref — see the docstring above.
            return pltpu.make_async_copy(
                ks_in.at[l, c, :, pl.ds(bi * bb, bb)],
                ksbuf.at[slot],
                kssem.at[slot],
            )

        def vs_dma(slot, c):
            return pltpu.make_async_copy(
                vs_in.at[l, c, :, pl.ds(bi * bb, bb)],
                vsbuf.at[slot],
                vssem.at[slot],
            )

        def o_dma(slot, c):
            return pltpu.make_async_copy(
                origin_ref.at[c, :, pl.ds(bi * bb, bb)],
                obuf.at[slot],
                osem.at[slot],
            )

        def chunk_dmas(slot, c):
            dmas = [k_dma(slot, c), v_dma(slot, c)]
            if cache_quant:
                dmas += [ks_dma(slot, c), vs_dma(slot, c)]
            if beam_k:
                dmas.append(o_dma(slot, c))
            return dmas

        @pl.when(nchunks > c0)
        def _():
            for dma in chunk_dmas(jax.lax.rem(c0, 2), c0):
                dma.start()

        def make_body(do_gather):
            def body(c, carry):
                m, l_run, acc = carry
                slot = jax.lax.rem(c, 2)
                nxt = jax.lax.rem(c + 1, 2)

                @pl.when(c + 1 < nchunks)
                def _():
                    for dma in chunk_dmas(nxt, c + 1):
                        dma.start()

                for dma in chunk_dmas(slot, c):
                    dma.wait()
                if cache_quant:
                    # dequant folded into the products; minor-dim insertion
                    # must happen on the f32 scales (Mosaic only supports it
                    # for 32-bit types), cast after
                    k = kbuf[slot].astype(cdt) * ksbuf[slot][:, :, None].astype(cdt)
                    v = vbuf[slot].astype(cdt) * vsbuf[slot][:, :, None].astype(cdt)
                else:
                    k = kbuf[slot]  # (CT, BB, D)
                    v = vbuf[slot]
                if beam_k and do_gather:
                    # ancestry indirection: row r attends to cache row
                    # origin[t, r] for position t (no host-side cache gather).
                    # The (ct, bb) int32 chunk rides the same double-buffered
                    # DMA walk as k/v (dynamic slicing of register arrays or
                    # VMEM refs does not lower in Mosaic — DMA does)
                    orig_c = obuf[slot]
                    if beam_gather == "onehot":
                        # DEFAULT (on-chip A/B: 3.54 vs 5.84 ms/step at 512
                        # rows): out[t] = P[t] @ x[t] with P the (bb, bb)
                        # one-hot of the local source rows.  Exact (one
                        # nonzero per row) and rides the MXU, which the
                        # HBM-bound weight stream leaves partly idle — vs
                        # 2·(2k−1) VPU relayout passes for the shifted-select
                        # gather.
                        j_loc = orig_c - bi * bb  # (ct, bb) local source row
                        r2 = jax.lax.broadcasted_iota(jnp.int32, (ct, bb, bb), 2)
                        oh = (j_loc[:, :, None] == r2).astype(jnp.float32).astype(cdt)

                        def _apply(x3):
                            rows = [
                                jnp.dot(
                                    oh[t], x3[t], preferred_element_type=jnp.float32
                                ).astype(x3.dtype)[None]
                                for t in range(ct)
                            ]
                            return rows[0] if ct == 1 else jnp.concatenate(rows, axis=0)

                        k = _apply(k)
                        v = _apply(v)
                    else:
                        r_loc = jax.lax.broadcasted_iota(jnp.int32, (ct, bb), 1)
                        delta = orig_c - (bi * bb + r_loc)
                        if beam_gather == "fused_shift":
                            # one 7-shift pass over the lane-concatenated
                            # [k|v] chunk: same bytes as two passes, half the
                            # relayout op dispatches
                            kv = _beam_gather(
                                jnp.concatenate([k, v], axis=2), delta, beam_k
                            )
                            k, v = kv[:, :, :d], kv[:, :, d:]
                        else:
                            k = _beam_gather(k, delta, beam_k)
                            v = _beam_gather(v, delta, beam_k)
                prod = k * q[None, :, :]
                s = jnp.dot(
                    prod.reshape(ct * bb, d), hs_ref[...], preferred_element_type=jnp.float32
                ).reshape(ct, bb, n_head) * scale
                kpos = c * ct + jax.lax.broadcasted_iota(jnp.int32, (ct, bb, n_head), 0)
                # per-row validity window [start_r, idx): rows admitted
                # mid-window (continuous batching) only attend to their own
                # prefix+tokens
                live = (kpos < idx) & (kpos >= start_ref[...][:, :, None])
                s = jnp.where(live, s, NEG_INF)
                m_new = jnp.maximum(m, jnp.max(s, axis=0))
                p = jnp.where(live, jnp.exp(s - m_new[None, :, :]), 0.0)
                alpha = jnp.exp(m - m_new)
                l_new = l_run * alpha + jnp.sum(p, axis=0)
                # expand probs per head (Mosaic matmuls accumulate in f32;
                # cast down immediately so the big (CT·BB, D) temp lives in
                # cdt)
                pe = jnp.dot(
                    p.reshape(ct * bb, n_head).astype(cdt),
                    he_ref[...].astype(cdt),
                    preferred_element_type=jnp.float32,
                ).astype(cdt).reshape(ct, bb, d)
                av = jnp.sum(pe * v, axis=0, dtype=jnp.float32)
                alpha_e = jnp.dot(alpha, he_ref[...], preferred_element_type=jnp.float32)
                return m_new, l_new, acc * alpha_e + av

            return body

        m0 = jnp.full((bb, n_head), NEG_INF, jnp.float32)
        l0 = jnp.zeros((bb, n_head), jnp.float32)
        acc0 = jnp.zeros((bb, d), jnp.float32)
        c_skip = (gather_start // ct) if beam_k else 0
        if beam_k and c_skip > 0:
            # positions < gather_start are ancestry-identical across each
            # beam group (the shared image prefix — all beams descend from
            # one prefill), so the gather there is a numeric no-op: walk
            # those chunks with the plain body and only gather from the
            # first chunk touching positions >= gather_start.  Saves the
            # whole gather cost on prefix chunks (~p_len/idx of the beam
            # premium; the origin DMA still rides along — 1 KB/chunk).
            mid = jnp.minimum(jnp.maximum(c0, c_skip), nchunks)
            carry = jax.lax.fori_loop(c0, mid, make_body(False), (m0, l0, acc0))
            m, l_run, acc = jax.lax.fori_loop(mid, nchunks, make_body(True), carry)
        else:
            m, l_run, acc = jax.lax.fori_loop(
                c0, nchunks, make_body(bool(beam_k)), (m0, l0, acc0)
            )

        # epilogue: the new token, straight from VMEM
        s_new = jnp.dot(q * kn, hs_ref[...], preferred_element_type=jnp.float32) * scale
        m_f = jnp.maximum(m, s_new)
        p_new = jnp.exp(s_new - m_f)
        alpha = jnp.exp(m - m_f)
        l_f = l_run * alpha + p_new
        alpha_e = jnp.dot(alpha, he_ref[...], preferred_element_type=jnp.float32)
        pn_e = jnp.dot(p_new, he_ref[...], preferred_element_type=jnp.float32)
        acc = acc * alpha_e + pn_e * vn.astype(jnp.float32)
        l_e = jnp.dot(l_f, he_ref[...], preferred_element_type=jnp.float32)
        kw_dma.wait()
        vw_out_dma.wait()
        return acc / l_e

    # output widths are tile-padded; biases arrive pre-padded, results sliced.
    # tile counts are nc·nr with nr = d_in/D (1 everywhere except cproj).
    qkv_w_pad = qkvw_ref.shape[1] * tw
    proj_pad = projw_ref.shape[1] * tw
    f_pad = fcw_ref.shape[1] * tw
    cproj_pad = cprojw_ref.shape[1] // (f // d) * tw

    to_cdt = lambda t: t.astype(cdt)  # noqa: E731
    gelu_cdt = lambda t: _gelu_new(t).astype(cdt)  # noqa: E731

    x32 = x_ref[...].astype(jnp.float32)  # residual stream, f32
    for l in range(n_layer):
        xln = _ln(x32, ln1s_ref[l], ln1b_ref[l], eps).astype(cdt)
        qkv = stream_matmul(
            xln, qkvw_ref, l, d, qkv_w_pad, attnb_ref, post=to_cdt,
            scale_ref=qkvs_ref,
        )
        q = qkv[:, :d]
        kn = qkv[:, d : 2 * d]
        vn = qkv[:, 2 * d : 3 * d]
        a = attention(q, kn, vn, l)
        x32 = x32 + stream_matmul(
            a.astype(cdt), projw_ref, l, d, proj_pad, projb_ref,
            scale_ref=projs_ref,
        )[:, :d]
        xln2 = _ln(x32, ln2s_ref[l], ln2b_ref[l], eps).astype(cdt)
        h = stream_matmul(
            xln2, fcw_ref, l, d, f_pad, fcb_ref, post=gelu_cdt, scale_ref=fcs_ref
        )[:, :f]
        x32 = x32 + stream_matmul(
            h, cprojw_ref, l, f, cproj_pad, cprojb_ref, scale_ref=cprojs_ref
        )[:, :d]

    # final LN + tied-embedding logits + running argmax, streamed over vocab
    xf = _ln(x32, lnf_ref[0], lnf_ref[1], eps).astype(cdt)
    nv = wtet_ref.shape[0]
    if quant:
        xfq, sxf = rowquant(xf)

    def vtile(slot, t):
        """Logits for vocab tile t from the staged weight tile."""
        if quant:
            acc = jnp.dot(xfq, vwbuf[slot], preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * sxf * wtes_ref[t]
        return jnp.dot(xf, vwbuf[slot], preferred_element_type=jnp.float32)

    def vdma(slot, t):
        return pltpu.make_async_copy(wtet_ref.at[t], vwbuf.at[slot], vwsem.at[slot])

    vdma(0, 0).start()
    if topk:
        # In-kernel per-row top-k + streaming logsumexp over the vocab walk:
        # beam search needs only each row's k best (logit, token) pairs and
        # the row's logsumexp — emitting those instead of full logits saves
        # the (B·K, V) HBM round-trip (~0.1 GB/step at 512 rows).  Selection
        # semantics match ops/sampling.topk_small / lax.top_k exactly:
        # descending values, ties broken toward the lowest vocab index,
        # distinct indices (running entries always come from earlier tiles,
        # so the min-index tie-break prefers them correctly).
        run_v = jnp.full((bb, topk), -jnp.inf, jnp.float32)
        run_i = jnp.zeros((bb, topk), jnp.int32)
        m = jnp.full((bb, 1), NEG_INF, jnp.float32)
        ssum = jnp.zeros((bb, 1), jnp.float32)
        big = jnp.int32(2**30)
        for t in range(nv):
            if t + 1 < nv:
                vdma((t + 1) % 2, t + 1).start()
            vdma(t % 2, t).wait()
            logits = vtile(t % 2, t)
            col = t * vw + jax.lax.broadcasted_iota(jnp.int32, (bb, vw), 1)
            logits = jnp.where(col < vocab, logits, NEG_INF)
            tm = jnp.max(logits, axis=1, keepdims=True)
            m_new = jnp.maximum(m, tm)
            ssum = ssum * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(logits - m_new), axis=1, keepdims=True
            )
            m = m_new
            lg, rv, ri = logits, run_v, run_i
            new_v, new_i = [], []
            for _ in range(topk):
                mx = jnp.maximum(
                    jnp.max(rv, axis=1, keepdims=True),
                    jnp.max(lg, axis=1, keepdims=True),
                )
                ric = jnp.min(jnp.where(rv == mx, ri, big), axis=1, keepdims=True)
                tic = jnp.min(jnp.where(lg == mx, col, big), axis=1, keepdims=True)
                sel = jnp.minimum(ric, tic)
                new_v.append(mx)
                new_i.append(sel)
                # mask with -inf (strictly below any live candidate), not
                # NEG_INF — same distinct-index guarantee as topk_small
                rv = jnp.where(ri == sel, -jnp.inf, rv)
                lg = jnp.where(col == sel, -jnp.inf, lg)
            run_v = jnp.concatenate(new_v, axis=1)
            run_i = jnp.concatenate(new_i, axis=1)
        tok_ref[...] = run_v
        tki_ref[...] = run_i
        lse_ref[...] = m + jnp.log(ssum)
    elif emit_logits:
        # stream full logits tiles to HBM: compute tile t into the staging
        # buffer, DMA it out to tok_ref[t, bi·bb : bi·bb+bb, :] (contiguous in
        # the (NT_v, BP, VW) tile layout), double-buffered so tile t+1's
        # matmul overlaps tile t's write.  Padded vocab columns carry NEG_INF
        # so downstream softmax/top-p ignores them.
        out_dmas = [None, None]
        for t in range(nv):
            if t + 1 < nv:
                vdma((t + 1) % 2, t + 1).start()
            vdma(t % 2, t).wait()
            slot = t % 2
            if out_dmas[slot] is not None:
                out_dmas[slot].wait()
            logits = vtile(slot, t)
            col = t * vw + jax.lax.broadcasted_iota(jnp.int32, (bb, vw), 1)
            lbuf[slot, :, :] = jnp.where(col < vocab, logits, NEG_INF)
            out_dmas[slot] = pltpu.make_async_copy(
                lbuf.at[slot], tok_ref.at[t, pl.ds(bi * bb, bb), :], lsem.at[slot]
            )
            out_dmas[slot].start()
        for dma in out_dmas:
            if dma is not None:
                dma.wait()
    elif sample:
        # In-kernel nucleus (top-p) sampling by SPECULATIVE ACCEPT instead of
        # a threshold search: the vocab walk draws ``cand_k`` independent
        # Gumbel-max candidates from the full temperature-scaled softmax (the
        # per-element noise rides the walk the logits matmul already does)
        # while tracking the row max/argmax and an online logsumexp.  Token t
        # is in the nucleus iff the mass STRICTLY above its logit is ≤ top_p
        # (exactly ops/sampling.py's per-token rule — no bisection float-
        # boundary cases), and a candidate drawn from the full softmax,
        # accepted iff it passes that test, is an EXACT draw from the
        # renormalized nucleus (rejection sampling).  Each membership test is
        # one masked sum, so a verification round re-streams only the vocab
        # tiles (the weights are hot in HBM; ~77 MB bf16 ≈ 0.1 ms) and tests
        # all ``cand_k`` candidates at once, drawing fresh candidates for the
        # (rare) unresolved rows.  P(row unresolved per round) ≤ (1−top_p)^k
        # — at the serving default top_p=0.9, k=4 that is 1e-4, so round 2
        # runs on ~1% of steps at b=128.  After ``rounds`` failed rounds a
        # row takes its last candidate unconditionally: a documented residual
        # bias ≤ (1−top_p)^(k·rounds) ≤ 2⁻²⁴ at top_p ≥ 0.5 (callers gate
        # smaller top_p to the XLA tail, where bisection is the right tool).
        # Rows with temperature == 0 take the running argmax of the raw
        # logits (the reference's greedy dispatch), per row — mixed
        # greedy/sampled pools (continuous batching) ride one kernel.
        pltpu.prng_seed(idx_ref[2], bi)
        temp = temp_ref[...]  # (BB, 1) f32 per-row temperature (0 ⇒ greedy)
        topp = topp_ref[...]  # (BB, 1) f32 per-row nucleus mass
        tinv = jnp.where(temp > 0.0, 1.0 / jnp.where(temp > 0.0, temp, 1.0), 1.0)
        ninf = float("-inf")
        big = jnp.int32(2**30)

        def gumbel():
            # 23 uniform bits → (0, 1) → standard Gumbel.  Masking the int32
            # bits keeps everything in natively-supported 32-bit int ops.
            bits = pltpu.prng_random_bits((bb, vw))
            u = (bits & jnp.int32(0x007FFFFF)).astype(jnp.float32) * (
                2.0**-23
            ) + (2.0**-24)
            return -jnp.log(-jnp.log(u))

        def track(cand, lq, col, cv, cc, cl):
            """Running argmax of the perturbed logits ``cand`` with the
            winner's column and UNPERTURBED logit (the membership threshold).
            """
            bm = jnp.max(cand, axis=1, keepdims=True)
            bidx = jnp.min(jnp.where(cand == bm, col, big), axis=1, keepdims=True)
            blog = jnp.sum(jnp.where(col == bidx, lq, 0.0), axis=1, keepdims=True)
            upd = bm > cv
            return (
                jnp.where(upd, bm, cv),
                jnp.where(upd, bidx, cc),
                jnp.where(upd, blog, cl),
            )

        cv = [jnp.full((bb, 1), ninf, jnp.float32) for _ in range(cand_k)]
        cc = [jnp.zeros((bb, 1), jnp.int32) for _ in range(cand_k)]
        cl = [jnp.full((bb, 1), ninf, jnp.float32) for _ in range(cand_k)]
        run_max = jnp.full((bb, 1), ninf, jnp.float32)
        run_idx = jnp.zeros((bb, 1), jnp.int32)
        m = jnp.full((bb, 1), ninf, jnp.float32)
        ssum = jnp.zeros((bb, 1), jnp.float32)
        for t in range(nv):
            if t + 1 < nv:
                vdma((t + 1) % 2, t + 1).start()
            vdma(t % 2, t).wait()
            raw = vtile(t % 2, t)
            col = t * vw + jax.lax.broadcasted_iota(jnp.int32, (bb, vw), 1)
            lq = jnp.where(col < vocab, raw * tinv, ninf)
            bm = jnp.max(lq, axis=1, keepdims=True)
            bidx = jnp.min(jnp.where(lq == bm, col, big), axis=1, keepdims=True)
            upd = bm > run_max
            run_max = jnp.where(upd, bm, run_max)
            run_idx = jnp.where(upd, bidx, run_idx)
            m_new = jnp.maximum(m, bm)
            ssum = ssum * jnp.exp(m - m_new) + jnp.sum(
                jnp.exp(lq - m_new), axis=1, keepdims=True
            )
            m = m_new
            for k in range(cand_k):
                cv[k], cc[k], cl[k] = track(
                    lq + gumbel(), lq, col, cv[k], cc[k], cl[k]
                )
        lse = m + jnp.log(ssum)

        def rdma(slot, t):
            return pltpu.make_async_copy(
                wtet_ref.at[t], vwbuf.at[slot], vwsem.at[slot]
            )

        unres = temp > 0.0  # greedy rows resolve to the raw argmax upfront
        chosen = run_idx
        rnd = jnp.zeros((bb, 1), jnp.int32)
        for r in range(1, rounds + 1):
            cnt = jnp.sum(jnp.where(unres, 1, 0).astype(jnp.int32))

            @pl.when(cnt > 0)
            def _(cl=cl):
                # one vocab re-stream: membership masses for the current
                # candidates + fresh candidates for a possible next round
                def rbody(t, carry):
                    ms, fv, fc, fl = carry
                    slot = jax.lax.rem(t, 2)

                    @pl.when(t + 1 < nv)
                    def _():
                        rdma(jax.lax.rem(t + 1, 2), t + 1).start()

                    rdma(slot, t).wait()
                    raw = vtile(slot, t)
                    col = t * vw + jax.lax.broadcasted_iota(
                        jnp.int32, (bb, vw), 1
                    )
                    lq = jnp.where(col < vocab, raw * tinv, ninf)
                    ex = jnp.exp(lq - lse)
                    ms = tuple(
                        ms[k]
                        + jnp.sum(
                            jnp.where(lq > cl[k], ex, 0.0), axis=1, keepdims=True
                        )
                        for k in range(cand_k)
                    )
                    new = [
                        track(lq + gumbel(), lq, col, fv[k], fc[k], fl[k])
                        for k in range(cand_k)
                    ]
                    return (
                        ms,
                        tuple(n[0] for n in new),
                        tuple(n[1] for n in new),
                        tuple(n[2] for n in new),
                    )

                rdma(0, 0).start()
                init = (
                    tuple(jnp.zeros((bb, 1), jnp.float32) for _ in range(cand_k)),
                    tuple(
                        jnp.full((bb, 1), ninf, jnp.float32) for _ in range(cand_k)
                    ),
                    tuple(jnp.zeros((bb, 1), jnp.int32) for _ in range(cand_k)),
                    tuple(
                        jnp.full((bb, 1), ninf, jnp.float32) for _ in range(cand_k)
                    ),
                )
                ms, _, fc, fl = jax.lax.fori_loop(0, nv, rbody, init)
                for k in range(cand_k):
                    massb[k][...] = ms[k]
                    fcolb[k][...] = fc[k]
                    flogb[k][...] = fl[k]

            # resolve: first accepted candidate wins (candidate order
            # preserves the iid-draw sequence, so accept-first is exact)
            for k in range(cand_k):
                take = unres & (massb[k][...] <= topp)
                chosen = jnp.where(take, cc[k], chosen)
                rnd = jnp.where(take, r, rnd)
                unres = unres & jnp.logical_not(take)
            # stale reads when the round was skipped are harmless: skipped ⇒
            # no row unresolved ⇒ every ``take``/forced path is masked off
            cc = [fcolb[k][...] for k in range(cand_k)]
            cl = [flogb[k][...] for k in range(cand_k)]
        chosen = jnp.where(unres, cc[0], chosen)
        rnd = jnp.where(unres, rounds + 1, rnd)
        tok_ref[...] = chosen
        rnd_ref[...] = rnd
        lse_ref[...] = lse
    else:
        run_max = jnp.full((bb, 1), NEG_INF, jnp.float32)
        run_idx = jnp.zeros((bb, 1), jnp.int32)
        big = jnp.int32(2**30)
        for t in range(nv):
            if t + 1 < nv:
                vdma((t + 1) % 2, t + 1).start()
            vdma(t % 2, t).wait()
            logits = vtile(t % 2, t)
            col = t * vw + jax.lax.broadcasted_iota(jnp.int32, (bb, vw), 1)
            logits = jnp.where(col < vocab, logits, NEG_INF)
            bm = jnp.max(logits, axis=1, keepdims=True)
            bidx = jnp.min(jnp.where(logits == bm, col, big), axis=1, keepdims=True)
            upd = bm > run_max
            run_idx = jnp.where(upd, bidx, run_idx)
            run_max = jnp.where(upd, bm, run_max)
        tok_ref[...] = run_idx


# ---------------------------------------------------------------------------
# Host-side packing + wrapper
# ---------------------------------------------------------------------------

def fused_greedy_enabled(gpt_cfg, policy, use_pallas_decode: bool | None) -> bool:
    """Dispatch for the fused whole-step decode (greedy argmax mode and the
    ``emit_logits`` sampling/beam mode share this gate).

    Default on TPU with bf16 compute (the serving configuration — f32 at the
    full 768-wide model would double every VMEM buffer past budget); tiny
    models (tests) are allowed in any dtype.  ``use_pallas_decode=False``
    opts out; env ``GIC_DISABLE_FUSED_DECODE=1`` disables globally.
    """
    import os

    if os.environ.get("GIC_DISABLE_FUSED_DECODE") not in (None, "", "0"):
        return False
    if use_pallas_decode is False:
        return False
    dtype_ok = policy.compute_dtype == jnp.bfloat16 or gpt_cfg.n_embd <= 256
    # VMEM budgets (weight tiles, KV chunks, logits staging) are tuned for
    # the 768-wide flagship; wider GPT-2 sizes (medium/large/xl) would blow
    # the 16 MB scoped limit deep inside Mosaic — route them to the generic
    # layerwise XLA cached path instead.  Tiny widths (tests) are fine.
    width_ok = gpt_cfg.n_embd <= 256 or gpt_cfg.n_embd == 768
    ok = dtype_ok and width_ok
    if use_pallas_decode is True:
        return ok
    return jax.default_backend() == "tpu" and ok

def _tile_rc(w: jnp.ndarray, row_t: int, tile: int, dtype) -> jnp.ndarray:
    """(L, d_in, out) → (L, nc·nr, row_t, tile) contiguous tiles, ordered
    column-major over (column block c, row block r): t = c·nr + r — the
    stream order of the kernel's accumulating matmul walk."""
    l, d_in, out = w.shape
    assert d_in % row_t == 0, (d_in, row_t)
    nr = d_in // row_t
    pad = (-out) % tile
    if pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad)))
    nc = (out + pad) // tile
    w = w.reshape(l, nr, row_t, nc, tile).transpose(0, 3, 1, 2, 4)
    return w.reshape(l, nc * nr, row_t, tile).astype(dtype)


def _pad_cols(b: jnp.ndarray, tile: int) -> jnp.ndarray:
    pad = (-b.shape[-1]) % tile
    return jnp.pad(b, ((0, 0), (0, pad))) if pad else b


def _tile_bias(b: jnp.ndarray, tile: int) -> jnp.ndarray:
    """(L, out) → (L, nc, 1, tile) so the kernel adds whole bias tiles
    (offset slices of a bias row do not lower in Mosaic)."""
    b = _pad_cols(b.astype(jnp.float32), tile)
    l, out = b.shape
    return b.reshape(l, out // tile, 1, tile)


def _colquant(w: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-column symmetric int8 quantization of (L, d_in, out):
    returns (int8 weights, (L, out) f32 dequant scales)."""
    sw = jnp.maximum(jnp.max(jnp.abs(w), axis=1) * (1.0 / 127.0), 1e-12)
    wq = jnp.round(w / sw[:, None, :]).astype(jnp.int8)
    return wq, sw.astype(jnp.float32)


def pack_decode_weights(params: dict, compute_dtype=jnp.bfloat16, tw: int = TILE_W,
                        vw: int = VOCAB_W, quant: bool = False) -> dict:
    """One-time re-layout of stacked GPT-2 params for the fused step kernel.

    Done inside jit (constant per generate call, amortized over all decode
    steps): weight matrices become contiguous column tiles so every kernel
    DMA is a single dense copy; wte is transposed once for the logits stream.

    ``quant=True`` packs the W8A8 serving mode: every streamed matrix
    (attention/MLP projections AND the tied-embedding logits matrix) is
    stored as int8 with per-output-column symmetric scales — halving the
    dominant HBM traffic term of the weight-bandwidth-bound decode step
    versus bf16.  Activations are quantized per row inside the kernel.
    """
    blocks = params["blocks"]
    v, d = params["wte"].shape
    pad_v = (-v) % vw
    wte_t = params["wte"].astype(jnp.float32).T  # (D, V)
    if quant:
        wq, wscale = _colquant(wte_t[None])  # treat as L=1
        wte_t, wte_scales = wq[0].astype(jnp.float32), wscale[0]
    if pad_v:
        wte_t = jnp.pad(wte_t, ((0, 0), (0, pad_v)))
    nv = (v + pad_v) // vw
    out = {
        "ln1s": blocks["ln_1"]["scale"].astype(jnp.float32),
        "ln1b": blocks["ln_1"]["bias"].astype(jnp.float32),
        "ln2s": blocks["ln_2"]["scale"].astype(jnp.float32),
        "ln2b": blocks["ln_2"]["bias"].astype(jnp.float32),
        "attnb": _tile_bias(blocks["attn"]["c_attn"]["b"], tw),
        "projb": _tile_bias(blocks["attn"]["c_proj"]["b"], tw),
        "fcb": _tile_bias(blocks["mlp"]["c_fc"]["b"], tw),
        "cprojb": _tile_bias(blocks["mlp"]["c_proj"]["b"], tw),
        "lnf": jnp.stack(
            [params["ln_f"]["scale"], params["ln_f"]["bias"]]
        ).astype(jnp.float32),
    }
    mats = {
        "qkvw": blocks["attn"]["c_attn"]["w"],
        "projw": blocks["attn"]["c_proj"]["w"],
        "fcw": blocks["mlp"]["c_fc"]["w"],
        "cprojw": blocks["mlp"]["c_proj"]["w"],
    }
    if quant:
        for name, w in mats.items():
            wq, sw = _colquant(w.astype(jnp.float32))
            out[name] = _tile_rc(wq, d, tw, jnp.int8)
            out[name[:-1] + "s"] = _tile_bias(sw, tw)  # qkvs/projs/fcs/cprojs
        out["wtet"] = (
            wte_t.reshape(d, nv, vw).transpose(1, 0, 2).astype(jnp.int8)
        )
        out["wtes"] = _pad_cols(wte_scales[None], vw)[0].reshape(nv, 1, vw)
    else:
        for name, w in mats.items():
            out[name] = _tile_rc(w, d, tw, compute_dtype)
        out["wtet"] = (
            wte_t.reshape(d, nv, vw).transpose(1, 0, 2).astype(compute_dtype)
        )
    return out


def quantize_cache(
    k: jnp.ndarray, v: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(L, T, B, D) float caches → int8 caches + (L, T, B) f32 per-row scales.

    One-time pass after prefill (the decode loop then appends quantized rows
    in-kernel); all-zero rows (beyond the prefill index) quantize to zeros
    under the epsilon-clamped scale.
    """

    def one(c):
        cf = c.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(cf), axis=-1) * (1.0 / 127.0), 1e-12)
        return jnp.round(cf / s[..., None]).astype(jnp.int8), s

    kq, ks = one(k)
    vq, vs = one(v)
    return kq, vq, ks, vs


def fused_decode_step(
    packed: dict,
    x0: jnp.ndarray,
    k_cache: jnp.ndarray,
    v_cache: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    n_head: int,
    vocab: int,
    eps: float = 1e-5,
    interpret: bool = False,
    emit_logits: bool = False,
    k_scale: jnp.ndarray | None = None,
    v_scale: jnp.ndarray | None = None,
    block_b: int | None = None,
    chunk_t: int | None = None,
    origin: jnp.ndarray | None = None,
    beam_k: int = 0,
    beam_gather: str | None = None,
    gather_start: int = 0,
    topk: int = 0,
    start: jnp.ndarray | None = None,
    sample: dict | None = None,
    sample_k: int = 3,
    sample_rounds: int = 6,
) -> tuple[jnp.ndarray, ...]:
    """One fused decode step.

    x0: (B, D) input embeddings (token embed + position embed) in the compute
    dtype; caches (L, Tpad, B, D) with rows [0, idx) valid.  Returns
    (next_token (B,) int32, k_cache', v_cache') with the new K/V rows written
    at ``idx`` (in place — caches are donated/aliased).

    ``emit_logits=True`` returns ``(logits (B, vocab) f32, k_cache',
    v_cache')`` instead of the greedy token: the in-kernel argmax is replaced
    by a streamed HBM write of the logits tiles (~13 MB at b=128, ~16 µs —
    negligible next to the weight walk), so temperature/top-p sampling and
    beam search can run the same one-kernel-per-step serving path with the
    token selection done outside in XLA.

    int8 KV cache: pass int8 caches plus ``k_scale``/``v_scale``
    (L, Tpad, B) f32 per-row scales (see :func:`quantize_cache`); the return
    tuple then ends with the updated scale arrays.  Halves the cache-read
    traffic — the largest per-step HBM term after the weights.

    Beam mode (``origin`` + ``beam_k=k``): ``origin`` is the (Tpad, B) int32
    ancestry map — attention over position t for decode row r reads cache
    row ``origin[t, r]`` instead of row r, so beam search never gathers or
    rewrites the (L, T, B, D) caches between steps (the round-2 beam
    bottleneck: ~0.6 GB of cache movement per step at 512 rows).  Rows are
    beam-major (image i's beams at rows i·k..i·k+k-1) and ancestors stay
    inside the k-aligned group, which must divide the batch block.
    ``beam_gather`` selects the in-kernel gather implementation:
    ``"onehot"`` (default — MXU permutation matmul, 1.65× the shift
    variant on-chip), ``"shift"`` / ``"fused_shift"`` (VPU shifted
    selects; kept as fallbacks, env override ``GIC_BEAM_GATHER``).  NB the
    env var is read at TRACE time: under a jitted caller it binds when the
    (shape, config) first compiles and is NOT part of the jit cache key, so
    flipping it later in the same process silently reuses the compiled
    executable — set it before the first call (A/B scripts clear jax caches
    when flipping).  All three are exact and interpret-tested equal.  ``gather_start`` (static)
    skips the gather entirely for cache positions below it — callers must
    guarantee those rows are identical across each beam group (true for
    the shared image prefix: every beam descends from one prefill), which
    makes the skip a numeric no-op that saves the gather's MXU/VPU cost
    on prefix chunks.

    ``topk=k`` replaces the greedy argmax with in-kernel per-row top-k +
    streaming logsumexp: returns ``(values (B, k) f32, token_ids (B, k)
    int32, logsumexp (B, 1) f32, k_cache', v_cache')`` — exactly the
    quantities beam search's union-of-per-beam-top-k selection needs,
    without the full-logits HBM round-trip of ``emit_logits``.

    ``start`` ((B,) int32, default zeros): per-row first valid cache
    position — continuous batching (rolling admission) writes an admitted
    request's prefix into cache positions ``[idx-p, idx)`` of a freed row
    and sets that row's start, so every row appends at the same ``idx``
    while attending only to its own window ``[start_r, idx)``.  The chunk
    walk starts at ``min(start) // ct`` (dead history is never read).

    Sample mode (``sample={"temp": (B,) f32, "top_p": (B,) f32, "seed":
    scalar int32}``): in-kernel temperature/top-p sampling by speculative
    accept (see the kernel comment) — returns ``(token (B,) int32,
    resolve_round (B,) int32, logsumexp (B, 1) f32, k_cache', v_cache')``.
    Per-row ``temp == 0`` rows take the raw-logit argmax (the reference's
    greedy dispatch).  Exact nucleus semantics up to a residual bias
    ≤ (1−top_p)^(sample_k·sample_rounds); callers should route top_p < 0.5
    to the XLA tail.  The noise is the TPU hardware PRNG — a different
    stream than ``jax.random.categorical``, identical distribution.
    """
    from gpt2_image_captioning_tpu.ops.decode_attention import _head_sum_matrix

    n_layer, tpad, b_all, d = k_cache.shape
    b = x0.shape[0]
    f = 4 * d  # GPT-2 MLP width
    cdt = x0.dtype
    quant = "qkvs" in packed  # int8 W8A8 packing (pack_decode_weights quant=True)
    cache_quant = k_cache.dtype == jnp.int8
    if cache_quant:
        assert k_scale is not None and v_scale is not None, "int8 cache needs scales"
    assert (origin is None) == (beam_k == 0), "beam mode needs origin AND beam_k"
    if origin is not None:
        origin = origin.astype(jnp.int32)
    assert not (topk and emit_logits), "topk and emit_logits are exclusive"
    assert not (topk and cache_quant), "beam top-k mode has no int8-cache variant"
    do_sample = sample is not None
    if do_sample:
        assert not (topk or emit_logits or beam_k or cache_quant), (
            "sample mode is exclusive with topk/emit_logits/beam/int8-cache"
        )
    tw = packed["qkvw"].shape[3]
    vw = packed["wtet"].shape[2]
    # Batch blocking: each grid program streams ALL weights, so weight
    # traffic multiplies by ceil(b / block_b).  At b ≥ 256 a 256-row block
    # halves the weight reads (measured +24% at b=256, +20% at b=512 —
    # docs/PERF_NOTES.md) but only fits the ~16 MB scoped VMEM with a
    # narrower weight tile (tw=384 packing) and half-depth KV chunks — so
    # the wide block engages exactly when the caller packed narrow tiles.
    if block_b is None:
        block_b = (
            2 * BLOCK_B if (b % (2 * BLOCK_B) == 0 and tw <= 384) else BLOCK_B
        )
    bb = min(block_b, -(-b // 8) * 8)  # batch is a tiled dim: 8-align blocks
    ct = chunk_t or (CHUNK_T // 2 if bb > BLOCK_B else CHUNK_T)
    if beam_k and chunk_t is None:
        # the ancestry gather keeps ~2k shifted chunk copies live on the
        # VMEM stack; half-depth chunks keep the kernel under the 16 MB
        # scoped limit (measured: ct=8 beam at bb=128 allocates 19 MB)
        ct = max(1, ct // 2)
    ct = min(ct, tpad)
    # the chunk walk reads rows [c*ct, (c+1)*ct): a non-dividing ct would let
    # the final chunk DMA run past the cache (init_cache pads T to 16, so the
    # default ct of 4/8 always divides)
    assert tpad % ct == 0, (tpad, ct)
    if beam_k:
        assert bb % beam_k == 0, (bb, beam_k)  # groups must not straddle blocks
    if start is None:
        startv = jnp.zeros((b,), jnp.int32)
        c0 = jnp.zeros((), jnp.int32)
    else:
        startv = start.astype(jnp.int32)
        c0 = jnp.min(startv) // ct
    if do_sample:
        # padded rows: temp 0 (greedy, resolves immediately), top_p 1
        tempv = sample["temp"].astype(jnp.float32).reshape(b, 1)
        toppv = sample["top_p"].astype(jnp.float32).reshape(b, 1)
        seed = jnp.asarray(sample["seed"], jnp.int32).reshape(())
    else:
        seed = jnp.zeros((), jnp.int32)
    pad_b = (-b) % bb
    if pad_b:
        x0 = jnp.pad(x0, ((0, pad_b), (0, 0)))
        startv = jnp.pad(startv, (0, pad_b))
        if do_sample:
            tempv = jnp.pad(tempv, ((0, pad_b), (0, 0)))
            toppv = jnp.pad(toppv, ((0, pad_b), (0, 0)), constant_values=1.0)
        k_cache = jnp.pad(k_cache, ((0, 0), (0, 0), (0, pad_b), (0, 0)))
        v_cache = jnp.pad(v_cache, ((0, 0), (0, 0), (0, pad_b), (0, 0)))
        if cache_quant:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, pad_b)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, pad_b)))
        if origin is not None:
            # padded rows point at themselves (delta 0 — no mixing)
            pad_rows = jnp.broadcast_to(
                jnp.arange(b, b + pad_b, dtype=jnp.int32)[None, :], (tpad, pad_b)
            )
            origin = jnp.concatenate([origin.astype(jnp.int32), pad_rows], axis=1)
    bp = x0.shape[0]
    nb = bp // bb
    # per-block first-live-chunk bounds (kernel walk starts at blk_c0[bi]):
    # padded rows are excluded via a tpad fill so a ragged tail block keeps
    # its real rows' bound; in continuous serving dead rows carry start=idx,
    # so an all-dead block's bound reaches nchunks and its walk vanishes
    if start is None:
        blk_c0 = jnp.zeros((nb,), jnp.int32)
    else:
        start_min = (
            jnp.concatenate(
                [start.astype(jnp.int32),
                 jnp.full((pad_b,), tpad, jnp.int32)]
            )
            if pad_b
            else startv
        )
        blk_c0 = start_min.reshape(nb, bb).min(axis=1) // ct
    if origin is not None:
        # chunk-major 3D layout: the kernel DMAs plane c per chunk (see
        # _step_kernel's origin comment for why 2D sub-tile slices fail)
        origin = origin.reshape(tpad // ct, ct, bp)

    hs = _head_sum_matrix(d, n_head, cdt)
    he = _head_sum_matrix(d, n_head, jnp.float32).T

    kernel = functools.partial(
        _step_kernel,
        n_layer=n_layer,
        d=d,
        f=f,
        n_head=n_head,
        ct=ct,
        tw=tw,
        vw=vw,
        vocab=vocab,
        eps=eps,
        emit_logits=emit_logits,
        quant=quant,
        cache_quant=cache_quant,
        beam_k=beam_k,
        beam_gather=beam_gather or os.environ.get("GIC_BEAM_GATHER", "onehot"),
        gather_start=gather_start,
        topk=topk,
        sample=do_sample,
        cand_k=sample_k,
        rounds=sample_rounds,
    )
    nv = packed["wtet"].shape[0]

    def vm(shape):  # VMEM full-block spec, replicated over the batch grid
        return pl.BlockSpec(shape, lambda bi, s: tuple(0 for _ in shape), memory_space=pltpu.VMEM)

    scale_specs = []
    scale_args = []
    if quant:
        scale_specs = [
            vm(packed["qkvs"].shape), vm(packed["projs"].shape),
            vm(packed["fcs"].shape), vm(packed["cprojs"].shape),
            vm(packed["wtes"].shape),
        ]
        scale_args = [
            packed["qkvs"], packed["projs"], packed["fcs"], packed["cprojs"],
            packed["wtes"],
        ]
    wtile_dt = jnp.int8 if quant else cdt
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((bb, d), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),  # x
            pl.BlockSpec((1, bb), lambda bi, s: (0, bi), memory_space=pltpu.VMEM),  # start
            vm(packed["ln1s"].shape),
            vm(packed["ln1b"].shape),
            vm(packed["ln2s"].shape),
            vm(packed["ln2b"].shape),
            vm(packed["attnb"].shape),
            vm(packed["projb"].shape),
            vm(packed["fcb"].shape),
            vm(packed["cprojb"].shape),
            *scale_specs,
            *(
                [
                    pl.BlockSpec((bb, 1), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bb, 1), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
                ]
                if do_sample
                else []
            ),
            *(
                # origin map, DMA-chunked.  Explicitly HBM: it is small
                # enough that ANY placed it in VMEM, where (ct, bb) chunk
                # slices with ct < 8 violate the (8, 128) int32 tiling —
                # HBM memrefs are untiled and slice arbitrarily
                [pl.BlockSpec(memory_space=pltpu.HBM)]
                if beam_k
                else []
            ),
            vm(packed["lnf"].shape),
            vm(hs.shape),
            vm(he.shape),
            pl.BlockSpec(memory_space=pl.ANY),  # qkvw
            pl.BlockSpec(memory_space=pl.ANY),  # projw
            pl.BlockSpec(memory_space=pl.ANY),  # fcw
            pl.BlockSpec(memory_space=pl.ANY),  # cprojw
            pl.BlockSpec(memory_space=pl.ANY),  # wtet
            pl.BlockSpec(memory_space=pl.ANY),  # k_cache
            pl.BlockSpec(memory_space=pl.ANY),  # v_cache
            *(
                # k_scale, v_scale — chunk-major 4D (L, T/ct, ct, B), read
                # one full (ct, bb) plane per chunk DMA (see ks_dma for the
                # Mosaic tiled-slice rules that force this layout)
                [pl.BlockSpec(memory_space=pl.ANY)] * 2
                if cache_quant
                else []
            ),
        ],
        out_specs=(
            *(
                [
                    pl.BlockSpec((bb, topk), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bb, topk), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bb, 1), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM),
                ]
                if topk
                else [
                    pl.BlockSpec((bb, 1), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM)
                ] * 3
                if do_sample
                else [
                    pl.BlockSpec(memory_space=pl.ANY)
                    if emit_logits
                    else pl.BlockSpec((bb, 1), lambda bi, s: (bi, 0), memory_space=pltpu.VMEM)
                ]
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            *(
                # new-row K/V scales, one (L, BB) stripe per grid program —
                # plain VMEM stores; the wrapper dynamic_update_slices them
                # into the (L, Tpad, B) arrays (no tiled-slice constraints)
                [
                    pl.BlockSpec(
                        (n_layer, bb), lambda bi, s: (0, bi),
                        memory_space=pltpu.VMEM,
                    )
                ] * 2
                if cache_quant
                else []
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d, tw), wtile_dt),
            pltpu.VMEM((2, d, vw), wtile_dt),
            pltpu.VMEM((2, ct, bb, d), k_cache.dtype),
            pltpu.VMEM((2, ct, bb, d), v_cache.dtype),
            pltpu.VMEM((bb, d), k_cache.dtype),
            pltpu.VMEM((bb, d), v_cache.dtype),
            # logits staging only exists in emit_logits mode; a token dummy
            # otherwise (1 MB matters: greedy at block_b=256 sits ~0.4 MB
            # under the 16 MB scoped-VMEM limit)
            pltpu.VMEM((2, bb, vw), jnp.float32)
            if emit_logits
            else pltpu.VMEM((1, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),  # wrsem: K/V row writes
            pltpu.SemaphoreType.DMA((2,)),
            *(
                # sample mode: per-candidate round results (masses + fresh
                # candidate columns/logits) crossing the pl.when boundary
                [pltpu.VMEM((bb, 1), jnp.float32)] * sample_k
                + [pltpu.VMEM((bb, 1), jnp.int32)] * sample_k
                + [pltpu.VMEM((bb, 1), jnp.float32)] * sample_k
                if do_sample
                else []
            ),
            *(
                [
                    pltpu.VMEM((2, ct, bb), jnp.int32),  # origin chunks
                    pltpu.SemaphoreType.DMA((2,)),
                ]
                if beam_k
                else []
            ),
            *(
                [
                    pltpu.VMEM((2, ct, bb), jnp.float32),
                    pltpu.VMEM((2, ct, bb), jnp.float32),
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ]
                if cache_quant
                else []
            ),
        ],
    )
    # caches (+ cache scales) are the last inputs; head outputs come first
    n_in = 19 + len(scale_args) + (1 if beam_k else 0) + (2 if do_sample else 0)
    n_head_out = 3 if (topk or do_sample) else 1
    aliases = {n_in: n_head_out, n_in + 1: n_head_out + 1}
    if topk:
        head_shapes = [
            jax.ShapeDtypeStruct((bp, topk), jnp.float32),
            jax.ShapeDtypeStruct((bp, topk), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ]
    elif do_sample:
        head_shapes = [
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.int32),
            jax.ShapeDtypeStruct((bp, 1), jnp.float32),
        ]
    elif emit_logits:
        head_shapes = [jax.ShapeDtypeStruct((nv, bp, vw), jnp.float32)]
    else:
        head_shapes = [jax.ShapeDtypeStruct((bp, 1), jnp.int32)]
    out_shapes = head_shapes + [
        jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
        jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
    ]
    cache_args = [k_cache, v_cache]
    if cache_quant:
        # scales go in chunk-major 4D (see ks_dma) and are NOT aliased
        # outputs: the kernel emits only the new row's (L, bp) scales,
        # folded back below with one XLA dynamic_update_slice
        out_shapes += [
            jax.ShapeDtypeStruct((n_layer, bp), jnp.float32),
            jax.ShapeDtypeStruct((n_layer, bp), jnp.float32),
        ]
        cache_args += [
            k_scale.reshape(n_layer, tpad // ct, ct, bp),
            v_scale.reshape(n_layer, tpad // ct, ct, bp),
        ]
    extra = {}
    if do_sample or (emit_logits and bb > BLOCK_B):
        # the greedy 256-row config already sits ~0.4 MB under the default
        # 16 MB scoped-VMEM watermark, so modes that add buffers on top
        # raise it (v5e physical VMEM is far larger; this is only the
        # compiler's budget): sample mode's 3·sample_k per-candidate scratch
        # bufs lane-pad to (bb, 128) f32 (~1.6 MB at bb=256), and emit mode's
        # f32 logits staging buffer costs ~1 MB at 256-row blocks (measured
        # on-chip: 16.46M needed vs the 16.00M default at b=256 emit)
        # measured needs: emit@256 16.5M, sample@256 31.6M (the candidate
        # walk's unrolled VPU temporaries land on the Mosaic stack)
        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=(40 if do_sample and bb > BLOCK_B else 24)
            * 1024 * 1024
        )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(out_shapes),
        # caches update in place (indices count the scalar-prefetch operand)
        input_output_aliases=aliases,
        interpret=interpret,
        **extra,
    )(
        jnp.concatenate([
            jnp.stack(
                [jnp.asarray(idx, jnp.int32).reshape(()), c0.astype(jnp.int32), seed]
            ),
            blk_c0,
        ]),
        x0,
        startv[None, :],
        packed["ln1s"], packed["ln1b"], packed["ln2s"], packed["ln2b"],
        packed["attnb"], packed["projb"], packed["fcb"], packed["cprojb"],
        *scale_args,
        *([tempv, toppv] if do_sample else []),
        *([origin] if beam_k else []),
        packed["lnf"], hs, he,
        packed["qkvw"], packed["projw"], packed["fcw"], packed["cprojw"],
        packed["wtet"],
        *cache_args,
    )
    kc, vc = outs[n_head_out], outs[n_head_out + 1]
    if pad_b:
        kc = kc[:, :, :b]
        vc = vc[:, :, :b]
    if topk:
        head = (outs[0][:b], outs[1][:b], outs[2][:b])
    elif do_sample:
        head = (outs[0][:b, 0], outs[1][:b, 0], outs[2][:b])
    elif emit_logits:
        # (NT_v, BP, VW) tiles → (B, vocab); padded cols hold NEG_INF anyway
        head = jnp.moveaxis(outs[0], 0, 1).reshape(bp, nv * vw)[:b, :vocab]
    else:
        head = outs[0][:b, 0]
    if cache_quant:
        # fold the new row's scales into the (L, Tpad, B) arrays — one
        # alignment-free XLA dynamic_update_slice per step (k_scale/v_scale
        # here are the batch-padded copies; slice the pad back off after).
        # k_scale/v_scale are deliberately NOT donated to the kernel: even if
        # XLA materializes these DUS as full copies in the decode loop, the
        # arrays are ~0.45 MB each at the flagship shape (L=12, Tpad~72,
        # B=128, f32) — worst-case ~2 µs/step of HBM traffic, <0.5% of the
        # int8 step; the on-chip b=128 A/B (docs/ab_logs/kv_quant_scale_*)
        # bounds it empirically
        nsk, nsv = outs[n_head_out + 2], outs[n_head_out + 3]
        zero = jnp.zeros((), jnp.int32)
        idx32 = jnp.asarray(idx, jnp.int32).reshape(())
        ks = jax.lax.dynamic_update_slice(
            k_scale, nsk[:, None, :], (zero, idx32, zero)
        )
        vs = jax.lax.dynamic_update_slice(
            v_scale, nsv[:, None, :], (zero, idx32, zero)
        )
        if pad_b:
            ks = ks[:, :, :b]
            vs = vs[:, :, :b]
        return head, kc, vc, ks, vs
    if topk or do_sample:
        return (*head, kc, vc)  # (vals, idxs, lse | tok, round, lse), kc, vc
    return head, kc, vc
