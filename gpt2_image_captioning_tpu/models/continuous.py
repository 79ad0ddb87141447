"""On-device continuous-batching engine: admission runs INSIDE the jit.

The host-driven rolling-admission loop (``decode_segment`` +
``admit_prefill`` in ``captioner.py``) is token-exact but pays one
device→host round trip per burst and one per admission — ~24 ms each over
this TPU's dispatch tunnel, which measured 6× slower than fixed-batch
decode end to end (scripts/continuous_ab.py, round 3).  TPU-first, the
whole serving loop belongs on device: this module compiles a **macro-step**
— ``bursts`` × (admit-from-staged-queue → ``seg`` fused decode steps) — as
ONE jitted program over donated device state.  The host stages a block of
queued requests (embeddings + caps + uids), dispatches the macro, and
fetches a single packed int32 matrix of (tokens, row uids, admitted firsts)
per macro; with one macro in flight the fetch overlaps the next macro's
device time, so the tunnel latency amortizes over ``bursts*seg`` tokens
instead of ``seg``.

Device mechanics shared with the host-driven path: every row appends at
one uniform cache position ``idx``; an admitted request's prefix K/V land
in its row's *past* positions ``[idx-P, idx)``; the fused kernel masks each
row's attention to its own window ``[start_r, idx)`` (the ``start`` operand
of ``ops/decode_step.fused_decode_step``).  Cache compaction (uniform roll
down by ``min(start)``) happens at macro entry, on device.

The reference has no serving surface (its decode is a notebook loop,
/root/reference/src/models.py:389-469); continuous batching is this
framework's production capability add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.precision import F32, Policy
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models.captioner import (
    CaptionerConfig,
    _gpt,
    build_prefix,
)
from gpt2_image_captioning_tpu.ops import decode_step as DS
from gpt2_image_captioning_tpu.ops.sampling import top_p_filter_bisect


def init_state(cfg: CaptionerConfig, slots: int, t_max: int, prefix_len: int,
               policy: Policy = F32) -> dict:
    """Fresh engine state: ``slots`` empty rows, append position at
    ``prefix_len`` (so the first admission's prefix fits below ``idx``)."""
    shape = (cfg.gpt2.n_layer, t_max, slots, cfg.gpt2.n_embd)
    p = jnp.asarray(prefix_len, jnp.int32)
    return {
        "k": jnp.zeros(shape, policy.compute_dtype),
        "v": jnp.zeros(shape, policy.compute_dtype),
        "idx": p,
        "start": jnp.full((slots,), prefix_len, jnp.int32),
        "prev": jnp.zeros((slots,), jnp.int32),
        "finished": jnp.ones((slots,), bool),  # empty rows are free
        "gen": jnp.zeros((slots,), jnp.int32),
        "cap": jnp.zeros((slots,), jnp.int32),
        "uid": jnp.full((slots,), -1, jnp.int32),
        # per-row sampling params (sampled mode only; carried like cap/uid
        # so every request decodes with ITS OWN temperature/top_p)
        "temp": jnp.zeros((slots,), jnp.float32),
        "topp": jnp.ones((slots,), jnp.float32),
        # global decode-step counter: monotone across macros and compactions
        # (unlike ``idx``), so sampled mode can fold it into the PRNG key
        # without ever reusing noise
        "t": jnp.zeros((), jnp.int32),
    }


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "policy", "seg", "bursts", "admit", "temperature",
                     "top_p", "sampled", "sample_in_kernel", "admit_affinity"),
    donate_argnums=(3,),
)
def macro_step(
    packed: dict,
    trainable: dict,
    frozen: dict,
    state: dict,
    emb_q: jnp.ndarray,   # (Q, E) staged embeddings (front of the host queue)
    cap_q: jnp.ndarray,   # (Q,) int32 per-request max tokens
    uid_q: jnp.ndarray,   # (Q,) int32 request uids
    n_q: jnp.ndarray,     # () int32 — valid staged count (<= Q)
    rng: jax.Array | None = None,
    temp_q: jnp.ndarray | None = None,  # (Q,) f32 per-request temperature
    topp_q: jnp.ndarray | None = None,  # (Q,) f32 per-request top_p
    *,
    cfg: CaptionerConfig,
    policy: Policy,
    seg: int,
    bursts: int,
    admit: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
    sampled: bool | None = None,
    sample_in_kernel: bool = False,
    admit_affinity: bool = False,
) -> tuple[dict, jnp.ndarray]:
    """``bursts*seg`` fused decode steps with admission every ``seg``-th
    step, compiled as ONE program (a single flat ``lax.scan``).

    At each admission point, up to ``admit`` staged requests are prefilled
    into free rows entirely on device (free-row selection, mapper+GPT
    prefix forward with LOCAL positions, K/V scatter into ``[idx-P, idx)``,
    slot bookkeeping).  Rows finish on EOS or when their per-request
    ``cap`` is reached and are reusable from the next admission point.

    Returns ``(state', out)`` with ``out`` int32 ``(bursts*seg, 4, S)`` per
    step ``t``:

    - ``out[t, 0]`` — the step's tokens (dead rows emit EOS padding,
      exactly like one-shot :func:`captioner.generate`),
    - ``out[t, 1]`` — each row's occupant uid for this step, or -1 for rows
      that were free/finished at the step start (their tokens are padding),
    - ``out[t, 2]`` / ``out[t, 3]`` — the step's admitted first tokens /
      admitted uids in admission order, -1-padded to S (first ``admit``
      columns meaningful; all -1 on non-admission steps).  The host learns
      staged-queue consumption from the count of non-(-1) admitted uids.

    Capacity contract (held by the caller): ``t_max >= P + max(cap) +
    bursts*seg`` — compaction at macro entry rebases ``idx`` to the longest
    live window, and ``idx`` then grows by ``bursts*seg``.

    Sampled serving: ``sampled=True`` (default: ``temperature != 0``)
    compiles the emit-logits program, and every row decodes with ITS OWN
    ``(temperature, top_p)`` — staged per request via ``temp_q``/``topp_q``
    (default: the static ``temperature``/``top_p``), carried in the state
    like ``cap``, and applied per row (temperature scaling broadcasts; the
    sort-free bisection nucleus mask is per-row math already).  Rows with
    temperature 0 take the argmax — greedy and sampled requests mix freely
    in one pool.  Noise is keyed by folding the global step counter
    ``state["t"]`` (decode steps use ``2t``, the burst's admission point
    ``2t+1``), so every draw across macros is fresh and a fixed ``(rng,
    submission order)`` replays exactly.

    ``sample_in_kernel=True`` moves the per-step token draw INSIDE the fused
    kernel (speculative-accept nucleus sampling, ops/decode_step.py): the
    (S, V) logits never leave the chip and the XLA bisect/categorical tail
    disappears.  Per-row temperature/top_p semantics are identical (temp 0
    rows take the argmax in-kernel); the noise stream is the TPU hardware
    PRNG seeded from the same folded key, so draws stay reproducible for a
    fixed ``(rng, submission order)`` but differ stream-wise from the XLA
    path.  Callers should keep per-request ``top_p`` ≥ 0.5 (the service
    validates): smaller nuclei make speculative accept retry often.  The
    admission-point first token keeps the XLA draw (one per request).
    """
    if sampled is None:
        sampled = temperature != 0.0
    if sampled and rng is None:
        raise ValueError("sampled macro_step needs rng")
    if temp_q is None:
        temp_q = jnp.full((emb_q.shape[0],), temperature, jnp.float32)
    if topp_q is None:
        topp_q = jnp.full((emb_q.shape[0],), top_p, jnp.float32)
    gpt_params = _gpt(trainable, frozen)
    wte, wpe = gpt_params["wte"], gpt_params["wpe"]
    eos = cfg.eos_token_id
    s = state["start"].shape[0]
    t_cap = state["k"].shape[1]
    n_layer = state["k"].shape[0]
    q_cap = emb_q.shape[0]
    cdt = policy.compute_dtype

    # probe the (static) total prefix length
    p_len = jax.eval_shape(
        lambda e: build_prefix(trainable, cfg, e, policy),
        jax.ShapeDtypeStruct((1, emb_q.shape[1]), jnp.float32),
    ).shape[1]

    # ---- compaction at macro entry: roll every live window to the bottom --
    k, v = state["k"], state["v"]
    idx, start = state["idx"], state["start"]
    finished = state["finished"]
    shift = jnp.minimum(
        jnp.min(jnp.where(finished, idx, start)), idx - p_len
    )  # all-free pools rebase to idx == P (admission needs idx >= P)
    k = jnp.roll(k, -shift, axis=1)
    v = jnp.roll(v, -shift, axis=1)
    idx = idx - shift
    start = start - shift

    carry0 = (
        k, v, idx, start, state["prev"], finished,
        state["gen"], state["cap"], state["uid"],
        state["temp"], state["topp"],
        jnp.zeros((), jnp.int32),  # qhead
        state["t"],
    )

    def sample_rows(lg, temp, topp, key):
        """Per-row temperature/top-p/categorical; temp==0 rows take argmax.

        The bisection nucleus mask is per-row math already (its threshold
        search runs rowwise), so a (R, 1) ``top_p`` broadcasts; ``top_p >=
        1`` rows keep the whole vocabulary and the filter is the identity."""
        lg32 = lg.astype(jnp.float32)
        greedy = jnp.argmax(lg32, axis=-1).astype(jnp.int32)
        tsafe = jnp.where(temp > 0, temp, 1.0)
        filtered = top_p_filter_bisect(lg32 / tsafe[:, None], topp[:, None])
        cat = jax.random.categorical(key, filtered, axis=-1).astype(jnp.int32)
        return jnp.where(temp > 0, cat, greedy)

    # Scan over BURSTS with the ``seg`` decode steps python-unrolled inside,
    # and ZERO scatter ops.  Two rejected shapes (scripts/continuous_decomp.py,
    # /tmp/continuous_decomp{2,3}.log):
    #   - nested scan-of-scans: ~1.6 ms per burst boundary (XLA materializes
    #     the 2×110 MB cache carry at each inner-scan entry/exit);
    #   - flat per-step scan with ``.at[pos, rows].set`` admission writes:
    #     2.7 ms/step even with NO admissions — TPU lowers the 2-D-index
    #     cache scatter to a serial per-index loop, and it ran every step.
    # Here admission placement is DENSE: a one-hot (S, A) matmul drops the
    # admitted prefix K/V onto the MXU, `where` merges the per-row vectors,
    # and one dynamic_update_slice writes the (L, P, S, D) cache window —
    # once per burst, so the window traffic (~0.1 ms) amortizes over ``seg``
    # steps.
    # kernel batch-block width (mirrors ops/decode_step.py's choice): used
    # by the age-affine admission policy below
    tw = packed["qkvw"].shape[-1]
    blk_w = 256 if (s % 256 == 0 and tw <= 384) else 128

    def burst_fn(carry, _):
        (k, v, idx, start, prev, finished, gen, cap, uid, temp, topp,
         qhead, tstep) = carry

        # -- admission (burst entry): free rows × staged requests ----------
        free = finished
        if admit_affinity and s % blk_w == 0 and s > blk_w:
            # age-affine admission: prefer the kernel batch block with the
            # most free rows.  Measured-REJECTED as default (on-chip A/B,
            # docs/ab_logs/continuous_occupancy_ab.log 17:58 session: loses
            # 2.5-5% at every pool) — the default lowest-free-row-first
            # order already clusters ages into low blocks for the kernel's
            # per-block chunk skip, and this key computation costs ~10 ms
            # per macro.  Kept as an opt-in for workloads whose length
            # spread breaks the natural clustering.
            # Exact for any row choice — only WHICH free rows admit changes.
            blk_free = free.reshape(s // blk_w, blk_w).sum(axis=1)
            key = jnp.where(
                free, -blk_free[jnp.arange(s) // blk_w], jnp.int32(s + 1)
            )
        else:
            key = jnp.where(free, 0, 1)
        order = jnp.argsort(key, stable=True)  # free (emptiest block) first
        rows = order[:admit]                                     # (A,)
        ntake = jnp.minimum(jnp.minimum(jnp.sum(free), n_q - qhead), admit)
        valid = jnp.arange(admit) < ntake
        qidx = jnp.minimum(qhead + jnp.arange(admit), q_cap - 1)
        # one-hot placement map: onehot[r, a] ⇔ admitted slot a lands in row r
        onehot = (rows[None, :] == jnp.arange(s)[:, None]) & valid[None, :]
        adm_row = jnp.any(onehot, axis=1)  # (S,) rows receiving an admission

        # the cond returns only the SMALL prefill products — routing the
        # (L, T, S, D) caches through lax.cond forbids input/output buffer
        # aliasing and copies both caches at every admission point (~1.4 ms
        # at the flagship shape, scripts/continuous_decomp.py)
        def do_admit():
            emb_a = emb_q[qidx]
            prefix = build_prefix(trainable, cfg, emb_a, policy)
            cache_n = G.init_cache(cfg.gpt2, admit, p_len, dtype=cdt)
            logits, cache_n = G.forward_cached(
                gpt_params, cfg.gpt2, prefix, cache_n, policy,
                fresh_prefill=True,
            )
            if not sampled:
                first = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            else:
                first = sample_rows(
                    logits, temp_q[qidx], topp_q[qidx],
                    jax.random.fold_in(rng, tstep * 2 + 1),
                )
            k_rows = cache_n["k"][:, :p_len].astype(k.dtype)  # (L, P, A, D)
            v_rows = cache_n["v"][:, :p_len].astype(v.dtype)
            return first, k_rows, v_rows

        def no_admit():
            z = jnp.zeros((n_layer, p_len, admit, k.shape[3]), k.dtype)
            return jnp.full((admit,), -1, jnp.int32), z, z

        first, k_rows, v_rows = jax.lax.cond(ntake > 0, do_admit, no_admit)

        # dense K/V placement into cache positions [idx-P, idx) of the freed
        # rows: one-hot matmul spreads (L, P, A, D) → (L, P, S, D), `where`
        # keeps non-admitted rows, one slice-update writes the window back
        oh = onehot.astype(cdt)  # (S, A)
        lo = idx - p_len
        for name, cache, rows_new in (("k", k, k_rows), ("v", v, v_rows)):
            win = jax.lax.dynamic_slice_in_dim(cache, lo, p_len, axis=1)
            placed = jnp.einsum(
                "lpad,sa->lpsd", rows_new, oh,
                preferred_element_type=cdt,
            )
            win = jnp.where(adm_row[None, None, :, None], placed, win)
            cache = jax.lax.dynamic_update_slice_in_dim(cache, win, lo, axis=1)
            if name == "k":
                k = cache
            else:
                v = cache

        # per-row vectors: dense one-hot select, no scatters
        def place(vals, old):  # vals (A,) → rows of (S,)
            spread = jnp.sum(jnp.where(onehot, vals[None, :], 0), axis=1)
            return jnp.where(adm_row, spread.astype(old.dtype), old)

        cap_a = cap_q[qidx]
        start = place(jnp.full((admit,), 1, jnp.int32) * lo, start)
        prev = place(first, prev)
        gen = place(jnp.ones((admit,), jnp.int32), gen)
        cap = place(cap_a, cap)
        uid = place(uid_q[qidx], uid)
        temp = place(temp_q[qidx], temp)
        topp = place(topp_q[qidx], topp)
        adm_done = (first == eos) | (cap_a <= 1)
        finished = place(adm_done, finished)
        qhead = qhead + ntake

        # admission report rides the burst's FIRST step row (static update)
        pad = jnp.full((s,), -1, jnp.int32)
        first_pad = pad.at[:admit].set(jnp.where(valid, first, -1))
        admuid_pad = pad.at[:admit].set(jnp.where(valid, uid_q[qidx], -1))

        # -- seg fused decode steps, python-unrolled ------------------------
        outs = []
        for j in range(seg):
            # finished rows hold an empty window at the append position
            # (keeps the kernel's first-live-chunk skip and compaction tight)
            start = jnp.where(finished, idx, start)
            row_uid = jnp.where(finished, -1, uid)
            live = jnp.logical_not(finished)
            local = idx - start
            x0 = (
                jnp.take(wte, prev, axis=0) + jnp.take(wpe, local, axis=0)
            ).astype(cdt)
            if not sampled:
                tok, k, v = DS.fused_decode_step(
                    packed, x0, k, v, idx,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon, start=start,
                )
            elif sample_in_kernel:
                # token draw fused into the kernel; dead rows carry temp 0
                # (pure argmax — no candidate machinery wasted on them) and
                # the hardware-PRNG seed derives from the same folded key
                seed = jax.lax.bitcast_convert_type(
                    jax.random.bits(
                        jax.random.fold_in(rng, tstep * 2), (), jnp.uint32
                    ),
                    jnp.int32,
                )
                tok, _, _, k, v = DS.fused_decode_step(
                    packed, x0, k, v, idx,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon, start=start,
                    sample={
                        "temp": jnp.where(live, temp, 0.0),
                        "top_p": topp,
                        "seed": seed,
                    },
                )
            else:
                lg, k, v = DS.fused_decode_step(
                    packed, x0, k, v, idx,
                    n_head=cfg.gpt2.n_head, vocab=cfg.gpt2.vocab_size,
                    eps=cfg.gpt2.layer_norm_epsilon, start=start,
                    emit_logits=True,
                )
                tok = sample_rows(
                    lg, temp, topp, jax.random.fold_in(rng, tstep * 2)
                )
            tok = jnp.where(live, tok, eos)
            tstep = tstep + 1
            gen = gen + live
            finished = finished | (tok == eos) | (gen >= cap)
            prev = tok
            idx = idx + 1
            neg = jnp.full((s,), -1, jnp.int32)
            outs.append(jnp.stack(
                [tok, row_uid,
                 first_pad if j == 0 else neg,
                 admuid_pad if j == 0 else neg], axis=0))

        carry = (k, v, idx, start, prev, finished, gen, cap, uid, temp, topp,
                 qhead, tstep)
        return carry, jnp.stack(outs, axis=0)  # (seg, 4, S)

    (k, v, idx, start, prev, finished, gen, cap, uid, temp, topp, _, t), outs = (
        jax.lax.scan(burst_fn, carry0, None, length=bursts)
    )
    outs = outs.reshape(bursts * seg, 4, s)
    state = {
        "k": k, "v": v, "idx": idx, "start": start, "prev": prev,
        "finished": finished, "gen": gen, "cap": cap, "uid": uid,
        "temp": temp, "topp": topp, "t": t,
    }
    return state, outs


def init_state_dp(cfg: CaptionerConfig, dp: int, slots: int, t_max: int,
                  prefix_len: int, policy: Policy = F32) -> dict:
    """Fresh dp-sharded engine state: ``dp`` independent sub-pools of
    ``slots // dp`` rows each.  Same keys as :func:`init_state`, but the
    per-pool scalars ``idx``/``t`` become ``(dp,)`` vectors (each sub-pool
    compacts and counts independently) — the layout :func:`macro_step_dp`
    splits over the mesh."""
    assert slots % dp == 0, f"slots {slots} must divide over dp={dp}"
    st = init_state(cfg, slots, t_max, prefix_len, policy)
    return dict(
        st,
        idx=jnp.full((dp,), int(st["idx"]), jnp.int32),
        t=jnp.zeros((dp,), jnp.int32),
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "cfg", "policy", "seg", "bursts", "admit",
                     "temperature", "top_p", "sampled", "sample_in_kernel",
                     "admit_affinity"),
    donate_argnums=(4,),
)
def macro_step_dp(
    mesh,
    packed: dict,
    trainable: dict,
    frozen: dict,
    state: dict,
    emb_q: jnp.ndarray,   # (Q, E) staged embeddings, Q split over dp
    cap_q: jnp.ndarray,
    uid_q: jnp.ndarray,
    n_q: jnp.ndarray,     # (dp,) per-shard valid staged counts
    rng: jax.Array | None = None,
    temp_q: jnp.ndarray | None = None,
    topp_q: jnp.ndarray | None = None,
    *,
    cfg: CaptionerConfig,
    policy: Policy,
    seg: int,
    bursts: int,
    admit: int,
    temperature: float = 0.0,
    top_p: float = 1.0,
    sampled: bool | None = None,
    sample_in_kernel: bool = False,
    admit_affinity: bool = False,
) -> tuple[dict, jnp.ndarray]:
    """Data-parallel continuous serving: ``dp`` independent sub-pools, one
    :func:`macro_step` per device, compiled as ONE ``shard_map`` program.

    Multi-chip serving shards by POOL, not by tensor: rolling admission is
    per-row bookkeeping plus a single-device fused kernel, so the natural
    mesh layout splits the slot axis (and each pool's staged queue slice)
    over ``dp`` and leaves weights/packed tiles replicated — zero
    collectives in the decode loop, the same recipe as ``generate``'s fused
    dp path.  The host routes requests to sub-pool queues (round-robin in
    the service); each sub-pool admits, compacts and finishes rows
    independently, which is why ``state["idx"]``/``state["t"]`` are per-pool
    vectors here (see :func:`init_state_dp`).

    Every array argument is split on its pool/queue axis: ``state`` rows and
    ``out`` columns on the slot axis, ``emb_q``/``cap_q``/``uid_q``/
    ``temp_q``/``topp_q`` on the queue axis, ``n_q`` one count per shard.
    Sampled mode folds the shard index into ``rng`` so sub-pools draw
    independent noise streams.  Returns ``(state', out)`` with ``out``
    ``(bursts*seg, 4, S)`` — concatenated over shards, so the host harvest
    is unchanged (uids are global).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as _P

    body = macro_step.__wrapped__  # the un-jitted macro (shard_map traces it)
    has_rng = rng is not None

    def shard_body(packed, trainable, frozen, state, emb_q, cap_q, uid_q,
                   n_q, rng, temp_q, topp_q):
        local = dict(state, idx=state["idx"][0], t=state["t"][0])
        rng_l = (
            jax.random.fold_in(rng, jax.lax.axis_index("dp")) if has_rng else None
        )
        st2, out = body(
            packed, trainable, frozen, local, emb_q, cap_q, uid_q, n_q[0],
            rng_l, temp_q, topp_q,
            cfg=cfg, policy=policy, seg=seg, bursts=bursts, admit=admit,
            temperature=temperature, top_p=top_p, sampled=sampled,
            sample_in_kernel=sample_in_kernel, admit_affinity=admit_affinity,
        )
        st2 = dict(st2, idx=st2["idx"][None], t=st2["t"][None])
        return st2, out

    row = _P("dp")
    state_specs = {
        "k": _P(None, None, "dp", None), "v": _P(None, None, "dp", None),
        "idx": row, "start": row, "prev": row, "finished": row, "gen": row,
        "cap": row, "uid": row, "temp": row, "topp": row, "t": row,
    }
    rng_spec = _P() if has_rng else None
    fn = shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: _P(), packed),
            jax.tree.map(lambda _: _P(), trainable),
            jax.tree.map(lambda _: _P(), frozen),
            state_specs,
            _P("dp", None), row, row, row, rng_spec, row, row,
        ),
        out_specs=(state_specs, _P(None, None, "dp")),
        check_vma=False,
    )
    if temp_q is None:
        temp_q = jnp.full((emb_q.shape[0],), temperature, jnp.float32)
    if topp_q is None:
        topp_q = jnp.full((emb_q.shape[0],), top_p, jnp.float32)
    return fn(packed, trainable, frozen, state, emb_q, cap_q, uid_q, n_q,
              rng, temp_q, topp_q)
