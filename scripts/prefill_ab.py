"""On-chip decomposition of the decode batch's FIXED costs (prefill phase).

PERF_NOTES round-2 accounting: at b=128/len50 the pipelined decode batch is
~44 ms of which ~13.2 ms is a per-batch fixed cost ("prefill"), ~2.4x above
its FLOP floor.  This script splits that fixed cost into its parts on the
real chip so the optimization targets the right term:

  A. mapper forward (build_prefix)                      — floor ~1.8 ms
  B. init_cache zeros + GPT prefill fwd (scan path)     — floor ~2.1 ms
  C. same with unroll=True (python loop, .at[i].set)
  D. B but WITHOUT cache writes (forward_hidden only)   — isolates cache cost
  E. one fused decode step in isolation (marginal sanity)
  F. generate() at max_length = 1 / 10 / 50             — intercept check
  G. empty jit dispatch+sync                            — tunnel floor

Timing notes: every measured computation is ONE jitted function created once
(module scope) and reused — a fresh ``jax.jit`` wrapper per rep would retrace
each call.  All jits fold their outputs to scalars so the D2H sync moves no
real data.  Single-op eager dispatches are avoided (each costs a full tunnel
roundtrip).  Run alone on an idle box — pytest on the single CPU core
inflates every dispatch by ~25 ms.

Run DETACHED on the real chip (one TPU process at a time; do not override
PYTHONPATH — /root/.axon_site must stay on it):
  cd /root/repo && setsid nohup python -u scripts/prefill_ab.py \
      > /tmp/prefill_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def timeit(fn, reps=7, warm=3):
    for _ in range(warm):
        np.asarray(fn())
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        out.append((time.perf_counter() - t0) * 1000)
    return float(np.median(out))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    batch, max_len = 128, 50
    emb = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 512)).astype(np.float32)
    )
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)
    np.asarray(jax.tree.leaves(packed)[0][0, 0])  # materialize

    # --- G: dispatch floor ---------------------------------------------------
    @jax.jit
    def empty(x):
        return x + 1

    one = jnp.zeros((), jnp.int32)
    g_t = timeit(lambda: empty(one))
    print(f"G  empty jit dispatch+sync               : {g_t:7.2f} ms", flush=True)

    # --- A: mapper -----------------------------------------------------------
    @jax.jit
    def mapper_s(tr, e):
        return C.build_prefix(tr, ccfg, e, policy)[:, 0, 0].astype(jnp.float32)[0]

    a = timeit(lambda: mapper_s(trainable, emb))
    print(f"A  mapper (build_prefix)                 : {a:7.2f} ms", flush=True)

    # --- B/C: cache init + prefill -------------------------------------------
    p_len = ccfg.total_prefix_length

    @jax.jit
    def mapper_full(tr, e):
        return C.build_prefix(tr, ccfg, e, policy)

    prefix_d = jax.block_until_ready(mapper_full(trainable, emb))

    def make_prefill(unroll):
        @jax.jit
        def prefill(gpt, pfx):
            cache = G.init_cache(gcfg, batch, p_len + max_len, dtype=policy.compute_dtype)
            logits, cache = G.forward_cached(
                gpt, gcfg, pfx, cache, policy, fresh_prefill=True, unroll=unroll
            )
            # fold the cache into a scalar so nothing big crosses the tunnel
            return (
                jnp.argmax(logits, -1)[0]
                + (cache["k"][0, 0, 0, 0] + cache["v"][-1, 0, 0, 0]).astype(jnp.int32)
            )

        return prefill

    prefill_scan = make_prefill(False)
    prefill_unroll = make_prefill(True)
    b_t = timeit(lambda: prefill_scan(frozen["gpt"], prefix_d))
    print(f"B  init_cache + prefill (scan)           : {b_t:7.2f} ms", flush=True)
    c_t = timeit(lambda: prefill_unroll(frozen["gpt"], prefix_d))
    print(f"C  init_cache + prefill (unroll)         : {c_t:7.2f} ms", flush=True)

    # --- D: prefill compute without any cache --------------------------------
    @jax.jit
    def fwd_only(gpt, pfx):
        h = G.forward_hidden(gpt, gcfg, pfx, None, policy)
        logits = jnp.dot(
            policy.cast(h[:, -1, :]),
            gpt["wte"].T.astype(policy.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return jnp.argmax(logits, -1)[0]

    d_t = timeit(lambda: fwd_only(frozen["gpt"], prefix_d))
    print(f"D  prefill fwd, no cache writes          : {d_t:7.2f} ms", flush=True)

    # --- E: one fused decode step in isolation --------------------------------
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    cache = G.init_cache(gcfg, batch, p_len + max_len, dtype=policy.compute_dtype)
    rng = np.random.default_rng(1)
    kc = jnp.asarray(rng.normal(size=cache["k"].shape).astype(np.float32)).astype(
        policy.compute_dtype
    )
    vc = jnp.asarray(rng.normal(size=cache["v"].shape).astype(np.float32)).astype(
        policy.compute_dtype
    )
    x0 = jnp.asarray(rng.normal(size=(batch, 768)).astype(np.float32)).astype(
        policy.compute_dtype
    )

    @jax.jit
    def one_step(pk, x, k, v):
        tok, _, _ = DS.fused_decode_step(
            pk, x, k, v, jnp.int32(40), n_head=gcfg.n_head,
            vocab=gcfg.vocab_size, eps=gcfg.layer_norm_epsilon,
        )
        return tok[0]

    e_t = timeit(lambda: one_step(packed, x0, kc, vc))
    print(f"E  one fused step (idx=40, call-sync)    : {e_t:7.2f} ms", flush=True)

    # --- F: generate() intercept ----------------------------------------------
    for ml in (1, 10, 50):
        def gen(ml=ml):
            return C.generate(
                trainable, frozen, ccfg, emb, max_length=ml,
                temperature=0.0, top_p=1.0, policy=policy, packed=packed,
            )

        f_t = timeit(gen, reps=5)
        print(f"F  generate(max_length={ml:3d})             : {f_t:7.2f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
