"""Decompose the continuous-engine macro-step cost on chip.

scripts/continuous_ab.py round-3 result: the on-device macro engine runs
~3.1 ms per decode step at S=128 where the identical fused kernel costs
0.71 ms/step inside generate()'s while_loop.  This probe bisects:

  A. generate()'s fused loop, 32 steps (known-good reference)
  B. bare lax.scan of 32 fused steps WITH the start operand (start=zeros)
  C. macro_step, all rows live, empty queue (decode + burst wrapper, no
     admission work)
  D. macro_step, first macro of the real workload (admissions included)

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/continuous_decomp.py \
      > /tmp/continuous_decomp.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

S = 128
STEPS = 32


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import continuous as CE
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init flagship params...")
    model = C.ImageCaptioningModel(ccfg, tokenizer=None, policy=policy)
    tr, fz, pol = model.decode_params("bf16")
    packed = C.prepare_decode_weights(tr, fz, ccfg, pol)
    gp = C._gpt(tr, fz)
    wte, wpe = gp["wte"], gp["wpe"]
    p = 15
    rng = np.random.default_rng(0)
    emb_b = jnp.asarray(rng.normal(size=(S, 512)).astype(np.float32))

    def timed(label, fn, reps=6):
        np.asarray(jax.tree.leaves(fn())[0])
        np.asarray(jax.tree.leaves(fn())[0])
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        for o in outs:
            np.asarray(jax.tree.leaves(o)[0])
        dt = (time.perf_counter() - t0) / reps
        log(f"{label}: {dt*1000:.2f} ms ({dt/STEPS*1e3:.3f} ms/step)")
        return dt

    # --- A: generate's fused loop at max_length=32 -------------------------
    def gen():
        return C.generate(
            tr, fz, ccfg, emb_b, max_length=STEPS, temperature=0.0,
            top_p=1.0, policy=pol, packed=packed,
        )

    log("compiling A (generate fused loop)...")
    timed("A generate 32-step fused loop", gen)

    # --- B: bare scan of fused steps with the start operand ----------------
    t_cap = 8 * ((p + STEPS + 8) // 8)

    @jax.jit
    def bare(packed, k, v, prev, idx, start):
        def body(carry, _):
            k, v, idx, prev = carry
            local = idx - start
            x0 = (
                jnp.take(wte, prev, axis=0) + jnp.take(wpe, local, axis=0)
            ).astype(pol.compute_dtype)
            tok, k, v = DS.fused_decode_step(
                packed, x0, k, v, idx,
                n_head=gcfg.n_head, vocab=gcfg.vocab_size,
                eps=gcfg.layer_norm_epsilon, start=start,
            )
            return (k, v, idx + 1, tok), tok

        (k, v, idx, prev), toks = jax.lax.scan(
            body, (k, v, idx, prev), None, length=STEPS
        )
        return toks

    k0 = jnp.zeros((gcfg.n_layer, t_cap, S, gcfg.n_embd), pol.compute_dtype)
    v0 = jnp.zeros_like(k0)
    prev0 = jnp.zeros((S,), jnp.int32)
    idx0 = jnp.asarray(p, jnp.int32)
    start0 = jnp.zeros((S,), jnp.int32)
    log("compiling B (bare scan + start operand)...")
    timed("B bare 32-step scan w/ start", lambda: bare(packed, k0, v0, prev0, idx0, start0))

    # --- B2: bare scan WITHOUT start (exactly generate's inner op) ---------
    @jax.jit
    def bare2(packed, k, v, prev, idx):
        def body(carry, _):
            k, v, idx, prev = carry
            x0 = (
                jnp.take(wte, prev, axis=0)
                + jax.lax.dynamic_slice_in_dim(wpe, idx, 1, 0)[0]
            ).astype(pol.compute_dtype)
            tok, k, v = DS.fused_decode_step(
                packed, x0, k, v, idx,
                n_head=gcfg.n_head, vocab=gcfg.vocab_size,
                eps=gcfg.layer_norm_epsilon,
            )
            return (k, v, idx + 1, tok), tok

        (k, v, idx, prev), toks = jax.lax.scan(
            body, (k, v, idx, prev), None, length=STEPS
        )
        return toks

    log("compiling B2 (bare scan, no start)...")
    timed("B2 bare 32-step scan no start", lambda: bare2(packed, k0, v0, prev0, idx0))

    # --- C: macro_step, all rows live, nothing staged ----------------------
    state = CE.init_state(ccfg, S, t_cap, p, pol)
    state["finished"] = jnp.zeros((S,), bool)
    state["cap"] = jnp.full((S,), STEPS + 2, jnp.int32)
    state["gen"] = jnp.ones((S,), jnp.int32)
    state["uid"] = jnp.arange(S, dtype=jnp.int32)
    state["start"] = jnp.zeros((S,), jnp.int32)
    emb_q = jnp.zeros((S, 512), jnp.float32)
    cap_q = jnp.zeros((S,), jnp.int32)
    uid_q = jnp.full((S,), -1, jnp.int32)
    zero = jnp.zeros((), jnp.int32)

    state_live = state

    def macro_c():
        # macro_step donates state — give each rep fresh buffers (~1 ms copy)
        st = jax.tree.map(jnp.copy, state_live)
        st2, out = CE.macro_step(
            packed, tr, fz, st, emb_q, cap_q, uid_q, zero,
            cfg=ccfg, policy=pol, seg=4, bursts=8, admit=32,
        )
        return out

    log("compiling C (macro, live rows, no admissions)...")
    timed("C macro 8x4 no admissions", macro_c)

    # --- D: macro_step with admissions -------------------------------------
    emb_q2 = jnp.asarray(rng.normal(size=(256, 512)).astype(np.float32))
    cap_q2 = jnp.full((256,), 12, jnp.int32)
    uid_q2 = jnp.arange(256, dtype=jnp.int32)
    n_q2 = jnp.asarray(256, jnp.int32)
    fresh = CE.init_state(ccfg, S, t_cap, p, pol)

    def macro_d():
        st = jax.tree.map(jnp.copy, fresh)
        st2, out = CE.macro_step(
            packed, tr, fz, st, emb_q2, cap_q2, uid_q2, n_q2,
            cfg=ccfg, policy=pol, seg=4, bursts=8, admit=32,
        )
        return out

    log("compiling D (macro with admissions)...")
    timed("D macro 8x4 with admissions", macro_d)

    # --- E: fewer burst boundaries (seg=8, bursts=4), no admissions --------
    def macro_e():
        st = jax.tree.map(jnp.copy, state_live)
        st2, out = CE.macro_step(
            packed, tr, fz, st, emb_q, cap_q, uid_q, zero,
            cfg=ccfg, policy=pol, seg=8, bursts=4, admit=32,
        )
        return out

    log("compiling E (macro 4x8 no admissions)...")
    timed("E macro 4x8 no admissions", macro_e)

    # --- F: admissions at bucket 128 (prefill shape efficiency) ------------
    emb_q3 = jnp.asarray(rng.normal(size=(512, 512)).astype(np.float32))
    cap_q3 = jnp.full((512,), 12, jnp.int32)
    uid_q3 = jnp.arange(512, dtype=jnp.int32)
    n_q3 = jnp.asarray(512, jnp.int32)

    def macro_f():
        st = jax.tree.map(jnp.copy, fresh)
        st2, out = CE.macro_step(
            packed, tr, fz, st, emb_q3, cap_q3, uid_q3, n_q3,
            cfg=ccfg, policy=pol, seg=4, bursts=8, admit=128,
        )
        return out

    log("compiling F (macro 8x4, admit bucket 128)...")
    timed("F macro 8x4 admit=128", macro_f)

    log("done")


if __name__ == "__main__":
    main()
