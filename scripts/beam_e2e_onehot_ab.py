"""End-to-end beam_generate A/B: ancestry-gather variants on the real chip.

Two levers, both exact (token-identical by construction):
  - gather impl: `shift` (VPU shifted selects) vs `onehot` (MXU permutation
    matmul, the default).  Isolated step: 3.54 ms vs 5.73-5.92 at 512 rows
    (scripts/beam_gather_ab.py).
  - prefix skip: `gather_start=p_len` skips the gather on cache chunks
    fully inside the shared image prefix, where every beam in a group
    descends from one prefill so ancestry indirection is a numeric no-op.

This script measures the public `beam_generate` surface (flagship 124M,
beam 4, max_length 50) with shift / onehot+full-gather / onehot+skip and
checks bit-identity across all three.  `beam_generate` is a module-level
`jax.jit`, so each env-var flip MUST clear its cache — the env is read at
trace time and a warm cache would silently reuse the previous variant's
executable.

Run DETACHED alone on the real chip (CLAUDE.md TPU rules):
  cd /root/repo && setsid nohup python -u scripts/beam_e2e_onehot_ab.py \
      > /tmp/beam_e2e_onehot_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init params...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    log("init done")

    k, max_len = 4, 50
    rng = np.random.default_rng(0)

    def run(emb, b, gather, skip, quant=False):
        os.environ["GIC_BEAM_GATHER"] = gather
        os.environ["GIC_BEAM_PREFIX_SKIP"] = "1" if skip else "0"
        # env is read at trace time; force a fresh trace per variant
        C.beam_generate.clear_cache()
        out = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=max_len, beam_size=k,
            policy=policy, decode_quant=quant,
        )
        toks = np.asarray(out)  # warm/compile
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(
                C.beam_generate(
                    trainable, frozen, ccfg, emb, max_length=max_len,
                    beam_size=k, policy=policy, decode_quant=quant,
                )
            )
        dt = (time.perf_counter() - t0) / reps
        return toks, dt

    for b in (32, 128):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        log(f"--- b={b}, beam={k}, len={max_len} ---")
        toks_sh, dt_sh = run(emb, b, "shift", skip=False)
        log(f"shift  full  : {dt_sh * 1000:8.1f} ms/batch = {b / dt_sh:7.1f} img/s")
        toks_oh, dt_oh = run(emb, b, "onehot", skip=False)
        log(
            f"onehot full  : {dt_oh * 1000:8.1f} ms/batch = "
            f"{b / dt_oh:7.1f} img/s  ({dt_sh / dt_oh:.2f}x shift)"
        )
        toks_sk, dt_sk = run(emb, b, "onehot", skip=True)
        log(
            f"onehot +skip : {dt_sk * 1000:8.1f} ms/batch = "
            f"{b / dt_sk:7.1f} img/s  ({dt_oh / dt_sk:.2f}x full, "
            f"{dt_sh / dt_sk:.2f}x shift)"
        )
        log(
            "token mismatches (expect 0): "
            f"oh-vs-shift {int((toks_sh != toks_oh).sum())}/{toks_sh.size}, "
            f"skip-vs-full {int((toks_sk != toks_oh).sum())}/{toks_oh.size}"
        )
        toks_q, dt_q = run(emb, b, "onehot", skip=True, quant=True)
        log(
            f"int8  +skip : {dt_q * 1000:8.1f} ms/batch = "
            f"{b / dt_q:7.1f} img/s  ({dt_sk / dt_q:.2f}x bf16-skip)"
        )
        log(
            "int8 token agreement vs bf16 (drift = quantization noise): "
            f"{float((toks_q == toks_sk).mean()):.3f}"
        )
        # re-anchor the slowest variant last so a mid-run transient can't
        # fake the ratios
        _, dt_sh2 = run(emb, b, "shift", skip=False)
        log(f"shift re-anchor: {dt_sh2 * 1000:8.1f} ms/batch = {b / dt_sh2:7.1f} img/s")

    log("done")


if __name__ == "__main__":
    main()
