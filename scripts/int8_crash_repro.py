"""Root-cause probe for the BENCH_r03 int8 INTERNAL crash.

BENCH_r03 died at `bench.py:134` (first dispatch of the int8 W8A8 greedy
decode) with `jax.errors.JaxRuntimeError: INTERNAL: TPU backend error`,
AFTER the in-kernel-sampled leg ran in the same process.  int8 passed in
BENCH_r02 and in the mid-round r3 session — the suspects are (a) a
tunnel/backend transient (CLAUDE.md rule 7 class), (b) an interaction with
the in-kernel-sample leg that r3 newly ran *before* int8 in the same
process (its speculative-accept vocab walk raised VMEM watermarks,
docs/PERF_NOTES.md round 3).

This script replays the EXACT r3 leg sequence — greedy → sampled →
in-kernel-sampled → int8, same shapes, same order, one process — then
re-alternates [in-kernel-sampled, int8] ``--trials`` more times.  If the
crash is the in-kernel-sample interaction it should reproduce here; if all
trials pass on a cool box the transient verdict stands (and the bench's
per-leg retry-after-cooldown is the right mitigation).

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/int8_crash_repro.py \
      > /tmp/int8_crash_repro.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    assert jax.default_backend() != "cpu", "run on the TPU"
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
    skey = jax.random.PRNGKey(7)
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy)

    def run(name, fn, reps=8):
        log(f"{name}: compile")
        np.asarray(fn())
        np.asarray(fn())
        t0 = time.perf_counter()
        outs = [fn() for _ in range(reps)]
        for o in outs:
            np.asarray(o)
        log(f"{name}: {batch * reps / (time.perf_counter() - t0):.0f} img/s OK")

    def greedy():
        return C.generate(trainable, frozen, ccfg, emb, max_length=max_len,
                          temperature=0.0, top_p=1.0, policy=policy, packed=packed)

    def sampled():
        return C.generate(trainable, frozen, ccfg, emb, max_length=max_len,
                          temperature=1.0, top_p=0.9, rng=skey, policy=policy,
                          packed=packed)

    def sampled_sk():
        return C.generate(trainable, frozen, ccfg, emb, max_length=max_len,
                          temperature=1.0, top_p=0.9, rng=skey, policy=policy,
                          packed=packed, sample_in_kernel=True)

    log(f"device: {jax.devices()[0]}  (exact BENCH_r03 leg order)")
    run("greedy", greedy)
    run("sampled", sampled)
    run("sampled_in_kernel", sampled_sk)

    failures = 0
    for trial in range(args.trials):
        # fresh packing each trial (r3 crashed on the first int8 dispatch
        # right after prepare_decode_weights; keep that step in the loop)
        packed8 = C.prepare_decode_weights(
            trainable, frozen, ccfg, policy=policy, quant=True
        )

        def int8():
            return C.generate(trainable, frozen, ccfg, emb, max_length=max_len,
                              temperature=0.0, top_p=1.0, policy=policy,
                              packed=packed8, decode_quant=True)

        try:
            run(f"int8 trial {trial + 1}/{args.trials}", int8)
        except Exception as e:  # noqa: BLE001
            failures += 1
            log(f"int8 trial {trial + 1} FAILED: {type(e).__name__}: {e}")
            log("cooling 240s before continuing")
            time.sleep(240)
        if trial + 1 < args.trials:
            run(f"interleave sampled_in_kernel {trial + 1}", sampled_sk, reps=4)

    log(f"done: {failures}/{args.trials} int8 trials failed")
    if failures == 0:
        log("verdict: does NOT reproduce after the in-kernel-sample leg -> "
            "BENCH_r03 crash consistent with a backend/tunnel transient; "
            "bench.py's per-leg retry-after-cooldown is the mitigation")


if __name__ == "__main__":
    main()
