"""On-chip A/B of the three beam ancestry-gather implementations.

scripts/beam_step_decomp.py isolated the whole beam premium to
`_beam_gather` (+3.05 ms of the 5.72 ms beam step at 512 rows): 2x(2k-1)
= 14 VPU shifted-copy passes per (ct, bb, 768) chunk ~ 5.3 GB of VMEM
relayout traffic per step.  Two alternatives, same semantics (exact row
copies — interpret-mode equality tested in
tests/test_kernels.py::test_fused_decode_step_origin_indirection_matches_gather):

  shift        2x(2k-1) statically shifted copies + masked select (current)
  fused_shift  one (2k-1)-shift pass over the lane-concatenated [k|v]
               chunk — same bytes, half the relayout dispatches
  onehot       per-t (bb, bb) one-hot permutation matmuls on the MXU —
               the weight stream is HBM-bound, so MXU slots are idle

Protocol: same as beam_step_decomp.py (512 rows, Tpad=80, idx 15..64,
in-jit 50-step scan, tiny-slice outputs), one session so transients
cancel.  D-shift re-anchors against the 5.717 ms from the decomp run.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/beam_gather_ab.py \
      > /tmp/beam_gather_ab.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.ops import decode_step as DS

    assert jax.default_backend() != "cpu", "run on the TPU"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init 124M params (bf16)...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    packed = C.prepare_decode_weights(trainable, frozen, ccfg, policy=policy, tw=384)

    b, k, d = 512, 4, 768
    tpad, p_len, steps = 80, 15, 50
    rng = np.random.default_rng(0)
    k0 = jnp.asarray(rng.normal(size=(12, tpad, b, d)), jnp.bfloat16)
    v0 = jnp.asarray(rng.normal(size=(12, tpad, b, d)), jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(b, d)), jnp.bfloat16)
    # adversarial ancestry: every row reads a RANDOM beam of its group at
    # every position (worst case for any gather implementation; identity
    # origins would flatter select-based ones)
    base = (np.arange(b) // k * k)[None, :]
    origin0 = jnp.asarray(
        base + np.random.default_rng(1).integers(0, k, size=(tpad, b)), jnp.int32
    )

    def time_loop(name, gather_mode):
        def body(carry, i):
            kc, vc = carry
            out = DS.fused_decode_step(
                packed, x0, kc, vc, p_len + i,
                n_head=12, vocab=gcfg.vocab_size, eps=1e-5,
                origin=origin0, beam_k=k, topk=k, beam_gather=gather_mode,
            )
            return (out[-2], out[-1]), None

        def run(kc, vc):
            out, _ = jax.lax.scan(body, (kc, vc), jnp.arange(steps))
            return out[0][0, -1, 0, :8], out[1][0, -1, 0, :8]

        j = jax.jit(run)
        try:
            np.asarray(j(k0, v0)[0])  # compile + warm
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = j(k0, v0)
            np.asarray(out[0])
            ms = (time.perf_counter() - t0) / reps / steps * 1000
            log(f"  {name:34s} {ms:7.3f} ms/step  ({ms * steps:6.1f} ms/50)")
            return ms
        except Exception as e:  # noqa: BLE001
            log(f"  {name:34s} FAILED {type(e).__name__}: {str(e)[:160]}")
            return None

    log(f"beam gather A/B, {b} rows, beam_k={k}, Tpad={tpad}, idx 15..64:")
    res = {}
    for mode in ("shift", "fused_shift", "onehot", "shift"):
        tag = f"beam+topk gather={mode}"
        r = time_loop(tag, mode)
        res.setdefault(mode, r)
    log("done")


if __name__ == "__main__":
    main()
