"""Micro-floor for the prefill/mapper dense chains (round 3).

prefill_decomp.py showed the FLAT 2D skeletons (pure dense+LN chains, no
attention) run ~4.6 ms vs a ~1.85 ms MXU floor.  Three suspects:
(a) the dots themselves underperform at these shapes,
(b) the f32 accumulate outputs round-trip HBM at 2x bytes before the cast,
(c) the bias/LN/activation elementwise passes between dots don't fuse.

Variants (8-layer mapper-shaped chain on (3200, 768)):
  1. dots only, bf16 accumulation     — raw MXU + bf16 write traffic
  2. dots only, f32 accum + cast      — adds the f32 epilogue traffic
  3. dots + bias + relu (no LN)       — adds fused-able elementwise
  4. full skeleton (LN, bias, relu)   — reference point from decomp

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/prefill_mm_floor.py \
      > /tmp/prefill_mm_floor.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 10


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops import nn

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    mp = trainable["mapping"]

    rows = 128 * 25

    def nloop(step):
        def run(*arrays):
            def body(c, _):
                return step(c, *arrays), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return out

        return jax.jit(run)

    def timed(name, step, *args):
        j = nloop(step)
        np.asarray(j(*args))
        t0 = time.perf_counter()
        np.asarray(j(*args))
        np.asarray(j(*args))
        ms = (time.perf_counter() - t0) / 2 / N * 1000
        log(f"{name:44s}: {ms:7.3f} ms/iter")
        return ms

    gflop = 8 * (
        2 * rows * 768 * 2304 + 2 * rows * 768 * 768 + 2 * 2 * rows * 768 * 3072
    ) / 1e9
    log(f"chain FLOPs: {gflop:.0f} GFLOP (floor at 197 TFLOP/s = {gflop / 197:.2f} ms)")

    def chain(c, mp, *, accum, bias, ln, act):
        pet = jnp.float32 if accum == "f32" else jnp.bfloat16

        def dot(x, p):
            y = jnp.dot(x, p["w"].astype(jnp.bfloat16), preferred_element_type=pet)
            if bias:
                y = y + p["b"].astype(pet)
            return y.astype(jnp.bfloat16)

        h = jnp.zeros((rows, 768), jnp.bfloat16) + c.astype(jnp.bfloat16)
        for lp in mp["layers"]:
            hh = nn.layer_norm(lp["ln1"], h, mcfg.layer_norm_eps) if ln else h
            qkv = dot(hh, lp["attn"]["in_proj"])
            h = h + dot(qkv[:, :768], lp["attn"]["out_proj"])
            hh = nn.layer_norm(lp["ln2"], h, mcfg.layer_norm_eps) if ln else h
            hh = dot(hh, lp["fc1"])
            if act:
                hh = jnp.maximum(hh, 0)
            h = h + dot(hh, lp["fc2"])
        return h[0, 0].astype(jnp.float32)

    timed("1 dots only, bf16 accum", functools.partial(chain, accum="bf16", bias=False, ln=False, act=False), mp)
    timed("2 dots only, f32 accum + cast", functools.partial(chain, accum="f32", bias=False, ln=False, act=False), mp)
    timed("3 dots + bias + relu (no LN)", functools.partial(chain, accum="f32", bias=True, ln=False, act=True), mp)
    timed("4 full skeleton (LN, bias, relu)", functools.partial(chain, accum="f32", bias=True, ln=True, act=True), mp)

    # row scaling: if the chain is FLOP/BW-bound, 4x rows => ~4x time; a
    # sub-linear curve means fixed per-dot cost (pipeline fill/drain at
    # small M) dominates — which no hand kernel on the same MXU removes
    def chain_rows(c, mp, r):
        def dot(x, p):
            return jnp.dot(
                x, p["w"].astype(jnp.bfloat16), preferred_element_type=jnp.bfloat16
            )

        h = jnp.zeros((r, 768), jnp.bfloat16) + c.astype(jnp.bfloat16)
        for lp in mp["layers"]:
            qkv = dot(h, lp["attn"]["in_proj"])
            h = h + dot(qkv[:, :768], lp["attn"]["out_proj"])
            hh = dot(h, lp["fc1"])
            h = h + dot(hh, lp["fc2"])
        return h[0, 0].astype(jnp.float32)

    for r in (800, 1600, 3200, 6400, 12800):
        timed(f"dots-only bf16, rows={r}", functools.partial(chain_rows, r=r), mp)
    log("done")


if __name__ == "__main__":
    main()
