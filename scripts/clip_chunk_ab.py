"""A/B: amortizing the encode dispatch — per-256 calls vs one chunked program.

bench.py's CLIP leg (8 × b=256 jit calls, pipelined, sync at end) measured
5,985 img/s vs the 9,190 device-true rate (scripts/clip_encode_ab.py): the
per-dispatch tunnel overhead (~24 ms staging+fetch per call on this box) is
not fully hidden by an 8-deep pipeline of 27.9 ms programs.  Candidate fix:
encode C chunks per dispatch — ONE program scans over a (C, b, 3, S, S)
pixel block so the fixed dispatch cost amortizes over C·b images instead
of b.  A flat (C·b,) megabatch is the other shape of the same idea.

Legs (synthetic device-resident pixels, exactly like the bench leg):
  A  per-256 jit calls, 8-deep pipeline (current bench leg — control)
  B  scan-chunked (8, 256) per dispatch, 2 dispatches pipelined
  C  flat b=2048 single call, 2 dispatches pipelined
  D  scan-chunked (4, 256), 4 dispatches pipelined (smaller staging block)

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/clip_chunk_ab.py \
      > /tmp/clip_chunk_ab.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.models import clip as CL

    assert jax.default_backend() != "cpu"
    policy = BF16
    vcfg = CL.CLIPVisionConfig.vit_b32()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
    )

    @jax.jit
    def encode(p, px):
        return CL.encode_image(p, vcfg, px, policy=policy, normalize=True)

    @jax.jit
    def encode_chunked(p, px_chunks):  # (C, b, 3, S, S) -> (C, b, D)
        def body(_, px):
            return None, CL.encode_image(p, vcfg, px, policy=policy, normalize=True)

        _, out = jax.lax.scan(body, None, px_chunks)
        return out

    rng = np.random.default_rng(1)
    total = 2048  # images per timed rep in every leg

    def pipelined(fn, args_list, n_img, reps=3):
        """Dispatch all calls back to back, sync at the end (bench-style)."""
        for a in args_list:  # compile + warm
            np.asarray(fn(*a))
        best = 0.0
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(*a) for a in args_list]
            for o in outs:
                np.asarray(o)
            rate = n_img / (time.perf_counter() - t0)
            best = max(best, rate)
        return best

    # A: control — 8 × b=256 calls
    px256 = [
        jnp.asarray(rng.normal(size=(256, 3, 224, 224)).astype(np.float32)).astype(
            jnp.bfloat16
        )
        for _ in range(8)
    ]
    a = pipelined(encode, [(params, p) for p in px256], total)
    log(f"A per-256 x8 pipelined      : {a:8.1f} img/s")

    # B: scan-chunked (8, 256) — 2 dispatches of 2048
    blocks = [
        jnp.stack(px256), jnp.stack(px256[::-1])
    ]  # (8, 256, 3, 224, 224) each
    b = pipelined(encode_chunked, [(params, blk) for blk in blocks], 2 * total)
    log(f"B scan(8,256) x2 pipelined  : {b:8.1f} img/s")

    # C: flat 2048 — 2 dispatches
    flat = [blk.reshape(2048, 3, 224, 224) for blk in blocks]
    c = pipelined(encode, [(params, f) for f in flat], 2 * total)
    log(f"C flat-2048 x2 pipelined    : {c:8.1f} img/s")

    # D: scan-chunked (4, 256) — 4 dispatches (half-size staging blocks)
    quads = [jnp.stack(px256[:4]), jnp.stack(px256[4:]),
             jnp.stack(px256[1:5]), jnp.stack(px256[3:7])]
    d = pipelined(encode_chunked, [(params, q) for q in quads], 2 * total)
    log(f"D scan(4,256) x4 pipelined  : {d:8.1f} img/s")

    # sanity: chunked == per-call numerics
    ref = np.asarray(encode(params, px256[0]))
    chk = np.asarray(encode_chunked(params, jnp.stack(px256))[0])
    log(f"max |chunked - percall| = {np.abs(ref - chk).max():.3e}")
    log("done")


if __name__ == "__main__":
    main()
