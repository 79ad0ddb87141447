"""On-chip decomposition of the beam-search step's bookkeeping.

Times each component with in-jit N-rep scan loops (scalar output, one sync)
— the only reliable method on this box (see PERF_NOTES "Round-2 correction").
All device arrays are passed as jit ARGUMENTS (closure constants would force
a device->host copy at lowering over the tunnel — CLAUDE.md rule 2).

Components at the flagship beam shape (b=32, beam=4 -> 128 rows, V=50257):
  1. log_softmax over (128, V)
  2. lax.top_k((32, k*V), 4)           <- suspected dominant cost
  3. 4 sequential masked argmaxes over the same flat candidates
  4. KV-cache gather along beams (L=12, T=65, 128, 768) bf16 x2
  5. emit_logits reassembly: moveaxis((99, 128, 512)) + reshape

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/beam_ab.py \
      > /tmp/beam_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N = 10


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(jitted, *args):
    import numpy as np

    np.asarray(jitted(*args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(jitted(*args))
    np.asarray(jitted(*args))
    return (time.perf_counter() - t0) / 2 / N * 1000


def main() -> None:
    import jax
    import jax.numpy as jnp

    assert jax.default_backend() != "cpu"
    b, k, v = 32, 4, 50257
    L, T, d = 12, 65, 768
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b * k, v)).astype(np.float32))
    kcache = jnp.asarray(rng.normal(size=(L, T, b * k, d)), jnp.bfloat16)
    parent = jnp.asarray(rng.integers(0, k, size=(b, k)).astype(np.int32))
    tiles = jnp.asarray(rng.normal(size=(99, b * k, 512)).astype(np.float32))

    def nloop(step):
        """jit(fn)(arrays...) scanning `step` N times with a f32 carry."""

        def run(*arrays):
            def body(c, _):
                return step(c, *arrays), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return out

        return jax.jit(run)

    # 1. log_softmax
    def s_ls(c, lg):
        lp = jax.nn.log_softmax(lg + c, axis=-1)
        return lp[0, 0]

    log(f"1 log_softmax (128, 50257)        : {timed(nloop(s_ls), logits):7.3f} ms/iter")

    # 2. lax.top_k over flat candidates
    flat = logits.reshape(b, k * v)

    def s_topk(c, fl):
        vals, idx = jax.lax.top_k(fl + c, k)
        return vals[0, 0] + idx[0, 0].astype(jnp.float32)

    log(f"2 lax.top_k((32, 201k), 4)        : {timed(nloop(s_topk), flat):7.3f} ms/iter")

    # 3. sequential masked argmax x4
    def s_seq(c, fl):
        x = fl + c
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        acc = jnp.float32(0)
        for _ in range(k):
            i = jnp.argmax(x, axis=-1).astype(jnp.int32)
            val = jnp.take_along_axis(x, i[:, None], axis=-1)
            acc = acc + val[0, 0] + i[0].astype(jnp.float32)
            x = jnp.where(col == i[:, None], jnp.float32(-1e30), x)
        return acc

    log(f"3 4x masked argmax ((32, 201k))   : {timed(nloop(s_seq), flat):7.3f} ms/iter")

    # 4. cache gather along beams (k and v caches both gather each step)
    flat_parent = (jnp.arange(b)[:, None] * k + parent).reshape(-1)

    def s_gather(c, kc, fp):
        g = kc[:, :, fp]
        g2 = g[:, :, fp]  # second gather chained so XLA can't CSE it away
        return g2[0, 0, 0, 0].astype(jnp.float32) + c

    log(
        f"4 KV gather 2x (12,65,128,768)bf16: {timed(nloop(s_gather), kcache, flat_parent):7.3f} ms/iter"
    )

    # 5. logits tile reassembly
    def s_move(c, tl):
        out = jnp.moveaxis(tl + c, 0, 1).reshape(b * k, 99 * 512)[:, :v]
        return out[0, 0]

    log(f"5 moveaxis (99,128,512)->(128,V)  : {timed(nloop(s_move), tiles):7.3f} ms/iter")

    log("done")


if __name__ == "__main__":
    main()
