"""On-chip decomposition of the beam-aware fused decode step (round 3).

Beam-4 at b=128 (= 512 decode rows) runs ~6.4 ms/step vs ~2.8 ms for the
greedy kernel at b=512 — 2.3x per row, all inside the kernel step (the
beam loop is a device-side lax.scan).  Three suspects, each isolable with
the kernel's independent mode flags:

  top-k      : beam mode's in-kernel per-row top-4 = 4 sequential masked
               argmaxes over every (bb, 512) vocab tile (~99 tiles) vs
               greedy's single running argmax.
  chunk depth: the ancestry gather keeps 2k-1 shifted chunk copies live, so
               beam mode halves the KV chunk depth (ct 4 -> 2 at 256-row
               blocks) — twice the DMA waits over the cache walk.
  gather     : _beam_gather itself = 2x(2k-1) = 14 VPU passes over each
               (ct, bb, 768) chunk (k and v).

Legs (512 rows, Tpad=80, idx walks 15..64 like real decode, in-jit 50-step
scan, tiny-slice outputs so the 472 MB caches never cross the tunnel):
  A  greedy default (ct=4)      — anchor
  A2 greedy chunk_t=2           — A->A2  = chunk-depth cost
  B  topk=4 chunk_t=2           — A2->B  = in-kernel top-k cost
  D  beam+topk default (ct=2)   — B->D   = ancestry-gather cost; D = production
  E  beam+topk chunk_t=4        — does ct=4 beam fit VMEM at bb=256?
  G  beam+emit_logits (+XLA     — hybrid: origin-map kernel, selection
     top-k tail, timed apart)     outside (untried: round-2's XLA beam path
                                  also paid the per-step cache gather)

v1 note: leg "topk=4 no beam at ct=4 (bb=256)" failed remote compile —
untested mode combo in production (beam always halves ct); dropped.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/beam_step_decomp.py \
      > /tmp/beam_step_decomp.log 2>&1 < /dev/null & disown
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
    origin0 = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[None, :], (tpad, b))

    def time_loop(name, step_fn, uses_origin):
        """step_fn(kc, vc, idx[, origin]) -> (kc, vc); scan idx p_len..p_len+steps."""

        def body(carry, i):
            if uses_origin:
                kc, vc, og = carry
                kc, vc = step_fn(kc, vc, p_len + i, og)
                return (kc, vc, og), None
            kc, vc = carry
            kc, vc = step_fn(kc, vc, p_len + i)
            return (kc, vc), None

        def run(kc, vc):
            init = (kc, vc, origin0) if uses_origin else (kc, vc)
            out, _ = jax.lax.scan(body, init, jnp.arange(steps))
            # tiny slices only: pulling the (12, 80, 512, 768) caches over
            # the tunnel would dominate the timing (v1 mistake)
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

    common = dict(n_head=12, vocab=gcfg.vocab_size, eps=1e-5)

    def mk(**kw):
        uses_origin = "beam" in kw and kw.pop("beam")

        def f(kc, vc, idx, og=None):
            extra = dict(kw)
            if uses_origin:
                extra.update(origin=og, beam_k=k)
            out = DS.fused_decode_step(packed, x0, kc, vc, idx, **common, **extra)
            return out[-2], out[-1]

        return f, uses_origin

    log(f"kernel step decomposition, {b} rows, Tpad={tpad}, idx 15..64:")
    legs = [
        ("A  greedy (anchor, ct=4)", mk()),
        ("A2 greedy ct=2", mk(chunk_t=2)),
        ("B  topk=4 ct=2", mk(topk=k, chunk_t=2)),
        ("D  beam+topk (production, ct=2)", mk(topk=k, beam=True)),
        ("E  beam+topk chunk_t=4", mk(topk=k, beam=True, chunk_t=4)),
        ("G  beam+emit_logits", mk(emit_logits=True, beam=True)),
    ]
    res = {}
    for name, (fn, uo) in legs:
        res[name.split()[0]] = time_loop(name, fn, uo)

    # G's honest total adds the XLA top-k tail on the emitted logits
    def tail_loop(lg):
        from gpt2_image_captioning_tpu.ops.sampling import topk_small

        def body(c, _):
            lf = (lg + c * 0.0).astype(jnp.float32)
            vals, idxs = topk_small(lf, k)
            lse = jax.nn.logsumexp(lf, axis=-1, keepdims=True)
            return c + vals.sum() * 0.0 + 1.0, None

        out, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(steps))
        return out

    lg = jnp.asarray(rng.normal(size=(b, gcfg.vocab_size)), jnp.float32)
    jt = jax.jit(tail_loop)
    np.asarray(jt(lg))
    t0 = time.perf_counter()
    np.asarray(jt(lg))
    tail_ms = (time.perf_counter() - t0) / steps * 1000
    log(f"  XLA top-k tail on (512, 50257)        {tail_ms:7.3f} ms/step")
    if res.get("G") is not None:
        log(f"  G + tail total                     {res['G'] + tail_ms:7.3f} ms/step")
    log("done")


if __name__ == "__main__":
    main()
