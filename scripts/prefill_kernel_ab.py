"""On-chip A/B for the fused whole-prefill kernel (ops/prefill_step.py).

Legs:
  parity  — kernel logits + cache rows vs forward_cached(fresh_prefill=True)
  B       — current XLA prefill (slab scan), in-jit N-rep          [ms/iter]
  K       — fused prefill kernel (prefill_into_cache), in-jit N-rep [ms/iter]
  E2E     — full generate() serving batch (b=128, 50 tokens, greedy bf16)
            with the fused prefill ON vs OFF (GIC_DISABLE_FUSED_PREFILL)
  BEAM    — beam_generate (b=128, k=4) ON vs OFF

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/prefill_kernel_ab.py \
      > /tmp/prefill_kernel_ab.log 2>&1 < /dev/null & disown
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


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.ops import decode_step as DS
    from gpt2_image_captioning_tpu.ops import prefill_step as PS

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    gpt_params = C._gpt(trainable, frozen)

    b, p_len, max_len = 128, 15, 50
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
    prefix_const = jnp.asarray(
        rng.normal(size=(b, p_len, 768)).astype(np.float32)
    ).astype(policy.compute_dtype)

    def nloop(step):
        def run(*arrays):
            def body(c, _):
                return step(c, *arrays), None

            out, _ = jax.lax.scan(body, jnp.float32(0), None, length=N)
            return out

        return jax.jit(run)

    def timed(jitted, *args):
        np.asarray(jitted(*args))
        t0 = time.perf_counter()
        np.asarray(jitted(*args))
        np.asarray(jitted(*args))
        return (time.perf_counter() - t0) / 2 / N * 1000

    # ---- parity on-chip ---------------------------------------------------
    def cur_prefill(gp, px):
        cache = G.init_cache(gcfg, b, p_len + max_len, dtype=policy.compute_dtype)
        return G.forward_cached(gp, gcfg, px, cache, policy, fresh_prefill=True)

    def ker_prefill(gp, packed, px):
        cache = G.init_cache(gcfg, b, p_len + max_len, dtype=policy.compute_dtype)
        return PS.prefill_into_cache(packed, gp, gcfg, px, cache, policy)

    packed = jax.jit(
        lambda gp: DS.pack_decode_weights(gp, policy.compute_dtype)
    )(gpt_params)
    log("compiling parity legs...")
    lg_a, cache_a = jax.jit(cur_prefill)(gpt_params, prefix_const)
    lg_k, cache_k = jax.jit(ker_prefill)(gpt_params, packed, prefix_const)
    dl = float(np.abs(np.asarray(lg_a) - np.asarray(lg_k)).max())
    dk = float(
        np.abs(
            np.asarray(cache_a["k"][:, :p_len]).astype(np.float32)
            - np.asarray(cache_k["k"][:, :p_len]).astype(np.float32)
        ).max()
    )
    dv = float(
        np.abs(
            np.asarray(cache_a["v"][:, :p_len]).astype(np.float32)
            - np.asarray(cache_k["v"][:, :p_len]).astype(np.float32)
        ).max()
    )
    am_a = np.asarray(jnp.argmax(lg_a, -1))
    am_k = np.asarray(jnp.argmax(lg_k, -1))
    log(f"parity: max|Δlogits|={dl:.3e} max|Δk|={dk:.3e} max|Δv|={dv:.3e} "
        f"argmax match {int((am_a == am_k).sum())}/{b}")

    # ---- isolated timing --------------------------------------------------
    def s_cur(c, gp, px):
        lg, c2 = cur_prefill(gp, px + c.astype(px.dtype))
        return lg[0, 0] + c2["k"][0, 0, 0, 0].astype(jnp.float32)

    def s_ker(c, gp, pk, px):
        lg, c2 = ker_prefill(gp, pk, px + c.astype(px.dtype))
        return lg[0, 0] + c2["k"][0, 0, 0, 0].astype(jnp.float32)

    log(f"B prefill XLA current  : {timed(nloop(s_cur), gpt_params, prefix_const):7.3f} ms/iter")
    log(f"K prefill fused kernel : {timed(nloop(s_ker), gpt_params, packed, prefix_const):7.3f} ms/iter")

    # ---- end-to-end generate ----------------------------------------------
    def e2e(tag):
        C.generate.clear_cache()
        f = lambda: np.asarray(  # noqa: E731
            C.generate(
                trainable, frozen, ccfg, emb, max_length=max_len,
                temperature=0.0, policy=policy,
            )
        )
        f()
        t0 = time.perf_counter()
        for _ in range(5):
            f()
        ms = (time.perf_counter() - t0) / 5 * 1000
        log(f"E2E greedy b={b} {tag:28s}: {ms:7.2f} ms/batch  "
            f"({b / ms * 1000:7.1f} img/s)")
        return ms

    def e2e_beam(tag):
        C.beam_generate.clear_cache()
        f = lambda: np.asarray(  # noqa: E731
            C.beam_generate(
                trainable, frozen, ccfg, emb, max_length=max_len,
                beam_size=4, policy=policy,
            )
        )
        f()
        t0 = time.perf_counter()
        for _ in range(3):
            f()
        ms = (time.perf_counter() - t0) / 3 * 1000
        log(f"BEAM4  b={b} {tag:28s}: {ms:7.2f} ms/batch  "
            f"({b / ms * 1000:7.1f} img/s)")
        return ms

    os.environ.pop("GIC_DISABLE_FUSED_PREFILL", None)
    on = e2e("fused prefill ON")
    os.environ["GIC_DISABLE_FUSED_PREFILL"] = "1"
    off = e2e("fused prefill OFF")
    log(f"E2E delta: {off - on:+.2f} ms/batch ({(off / on - 1) * 100:+.1f}% speedup)")

    os.environ.pop("GIC_DISABLE_FUSED_PREFILL", None)
    bon = e2e_beam("fused prefill ON")
    os.environ["GIC_DISABLE_FUSED_PREFILL"] = "1"
    boff = e2e_beam("fused prefill OFF")
    log(f"BEAM delta: {boff - bon:+.2f} ms/batch ({(boff / bon - 1) * 100:+.1f}% speedup)")
    log("done")


if __name__ == "__main__":
    main()
