"""On-chip prefill decomposition, round 3 (VERDICT item 5).

Round-2 numbers (scripts/prefill_ab.py, PERF_NOTES "Round-2 correction"):
prefill phase ≈ 9 ms at b=128 ≈ 1.6× its combined floor.  Hypothesis: the
``lax.scan`` prefill carries each layer's FULL padded (Tpad, B, D) cache
slab through the loop and restacks it into the stacked ys — ~300 MB of
HBM traffic to write 15 valid rows (~28 MB).  Candidate fix measured here:
a fresh-prefill scan that emits only the new (T, B, D) rows per layer and
performs ONE dynamic_update_slice into the (L, Tpad, B, D) cache outside
the loop.

All timings are in-jit N-rep scan loops with a scalar output (the only
device-true method over this tunnel — CLAUDE.md rules).

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/prefill_ab2.py \
      > /tmp/prefill_ab2.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.ops import nn
    from gpt2_image_captioning_tpu.ops.attention import mha

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

    # A. mapper alone
    def s_mapper(c, tr, e):
        px = C.build_prefix(tr, ccfg, e + c, policy)
        return px[0, 0, 0].astype(jnp.float32)

    log(f"A mapper (build_prefix)          : {timed(nloop(s_mapper), trainable, emb):7.3f} ms/iter")

    # B. current prefill (scan carries full cache slabs)
    def s_prefill_cur(c, gp, px):
        cache = G.init_cache(gcfg, b, p_len + max_len, dtype=policy.compute_dtype)
        logits, cache2 = G.forward_cached(
            gp, gcfg, px + c.astype(px.dtype), cache, policy, fresh_prefill=True
        )
        return logits[0, 0] + cache2["k"][0, 0, 0, 0].astype(jnp.float32)

    log(f"B prefill current (slab scan)    : {timed(nloop(s_prefill_cur), gpt_params, prefix_const):7.3f} ms/iter")

    # C. candidate: scan emits only new rows; one cache write outside
    def s_prefill_rows(c, gp, px):
        x = px + c.astype(px.dtype)
        pos = gp["wpe"][:p_len].astype(jnp.float32)
        x = (x.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

        def body(x, bp):
            h = nn.layer_norm(bp["ln_1"], x, gcfg.layer_norm_epsilon)
            qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
            q3, k3, v3 = jnp.split(qkv, 3, axis=-1)
            a4 = mha(
                nn.split_heads(q3, gcfg.n_head),
                nn.split_heads(k3, gcfg.n_head),
                nn.split_heads(v3, gcfg.n_head),
                causal=True,
                policy=policy,
            )
            a = nn.merge_heads(a4)
            x = x + nn.dense(bp["attn"]["c_proj"], a, policy)
            h2 = nn.layer_norm(bp["ln_2"], x, gcfg.layer_norm_epsilon)
            h2 = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h2, policy))
            x = x + nn.dense(bp["mlp"]["c_proj"], h2, policy)
            return x, (
                k3.transpose(1, 0, 2).astype(policy.compute_dtype),
                v3.transpose(1, 0, 2).astype(policy.compute_dtype),
            )

        x, (k_rows, v_rows) = jax.lax.scan(body, x, gp["blocks"])
        cache = G.init_cache(gcfg, b, p_len + max_len, dtype=policy.compute_dtype)
        new_k = jax.lax.dynamic_update_slice(cache["k"], k_rows, (0, 0, 0, 0))
        new_v = jax.lax.dynamic_update_slice(cache["v"], v_rows, (0, 0, 0, 0))
        xl = nn.layer_norm(gp["ln_f"], x[:, -1:, :], gcfg.layer_norm_epsilon)
        logits = jnp.dot(
            policy.cast(xl[:, 0, :]),
            gp["wte"].T.astype(policy.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return logits[0, 0] + new_k[0, 0, 0, 0].astype(jnp.float32) + new_v[0, 0, 0, 0].astype(jnp.float32)

    log(f"C prefill rows-scan + one write  : {timed(nloop(s_prefill_rows), gpt_params, prefix_const):7.3f} ms/iter")

    # D. numerics: candidate logits + written cache rows == current path
    def rows_outputs(gp, px):
        x = px
        pos = gp["wpe"][:p_len].astype(jnp.float32)
        x = (x.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

        def body(x, bp):
            h = nn.layer_norm(bp["ln_1"], x, gcfg.layer_norm_epsilon)
            qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
            q3, k3, v3 = jnp.split(qkv, 3, axis=-1)
            a4 = mha(
                nn.split_heads(q3, gcfg.n_head),
                nn.split_heads(k3, gcfg.n_head),
                nn.split_heads(v3, gcfg.n_head),
                causal=True,
                policy=policy,
            )
            a = nn.merge_heads(a4)
            x = x + nn.dense(bp["attn"]["c_proj"], a, policy)
            h2 = nn.layer_norm(bp["ln_2"], x, gcfg.layer_norm_epsilon)
            h2 = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h2, policy))
            x = x + nn.dense(bp["mlp"]["c_proj"], h2, policy)
            return x, (
                k3.transpose(1, 0, 2).astype(policy.compute_dtype),
                v3.transpose(1, 0, 2).astype(policy.compute_dtype),
            )

        x, (k_rows, v_rows) = jax.lax.scan(body, x, gp["blocks"])
        xl = nn.layer_norm(gp["ln_f"], x[:, -1:, :], gcfg.layer_norm_epsilon)
        logits = jnp.dot(
            policy.cast(xl[:, 0, :]),
            gp["wte"].T.astype(policy.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        return logits, k_rows, v_rows

    log("checking parity of candidate vs current...")
    cache0 = G.init_cache(gcfg, b, p_len + max_len, dtype=policy.compute_dtype)
    lg_cur, cache_cur = jax.jit(
        lambda gp, px, cc: G.forward_cached(gp, gcfg, px, cc, policy, fresh_prefill=True)
    )(gpt_params, prefix_const, cache0)
    lg_new, k_rows, v_rows = jax.jit(rows_outputs)(gpt_params, prefix_const)
    dl = float(np.abs(np.asarray(lg_cur) - np.asarray(lg_new)).max())
    dk = float(
        np.abs(
            np.asarray(cache_cur["k"][:, :p_len]).astype(np.float32)
            - np.asarray(k_rows).astype(np.float32)
        ).max()
    )
    dv = float(
        np.abs(
            np.asarray(cache_cur["v"][:, :p_len]).astype(np.float32)
            - np.asarray(v_rows).astype(np.float32)
        ).max()
    )
    log(f"max |Δlogits|={dl:.3e}  max |Δk|={dk:.3e}  max |Δv|={dv:.3e}")
    log("done")


if __name__ == "__main__":
    main()
