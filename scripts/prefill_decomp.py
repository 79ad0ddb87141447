"""On-chip decomposition of the prefill-phase cost (round 3, VERDICT item 5).

scripts/prefill_ab2.py established: mapper 5.67 ms + prefill 6.20 ms at
b=128, and the rows-scan candidate == the slab scan (6.10) — so the scan's
cache-slab restacking is NOT the cost (XLA elides it).  Combined matmul
floor is ~3.6 ms, so ~8 ms is layout/elementwise/attention overhead.  This
script bisects each phase: attention removed, layernorms removed, logits
removed, flattened matmul-only skeletons — to find where the time goes and
whether a hand kernel could plausibly reach the floor.

All timings are in-jit N-rep scan loops with a scalar output (CLAUDE.md).

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/prefill_decomp.py \
      > /tmp/prefill_decomp.log 2>&1 < /dev/null & disown
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
    mp = trainable["mapping"]

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

    def timed(name, step, *args):
        j = nloop(step)
        np.asarray(j(*args))
        t0 = time.perf_counter()
        np.asarray(j(*args))
        np.asarray(j(*args))
        ms = (time.perf_counter() - t0) / 2 / N * 1000
        log(f"{name:42s}: {ms:7.3f} ms/iter")
        return ms

    # ---------------- mapper bisection ----------------
    def enc_layer(lp, h, *, attn=True, lns=True):
        x = h
        hh = nn.layer_norm(lp["ln1"], x, mcfg.layer_norm_eps) if lns else x
        qkv = nn.dense(lp["attn"]["in_proj"], hh, policy)
        q, k, v = (nn.split_heads(t, mcfg.num_heads) for t in jnp.split(qkv, 3, axis=-1))
        a = mha(q, k, v, causal=False, policy=policy) if attn else q
        x = x + nn.dense(lp["attn"]["out_proj"], nn.merge_heads(a), policy)
        hh = nn.layer_norm(lp["ln2"], x, mcfg.layer_norm_eps) if lns else x
        hh = jnp.maximum(nn.dense(lp["fc1"], hh, policy), 0)
        return x + nn.dense(lp["fc2"], hh, policy)

    def mapper_variant(c, mp, e, *, attn=True, lns=True):
        x = e + c
        img = nn.dense(mp["linear"], x, policy).reshape(b, mcfg.hidden_length, 768)
        pre = jnp.broadcast_to(
            mp["prefix_const"].astype(policy.compute_dtype), (b, mcfg.prefix_length, 768)
        )
        h = jnp.concatenate([img, pre], axis=1)
        for lp in mp["layers"]:
            h = enc_layer(lp, h, attn=attn, lns=lns)
        return h[0, -1, 0].astype(jnp.float32)

    import functools

    timed("M full", functools.partial(mapper_variant, attn=True, lns=True), mp, emb)
    timed("M no-attention (a=q)", functools.partial(mapper_variant, attn=False, lns=True), mp, emb)
    timed("M no-attn no-LN", functools.partial(mapper_variant, attn=False, lns=False), mp, emb)

    # flattened matmul skeleton: same dense chain on (b*25, d) 2D — the
    # pure-MXU + VPU floor a fused mapper kernel would target
    seq = mcfg.hidden_length + mcfg.prefix_length

    def mapper_flat(c, mp, e):
        h = jnp.zeros((b * seq, 768), policy.compute_dtype) + c.astype(policy.compute_dtype)
        for lp in mp["layers"]:
            hh = nn.layer_norm(lp["ln1"], h, mcfg.layer_norm_eps)
            qkv = nn.dense(lp["attn"]["in_proj"], hh, policy)
            h = h + nn.dense(lp["attn"]["out_proj"], qkv[:, :768], policy)
            hh = nn.layer_norm(lp["ln2"], h, mcfg.layer_norm_eps)
            hh = jnp.maximum(nn.dense(lp["fc1"], hh, policy), 0)
            h = h + nn.dense(lp["fc2"], hh, policy)
        return h[0, 0].astype(jnp.float32)

    timed("M flat 2D skeleton (matmul+LN floor)", mapper_flat, mp, emb)

    # ---------------- prefill bisection ----------------
    def prefill_variant(c, gp, px, *, attn=True, logits=True, cache=True):
        x = px + c.astype(px.dtype)
        pos = gp["wpe"][:p_len].astype(jnp.float32)
        x = (x.astype(jnp.float32) + pos[None]).astype(policy.compute_dtype)

        def body(x, bp):
            h = nn.layer_norm(bp["ln_1"], x, gcfg.layer_norm_epsilon)
            qkv = nn.dense(bp["attn"]["c_attn"], h, policy)
            q3, k3, v3 = jnp.split(qkv, 3, axis=-1)
            if attn:
                a4 = mha(
                    nn.split_heads(q3, gcfg.n_head),
                    nn.split_heads(k3, gcfg.n_head),
                    nn.split_heads(v3, gcfg.n_head),
                    causal=True,
                    policy=policy,
                )
                a = nn.merge_heads(a4)
            else:
                a = q3
            x = x + nn.dense(bp["attn"]["c_proj"], a, policy)
            h2 = nn.layer_norm(bp["ln_2"], x, gcfg.layer_norm_epsilon)
            h2 = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], h2, policy))
            x = x + nn.dense(bp["mlp"]["c_proj"], h2, policy)
            ys = (
                (k3.transpose(1, 0, 2).astype(policy.compute_dtype),
                 v3.transpose(1, 0, 2).astype(policy.compute_dtype))
                if cache
                else (jnp.float32(0), jnp.float32(0))
            )
            return x, ys

        x, (k_rows, v_rows) = jax.lax.scan(body, x, gp["blocks"])
        out = jnp.float32(0)
        if cache:
            out = out + k_rows[0, 0, 0, 0].astype(jnp.float32) + v_rows[0, 0, 0, 0].astype(jnp.float32)
        if logits:
            xl = nn.layer_norm(gp["ln_f"], x[:, -1:, :], gcfg.layer_norm_epsilon)
            lg = jnp.dot(
                policy.cast(xl[:, 0, :]),
                gp["wte"].T.astype(policy.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            out = out + lg[0, 0]
        else:
            out = out + x[0, 0, 0].astype(jnp.float32)
        return out

    timed("P full (rows scan)", functools.partial(prefill_variant, attn=True, logits=True, cache=True), gpt_params, prefix_const)
    timed("P no-attention", functools.partial(prefill_variant, attn=False, logits=True, cache=True), gpt_params, prefix_const)
    timed("P no-logits", functools.partial(prefill_variant, attn=True, logits=False, cache=True), gpt_params, prefix_const)
    timed("P no-cache-ys", functools.partial(prefill_variant, attn=True, logits=True, cache=False), gpt_params, prefix_const)

    # flattened skeleton: (b*15, d) dense chain, no attention/transposes
    def prefill_flat(c, gp):
        h = jnp.zeros((b * p_len, 768), policy.compute_dtype) + c.astype(policy.compute_dtype)

        def body(h, bp):
            hh = nn.layer_norm(bp["ln_1"], h, gcfg.layer_norm_epsilon)
            qkv = nn.dense(bp["attn"]["c_attn"], hh, policy)
            h = h + nn.dense(bp["attn"]["c_proj"], qkv[:, :768], policy)
            hh = nn.layer_norm(bp["ln_2"], h, gcfg.layer_norm_epsilon)
            hh = nn.gelu_new(nn.dense(bp["mlp"]["c_fc"], hh, policy))
            return h + nn.dense(bp["mlp"]["c_proj"], hh, policy), None

        h, _ = jax.lax.scan(body, h, gp["blocks"])
        return h[0, 0].astype(jnp.float32)

    timed("P flat 2D skeleton (matmul+LN floor)", prefill_flat, gpt_params)

    log("done")


if __name__ == "__main__":
    main()
