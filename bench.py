"""Benchmark: caption decode throughput on the flagship model (real chip).

Measures KV-cached, jit-compiled greedy decode (GPT-2 124M + transformer
mapper, bf16) in images/sec, and compares against a faithful re-creation of
the reference's decode *algorithm* (no KV cache: full re-forward of the whole
sequence per generated token, ``/root/reference/src/models.py:389-395``)
running on the SAME chip — i.e. ``vs_baseline`` isolates the framework's
algorithmic/compilation win at equal hardware and numerics.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N, ...}
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M

    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    # bf16 weights on device for the compute path
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)

    batch, max_len = 128, 50
    emb = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 512)).astype(np.float32)
    )

    # --- ours: KV-cached compiled decode ---------------------------------
    def ours():
        out = C.generate(
            trainable, frozen, ccfg, emb,
            max_length=max_len, temperature=0.0, top_p=1.0, policy=policy,
        )
        jax.block_until_ready(out)
        return out

    ours()  # compile
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        ours()
    ours_img_s = batch * reps / (time.perf_counter() - t0)

    # --- reference algorithm on the same chip: uncached O(L^2) decode ----
    # Full forward over the growing sequence each step, expressed with a
    # fixed padded length + mask so it compiles once (fastest-possible
    # version of the reference's loop on TPU).
    total_len = mcfg.prefix_length + max_len

    @jax.jit
    def uncached(emb):
        gpt = frozen["gpt"]
        prefix = C.build_prefix(trainable, ccfg, emb, policy)
        seq = jnp.zeros((batch, total_len, 768), policy.compute_dtype)
        seq = jax.lax.dynamic_update_slice(seq, prefix.astype(seq.dtype), (0, 0, 0))

        def step(carry, i):
            seq, = carry
            t = mcfg.prefix_length + i
            mask = (jnp.arange(total_len)[None, :] < t).astype(jnp.int32)
            mask = jnp.broadcast_to(mask, (batch, total_len))
            logits = G.forward(gpt, gcfg, seq, mask, policy)  # full re-forward
            # logits at the last valid position
            last = jax.lax.dynamic_index_in_dim(logits, t - 1, axis=1, keepdims=False)
            nxt = jnp.argmax(last, axis=-1).astype(jnp.int32)
            tok_embed = G.embed_tokens(gpt, nxt[:, None]).astype(seq.dtype)
            seq = jax.lax.dynamic_update_slice(seq, tok_embed, (0, t, 0))
            return (seq,), nxt

        (_,), toks = jax.lax.scan(step, (seq,), jnp.arange(max_len))
        return toks

    out = uncached(emb)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = uncached(emb)
    jax.block_until_ready(out)
    base_img_s = batch / (time.perf_counter() - t0)

    print(
        json.dumps(
            {
                "metric": "caption_decode_throughput_gpt2_124m_b128_len50",
                "value": round(ours_img_s, 2),
                "unit": "img/s",
                "vs_baseline": round(ours_img_s / base_img_s, 2),
                "baseline": {
                    "what": "reference decode algorithm (uncached full re-forward/step) on the same chip",
                    "img_s": round(base_img_s, 2),
                },
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
