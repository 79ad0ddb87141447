"""On-chip A/B: large-batch greedy decode block configurations.

Each kernel grid program streams ALL weights, so b=256 with block_b=128
reads the 124M weights twice per step.  Compare block_b=128/ct=8 (two
programs) vs block_b=256/ct=4 (one program, halved KV chunk depth for VMEM)
at b=256, plus b=128 as the control.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/batch256_ab.py \
      > /tmp/b256_ab.log 2>&1 < /dev/null & disown
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def timed(fn, reps=8, warm=2):
    for _ in range(warm):
        np.asarray(fn())
    t0 = time.perf_counter()
    outs = [fn() for _ in range(reps)]
    for o in outs:
        np.asarray(o)
    return (time.perf_counter() - t0) / reps * 1000


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
    params = frozen["gpt"]
    # block_b=256 only fits VMEM with a narrower weight tile (tw=384)
    packs = {
        128: DS.pack_decode_weights(params, jnp.bfloat16),
        256: DS.pack_decode_weights(params, jnp.bfloat16, tw=384),
    }
    max_len = 50
    rng = np.random.default_rng(0)

    # raw kernel-loop benchmark at a given (b, block_b, chunk_t): prefill a
    # cache once, then run a jitted 50-step fused greedy loop
    def build_loop(b, block_b, chunk_t):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        packed = packs[block_b]

        @jax.jit
        def run(trainable, frozen, packed, emb):
            # NB: all device arrays arrive as ARGUMENTS (closure constants
            # would force a device->host copy at lowering — CLAUDE.md rule 2)
            gp = frozen["gpt"]
            prefix = C.build_prefix(trainable, ccfg, emb, policy)
            p_len = prefix.shape[1]
            cache = G.init_cache(gcfg, b, p_len + max_len, dtype=jnp.bfloat16)
            logits, cache = G.forward_cached(
                gp, gcfg, prefix, cache, policy, fresh_prefill=True
            )
            nxt0 = jnp.argmax(logits, axis=-1).astype(jnp.int32)

            def body(i, state):
                prev, k_c, v_c, index, acc = state
                x0 = (
                    jnp.take(gp["wte"], prev, axis=0)
                    + jax.lax.dynamic_slice_in_dim(gp["wpe"], index, 1, 0)[0]
                ).astype(jnp.bfloat16)
                nxt, k_c, v_c = DS.fused_decode_step(
                    packed, x0, k_c, v_c, index, n_head=12,
                    vocab=gcfg.vocab_size, block_b=block_b, chunk_t=chunk_t,
                )
                return nxt, k_c, v_c, index + 1, acc + jnp.sum(nxt)

            _, _, _, _, acc = jax.lax.fori_loop(
                0, max_len - 1,
                body,
                (nxt0, cache["k"], cache["v"], cache["index"], jnp.sum(nxt0)),
            )
            return acc

        return lambda: run(trainable, frozen, packed, emb)

    for b, bbk, ct in [
        (128, 128, 8),
        (256, 128, 8),
        (256, 256, 4),
        (512, 128, 8),
        (512, 256, 4),
    ]:
        log(f"compiling b={b} block_b={bbk} ct={ct}...")
        try:
            ms = timed(build_loop(b, bbk, ct), reps=6)
            log(f"   b={b} block_b={bbk} ct={ct}: {ms:.1f} ms = {b / ms * 1000:.0f} img/s")
        except Exception as e:  # VMEM overflow etc. — record and continue
            log(f"   b={b} block_b={bbk} ct={ct}: FAILED {type(e).__name__}: {str(e)[:200]}")

    log("done")


if __name__ == "__main__":
    main()
