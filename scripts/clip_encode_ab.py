"""Device-true CLIP ViT-B/32 encode timing + decomposition (round 3).

bench.py's CLIP leg syncs every rep over the tunnel (~24 ms fixed each), so
the committed 3,976 img/s conflates device compute with tunnel latency.
FLOP floor: ~9 GFLOP/img → 256-batch ≈ 2.3 TFLOP ≈ 11.7 ms at peak bf16.
This script times the encode with the in-jit N-rep scan (the only
device-true method here) and decomposes patch-embed vs transformer.

Run DETACHED alone on the real chip:
  cd /root/repo && setsid nohup python -u scripts/clip_encode_ab.py \
      > /tmp/clip_encode_ab.log 2>&1 < /dev/null & disown
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
    from gpt2_image_captioning_tpu.models import clip as CL

    assert jax.default_backend() != "cpu"
    policy = BF16
    vcfg = CL.CLIPVisionConfig.vit_b32()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16), CL.init_vision(jax.random.PRNGKey(1), vcfg)
    )

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

    for b in (256, 512):
        px = jnp.asarray(
            np.random.default_rng(1).normal(size=(b, 3, 224, 224)).astype(np.float32)
        ).astype(jnp.bfloat16)

        def s_full(c, p, x):
            out = CL.encode_image(p, vcfg, x + c.astype(x.dtype), policy=policy, normalize=True)
            return out[0, 0].astype(jnp.float32)

        ms = timed(nloop(s_full), params, px)
        log(f"b={b} full encode      : {ms:8.3f} ms/iter  ({b / ms * 1000:9.1f} img/s device-true)")

        def s_patch(c, p, x):
            pt = CL.extract_patches(
                (x + c.astype(x.dtype)).astype(policy.compute_dtype), vcfg.patch_size
            )
            e = jnp.dot(
                pt,
                p["patch_embedding"].astype(policy.compute_dtype),
                preferred_element_type=jnp.float32,
            )
            return e[0, 0, 0]

        ms_p = timed(nloop(s_patch), params, px)
        log(f"b={b} patch extract+mm : {ms_p:8.3f} ms/iter")

        tok = jnp.asarray(
            np.random.default_rng(2)
            .normal(size=(b, vcfg.num_patches + 1, vcfg.hidden_size))
            .astype(np.float32)
        ).astype(policy.compute_dtype)

        def s_layers(c, p, x):
            def body(xx, lp):
                return (
                    CL._clip_layer(
                        lp, xx, vcfg.num_attention_heads, vcfg.layer_norm_eps,
                        causal=False, policy=policy,
                    ),
                    None,
                )

            y, _ = jax.lax.scan(body, x + c.astype(x.dtype), p["layers"])
            return y[0, 0, 0].astype(jnp.float32)

        ms_l = timed(nloop(s_layers), params, tok)
        log(f"b={b} 12 layers only   : {ms_l:8.3f} ms/iter")
    log("done")


if __name__ == "__main__":
    main()
