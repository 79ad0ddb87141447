"""On-chip A/B: beam-aware fused kernel vs the XLA beam path (round 3).

The round-2 beam profile (scripts/beam_ab.py, docs/PERF_NOTES.md) showed the
step dominated by the two full-cache beam gathers (~1.5 ms/step at 128 rows)
plus the (B·K, V) logits round-trip; the beam-aware kernel removes both via
an origin-map ancestry indirection inside the attention walk and in-kernel
per-row top-k + logsumexp (ops/decode_step.py beam mode).

Measures end-to-end ``beam_generate`` (one jit; internal lax.scan of
max_length fused steps) on the flagship 124M model, beam 4, max_length 50,
at b=32 and b=128 images, for both paths, and counts token mismatches
(expected ~0; the paths share selection math — only logsumexp rounding on
near-ties can differ).

Run DETACHED alone on the real chip (CLAUDE.md TPU rules):
  cd /root/repo && setsid nohup python -u scripts/beam_ab2.py \
      > /tmp/beam_ab2.log 2>&1 < /dev/null & disown
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

    assert jax.default_backend() != "cpu"
    policy = BF16
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init params...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    log("init done")

    k, max_len = 4, 50
    rng = np.random.default_rng(0)

    def run(emb, b, fused):
        # warm/compile
        out = C.beam_generate(
            trainable, frozen, ccfg, emb, max_length=max_len, beam_size=k,
            policy=policy, use_pallas_decode=None if fused else False,
        )
        toks = np.asarray(out)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            np.asarray(
                C.beam_generate(
                    trainable, frozen, ccfg, emb, max_length=max_len,
                    beam_size=k, policy=policy,
                    use_pallas_decode=None if fused else False,
                )
            )
        dt = (time.perf_counter() - t0) / reps
        return toks, dt

    for b in (32, 128):
        emb = jnp.asarray(rng.normal(size=(b, 512)).astype(np.float32))
        log(f"--- b={b}, beam={k}, len={max_len} ---")
        toks_xla, dt_xla = run(emb, b, fused=False)
        log(f"XLA  beam path : {dt_xla * 1000:8.1f} ms/batch = {b / dt_xla:7.1f} img/s")
        toks_fused, dt_fused = run(emb, b, fused=True)
        log(
            f"FUSED beam path: {dt_fused * 1000:8.1f} ms/batch = "
            f"{b / dt_fused:7.1f} img/s  ({dt_xla / dt_fused:.2f}x)"
        )
        mism = int((toks_xla != toks_fused).sum())
        total = toks_xla.size
        log(f"token mismatches: {mism}/{total}")
        # divergence structure: on random-init weights the beams are wall-to-
        # wall near-ties, so ONE bf16 rounding flip (kernel and XLA reduce in
        # different orders) rewrites that row's whole suffix.  Rows that
        # diverge late share a long exact prefix — evidence the selection
        # math agrees and only tie-breaking differs (interpret-mode tests
        # are bit-exact vs XLA).
        diff = toks_xla != toks_fused
        rows_div = diff.any(axis=1)
        first = np.where(rows_div, diff.argmax(axis=1), toks_xla.shape[1])
        log(
            f"rows diverged: {int(rows_div.sum())}/{toks_xla.shape[0]}; "
            f"mean first-divergence step of those: "
            f"{float(first[rows_div].mean()) if rows_div.any() else float('nan'):.1f}/{max_len}"
        )
        # determinism: same path twice must match exactly
        toks_fused2, _ = run(emb, b, fused=True)
        log(f"fused determinism mismatches: {int((toks_fused != toks_fused2).sum())}")

    log("done")


if __name__ == "__main__":
    main()
