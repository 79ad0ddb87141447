"""Focused re-measure of the continuous-serving tuning winners on a cooled
box (the full sweep ran during a documented shared-host transient — ordering
was valid, absolutes depressed).  Adds p50/p95 latency: seg*bursts is the
tokens-per-dispatch granularity, so the throughput win costs latency
granularity and both sides of the trade need numbers.
"""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gpt2_image_captioning_tpu.core.precision import BF16
from gpt2_image_captioning_tpu.models import captioner as C
from gpt2_image_captioning_tpu.models import clip as CL
from gpt2_image_captioning_tpu.models import gpt2 as G
from gpt2_image_captioning_tpu.models import mapping as M
from gpt2_image_captioning_tpu.serving import ContinuousCaptionService


class _NullTokenizer:
    def batch_decode(self, arr, skip_special_tokens=True):
        return [""] * len(arr)


def main():
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)
    trainable = jax.tree.map(lambda x: x.astype(jnp.bfloat16), trainable)
    frozen = jax.tree.map(lambda x: x.astype(jnp.bfloat16), frozen)
    vcfg = CL.CLIPVisionConfig.vit_b32()
    vparams = CL.init_vision(jax.random.PRNGKey(1), vcfg)
    model = C.ImageCaptioningModel(ccfg, tokenizer=_NullTokenizer(), policy=BF16)
    model.trainable, model.frozen = trainable, frozen
    emb_np = np.random.default_rng(9).normal(size=(1024, 512)).astype(np.float32)

    legs = [
        ("seg4 bursts8 bf16 (committed)", dict(segment=4, bursts=8)),
        ("seg8 bursts16 bf16", dict(segment=8, bursts=16)),
        ("seg8 bursts16 int8", dict(segment=8, bursts=16, decode_precision="int8")),
    ]
    for name, kw in legs:
        kw.setdefault("decode_precision", "bf16")
        svc = ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=128, admit=32,
            max_length=50, **kw,
        )
        print(f"[tune2] {name}: compiling...", flush=True)
        for e in emb_np[:128]:
            svc.submit_embedding(e)
        svc.drain()
        svc._latencies.clear()
        for rep in range(2):  # rep 0 warms dispatch; rep 1 is the number
            svc._latencies.clear()
            t0 = time.perf_counter()
            for e in emb_np:
                svc.submit_embedding(e)
            done = svc.drain()
            dt = time.perf_counter() - t0
        assert len(done) >= 1024
        s = svc.stats
        print(
            f"[tune2] {name}: {1024 / dt:.0f} img/s (wall {dt * 1e3:.0f} ms, "
            f"p50 lat {s.get('latency_p50_s', 0) * 1e3:.0f} ms, "
            f"p95 {s.get('latency_p95_s', 0) * 1e3:.0f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
