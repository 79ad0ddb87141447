"""Continuous serving end-to-end throughput + host-phase breakdown (real chip).

Measures ContinuousCaptionService at the bench leg's exact shape (flagship
124M, 128 slots, seg=4, bursts=8, greedy len-50, embedding intake, 1024
requests) and prints the service's phase stats.  Used for the round-3 A/B of
the vectorized numpy harvest vs the original per-(step, row) Python loop
(the "before" number is bench.py's continuous leg in the same session:
1,115 img/s with the scalar loop).

Run DETACHED, one TPU process at a time (CLAUDE.md rules).
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

    for slots in (128, 256):
        svc = ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=slots, segment=4,
            bursts=8, admit=32, max_length=50, decode_precision="bf16",
        )
        emb_np = np.random.default_rng(9).normal(size=(1024, 512)).astype(np.float32)
        print(f"[ab] slots={slots}: compiling macro...", flush=True)
        for e in emb_np[:slots]:
            svc.submit_embedding(e)
        svc.drain()
        svc._stats = {k: (0.0 if isinstance(v, float) else 0)
                      for k, v in svc._stats.items()}
        svc._latencies.clear()
        t0 = time.perf_counter()
        for e in emb_np:
            svc.submit_embedding(e)
        done = svc.drain()
        dt = time.perf_counter() - t0
        assert len(done) >= 1024
        s = svc.stats
        print(
            f"[ab] slots={slots}: {1024 / dt:.0f} img/s "
            f"(wall {dt * 1e3:.0f} ms, macros {s['macros']}, "
            f"dispatch {s['dispatch_s'] * 1e3:.0f} ms, "
            f"sync {s['sync_s'] * 1e3:.0f} ms, host {s['host_s'] * 1e3:.0f} ms, "
            f"p50 lat {s.get('latency_p50_s', 0) * 1e3:.0f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
