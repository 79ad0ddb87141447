"""Continuous-serving tuning sweep on the real chip: (segment, bursts) and
int8 weights at the bench shape (flagship 124M, 128 slots, greedy len-50,
1,024 embedding requests, vectorized harvest).

PERF_NOTES says the admission machinery costs ~0.36 ms/step at seg=4 and
halves at seg=8; bursts amortize the per-macro dispatch; int8 halves the
dominant weight stream.  This measures the combinations end to end.

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
    emb_np = np.random.default_rng(9).normal(size=(1024, 512)).astype(np.float32)

    legs = [
        ("seg4 bursts8 bf16 (committed)", dict(segment=4, bursts=8)),
        ("seg8 bursts8 bf16", dict(segment=8, bursts=8)),
        ("seg8 bursts16 bf16", dict(segment=8, bursts=16)),
        ("seg4 bursts8 int8", dict(segment=4, bursts=8, decode_precision="int8")),
        ("seg8 bursts16 int8", dict(segment=8, bursts=16, decode_precision="int8")),
    ]
    for name, kw in legs:
        kw.setdefault("decode_precision", "bf16")
        svc = ContinuousCaptionService(
            model, vparams, vcfg, encoder="clip", slots=128, admit=32,
            max_length=50, **kw,
        )
        print(f"[tune] {name}: compiling...", flush=True)
        for e in emb_np[:128]:
            svc.submit_embedding(e)
        svc.drain()
        t0 = time.perf_counter()
        for e in emb_np:
            svc.submit_embedding(e)
        done = svc.drain()
        dt = time.perf_counter() - t0
        assert len(done) >= 1024
        s = svc.stats
        print(
            f"[tune] {name}: {1024 / dt:.0f} img/s (wall {dt * 1e3:.0f} ms, "
            f"macros {s['macros']}, sync {s['sync_s'] * 1e3:.0f} ms, "
            f"host {s['host_s'] * 1e3:.0f} ms)",
            flush=True,
        )


if __name__ == "__main__":
    main()
