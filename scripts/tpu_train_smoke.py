"""Real-chip training smoke: the flagship configuration (GPT-2 124M frozen,
transformer mapper, batch 128, seq 50+15) for a handful of steps — proves the
jitted train step end-to-end on hardware and measures step time / captions/s.

Run detached: ``nohup python -u scripts/tpu_train_smoke.py &`` (axon rules:
one TPU process at a time, never kill it).
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(f"[{time.strftime('%H:%M:%S')}] {m}", flush=True)


def main():
    from gpt2_image_captioning_tpu.core.mesh import MeshSpec, create_mesh
    from gpt2_image_captioning_tpu.core.precision import BF16
    from gpt2_image_captioning_tpu.models import captioner as C
    from gpt2_image_captioning_tpu.models import gpt2 as G
    from gpt2_image_captioning_tpu.models import mapping as M
    from gpt2_image_captioning_tpu.train import optim
    from gpt2_image_captioning_tpu.train.loop import make_train_step

    assert jax.default_backend() != "cpu"
    gcfg = G.GPT2Config.gpt2_124m()
    mcfg = M.TransformerMappingConfig(
        embed_dim=512, gpt_dim=768, prefix_length=15, hidden_length=10
    )
    ccfg = C.CaptionerConfig(gpt2=gcfg, mapping=mcfg, eos_token_id=50256)
    log("init 124M params...")
    trainable, frozen = C.init_params(jax.random.PRNGKey(0), ccfg)

    mesh = create_mesh(MeshSpec(dp=1, tp=1), devices=jax.devices()[:1])
    opt_cfg = optim.AdamWConfig(learning_rate=1e-4, num_training_steps=1000)
    step_fn, (tr_sh, fr_sh, opt_sh, batch_sh) = make_train_step(
        ccfg, opt_cfg, mesh, BF16
    )

    batch_size, seq = 128, 50
    rng = np.random.default_rng(0)
    batch = {
        "token_ids": rng.integers(0, 50256, size=(batch_size, seq)).astype(np.int32),
        "labels": rng.integers(0, 50256, size=(batch_size, seq)).astype(np.int32),
        "attention_mask": np.ones((batch_size, seq), np.int32),
        "image_embedding": rng.normal(size=(batch_size, 512)).astype(np.float32),
    }
    tr = jax.device_put(trainable, tr_sh)
    fz = jax.device_put(frozen, fr_sh)
    opt = jax.device_put(optim.init(trainable), opt_sh)
    b = jax.device_put(batch, batch_sh)

    log("compiling train step (teacher-forced loss + AdamW, bf16)...")
    t0 = time.time()
    tr, opt, loss, gnorm = step_fn(tr, opt, fz, b, {})
    log(f"compiled+step1 in {time.time()-t0:.1f}s loss={float(np.asarray(loss)):.4f}")

    n_steps = 20
    t0 = time.time()
    for _ in range(n_steps):
        tr, opt, loss, gnorm = step_fn(tr, opt, fz, b, {})
    loss_v = float(np.asarray(loss))  # sync
    dt = (time.time() - t0) / n_steps
    log(
        f"steady state: {dt*1000:.1f} ms/step, {batch_size/dt:.0f} captions/s, "
        f"loss={loss_v:.4f} (finite={np.isfinite(loss_v)})"
    )
    # train2017 epoch estimate: 591,753 captions
    log(f"-> full COCO train2017 epoch (591,753 captions): ~{591753/ (batch_size/dt) / 60:.1f} min/chip")
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main()
