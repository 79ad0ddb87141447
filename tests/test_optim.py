"""AdamW + linear-warmup schedule vs torch.optim.AdamW +
HF get_linear_schedule_with_warmup on identical gradient streams."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.train import optim


def test_adamw_matches_torch_with_schedule():
    rng = np.random.default_rng(0)
    p0 = rng.normal(size=(5, 3)).astype(np.float32)
    grads = [rng.normal(size=(5, 3)).astype(np.float32) for _ in range(12)]

    cfg = optim.AdamWConfig(
        learning_rate=1e-2,
        weight_decay=0.01,
        max_grad_norm=None,
        num_warmup_steps=3,
        num_training_steps=12,
    )

    # torch side
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-2, weight_decay=0.01)
    sched = transformers.get_linear_schedule_with_warmup(
        topt, num_warmup_steps=3, num_training_steps=12
    )
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()
        sched.step()

    # ours
    params = {"p": jnp.asarray(p0)}
    state = optim.init(params)
    for g in grads:
        params, state, _ = optim.step(cfg, params, {"p": jnp.asarray(g)}, state)

    np.testing.assert_allclose(np.asarray(params["p"]), tp.detach().numpy(), atol=1e-6, rtol=1e-6)


def test_grad_clipping_matches_torch():
    rng = np.random.default_rng(1)
    p0 = rng.normal(size=(4,)).astype(np.float32)
    g = (10 * rng.normal(size=(4,))).astype(np.float32)

    cfg = optim.AdamWConfig(
        learning_rate=1e-2, max_grad_norm=1.0, num_warmup_steps=0, num_training_steps=10
    )
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = torch.optim.AdamW([tp], lr=1e-2, weight_decay=0.01)
    sched = transformers.get_linear_schedule_with_warmup(topt, 0, 10)
    tp.grad = torch.from_numpy(g.copy())
    torch.nn.utils.clip_grad_norm_([tp], max_norm=1.0)
    topt.step()
    sched.step()

    params = {"p": jnp.asarray(p0)}
    state = optim.init(params)
    params, state, gnorm = optim.step(cfg, params, {"p": jnp.asarray(g)}, state)
    assert float(gnorm) == pytest.approx(float(np.linalg.norm(g)), rel=1e-6)
    np.testing.assert_allclose(np.asarray(params["p"]), tp.detach().numpy(), atol=1e-6)


def test_schedule_shape():
    cfg = optim.AdamWConfig(num_warmup_steps=4, num_training_steps=10)
    vals = [float(optim.linear_warmup_schedule(cfg, jnp.asarray(s))) for s in range(12)]
    assert vals[0] == 0.0
    assert vals[2] == pytest.approx(0.5)
    assert vals[4] == pytest.approx(1.0)  # end of warmup
    assert vals[7] == pytest.approx(0.5)
    assert vals[10] == 0.0
    assert vals[11] == 0.0  # clamped, never negative


def test_step_is_jittable():
    cfg = optim.AdamWConfig(num_training_steps=5)
    params = {"a": jnp.ones((3,)), "b": {"c": jnp.zeros((2, 2))}}
    state = optim.init(params)
    step = jax.jit(lambda p, g, s: optim.step(cfg, p, g, s))
    grads = jax.tree.map(jnp.ones_like, params)
    p2, s2, n = step(params, grads, state)
    assert int(s2.step) == 1
    assert p2["a"].shape == (3,)
