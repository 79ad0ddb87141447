"""In-framework optimizer: AdamW + linear-warmup schedule + global-norm clip.

Matches the reference's optimization exactly (``src/train.py:94-103,142-159``):

- **AdamW** with torch semantics — decoupled weight decay applied as
  ``p -= lr * wd * p`` before the Adam update, bias-corrected first/second
  moments, eps added *outside* the bias-corrected sqrt (torch's formula).
- **Linear warmup/decay schedule** — HF ``get_linear_schedule_with_warmup``:
  ``lr * step/max(1,warmup)`` during warmup then linear decay to 0 at
  ``num_training_steps``.
- **Global-norm gradient clipping** at 1.0 over the full trainable pytree
  (torch ``clip_grad_norm_`` semantics: scale by ``max_norm/(total+1e-6)``).

Pure-functional: ``init`` → state pytree; ``step`` → (new_params, new_state),
all jit/pjit-friendly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gpt2_image_captioning_tpu.core.tree import global_norm


@dataclasses.dataclass(frozen=True)
class AdamWConfig:
    learning_rate: float = 1e-4
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8
    weight_decay: float = 0.01  # reference src/train.py:95
    max_grad_norm: float | None = 1.0  # reference src/train.py:150
    num_warmup_steps: int = 0
    num_training_steps: int = 1


class AdamWState(NamedTuple):
    step: jnp.ndarray  # int32, counts optimizer steps taken
    mu: Any  # first moments (same pytree as params)
    nu: Any  # second moments


def linear_warmup_schedule(cfg: AdamWConfig, step: jnp.ndarray) -> jnp.ndarray:
    """HF get_linear_schedule_with_warmup's multiplier evaluated at ``step``
    (0-based current step, matching LambdaLR's last_epoch counter)."""
    warmup = jnp.asarray(cfg.num_warmup_steps, jnp.float32)
    total = jnp.asarray(cfg.num_training_steps, jnp.float32)
    stepf = step.astype(jnp.float32)
    warm = stepf / jnp.maximum(1.0, warmup)
    decay = jnp.maximum(0.0, (total - stepf) / jnp.maximum(1.0, total - warmup))
    return jnp.where(stepf < warmup, warm, decay)


def init(params: Any) -> AdamWState:
    zeros = jax.tree.map(lambda p: jnp.zeros_like(p, dtype=jnp.float32), params)
    return AdamWState(step=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.copy, zeros))


def clip_by_global_norm(grads: Any, max_norm: float) -> tuple[Any, jnp.ndarray]:
    norm = global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree.map(lambda g: g * scale, grads), norm


def step(
    cfg: AdamWConfig, params: Any, grads: Any, state: AdamWState
) -> tuple[Any, AdamWState, jnp.ndarray]:
    """One AdamW update. Returns (params, state, grad_norm_before_clip)."""
    if cfg.max_grad_norm is not None:
        grads, gnorm = clip_by_global_norm(grads, cfg.max_grad_norm)
    else:
        gnorm = global_norm(grads)

    lr = cfg.learning_rate * linear_warmup_schedule(cfg, state.step)
    t = (state.step + 1).astype(jnp.float32)
    bc1 = 1.0 - cfg.beta1**t
    bc2 = 1.0 - cfg.beta2**t

    def upd(p, g, m, v):
        g = g.astype(jnp.float32)
        m = cfg.beta1 * m + (1 - cfg.beta1) * g
        v = cfg.beta2 * v + (1 - cfg.beta2) * jnp.square(g)
        # torch AdamW: decoupled decay then bias-corrected Adam step
        p32 = p.astype(jnp.float32) * (1.0 - lr * cfg.weight_decay)
        update = (m / bc1) / (jnp.sqrt(v / bc2) + cfg.eps)
        p32 = p32 - lr * update
        return p32.astype(p.dtype), m, v

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    new_p, new_m, new_v = [], [], []
    for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        a, b, c = upd(p, g, m, v)
        new_p.append(a)
        new_m.append(b)
        new_v.append(c)
    return (
        jax.tree.unflatten(treedef, new_p),
        AdamWState(
            step=state.step + 1,
            mu=jax.tree.unflatten(treedef, new_m),
            nu=jax.tree.unflatten(treedef, new_v),
        ),
        gnorm,
    )
