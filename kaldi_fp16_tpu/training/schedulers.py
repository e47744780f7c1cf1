"""LR schedulers + Adam (gotorch capability parity: SGD/Adam, StepLR/
ExponentialLR/warmup — ref: go/gotorch/model.go optimizers & schedulers,
cnn_tdnn.go:675-705 warmup)."""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


# -- schedulers (step -> lr) -------------------------------------------------

def step_lr(initial: float, step_size: int, gamma: float = 0.1
            ) -> Callable[[int], float]:
    def lr(step: int) -> float:
        return initial * (gamma ** (step // step_size))
    return lr


def exponential_decay_lr(initial: float, gamma: float) -> Callable[[int], float]:
    def lr(step: int) -> float:
        return initial * (gamma ** step)
    return lr


def warmup_lr(base: Callable[[int], float], warmup_steps: int
              ) -> Callable[[int], float]:
    """Linear warmup from 0 over warmup_steps, then the base schedule."""
    def lr(step: int) -> float:
        if step < warmup_steps:
            return base(warmup_steps) * (step + 1) / warmup_steps
        return base(step)
    return lr


# -- Adam (fp32 master-state) ------------------------------------------------

def init_adam_state(params) -> dict:
    zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
    return {"m": zeros(), "v": zeros(), "step": jnp.zeros((), jnp.int32)}


def adam_update(params, grads, state, lr: float, b1: float = 0.9,
                b2: float = 0.999, eps: float = 1e-8,
                weight_decay: float = 0.0):
    """Standard Adam with optional decoupled weight decay."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    def upd(w, g, m, v):
        g = g.astype(jnp.float32)
        m2 = b1 * m + (1 - b1) * g
        v2 = b2 * v + (1 - b2) * g * g
        mhat = m2 / bc1
        vhat = v2 / bc2
        delta = lr * mhat / (jnp.sqrt(vhat) + eps)
        if weight_decay:
            delta = delta + lr * weight_decay * w
        return w - delta, m2, v2

    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = jax.tree_util.tree_leaves(grads)
    flat_m = jax.tree_util.tree_leaves(state["m"])
    flat_v = jax.tree_util.tree_leaves(state["v"])
    new_p, new_m, new_v = [], [], []
    for w, g, m, v in zip(flat_p, flat_g, flat_m, flat_v):
        a, b, c = upd(w, g, m, v)
        new_p.append(a)
        new_m.append(b)
        new_v.append(c)
    unflatten = treedef.unflatten
    return (unflatten(new_p),
            {"m": unflatten(new_m), "v": unflatten(new_v), "step": step})
