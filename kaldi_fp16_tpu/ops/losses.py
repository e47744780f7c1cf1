"""Generic training losses (the GoTorch stack's loss inventory:
go/gotorch/ops.go cross-entropy / MSE, kernels.cu cross_entropy_grad —
here gradients come from autodiff, so only the forward forms exist).

The chain pipeline has its own objective (chain/objective.py); these
serve the auxiliary model families (x-vector speaker CE, regression
heads) and generic experimentation.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray,
                  weights: Optional[jnp.ndarray] = None,
                  label_smoothing: float = 0.0) -> jnp.ndarray:
    """Mean softmax cross-entropy.  logits [..., C]; labels [...] int or
    [..., C] one-hot/soft; optional per-example weights [...]."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    c = logits.shape[-1]
    if labels.ndim == logits.ndim - 1:
        onehot = jax.nn.one_hot(labels, c, dtype=logp.dtype)
    else:
        onehot = labels.astype(logp.dtype)
    if label_smoothing:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / c
    nll = -(onehot * logp).sum(axis=-1)
    if weights is not None:
        return (nll * weights).sum() / jnp.maximum(weights.sum(), 1e-8)
    return nll.mean()


def mse(pred: jnp.ndarray, target: jnp.ndarray,
        weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean squared error; optional per-example weights on axis 0."""
    se = jnp.mean((pred - target) ** 2,
                  axis=tuple(range(1, pred.ndim))) if pred.ndim > 1 else (
        (pred - target) ** 2)
    if weights is not None:
        return (se * weights).sum() / jnp.maximum(weights.sum(), 1e-8)
    return se.mean()
