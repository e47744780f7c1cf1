"""Mixed-precision SGD with momentum, fp32 master weights, and Kaldi
max-change clipping.

The reference keeps fp32 master weights + fp32 velocity per parameter on
GPU with the fused update v = mu*v + g; w32 -= lr*v; w16 = half(w32)
(ref: internal/gpu/optimize.go:1-9,95-120, backward_wrappers.cu
bw_sgd_update_kernel).  Here params ARE fp32 (cast to bf16 only inside the
forward), so the master-weight discipline is structural; the update is the
same math as one fused XLA op over the pytree.

Max-change follows Kaldi nnet3 semantics (nnet-utils.cc):
  * per-component: scale the component's delta so ||lr*v|| <= max_change_i
  * global: scale ALL deltas so the total param-change norm
    sqrt(sum_i ||delta_i||^2) <= max_param_change (TrainConfig, default 2.0,
    ref: train_step.go:21-28)
Per-layer learning-rate factors (xconfig learning-rate-factor) multiply lr.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.models.model import Model
from kaldi_fp16_tpu.models.layers import ConvReluBNSpec, OutputSpec
from kaldi_fp16_tpu.models.xconfig import LayerType


@dataclass(frozen=True)
class SGDConfig:
    learning_rate: float = 1e-3
    momentum: float = 0.0
    max_param_change: float = 2.0      # global, Kaldi default
    default_max_change: float = 0.75   # per-component, Kaldi default


def layer_hyperparams(model: Model) -> Dict[str, Dict[str, float]]:
    """Per-layer (lr_factor, max_change, l2) from the xconfig specs.

    max_change is None when the xconfig doesn't set it (falls back to the
    SGDConfig default); an EXPLICIT max-change=0 means "no per-component
    limit" (Kaldi nnet3 skips the clip when max_change == 0).
    l2 is the xconfig l2-regularize factor, applied as learning-rate-scaled
    weight decay (Kaldi ApplyL2Regularization)."""
    out = {}
    for layer in model.layers:
        lr_factor = 1.0
        max_change: Optional[float] = None
        s = layer.spec
        if isinstance(s, (ConvReluBNSpec, OutputSpec)):
            lr_factor = s.learning_rate_factor
            max_change = s.max_change
        lr_factor = layer.config.get_float("learning-rate-factor", lr_factor)
        if "max-change" in layer.config.params:
            max_change = layer.config.get_float("max-change")
        l2 = getattr(s, "l2_reg", 0.0) or 0.0
        out[layer.name] = {"lr_factor": lr_factor, "max_change": max_change,
                           "l2": l2}
    return out


def init_sgd_state(params) -> dict:
    return {"velocity": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32)}


def sgd_update(params, grads, opt_state, config: SGDConfig,
               lr: Optional[jnp.ndarray] = None,
               hyper: Optional[Dict[str, Dict[str, float]]] = None,
               trainable: Optional[dict] = None,
               skip: Optional[jnp.ndarray] = None):
    """One SGD step over nested dict params {layer: {name: array}}.

    grads are d loss/d w (descent).  Returns (new_params, new_opt_state,
    stats) where stats has the global change norm and clip factor.
    skip: optional scalar bool — when True (loss-scale overflow) velocity
    and params are left untouched.
    """
    lr = jnp.asarray(config.learning_rate if lr is None else lr, jnp.float32)
    mu = jnp.asarray(config.momentum, jnp.float32)
    hyper = hyper or {}

    vel = opt_state["velocity"]
    new_vel = {}
    deltas = {}
    sq_norms = []
    l2_decay = {}
    for lname, lparams in params.items():
        new_vel[lname] = {}
        deltas[lname] = {}
        h = hyper.get(lname, {})
        lr_factor = h.get("lr_factor", 1.0)
        # None = unset in xconfig -> SGDConfig default; explicit 0 = Kaldi's
        # "no per-component limit"
        max_change = h.get("max_change")
        if max_change is None:
            max_change = config.default_max_change
        layer_lr = lr * lr_factor
        l2 = h.get("l2", 0.0)
        # per-component (per-layer) delta and clip
        layer_sq = []
        for pname, w in lparams.items():
            g = grads[lname][pname]
            is_trainable = (trainable is None or trainable[lname][pname])
            if not is_trainable:
                new_vel[lname][pname] = vel[lname][pname]
                deltas[lname][pname] = jnp.zeros_like(w)
                continue
            v = mu * vel[lname][pname] + g.astype(jnp.float32)
            new_vel[lname][pname] = v
            d = layer_lr * v
            deltas[lname][pname] = d
            layer_sq.append(jnp.sum(d.astype(jnp.float32) ** 2))
            if l2 > 0:
                # Kaldi ApplyL2Regularization: lr-scaled weight decay,
                # OUTSIDE the max-change-clipped delta
                l2_decay[(lname, pname)] = layer_lr * l2 * w
        if layer_sq and max_change > 0:
            comp_norm = jnp.sqrt(sum(layer_sq))
            comp_scale = jnp.minimum(1.0, max_change / jnp.maximum(comp_norm, 1e-20))
            for pname in deltas[lname]:
                deltas[lname][pname] = deltas[lname][pname] * comp_scale
            sq_norms.append((comp_norm * comp_scale) ** 2)
        elif layer_sq:
            sq_norms.append(sum(layer_sq))

    total_norm = jnp.sqrt(sum(sq_norms)) if sq_norms else jnp.zeros(())
    global_scale = jnp.minimum(
        1.0, config.max_param_change / jnp.maximum(total_norm, 1e-20))

    new_params = {}
    for lname, lparams in params.items():
        new_params[lname] = {}
        for pname, w in lparams.items():
            d = deltas[lname][pname]
            new_w = w - global_scale * d - l2_decay.get((lname, pname), 0.0)
            # On skip (loss-scale overflow) params and velocity must be left
            # EXACTLY untouched: deltas may be inf/NaN, so a multiplicative
            # gate (0 * inf = NaN) would poison the weights — select instead.
            if skip is not None:
                new_w = jnp.where(skip, w, new_w)
                new_vel[lname][pname] = jnp.where(
                    skip, vel[lname][pname], new_vel[lname][pname])
            new_params[lname][pname] = new_w

    stepped = jnp.where(skip, 0, 1) if skip is not None else 1
    new_state = {"velocity": new_vel,
                 "step": opt_state["step"] + stepped}
    stats = {"param_change_norm": total_norm * global_scale,
             "global_clip_scale": global_scale}
    return new_params, new_state, stats
