"""Sharded training: dp over the batch axis + tp over the wide heads
+ optional sp over the feature time axis (see mesh.py axis docs).

GSPMD style: the train step stays the pure function from training/train_step;
we annotate input/output shardings and let XLA insert the collectives.
Gradient all-reduce over 'data' emerges from replicated-param outputs;
tensor-parallel matmuls for the 3080-wide output (and 1024-wide prefinal
big) layers emerge from sharding their weight columns over 'model'.

jit-with-shardings is chosen over shard_map deliberately: BatchNorm computes
batch statistics over the global (B, T) axes inside the forward, and GSPMD
keeps that a true global mean; a naive shard_map would silently switch to
per-shard statistics.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kaldi_fp16_tpu.models.model import Model
from kaldi_fp16_tpu.models.xconfig import LayerType


def param_shardings(model: Model, mesh: Mesh, params) -> Dict:
    """Sharding rules: tp-shard output/prefinal wide matmuls, replicate rest.

    output.w [in, num_pdfs]   -> P(None, 'model')
    output.b [num_pdfs]       -> P('model')
    prefinal big_w [in, big]  -> P(None, 'model');  big_b [big] -> P('model')
    prefinal small_w [big, s] -> P('model', None)   (row-sharded: follows big)
    tdnnf affine_w [2b, dim]  -> P(None, 'model');  linear_w stays replicated
    """
    out = {}
    tp = mesh.shape.get("model", 1) > 1
    for lname, lparams in params.items():
        layer = model.layer_map.get(lname)
        rules = {}
        for pname, v in lparams.items():
            spec = P()
            if tp and layer is not None:
                if layer.type == LayerType.OUTPUT:
                    spec = P(None, "model") if v.ndim == 2 else P("model")
                elif layer.type == LayerType.PREFINAL:
                    if pname == "big_w":
                        spec = P(None, "model")
                    elif pname == "big_b":
                        spec = P("model")
                    elif pname == "small_w":
                        spec = P("model", None)
                elif layer.type == LayerType.TDNNF and pname == "affine_w":
                    spec = P(None, "model")
                elif layer.type == LayerType.TDNNF and pname == "affine_b":
                    spec = P("model")
            rules[pname] = NamedSharding(mesh, spec)
        out[lname] = rules
    return out


def _repl_like(tree, mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: repl, tree)


_TIME_AXIS_KEYS = ("features", "deriv_weights")


def _batch_spec(k: str, v, mesh: Mesh) -> P:
    """Batch axis over 'data'; the TIME axis of time-major arrays over
    'seq' (GSPMD turns the temporal shifts into halo exchanges)."""
    ndim = getattr(v, "ndim", 0)
    if ndim == 0:
        return P()
    if (mesh.shape.get("seq", 1) > 1 and ndim >= 2
            and k in _TIME_AXIS_KEYS):
        return P("data", "seq")
    return P("data")


def shard_batch(batch: Dict[str, jnp.ndarray], mesh: Mesh) -> Dict:
    """Place batch arrays with the leading (sequence) axis over 'data'
    and time axes over 'seq' (when the mesh has one)."""
    return {k: jax.device_put(v, NamedSharding(mesh, _batch_spec(k, v, mesh)))
            for k, v in batch.items()}


def make_sharded_train_step(step_fn, mesh: Mesh, model: Model, params,
                            net_state, opt_state, scale_state,
                            example_batch: Dict):
    """Jit `step_fn` (the PURE function from make_train_step(..., donate=False)
    or its unjitted core) with dp+tp shardings.

    Returns (sharded_step, (params, net_state, opt_state, scale_state))
    where the states have been device_put with their target shardings.
    sharded_step(params, net_state, opt_state, scale_state, batch, rng)
    keeps output shardings identical to inputs so layout is step-stable.
    """
    repl = NamedSharding(mesh, P())
    p_shard = param_shardings(model, mesh, params)
    net_shard = _repl_like(net_state, mesh)
    # velocity follows the param shardings; anything else in the optimizer
    # state (step counter, natural-gradient Fisher factors, ...) replicates
    opt_shard = {k: (p_shard if k == "velocity" else _repl_like(v, mesh))
                 for k, v in opt_state.items()}
    scale_shard = _repl_like(scale_state, mesh)
    batch_shard = {k: NamedSharding(mesh, _batch_spec(k, v, mesh))
                   for k, v in example_batch.items()}

    placed = (
        jax.device_put(params, p_shard),
        jax.device_put(net_state, net_shard),
        {k: jax.device_put(v, opt_shard[k]) for k, v in opt_state.items()},
        jax.device_put(scale_state, scale_shard),
    )

    out_shard = (p_shard, net_shard, opt_shard, scale_shard, repl)

    sharded_step = jax.jit(
        step_fn,
        in_shardings=(p_shard, net_shard, opt_shard, scale_shard,
                      batch_shard, repl),
        out_shardings=out_shard,
    )
    return sharded_step, placed
