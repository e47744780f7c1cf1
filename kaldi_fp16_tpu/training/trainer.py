"""Trainer: the loop around the pure train step.

(ref: internal/nnet/train_step.go Trainer + scripts/train_cnn_tdnn.sh
hyperparameters: epochs 15, lr 1e-3 -> 1e-4 exponential, batch 64.)

Handles per-bucket step compilation (one jit per (T_in, fps) bucket),
exponential LR decay, metric aggregation, periodic checkpointing.
"""

from __future__ import annotations

import math
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
from kaldi_fp16_tpu.chain.graph import build_numerator_batch
from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
from kaldi_fp16_tpu.io.batch import ChainBatch
from kaldi_fp16_tpu.models.model import Model
from kaldi_fp16_tpu.training.train_step import (
    TrainConfig, TrainStepOutput, init_train_state, make_train_step,
)


def exponential_lr(initial: float, final: float, num_steps: int
                   ) -> Callable[[int], float]:
    """Kaldi-style exponential decay lr(t) = li * (lf/li)^(t/T)."""
    ratio = final / initial

    def lr(step: int) -> float:
        frac = min(step / max(num_steps, 1), 1.0)
        return initial * (ratio ** frac)
    return lr


@dataclass
class TrainerMetrics:
    steps: int = 0
    examples: int = 0
    total_objf: float = 0.0
    total_weight: float = 0.0
    total_xent: float = 0.0
    skipped_steps: int = 0
    step_seconds: float = 0.0
    history: List[Dict] = field(default_factory=list)

    @property
    def objf_per_frame(self) -> float:
        return self.total_objf / max(self.total_weight, 1e-9)


class Trainer:
    """Drives train steps over ChainBatches with per-bucket compiled steps."""

    def __init__(self, model: Model, den: DenominatorComputation,
                 config: TrainConfig = TrainConfig(),
                 chain_opts: ChainTrainingOpts = ChainTrainingOpts(),
                 lr_schedule: Optional[Callable[[int], float]] = None,
                 seed: int = 0,
                 fst_pad_states: int = 256, fst_pad_arcs: int = 512):
        self.model = model
        self.den = den
        self.config = config
        self.chain_opts = chain_opts
        self.lr_schedule = lr_schedule
        self.metrics = TrainerMetrics()
        self.fst_pad_states = fst_pad_states
        self.fst_pad_arcs = fst_pad_arcs
        self._steps: Dict = {}
        self._key = jax.random.PRNGKey(seed)
        (self.params, self.net_state, self.opt_state,
         self.scale_state) = init_train_state(model, jax.random.PRNGKey(seed),
                                              config)
        self.global_step = 0

    def _step_fn(self, batch: ChainBatch):
        """One compiled step per bucket geometry.

        The numerator graph arrays are baked into the jitted function via
        closure; with fixed padding (fst_pad_*) the SHAPES are stable, but
        values change per batch — so the graph must be an argument, not a
        closure.  make_train_step closes over num_graph; to keep its shapes
        as traced arguments we rebuild a step that takes the graph arrays.
        """
        key = (batch.features.shape, batch.frames_per_seq,
               batch.num_graph.num_states, batch.num_graph.num_arcs)
        if key not in self._steps:
            step = _make_graph_arg_train_step(
                self.model, self.den, self.chain_opts, self.config,
                batch.frames_per_seq)
            self._steps[key] = step
        return self._steps[key]

    def train_batch(self, batch: ChainBatch) -> TrainStepOutput:
        step = self._step_fn(batch)
        self._key, sub = jax.random.split(self._key)
        lr = (self.lr_schedule(self.global_step) if self.lr_schedule
              else self.config.learning_rate)
        g = batch.num_graph
        arrays = {k: jnp.asarray(v) for k, v in batch.arrays().items()}
        if batch.deriv_weights is not None:
            arrays["deriv_weights"] = jnp.asarray(batch.deriv_weights)
        t0 = time.perf_counter()
        (self.params, self.net_state, self.opt_state, self.scale_state,
         out) = step(self.params, self.net_state, self.opt_state,
                     self.scale_state, arrays,
                     jnp.asarray(g.arc_src), jnp.asarray(g.arc_dst),
                     jnp.asarray(g.arc_pdf), jnp.asarray(g.arc_logw),
                     jnp.asarray(g.arc_mask), jnp.asarray(g.start),
                     jnp.asarray(g.final_logw),
                     sub, jnp.asarray(lr, jnp.float32),
                     jnp.asarray(batch.left_context, jnp.int32))
        dt = time.perf_counter() - t0

        self.global_step += 1
        m = self.metrics
        m.steps += 1
        m.examples += batch.batch_size
        m.total_objf += -float(out.loss)
        m.total_weight += float(np.sum(batch.weights)) * batch.frames_per_seq
        m.total_xent += float(out.xent_objf)
        m.skipped_steps += int(bool(out.skipped))
        m.step_seconds += dt
        return out

    def train_epoch(self, batches, log_every: int = 0,
                    log_fn=print) -> TrainerMetrics:
        for i, batch in enumerate(batches):
            out = self.train_batch(batch)
            if log_every and (i + 1) % log_every == 0:
                log_fn(f"step {self.global_step}: loss={float(out.loss):.4f} "
                       f"objf/frame={float(out.objf_per_frame):.4f} "
                       f"num={float(out.num_logprob):.4f} "
                       f"den={float(out.den_logprob):.4f} "
                       f"|dW|={float(out.param_change_norm):.4f}")
        return self.metrics


def _make_graph_arg_train_step(model, den, chain_opts, config,
                               num_frames_out: int):
    """A train step taking the numerator-graph arrays as traced arguments so
    one compilation serves every batch of the same bucket geometry."""
    from kaldi_fp16_tpu.chain.graph import NumeratorGraphBatch
    from kaldi_fp16_tpu.chain.objective import make_chain_objf_with_post
    from kaldi_fp16_tpu.models.network import (
        forward, make_ng_taps, ng_sites, subsample_output, trainable_mask)
    from kaldi_fp16_tpu.training.optimizer import (
        SGDConfig, layer_hyperparams, sgd_update)
    from kaldi_fp16_tpu.training.loss_scale import (
        grads_finite, unscale_grads, update_loss_scale)
    from kaldi_fp16_tpu.training.natural_gradient import NGConfig
    from kaldi_fp16_tpu.training.train_step import apply_natural_gradient

    sites = ng_sites(model) if config.natural_gradient else []
    ng_cfg_in = NGConfig(rank=config.ng_rank_in)
    ng_cfg_out = NGConfig(rank=config.ng_rank_out)
    hyper = layer_hyperparams(model)
    dtype = jnp.bfloat16 if config.compute_dtype == "bfloat16" else jnp.float32
    sgd_cfg = SGDConfig(learning_rate=config.learning_rate,
                        momentum=config.momentum,
                        max_param_change=config.max_param_change)
    stride = config.frame_subsampling_factor

    def step(params, net_state, opt_state, scale_state, arrays,
             arc_src, arc_dst, arc_pdf, arc_logw, arc_mask, start, final_logw,
             rng, lr, left_context):
        feats = arrays["features"]
        ivecs = arrays.get("ivectors")
        weights = arrays.get("weights")
        dws = arrays.get("deriv_weights")
        B = feats.shape[0]
        if weights is None:
            weights = jnp.ones(B, jnp.float32)

        num_graph = NumeratorGraphBatch(
            arc_src=arc_src, arc_dst=arc_dst, arc_pdf=arc_pdf,
            arc_logw=arc_logw, arc_mask=arc_mask, start=start,
            final_logw=final_logw, num_states=final_logw.shape[1],
            num_arcs=arc_src.shape[1])
        objf_fn = make_chain_objf_with_post(num_graph, den, chain_opts)

        def loss_fn(p, taps):
            if taps is not None:
                outs, new_state, xs = forward(
                    model, p, net_state, feats, ivecs, train=True, rng=rng,
                    compute_dtype=dtype, ng_taps=taps, collect_ng=True)
            else:
                outs, new_state = forward(model, p, net_state, feats, ivecs,
                                          train=True, rng=rng,
                                          compute_dtype=dtype)
                xs = {}
            chain_head = model.chain_output().name
            full = outs[chain_head].astype(jnp.float32)
            out = jax.lax.dynamic_slice_in_dim(
                full, left_context,
                (num_frames_out - 1) * stride + 1, axis=1)[:, ::stride]
            objf, result, num_post = objf_fn(out, weights)
            loss = -objf
            xent_objf = jnp.zeros((), jnp.float32)
            xent_layer = model.xent_output()
            if config.xent_regularize > 0 and xent_layer is not None:
                xfull = outs[xent_layer.name].astype(jnp.float32)
                xent = jax.lax.dynamic_slice_in_dim(
                    xfull, left_context,
                    (num_frames_out - 1) * stride + 1, axis=1)[:, ::stride]
                if dws is not None:
                    xent = xent * dws[:, :, None]
                xent_objf = jnp.sum(weights[:, None, None] * num_post * xent)
                loss = loss - config.xent_regularize * xent_objf
            if config.use_loss_scaling:
                loss = loss * scale_state.scale
            return loss, (result, new_state, xent_objf, xs)

        if config.natural_gradient:
            taps = make_ng_taps(sites, B, feats.shape[1])
            ((loss, (result, new_state, xent_objf, xs)),
             (grads, tap_grads)) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(params, taps)
        else:
            (loss, (result, new_state, xent_objf, xs)), grads = (
                jax.value_and_grad(loss_fn, has_aux=True)(params, None))
            tap_grads = {}

        if config.use_loss_scaling:
            loss = loss / scale_state.scale
            grads = unscale_grads(grads, scale_state)
            if config.natural_gradient:
                tap_grads = unscale_grads(tap_grads, scale_state)
        finite = grads_finite(grads)
        new_scale_state, skip = update_loss_scale(scale_state, finite)
        if not config.use_loss_scaling:
            skip = ~finite

        new_ng = opt_state.get("ng", {})
        if config.natural_gradient:
            grads, new_ng = apply_natural_gradient(
                sites, opt_state["ng"], xs, tap_grads, grads, skip,
                ng_cfg_in, ng_cfg_out)

        grad_norm = jnp.sqrt(sum(
            jnp.sum(g.astype(jnp.float32) ** 2)
            for g in jax.tree_util.tree_leaves(grads)))

        mask = trainable_mask(model, params)
        new_params, new_opt_state, stats = sgd_update(
            params, grads, {k: v for k, v in opt_state.items() if k != "ng"},
            sgd_cfg, lr=lr, hyper=hyper, trainable=mask, skip=skip)
        if config.natural_gradient:
            new_opt_state["ng"] = new_ng

        out = TrainStepOutput(
            loss=loss, objf_per_frame=result.objf_per_frame,
            num_logprob=result.num_logprob.mean(),
            den_logprob=result.den_logprob.mean(),
            xent_objf=xent_objf,
            param_change_norm=stats["param_change_norm"],
            grad_norm=grad_norm, loss_scale=new_scale_state.scale,
            skipped=skip, ok=result.ok.all())
        return new_params, new_state, new_opt_state, new_scale_state, out

    return jax.jit(step)
