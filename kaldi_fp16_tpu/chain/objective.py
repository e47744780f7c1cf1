"""Chain objective + derivative: the ComputeChainObjfAndDeriv equivalent.

Mirrors the reference orchestration (ref: internal/nnet/backward.go:224-371):
  1. denominator forward-backward (probability domain, leaky HMM)
  2. PenalizeOutOfRange: +/-30 limit, scale 2*oor_reg, every-other frame
     (ref: chain_backward.cu:27-67 — deterministic even-frame selection
     approximating Kaldi's random 50%)
  3. numerator forward-backward (log domain)
  4. deriv = weight * (num_post - den_post)  [+ penalty, + L2 term]
  5. L2: deriv -= weight*l2*out; l2_term = -0.5*weight*l2*||out||^2
  6. objf = weight * (num_logprob - den_logprob)
  7. NaN/Inf containment: zero deriv, objf := -10 * weight * T

Exposed as `chain_objf` with a jax.custom_vjp: the analytic posteriors ARE
the derivative, so `jax.grad` of any loss built on chain_objf flows the
exact forward-backward gradient into the network — the JAX-native
replacement for the reference's hand-routed backward pass.

Sign convention: chain_objf returns the OBJECTIVE (higher is better), and
its custom VJP returns d objf / d nnet_output.  Training code minimizes
loss = -objf, which makes standard gradient-descent optimizers equivalent
to Kaldi's ascent-with-derivative update.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.chain.graph import DenominatorGraph, NumeratorGraphBatch, LOG_ZERO
from kaldi_fp16_tpu.chain.numerator import numerator_forward_backward
from kaldi_fp16_tpu.chain.denominator import DenominatorComputation


@dataclass(frozen=True)
class ChainTrainingOpts:
    """Kaldi ChainTrainingOptions defaults (ref: backward.go:114-140)."""
    l2_regularize: float = 0.0
    out_of_range_regularize: float = 0.01
    leaky_hmm_coefficient: float = 1e-5
    xent_regularize: float = 0.0


class ChainResult(NamedTuple):
    """Diagnostics (ref: ChainLossBackward, backward.go:147-174)."""
    total_objf: jnp.ndarray      # scalar: sum_b w_b * (num_b - den_b) + l2
    l2_term: jnp.ndarray         # scalar
    total_weight: jnp.ndarray    # scalar: sum_b w_b * T
    num_logprob: jnp.ndarray     # [B]
    den_logprob: jnp.ndarray     # [B]
    objf_per_frame: jnp.ndarray  # scalar
    out_of_range_count: jnp.ndarray  # scalar int
    ok: jnp.ndarray              # [B] bool — False where NaN containment fired


def _penalize_out_of_range(nnet_output: jnp.ndarray, oor_reg: float,
                           limit: float = 30.0):
    """Returns (penalty_grad [B,T,P], count). Applied on even frames only."""
    B, T, P = nnet_output.shape
    scale = 2.0 * oor_reg
    even = (jnp.arange(T) % 2 == 0)[None, :, None]
    below = nnet_output < -limit
    above = nnet_output > limit
    g = jnp.where(below, (-limit - nnet_output) * scale, 0.0)
    g = jnp.where(above, (limit - nnet_output) * scale, g)
    g = jnp.where(even, g, 0.0)
    count = jnp.sum(jnp.where(even & (below | above), 1, 0))
    return g, count


def chain_objf_and_deriv(
    num_graph: NumeratorGraphBatch,
    den: DenominatorComputation,
    nnet_output: jnp.ndarray,              # [B, T, P] float32
    weights: Optional[jnp.ndarray] = None,  # [B] supervision weights
    deriv_weights: Optional[jnp.ndarray] = None,  # [B, T] per-frame weights
    opts: ChainTrainingOpts = ChainTrainingOpts(),
) -> Tuple[ChainResult, jnp.ndarray]:
    """Full objective + analytic derivative.  deriv is d objf / d output."""
    result, deriv, _ = _chain_core(num_graph, den, nnet_output, weights,
                                   deriv_weights, opts)
    return result, deriv


def _chain_core(
    num_graph: NumeratorGraphBatch,
    den: DenominatorComputation,
    nnet_output: jnp.ndarray,
    weights: Optional[jnp.ndarray] = None,
    deriv_weights: Optional[jnp.ndarray] = None,
    opts: ChainTrainingOpts = ChainTrainingOpts(),
) -> Tuple[ChainResult, jnp.ndarray, jnp.ndarray]:
    """Returns (result, deriv, num_post)."""
    B, T, P = nnet_output.shape
    w = jnp.ones(B, dtype=nnet_output.dtype) if weights is None else weights

    # 1. denominator first (ref: "Kaldi does denominator FIRST", backward.go)
    den_logprob, den_post = den.forward_backward(nnet_output)

    # 2. out-of-range penalty
    if opts.out_of_range_regularize > 0:
        oor_grad, oor_count = _penalize_out_of_range(
            nnet_output, opts.out_of_range_regularize)
    else:
        oor_grad = jnp.zeros_like(nnet_output)
        oor_count = jnp.zeros((), dtype=jnp.int32)

    # 3. numerator
    num_logprob, num_post = numerator_forward_backward(num_graph, nnet_output)

    # 4. combine
    deriv = oor_grad + w[:, None, None] * (num_post - den_post)

    # 5. L2
    if opts.l2_regularize > 0:
        l2_scale = w * opts.l2_regularize
        deriv = deriv - l2_scale[:, None, None] * nnet_output
        l2_term = -0.5 * jnp.sum(
            l2_scale * jnp.sum(nnet_output * nnet_output, axis=(1, 2)))
    else:
        l2_term = jnp.zeros((), dtype=nnet_output.dtype)

    # 6. objective
    per_seq_objf = w * (num_logprob - den_logprob)

    # 7. NaN/Inf containment per sequence (ref: backward.go:359-364).
    # A numerator total of LOG_ZERO (unreachable final state) is also a
    # failure even though -1e30 is technically finite.
    ok = (jnp.isfinite(per_seq_objf)
          & (num_logprob > 0.5 * LOG_ZERO)
          & (den_logprob > 0.5 * LOG_ZERO))
    per_seq_objf = jnp.where(ok, per_seq_objf, -10.0 * w * T)
    deriv = jnp.where(ok[:, None, None], deriv, 0.0)
    deriv = jnp.where(jnp.isfinite(deriv), deriv, 0.0)

    if deriv_weights is not None:
        deriv = deriv * deriv_weights[:, :, None]

    total_objf = per_seq_objf.sum() + l2_term
    total_weight = jnp.sum(w) * T
    result = ChainResult(
        total_objf=total_objf,
        l2_term=l2_term,
        total_weight=total_weight,
        num_logprob=num_logprob,
        den_logprob=den_logprob,
        objf_per_frame=total_objf / total_weight,
        out_of_range_count=oor_count,
        ok=ok,
    )
    return result, deriv, num_post


# ---------------------------------------------------------------------------
# custom_vjp entry point: differentiable objective
# ---------------------------------------------------------------------------

def make_chain_objf(num_graph: NumeratorGraphBatch, den: DenominatorComputation,
                    opts: ChainTrainingOpts = ChainTrainingOpts()):
    """Build a differentiable objf(nnet_output, weights) -> (objf, ChainResult).

    The VJP wrt nnet_output is the analytic forward-backward derivative;
    weights are treated as non-differentiable.
    """

    @jax.custom_vjp
    def objf_fn(nnet_output, weights):
        result, _ = chain_objf_and_deriv(num_graph, den, nnet_output,
                                         weights, opts=opts)
        return result.total_objf, result

    def objf_fwd(nnet_output, weights):
        result, deriv = chain_objf_and_deriv(num_graph, den, nnet_output,
                                             weights, opts=opts)
        return (result.total_objf, result), deriv

    def objf_bwd(deriv, cotangents):
        g_objf, _g_result = cotangents
        return (g_objf * deriv, None)

    objf_fn.defvjp(objf_fwd, objf_bwd)
    return objf_fn


def make_chain_objf_with_post(num_graph: NumeratorGraphBatch,
                              den: DenominatorComputation,
                              opts: ChainTrainingOpts = ChainTrainingOpts()):
    """Like make_chain_objf, but also returns the numerator posteriors
    (stop-gradiented) so callers can add cross-entropy regularization on a
    second head: xent_objf = sum(w * num_post * xent_logprob)
    (Kaldi nnet-chain-training.cc xent_regularize path).

    The returned objf_fn takes (nnet_output, weights, deriv_weights) where
    deriv_weights [B, T] (or None) mask the chain DERIVATIVE per frame
    (Kaldi supervision deriv-weights: e.g. zeroing chunk-overlap frames);
    the objective value itself is unweighted, matching Kaldi."""

    @jax.custom_vjp
    def objf_fn(nnet_output, weights, deriv_weights):
        result, _, num_post = _chain_core(num_graph, den, nnet_output,
                                          weights, deriv_weights, opts=opts)
        return result.total_objf, result, jax.lax.stop_gradient(num_post)

    def objf_fwd(nnet_output, weights, deriv_weights):
        result, deriv, num_post = _chain_core(num_graph, den, nnet_output,
                                              weights, deriv_weights,
                                              opts=opts)
        return ((result.total_objf, result, jax.lax.stop_gradient(num_post)),
                deriv)

    def objf_bwd(deriv, cotangents):
        g_objf = cotangents[0]
        return (g_objf * deriv, None, None)

    objf_fn.defvjp(objf_fwd, objf_bwd)
    return objf_fn


def chain_objf(num_graph, den, nnet_output, weights=None,
               opts: ChainTrainingOpts = ChainTrainingOpts()):
    """One-shot differentiable objective (builds the vjp wrapper inline)."""
    B = nnet_output.shape[0]
    if weights is None:
        weights = jnp.ones(B, dtype=nnet_output.dtype)
    return make_chain_objf(num_graph, den, opts)(nnet_output, weights)


def chain_loss_and_grad(num_graph, den, nnet_output, weights=None,
                        opts: ChainTrainingOpts = ChainTrainingOpts()):
    """Convenience: (loss, ChainResult, d loss/d output) with loss = -objf."""
    result, deriv = chain_objf_and_deriv(num_graph, den, nnet_output,
                                         weights, opts=opts)
    return -result.total_objf, result, -deriv
