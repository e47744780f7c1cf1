"""Probability-domain leaky-HMM denominator forward-backward (fused scan).

TPU redesign of the reference chain_den.cu (ref: cpp/cuda/chain_den.cu:496-699,
itself a faithful port of Kaldi chain-denominator.cc).  All six Kaldi
behaviors are preserved:

  1. probability space: x = exp(clamp(nnet, -30, 30))
  2. initial probs from the 100-iteration fp64 warmup (graph.initial)
  3. leaky HMM: alpha' = alpha + sum(alpha) * leaky * init
  4. per-frame rescale by 1/sum(alpha) with log-correction accumulation
  5. all states final: beta'[T] = 1/total_prob uniformly
  6. transition prob = exp(-tropical_weight) (baked into graph.prob)

Where the reference launches ~6 kernels per frame with host round-trips for
the running alpha_sum, here the whole recursion (forward AND backward with
posterior accumulation) is two lax.scans inside one jit: zero host syncs,
one XLA fusion per scan body.  The batch dimension N is explicit — the
reference supports only num_sequences == 1 (denominator.go:226-228); this
implementation is batched from the start.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.chain.graph import DenominatorGraph


@functools.partial(jax.jit, static_argnames=("num_states", "compute_grad"))
def _den_forward_backward(src, dst, pdf, prob, init, nnet_output,
                          leaky: jnp.ndarray, num_states: int,
                          compute_grad: bool = True):
    """nnet_output: [N, T, P].  Returns (log_prob [N], posteriors [N, T, P])."""
    N, T, P = nnet_output.shape
    S = num_states

    x = jnp.exp(jnp.clip(nnet_output, -30.0, 30.0))       # [N, T, P]
    xt_seq = jnp.swapaxes(x, 0, 1)                        # [T, N, P]

    seg_sum = jax.vmap(
        lambda v, ids: jax.ops.segment_sum(v, ids, num_segments=S,
                                           indices_are_sorted=True),
        in_axes=(0, None))

    def propagate(alpha_dash, x_t):
        """alpha_next[n, d] = sum_arcs alpha_dash[n, src] * tp * x_t[n, pdf]."""
        contrib = alpha_dash[:, src] * prob[None, :] * x_t[:, pdf]   # [N, A]
        return seg_sum(contrib, dst)                                  # [N, S]

    # ---- forward ----------------------------------------------------------
    alpha0 = jnp.broadcast_to(init, (N, S))
    asum0 = alpha0.sum(axis=1)                             # [N]
    adash0 = alpha0 + asum0[:, None] * leaky * init[None, :]

    def fwd_step(carry, x_t):
        adash_prev, asum_prev = carry
        nxt = propagate(adash_prev, x_t)
        safe = asum_prev > 0
        nxt = jnp.where(safe[:, None], nxt / asum_prev[:, None], nxt)
        logc_inc = jnp.where(safe, jnp.log(asum_prev), 0.0)
        asum = nxt.sum(axis=1)
        adash = nxt + asum[:, None] * leaky * init[None, :]
        return (adash, asum), (adash_prev, asum_prev, logc_inc)

    (adash_T, _asum_T), (adash_hist, asum_hist, logc_incs) = jax.lax.scan(
        fwd_step, (adash0, asum0), xt_seq)
    # adash_hist: [T, N, S] = alpha'[0..T-1]; asum_hist: [T, N] = alpha_sum[0..T-1]

    total_prob = adash_T.sum(axis=1)                       # [N]
    log_prob = jnp.log(total_prob) + logc_incs.sum(axis=0)

    if not compute_grad:
        return log_prob, None

    # ---- backward ---------------------------------------------------------
    seg_sum_src = jax.vmap(
        lambda v, ids: jax.ops.segment_sum(v, ids, num_segments=S),
        in_axes=(0, None))
    seg_sum_pdf = jax.vmap(
        lambda v, ids: jax.ops.segment_sum(v, ids, num_segments=P),
        in_axes=(0, None))

    beta_dash_T = jnp.where(total_prob[:, None] > 0,
                            1.0 / total_prob[:, None], 0.0)
    beta_dash_T = jnp.broadcast_to(beta_dash_T, (N, S))

    def leakify(beta_dash):
        tot_beta = leaky * (beta_dash * init[None, :]).sum(axis=1)  # [N]
        return beta_dash + tot_beta[:, None]

    betaT = leakify(beta_dash_T)

    def bwd_step(beta_next, inp):
        x_t, adash_t, asum_t = inp
        contrib = beta_next[:, dst] * prob[None, :] * x_t[:, pdf]    # [N, A]
        bd = seg_sum_src(contrib, src)
        safe = asum_t > 0
        inv = jnp.where(safe, 1.0 / asum_t, 0.0)
        bd = bd * inv[:, None]
        gamma = adash_t[:, src] * contrib * inv[:, None]             # [N, A]
        post_t = seg_sum_pdf(gamma, pdf)                             # [N, P]
        beta_t = leakify(bd)
        return beta_t, post_t

    _, posts = jax.lax.scan(bwd_step, betaT,
                            (xt_seq, adash_hist, asum_hist), reverse=True)
    posteriors = jnp.swapaxes(posts, 0, 1)                           # [N, T, P]
    return log_prob, posteriors


class DenominatorComputation:
    """Device-resident denominator graph with forward/forward-backward ops
    (the reference's NativeDenominator analog, batched)."""

    def __init__(self, graph: DenominatorGraph, leaky: float = 1e-5):
        self.graph = graph
        self.leaky = leaky
        self._src = jnp.asarray(graph.src)
        self._dst = jnp.asarray(graph.dst)
        self._pdf = jnp.asarray(graph.pdf)
        self._prob = jnp.asarray(graph.prob)
        self._init = jnp.asarray(graph.initial)

    def forward(self, nnet_output: jnp.ndarray) -> jnp.ndarray:
        logp, _ = _den_forward_backward(
            self._src, self._dst, self._pdf, self._prob, self._init,
            nnet_output, jnp.float32(self.leaky),
            num_states=self.graph.num_states, compute_grad=False)
        return logp

    def forward_backward(self, nnet_output: jnp.ndarray
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return _den_forward_backward(
            self._src, self._dst, self._pdf, self._prob, self._init,
            nnet_output, jnp.float32(self.leaky),
            num_states=self.graph.num_states, compute_grad=True)


def denominator_forward_backward(graph: DenominatorGraph,
                                 nnet_output: jnp.ndarray,
                                 leaky: float = 1e-5):
    """Functional convenience wrapper; nnet_output [N, T, P]."""
    return DenominatorComputation(graph, leaky).forward_backward(nnet_output)
