"""Log-domain numerator forward-backward as a single jitted lax.scan.

TPU redesign of the reference's per-frame kernel-launch loop
(ref: cpp/cuda/chain.cu:368-473 — one launch per frame, atomicLogAdd):
here the whole T-recursion is ONE fused scan compiled by XLA, and the
per-frame arc reduction is an exact fixed-order segment-logsumexp
(XLA determinism replaces the reference's atomic/deterministic kernel split,
ref: chain_det.cu).

Shapes are fully static: B sequences, S padded states, A padded arcs, T
frames.  All arrays batched [B, ...]; masking handles padding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.chain.graph import LOG_ZERO, NumeratorGraphBatch


def _segment_logsumexp(vals: jnp.ndarray, segids: jnp.ndarray, num_segments: int
                       ) -> jnp.ndarray:
    """Scatter-logsumexp of vals into num_segments buckets (per batch row).

    vals, segids: [A]; returns [S].  Entries <= LOG_ZERO are treated as
    log(0).  Exact and deterministic (two-pass max + sum-exp).
    """
    seg_max = jax.ops.segment_max(vals, segids, num_segments=num_segments)
    seg_max = jnp.maximum(seg_max, LOG_ZERO)  # empty segments -> -inf guard
    shifted = jnp.where(vals > LOG_ZERO, jnp.exp(vals - seg_max[segids]), 0.0)
    seg_sum = jax.ops.segment_sum(shifted, segids, num_segments=num_segments)
    return jnp.where(seg_sum > 0, seg_max + jnp.log(seg_sum), LOG_ZERO)


@functools.partial(jax.jit, static_argnames=("num_states",))
def _num_forward_backward(arc_src, arc_dst, arc_pdf, arc_logw, arc_mask,
                          start, final_logw, nnet_output, num_states: int):
    """Returns (total_logprob [B], posteriors [B, T, P])."""
    B, T, P = nnet_output.shape
    S = num_states

    seg_lse = jax.vmap(_segment_logsumexp, in_axes=(0, 0, None))

    # hoisted per-arc scores for all frames: [T, B, A]
    # score[b, t, a] = nnet[b, t, pdf[b, a]] + logw[b, a], masked
    pdf_scores = jax.vmap(lambda x_bt, pdf_b: x_bt[:, pdf_b])(
        nnet_output, arc_pdf)                                  # [B, T, A]
    scores = pdf_scores + arc_logw[:, None, :]
    scores = jnp.where(arc_mask[:, None, :] > 0, scores, LOG_ZERO)
    scores = jnp.swapaxes(scores, 0, 1)                        # [T, B, A]

    alpha0 = jnp.full((B, S), LOG_ZERO, dtype=jnp.float32)
    alpha0 = alpha0.at[jnp.arange(B), start].set(0.0)

    def fwd_step(alpha, score_t):
        src_alpha = jnp.take_along_axis(alpha, arc_src, axis=1)
        vals = jnp.where(src_alpha > LOG_ZERO, src_alpha + score_t, LOG_ZERO)
        alpha_next = seg_lse(vals, arc_dst, S)
        return alpha_next, alpha

    alpha_T, alphas = jax.lax.scan(fwd_step, alpha0, scores)
    # alphas: [T, B, S] = alpha[0..T-1]; alpha_T = alpha[T]

    total = jax.vmap(lambda a, f: jax.scipy.special.logsumexp(
        jnp.where(f > LOG_ZERO, a + f, -jnp.inf)))(alpha_T, final_logw)
    total = jnp.where(jnp.isfinite(total), total, LOG_ZERO)

    betaT = jnp.where(final_logw > LOG_ZERO, final_logw, LOG_ZERO)

    def bwd_step(beta_next, inp):
        score_t, alpha_t = inp
        dst_beta = jnp.take_along_axis(beta_next, arc_dst, axis=1)
        vals = jnp.where(dst_beta > LOG_ZERO, dst_beta + score_t, LOG_ZERO)
        beta_t = seg_lse(vals, arc_src, S)
        # posteriors for frame t
        src_alpha = jnp.take_along_axis(alpha_t, arc_src, axis=1)
        lp = jnp.where((src_alpha > LOG_ZERO) & (dst_beta > LOG_ZERO),
                       src_alpha + score_t + dst_beta - total[:, None],
                       -jnp.inf)
        lp = jnp.minimum(lp, 0.0)                              # clamp (chain.cu:311)
        arc_post = jnp.where(jnp.isfinite(lp), jnp.exp(lp), 0.0)
        post_t = jax.vmap(
            lambda v, p: jax.ops.segment_sum(v, p, num_segments=P)
        )(arc_post, arc_pdf)                                   # [B, P]
        return beta_t, post_t

    _, posts = jax.lax.scan(bwd_step, betaT, (scores, alphas), reverse=True)
    posteriors = jnp.swapaxes(posts, 0, 1)                     # [B, T, P]
    ok = total > LOG_ZERO
    posteriors = jnp.where(ok[:, None, None], posteriors, 0.0)
    return total, posteriors


def numerator_forward_backward(graph: NumeratorGraphBatch,
                               nnet_output: jnp.ndarray
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched log-domain forward-backward.

    nnet_output: [B, T, P] float32.
    Returns (total_logprob [B], posteriors [B, T, P]).
    """
    return _num_forward_backward(
        jnp.asarray(graph.arc_src), jnp.asarray(graph.arc_dst),
        jnp.asarray(graph.arc_pdf), jnp.asarray(graph.arc_logw),
        jnp.asarray(graph.arc_mask), jnp.asarray(graph.start),
        jnp.asarray(graph.final_logw), nnet_output,
        num_states=graph.num_states)
