"""Batched on-device Viterbi over dense decoding graphs.

For decoding graphs that fit a dense state table (S up to a few thousand —
epsilon-free, or epsilon-closed offline), the max-plus recursion runs as a
single jitted lax.scan on TPU over a batch of utterances:

    score[t+1, d] = max_s ( score[t, s] + trans[s, d] + acoustic[t, pdf(s,d)] )

The dense [S, S] transition/pdf tables are built once from a DecodingGraph
(taking the best arc per (src, dst) pair, exact for determinized graphs).
Backpointers are returned to the host for traceback; the host-side
ViterbiDecoder (viterbi.py) remains the general sparse/beam reference.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from kaldi_fp16_tpu.decode.graph import DecodingGraph

NEG_INF = -1.0e30


@dataclass
class DenseGraph:
    """Dense max-plus form of a decoding graph."""
    trans: np.ndarray      # [S, S] float32: -graph_cost, NEG_INF if no arc
    pdf: np.ndarray        # [S, S] int32: acoustic row for the arc (or 0)
    ilabel: np.ndarray     # [S, S] int32: input label of the best arc
    olabel: np.ndarray     # [S, S] int32: output label of the best arc
    final: np.ndarray      # [S] float32: -final_cost, NEG_INF if not final
    start: int

    @property
    def num_states(self) -> int:
        return self.trans.shape[0]

    @classmethod
    def from_graph(cls, g: DecodingGraph) -> "DenseGraph":
        """Best emitting arc per (src, dst); requires an epsilon-free graph
        (compose/epsilon-remove offline for HCLG with eps arcs)."""
        S = g.num_states
        if len(g.eps_dst):
            raise ValueError("dense decoder requires an epsilon-free graph")
        trans = np.full((S, S), NEG_INF, dtype=np.float32)
        pdf = np.zeros((S, S), dtype=np.int32)
        ilabel = np.zeros((S, S), dtype=np.int32)
        olabel = np.zeros((S, S), dtype=np.int32)
        for s in range(S):
            for a in range(g.em_row_ptr[s], g.em_row_ptr[s + 1]):
                d = int(g.em_dst[a])
                w = -float(g.em_weight[a])
                if w > trans[s, d]:
                    trans[s, d] = w
                    pdf[s, d] = g.pdf_of(int(g.em_ilabel[a]))
                    ilabel[s, d] = int(g.em_ilabel[a])
                    olabel[s, d] = int(g.em_olabel[a])
        final = np.where(np.isfinite(g.final_cost), -g.final_cost,
                         NEG_INF).astype(np.float32)
        return cls(trans=trans, pdf=pdf, ilabel=ilabel, olabel=olabel,
                   final=final, start=g.start)


@functools.partial(jax.jit, static_argnames=())
def _viterbi_scan(trans, pdf, final, start, loglikes, acoustic_scale):
    """loglikes [B, T, P] -> (best_score [B], backptr [B, T, S], last [B])."""
    B, T, P = loglikes.shape
    S = trans.shape[0]

    score0 = jnp.full((B, S), NEG_INF, dtype=jnp.float32)
    score0 = score0.at[:, start].set(0.0)

    def step(score, ll_t):
        # acoustic contribution per (s, d): scale * ll[pdf[s, d]]
        ac = acoustic_scale * ll_t[:, pdf]               # [B, S, S]
        cand = score[:, :, None] + trans[None] + ac      # [B, S, S]
        best = cand.max(axis=1)                          # [B, S] over src
        bp = cand.argmax(axis=1).astype(jnp.int32)       # [B, S]
        return best, bp

    final_score, bps = jax.lax.scan(step, score0,
                                    jnp.swapaxes(loglikes, 0, 1))
    total = final_score + final[None]
    last = total.argmax(axis=1).astype(jnp.int32)
    best = total.max(axis=1)
    return best, jnp.swapaxes(bps, 0, 1), last


class DenseViterbiDecoder:
    """Full (unpruned) batched Viterbi on device; exact best path."""

    def __init__(self, graph: DecodingGraph, acoustic_scale: float = 1.0):
        self.dense = DenseGraph.from_graph(graph)
        self.acoustic_scale = acoustic_scale
        self._trans = jnp.asarray(self.dense.trans)
        self._pdf = jnp.asarray(self.dense.pdf)
        self._final = jnp.asarray(self.dense.final)

    def decode_batch(self, loglikes) -> List[dict]:
        """loglikes [B, T, P] -> list of {words, alignment, total_cost}."""
        ll = jnp.asarray(loglikes, dtype=jnp.float32)
        best, bps, last = _viterbi_scan(
            self._trans, self._pdf, self._final,
            jnp.asarray(self.dense.start, jnp.int32), ll,
            jnp.asarray(self.acoustic_scale, jnp.float32))
        best = np.asarray(best)
        bps = np.asarray(bps)
        last = np.asarray(last)
        B, T, _ = bps.shape
        results = []
        for b in range(B):
            states = np.zeros(T + 1, dtype=np.int32)
            states[T] = last[b]
            for t in range(T - 1, -1, -1):
                states[t] = bps[b, t, states[t + 1]]
            words, align = [], []
            for t in range(T):
                s, d = states[t], states[t + 1]
                ol = int(self.dense.olabel[s, d])
                # the arc's true input label (pdf+1 only when no
                # ilabel_to_pdf map exists — transition-id graphs differ)
                align.append(int(self.dense.ilabel[s, d]))
                if ol > 0:
                    words.append(ol)
            results.append({"words": words, "alignment": align,
                            "total_cost": -float(best[b]),
                            "final_reached": bool(np.isfinite(-best[b]))
                            and best[b] > NEG_INF / 2})
        return results
