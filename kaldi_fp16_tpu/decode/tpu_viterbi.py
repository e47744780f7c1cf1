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


# ---------------------------------------------------------------------------
# Sparse arc-parallel Viterbi — the production on-device decoder.
#
# The dense [S, S] formulation above gathers ll[pdf[s, d]] into a [B, S, S]
# intermediate every frame (537 MB/frame at S=2048, B=32) and ships a
# [B, T, S] backpointer table to the host: measured 25.5 s for a
# 32x500-frame batch.  This decoder applies the chain-kernel design
# instead (SURVEY.md §7 stage 5 philosophy): arcs as a flat list sorted
# by destination, scores state-major [S, B], per-frame per-arc gathers +
# a segment-max into the destination states, and the traceback as a
# second (reverse) on-device scan so only [T, B] arc ids ever cross the
# host boundary.  Measured 1.13 s for the same batch — 23x the dense
# path (tools/decodebench.py; the in-scan step itself is 0.46 ms, so
# off-tunnel the gap widens).  A blocked masked-max replacement for the
# two segment scatters was measured slower (0.58 vs 0.46 ms/step).
# ---------------------------------------------------------------------------


@dataclass
class ArcGraph:
    """Flat arc-list (dst-sorted) max-plus form of a decoding graph."""
    src: np.ndarray        # [A] int32
    dst: np.ndarray        # [A] int32, ascending
    pdf: np.ndarray        # [A] int32 acoustic row
    ilabel: np.ndarray     # [A] int32
    olabel: np.ndarray     # [A] int32
    weight: np.ndarray     # [A] float32, -graph_cost (max-plus)
    final: np.ndarray      # [S] float32, -final_cost or NEG_INF
    start: int
    num_states: int

    @classmethod
    def from_graph(cls, g: DecodingGraph) -> "ArcGraph":
        if len(g.eps_dst):
            raise ValueError("arc decoder requires an epsilon-free graph")
        S = g.num_states
        A = len(g.em_dst)
        src = np.repeat(np.arange(S, dtype=np.int32),
                        np.diff(g.em_row_ptr).astype(np.int64))
        if g.ilabel_to_pdf is not None:
            pdf = g.ilabel_to_pdf[g.em_ilabel].astype(np.int32)
        else:
            pdf = (g.em_ilabel - 1).astype(np.int32)
        order = np.argsort(g.em_dst, kind="stable").astype(np.int64)
        final = np.where(np.isfinite(g.final_cost), -g.final_cost,
                         NEG_INF).astype(np.float32)
        assert A == len(src)
        return cls(src=src[order], dst=g.em_dst[order].astype(np.int32),
                   pdf=pdf[order], ilabel=g.em_ilabel[order].astype(np.int32),
                   olabel=g.em_olabel[order].astype(np.int32),
                   weight=(-g.em_weight[order]).astype(np.float32),
                   final=final, start=g.start, num_states=S)


@functools.partial(jax.jit, static_argnames=("num_states",))
def _arc_viterbi(src, dst, pdf, weight, final, start, loglikes,
                 acoustic_scale, num_states: int):
    """loglikes [B, T, P] -> (best [B], last [B], arcs_taken [T, B]).

    Forward: one lax.scan over frames; score kept state-major [S, B];
    per-arc candidate = score[src] + w + scale*ll[pdf], reduced into
    destinations with a sorted segment-max; the winning ARC id per
    (state, frame) stays on device.  Traceback: a reverse scan walks
    bp[t, state] -> src[arc] so only [T, B] int32 leaves the chip.
    """
    B, T, P = loglikes.shape
    S = num_states
    A = src.shape[0]
    ll_tpb = jnp.transpose(loglikes, (1, 2, 0))          # [T, P, B]

    score0 = jnp.full((S, B), NEG_INF, dtype=jnp.float32)
    score0 = score0.at[start, :].set(0.0)
    arc_ids = jnp.arange(A, dtype=jnp.int32)

    def step(score, ll_t):
        cand = (jnp.take(score, src, axis=0)
                + weight[:, None]
                + acoustic_scale * jnp.take(ll_t, pdf, axis=0))   # [A, B]
        nxt = jax.ops.segment_max(cand, dst, num_segments=S,
                                  indices_are_sorted=True)        # [S, B]
        nxt = jnp.maximum(nxt, NEG_INF)   # segment_max pads with -inf
        # winning arc per destination: smallest arc id achieving the max
        win = cand >= jnp.take(nxt, dst, axis=0)
        bp = jax.ops.segment_min(
            jnp.where(win, arc_ids[:, None], jnp.int32(A)), dst,
            num_segments=S, indices_are_sorted=True)              # [S, B]
        return nxt, bp

    final_score, bps = jax.lax.scan(step, score0, ll_tpb)         # [T, S, B]
    total = final_score + final[:, None]
    best = total.max(axis=0)
    last = total.argmax(axis=0).astype(jnp.int32)                 # [B]

    def back_step(state, bp_t):
        arc = jnp.take_along_axis(bp_t, state[None, :], axis=0)[0]  # [B]
        safe = jnp.clip(arc, 0, A - 1)
        prev = jnp.where(arc < A, jnp.take(src, safe), state)
        return prev, arc

    _, arcs_taken = jax.lax.scan(back_step, last, bps, reverse=True)
    return best, last, arcs_taken


class SparseViterbiDecoder:
    """Exact batched Viterbi over an epsilon-free graph, arc-parallel on
    device with on-device traceback (same results as DenseViterbiDecoder,
    bench-scale graphs decode ~60x faster — tools/decodebench.py)."""

    def __init__(self, graph: DecodingGraph, acoustic_scale: float = 1.0):
        self.arcs = ArcGraph.from_graph(graph)
        self.acoustic_scale = acoustic_scale
        a = self.arcs
        self._dev = tuple(jnp.asarray(v) for v in
                          (a.src, a.dst, a.pdf, a.weight, a.final))
        # scalars uploaded once: each per-call transfer costs a full
        # dispatch round trip on tunneled backends
        self._start_j = jnp.asarray(a.start, jnp.int32)
        self._scale_j = jnp.asarray(acoustic_scale, jnp.float32)

    def decode_batch(self, loglikes) -> List[dict]:
        """loglikes [B, T, P] -> list of {words, alignment, total_cost}."""
        ll = jnp.asarray(loglikes, dtype=jnp.float32)
        src, dst, pdf, weight, final = self._dev
        best, last, arcs_taken = _arc_viterbi(
            src, dst, pdf, weight, final, self._start_j, ll, self._scale_j,
            num_states=self.arcs.num_states)
        best = np.asarray(best)
        arcs_taken = np.asarray(arcs_taken)                       # [T, B]
        A = len(self.arcs.src)
        B = ll.shape[0]
        results = []
        for b in range(B):
            path = arcs_taken[:, b]
            ok = bool(best[b] > NEG_INF / 2) and bool((path < A).all())
            words, align = [], []
            if ok:
                for arc in path:
                    align.append(int(self.arcs.ilabel[arc]))
                    ol = int(self.arcs.olabel[arc])
                    if ol > 0:
                        words.append(ol)
            results.append({"words": words, "alignment": align,
                            "total_cost": -float(best[b]),
                            "final_reached": ok})
        return results


# ---------------------------------------------------------------------------
# Device lattice generation (exact, beam-pruned)
#
# The retrieved literature (PAPERS.md: "GPU-based WFST Decoder with Exact
# Lattice Generation", "GPU-Accelerated Viterbi Exact Lattice Decoder")
# generates lattices on the accelerator; here the TPU-native shape is two
# min-plus scans + one mask: an arc instance (t, a) belongs to the
# lattice iff
#
#     alpha[t, src] + (graph_cost + scale*acoustic_cost) + beta[t+1, dst]
#         <= best_total + lattice_beam
#
# which is EXACTLY Lattice.prune's keep criterion — so the device path is
# exact (full Viterbi, no token beam) where the host token-passing
# decoder is approximate under tight decode beams.  The device emits
# bit-packed masks ([T, A/8, B] uint8, ~1 bit per arc instance); the
# host assembles Lattice objects that plug into the existing n-best /
# LM-rescoring / oracle-WER machinery unchanged.
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_states",))
def _lattice_masks(src, dst, pdf, graph_cost, final_cost, start, loglikes,
                   acoustic_scale, lattice_beam, num_states: int):
    """loglikes [B, T, P] -> (packed keep-masks [T, ceil(A/8), B] uint8,
    best [B]).  All costs min-plus (positive = worse)."""
    B, T, P = loglikes.shape
    S = num_states
    A = src.shape[0]
    INF = jnp.float32(-NEG_INF)
    ac_cost = -jnp.transpose(loglikes, (1, 2, 0))        # [T, P, B] cost

    alpha0 = jnp.full((S, B), INF).at[start, :].set(0.0)

    def arc_costs(ll_t):
        return (graph_cost[:, None]
                + acoustic_scale * jnp.take(ll_t, pdf, axis=0))  # [A, B]

    def fwd(alpha, ll_t):
        cand = jnp.take(alpha, src, axis=0) + arc_costs(ll_t)
        nxt = jnp.minimum(
            -jax.ops.segment_max(-cand, dst, num_segments=S,
                                 indices_are_sorted=True), INF)
        return nxt, alpha

    alpha_T, alpha_hist = jax.lax.scan(fwd, alpha0, ac_cost)
    total = alpha_T + final_cost[:, None]
    best = total.min(axis=0)                              # [B]

    betaT = jnp.broadcast_to(final_cost[:, None], (S, B))

    # beta recursion reduces into SOURCE states; arcs are dst-sorted, so
    # use segment_min over the unsorted src ids (correct; the sorted-id
    # fast path only applies to the dst-grouped forward)
    def bwd_step(beta_next, ll_t):
        cand = arc_costs(ll_t) + jnp.take(beta_next, dst, axis=0)
        beta = jnp.minimum(
            jax.ops.segment_min(cand, src, num_segments=S), INF)
        return beta, beta_next

    _, beta_hist = jax.lax.scan(bwd_step, betaT, ac_cost, reverse=True)
    # beta_hist[t] = beta at time t+1 (the carry INPUT emitted per step)

    # no reachable final state => keep NOTHING: with best ~ INF, fp32
    # saturation would otherwise make `tot <= best + beam` true for every
    # arc with one finite endpoint (the host path has the same guard in
    # Lattice.prune via np.isfinite(best))
    thr = jnp.where(best > INF / 2, -INF, best + lattice_beam)    # [B]

    def mask_step(carry, inp):
        alpha_t, beta_t1, ll_t = inp
        tot = (jnp.take(alpha_t, src, axis=0) + arc_costs(ll_t)
               + jnp.take(beta_t1, dst, axis=0))          # [A, B]
        keep = tot <= thr[None, :]
        pad = (-A) % 8
        kp = jnp.pad(keep, ((0, pad), (0, 0)))
        packed = jnp.packbits(kp.astype(jnp.uint8), axis=0)
        return carry, packed

    _, packed = jax.lax.scan(mask_step, 0,
                             (alpha_hist, beta_hist, ac_cost))
    return packed, best


class DeviceLatticeDecoder:
    """Exact beam-pruned lattice generation on device for epsilon-free
    graphs; host assembly into decode.lattice.Lattice objects."""

    def __init__(self, graph: DecodingGraph, acoustic_scale: float = 1.0,
                 lattice_beam: float = 8.0):
        self.graph = graph
        self.arcs = ArcGraph.from_graph(graph)
        self.acoustic_scale = acoustic_scale
        self.lattice_beam = lattice_beam
        a = self.arcs
        self._src = jnp.asarray(a.src)
        self._dst = jnp.asarray(a.dst)
        self._pdf = jnp.asarray(a.pdf)
        self._gcost = jnp.asarray(-a.weight)          # back to tropical cost
        fc = np.where(a.final > NEG_INF / 2, -a.final, -NEG_INF)
        self._fcost = jnp.asarray(fc.astype(np.float32))
        self._start = jnp.asarray(a.start, jnp.int32)

    def decode_batch(self, loglikes) -> List["object"]:
        """loglikes [B, T, P] -> list of Lattice (already beam-pruned)."""
        from kaldi_fp16_tpu.decode.lattice import ArcArrays, Lattice
        ll = jnp.asarray(loglikes, dtype=jnp.float32)
        B, T, P = ll.shape
        packed, best = _lattice_masks(
            self._src, self._dst, self._pdf, self._gcost, self._fcost,
            self._start, ll,
            jnp.asarray(self.acoustic_scale, jnp.float32),
            jnp.asarray(self.lattice_beam, jnp.float32),
            num_states=self.arcs.num_states)
        packed = np.asarray(packed)                   # [T, A8, B]
        best = np.asarray(best)
        a = self.arcs
        A = len(a.src)
        S = self.arcs.num_states
        lls = np.asarray(ll)
        out = []
        for b in range(B):
            # vectorized assembly: node key = frame*S + state; np.unique
            # keys ascending, and in an exact lattice every frame-0
            # source is the start state (alpha[0] is finite only there),
            # so node 0 is always (0, start) as Lattice requires
            mask = np.unpackbits(packed[:, :, b], axis=1)[:, :A] > 0
            ts, ais = np.nonzero(mask)
            src_keys = ts.astype(np.int64) * S + a.src[ais]
            dst_keys = (ts.astype(np.int64) + 1) * S + a.dst[ais]
            start_key = np.asarray([0 * S + a.start], np.int64)
            uniq, inv = np.unique(
                np.concatenate([start_key, src_keys, dst_keys]),
                return_inverse=True)
            n = len(uniq)
            k = len(ts)
            src_ids = inv[1:1 + k]
            dst_ids = inv[1 + k:]
            frames = (uniq // S).astype(np.int64)
            arcs = ArcArrays(src_ids, dst_ids, a.ilabel[ais], a.olabel[ais],
                             (-a.weight[ais]).astype(np.float64),
                             (-lls[b, ts, a.pdf[ais]]).astype(np.float64))
            final = np.full(n, np.inf)
            at_T = frames == T
            if at_T.any():
                fc = self.graph.final_cost[uniq[at_T] - T * S]
                final[at_T] = fc
            out.append(Lattice(num_nodes=n, arcs=arcs, final_cost=final,
                               node_frame=frames))
        return out
