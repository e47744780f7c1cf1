"""Scratch profiler: where does the tree-ELL Viterbi step spend its time?

Round-3 finding: tree layout at S=100K/390K arcs measured 3.8 audio-sec/s
(~42 ms/frame) vs the gather-roofline estimate of ~0.2 ms/frame.  This
times each piece of the per-frame step in isolation (lax.scan over T so
dispatch is amortized) to find the culprit.

Run: python tools/profile_tree.py [--states 100000 --batch 16]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=100000)
    ap.add_argument("--pdfs", type=int, default=3080)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--max-width", type=int, default=128)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import _common  # noqa: F401 — repo-root path + compile cache
    from decodebench import synth_hclg_graph
    from kaldi_fp16_tpu.decode.tpu_viterbi import (
        ArcGraph, TreeEllGraph, _ell_gather, _tree_max_step, _tree_min_step,
        NEG_INF,
    )

    S, P, B, T = args.states, args.pdfs, args.batch, args.frames
    graph = synth_hclg_graph(S, P)
    arcs = ArcGraph.from_graph(graph)
    S = graph.num_states
    A = len(arcs.src)
    print(f"graph: S={S} A={A} P={P} B={B} T={T}")

    t0 = time.perf_counter()
    tree = TreeEllGraph.from_arcs(arcs, "in", max_width=args.max_width)
    print(f"tree build: {time.perf_counter() - t0:.2f}s")
    l1_shapes = [s.shape for s in tree.src]
    slots_l1 = sum(int(np.prod(s)) for s in l1_shapes)
    print(f"level-1 buckets: {l1_shapes} ({slots_l1} slots, "
          f"{slots_l1 / max(A,1):.2f}x arcs)")
    for i, lvl in enumerate(tree.levels):
        print(f"reduce level {i + 2}: {[e.shape for e in lvl]}")

    bsrc, bpdf, bw, barc, levels = tree.device_arrays()
    rng = np.random.default_rng(0)
    score0 = jnp.asarray(rng.normal(size=(S, B)).astype(np.float32))
    ll = jnp.asarray(rng.normal(size=(T, P, B)).astype(np.float32))

    def bench(name, step_fn, carry0):
        @jax.jit
        def run(carry0, ll):
            def body(c, ll_t):
                return step_fn(c, ll_t), ()
            c, _ = jax.lax.scan(body, carry0, ll)
            return c
        r = run(carry0, ll)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(carry0, ll)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / T * 1e3
        print(f"{name:40s} {ms:8.3f} ms/frame")
        return ms

    # 1. gathers only: both operand gathers, summed, reduced by max
    def gathers_only(score, ll_t):
        outs = []
        for src_b, pdf_b, w_b in zip(bsrc, bpdf, bw):
            Rb, Db = src_b.shape
            sb = (Rb, Db, B)
            cand = (_ell_gather(score, src_b.reshape(-1), sb)
                    + w_b[..., None]
                    + _ell_gather(ll_t, pdf_b.reshape(-1), sb))
            outs.append(cand.max(axis=1))
        vals = jnp.concatenate(outs, axis=0)
        return jnp.maximum(vals[:S], score)  # keep shape [S, B]

    bench("L1 gathers+max (no levels, no argmax)", gathers_only, score0)

    # 2. min_step (full reduction levels, no arc tracking)
    def min_step(score, ll_t):
        return _tree_min_step(bsrc, bpdf, bw, levels, score, ll_t,
                              jnp.float32(1.0))
    bench("min_step (levels, no argmax)", min_step, score0)

    # 3. max_step full (argmax + arc tracking), discard bp
    def max_step(score, ll_t):
        nxt, arc = _tree_max_step(bsrc, bpdf, bw, barc, levels, A, score,
                                  ll_t, jnp.float32(1.0))
        return nxt + 1e-30 * arc.astype(jnp.float32)
    bench("max_step (argmax+arc track, bp dropped)", max_step, score0)

    # 4. max_step with [T, S, B] bp stacking (what _tree_viterbi does)
    @jax.jit
    def full(score0, ll):
        def body(c, ll_t):
            nxt, arc = _tree_max_step(bsrc, bpdf, bw, barc, levels, A, c,
                                      ll_t, jnp.float32(1.0))
            return nxt, arc
        c, bps = jax.lax.scan(body, score0, ll)
        return c, bps
    r = full(score0, ll)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = full(score0, ll)
    jax.block_until_ready(r)
    print(f"{'max_step + [T,S,B] bp stack':40s} "
          f"{(time.perf_counter() - t0) / T * 1e3:8.3f} ms/frame")


if __name__ == "__main__":
    main()
