"""Scratch profiler: where does the tree-layout LATTICE path spend time?

HCLG-scale lattice decode measured 1.4 audio-sec/s (55 ms/frame at B=8,
S=100K) while its min_step reduction costs only ~4 ms/frame — this
times each piece of _lattice_masks_tree's per-frame work in isolation.

Run: python tools/profile_lattice.py [--states 100000 --batch 8]
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=100000)
    ap.add_argument("--pdfs", type=int, default=3080)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import _common  # noqa: F401 — repo-root path + compile cache
    from decodebench import synth_hclg_graph
    from kaldi_fp16_tpu.decode.tpu_viterbi import (
        ArcGraph, TreeEllGraph, _tree_min_step, _tree_min_step_mask,
        NEG_INF,
    )

    S, P, B, T = args.states, args.pdfs, args.batch, args.frames
    graph = synth_hclg_graph(S, P)
    a = ArcGraph.from_graph(graph)
    S = a.num_states
    A = len(a.src)
    print(f"graph: S={S} A={A} P={P} B={B} T={T}")

    tin = TreeEllGraph.from_arcs(a, "in")
    tout = TreeEllGraph.from_arcs(a, "out")
    in_src, in_pdf, in_w, _, in_lvls = tin.device_arrays()
    out_dst, out_pdf, out_w, _, out_lvls = tout.device_arrays()
    src = jnp.asarray(a.src)
    dst = jnp.asarray(a.dst)
    pdf = jnp.asarray(a.pdf)
    gcost = jnp.asarray(-a.weight)
    rng = np.random.default_rng(0)
    alpha0 = jnp.asarray(rng.normal(size=(S, B)).astype(np.float32))
    ll = jnp.asarray(rng.normal(size=(T, P, B)).astype(np.float32))
    thr = jnp.zeros((B,), jnp.float32)
    pad = (-A) % 8

    def bench(name, step_fn, carry0):
        @jax.jit
        def run(carry0, ll):
            def body(c, ll_t):
                return step_fn(c, ll_t)
            c, ys = jax.lax.scan(body, carry0, ll)
            return c, ys
        r = run(carry0, ll)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(carry0, ll)
        jax.block_until_ready(r)
        ms = (time.perf_counter() - t0) / T * 1e3
        print(f"{name:44s} {ms:8.3f} ms/frame")
        return ms

    # 1. min_step only (the alpha/beta reduction)
    bench("min_step only", lambda c, ll_t: (
        _tree_min_step(in_src, in_pdf, in_w, in_lvls, c, ll_t,
                       jnp.float32(1.0)), None), alpha0)

    # 2. arc keep-mask gathers only (alpha[src] + ll[pdf] + beta[dst])
    def mask_only(c, ll_t):
        tot = (jnp.take(c, src, axis=0)
               + gcost[:, None] + jnp.take(ll_t, pdf, axis=0)
               + jnp.take(c, dst, axis=0))
        return c, (tot <= thr[None, :]).sum(axis=0)
    bench("keep-mask gathers (3xA rows) + cmp", mask_only, alpha0)

    # 3. packbits alone on a [A+pad, B] bool
    def pack_only(c, ll_t):
        kp = (c[:1] + ll_t[:1] > 0)  # tiny; just to depend on inputs
        big = jnp.broadcast_to(kp, (A + pad, B))
        return c, jnp.packbits(big.astype(jnp.uint8), axis=0)
    bench("packbits [A, B] alone", pack_only, alpha0)

    # 4. full bwd_frame work (min_step + mask + packbits)
    def full(c, ll_t):
        beta = _tree_min_step(out_dst, out_pdf, out_w, out_lvls, c, ll_t,
                              jnp.float32(1.0))
        tot = (jnp.take(c, src, axis=0)
               + gcost[:, None] + jnp.take(ll_t, pdf, axis=0)
               + jnp.take(c, dst, axis=0))
        kp = jnp.pad(tot <= thr[None, :], ((0, pad), (0, 0)))
        packed = jnp.packbits(kp.astype(jnp.uint8), axis=0)
        return beta, packed
    bench("full bwd_frame (min+mask+packbits)", full, alpha0)

    # 5. FUSED bwd_frame (r3): keep-mask emitted inside the beta tree
    # reduction in slot order — no per-arc gathers
    rstate = tuple(jnp.asarray(x) for x in tout.row_state)
    n_slots = sum(t.size for t in tout.arc)
    spad = (-n_slots) % 8

    def fused(c, ll_t):
        beta, keep = _tree_min_step_mask(
            out_dst, out_pdf, out_w, rstate, out_lvls, c, c, ll_t,
            jnp.float32(1.0), thr)
        kp = jnp.pad(keep, ((0, spad), (0, 0)))
        packed = jnp.packbits(kp.astype(jnp.uint8), axis=0)
        return beta, packed
    bench("FUSED bwd_frame (slot-order mask)", fused, alpha0)


if __name__ == "__main__":
    main()
