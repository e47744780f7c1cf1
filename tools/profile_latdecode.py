#!/usr/bin/env python
"""Scratch profiler: END-TO-END phase attribution of the HCLG lattice
decode (device scans vs mask compaction vs host assembly vs acoustic
gather).  decodebench --lattice measures the total only; at B=64 the
total is 21.5 s/batch and the per-piece device profile (profile_lattice)
accounts for a fraction — this script times decode_batch's phases
in-place via a monkeypatched section walkthrough.

Run: python tools/profile_latdecode.py [--states 100000 --batch 64]
"""

import argparse
import time

import _common  # noqa: F401
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--states", type=int, default=100000)
    ap.add_argument("--pdfs", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--frames", type=int, default=300)
    ap.add_argument("--transfer", default="compact")
    ap.add_argument("--beam", type=float, default=4.0)
    args = ap.parse_args()
    _common.enable_compile_cache()

    import jax
    import jax.numpy as jnp
    from decodebench import synth_hclg_graph
    import kaldi_fp16_tpu.decode.tpu_viterbi as tv

    graph = synth_hclg_graph(args.states, args.pdfs)
    dec = tv.DeviceLatticeDecoder(graph, acoustic_scale=1.0,
                                  lattice_beam=args.beam,
                                  transfer=args.transfer)
    B, T, P = args.batch, args.frames, args.pdfs
    ll = jax.random.normal(jax.random.PRNGKey(1), (B, T, P),
                           dtype=jnp.float32)
    ll.block_until_ready()

    # warm everything once
    dec.decode_batch(ll)

    # phase 1: kernels only — same kernel routing as decode_batch (the
    # layout is auto-selected: tree above ~64K arcs, segment below)
    S = dec.arcs.num_states
    t0 = time.perf_counter()
    chunk = tv._pick_chunk(T, S, B, dec.alpha_hist_limit)
    if dec.layout == "tree":
        packed, best = tv._lattice_masks_tree_ckpt(
            dec._tree_in, dec._tree_out, dec._tree_rstate,
            dec._fcost, dec._start, ll, dec._scale_j, dec._beam_j,
            num_states=S, chunk=chunk)
    else:
        packed, best = tv._lattice_masks_ckpt(
            dec._src, dec._dst, dec._pdf, dec._gcost, dec._fcost,
            dec._start, ll, dec._scale_j, dec._beam_j,
            num_states=S, chunk=chunk)
    jax.block_until_ready((packed, best))
    t_kern = time.perf_counter() - t0

    # phase 2: compaction (slab group-nonzero + count sync + sliced D2H)
    nbytes_row = int(packed.shape[1])
    t0 = time.perf_counter()
    slab_elems = 1 << 28
    slab_t = max(1, slab_elems // max(nbytes_row * B, 1))
    n_total = 0
    t_sync = 0.0
    for s0 in range(0, T, slab_t):
        slab = packed[s0:s0 + slab_t]
        gcap = tv._slab_gcap(slab.shape, dec.compact_cap)
        gidx, gvals, count = tv._compact_nonzero_groups(slab, cap=gcap)
        ts = time.perf_counter()
        n = int(jax.device_get(count))
        t_sync += time.perf_counter() - ts
        k = max(n, 1)
        np.asarray(gidx[:k])
        np.asarray(gvals[:k])
        n_total += n
    t_compact = time.perf_counter() - t0

    # phase 3: full decode (total)
    t0 = time.perf_counter()
    lats = dec.decode_batch(ll)
    t_total = time.perf_counter() - t0

    print({
        "kernels_s": round(t_kern, 2),
        "compact_s": round(t_compact, 2),
        "compact_sync_s": round(t_sync, 2),
        "kept_bytes": n_total,
        "total_s": round(t_total, 2),
        "host_assembly_s(resid)": round(t_total - t_kern - t_compact, 2),
        "mean_arcs": round(float(np.mean([len(l.arcs.src) for l in lats])),
                           1),
    })


if __name__ == "__main__":
    main()
