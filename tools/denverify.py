#!/usr/bin/env python
"""denverify — denominator verification (ref: cmd/denverify/main.go, which
compared NativeDenominator vs the Kaldi wrapper to ~1e-4; without Kaldi the
oracle is the fp64 reference + dense brute force).

Usage: python tools/denverify.py [--den-fst PATH] [--pdfs 24] [--frames 10]
"""

import argparse
import sys

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--den-fst")
    ap.add_argument("--pdfs", type=int, default=24)
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--tol", type=float, default=2e-3)
    args = ap.parse_args()

    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.graph import DenominatorGraph, make_simple_den_fst
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.reference import (
        denominator_brute_force, denominator_forward_backward_ref,
    )
    from kaldi_fp16_tpu.io.fst import read_fst_file

    if args.den_fst:
        fst = read_fst_file(args.den_fst)
        print(f"den.fst: {fst.num_states} states, {fst.num_arcs} arcs")
    else:
        fst = make_simple_den_fst(num_pdfs=args.pdfs, num_states=12, seed=0)
        print(f"synthetic den fst: {fst.num_states} states, {fst.num_arcs} arcs")
    graph = DenominatorGraph.from_fst(fst, args.pdfs)
    print(f"initial probs: sum={graph.initial.sum():.6f} "
          f"nonzero={int((graph.initial > 0).sum())}/{graph.num_states}")

    failures = 0
    rng = np.random.default_rng(0)
    for name, out in [("zero", np.zeros((args.frames, args.pdfs))),
                      ("random", rng.normal(size=(args.frames, args.pdfs)) * 0.5)]:
        ref_lp, ref_grad = denominator_forward_backward_ref(graph, out)
        bf_lp = denominator_brute_force(graph, out, leaky=1e-5)
        den = DenominatorComputation(graph, leaky=1e-5)
        lp, grad = den.forward_backward(jnp.asarray(out[None].astype(np.float32)))
        err_ref = abs(float(lp[0]) - ref_lp)
        err_bf = abs(ref_lp - bf_lp)
        err_grad = np.abs(np.asarray(grad[0]) - ref_grad).max()
        ok = err_ref < args.tol and err_bf < 1e-8 and err_grad < args.tol
        print(f"[{name}] logprob: device={float(lp[0]):.6f} oracle={ref_lp:.6f} "
              f"brute={bf_lp:.6f}")
        print(f"  |device-oracle|={err_ref:.2e} |oracle-brute|={err_bf:.2e} "
              f"grad max|err|={err_grad:.2e}  {'OK' if ok else 'FAIL'}")
        if not ok:
            failures += 1
    print("PASS" if failures == 0 else "FAIL")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
