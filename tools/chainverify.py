#!/usr/bin/env python
"""chainverify — numerical verification of the chain objective
(ref: cmd/chainverify/main.go; without a Kaldi install the oracle is the
float64 reference implementation + brute-force path enumeration + finite
differences — the same three-way check the test-suite runs, on demand and
with configurable sizes).

Phases:
  1. zero-output check: numerator/denominator logprobs vs the fp64 oracle
  2. random-output check: logprob + posterior allclose vs fp64 oracle
  3. gradient check: analytic deriv vs central finite differences
  4. reproducibility: N repeat runs of the jitted kernels must be bit-equal
     (XLA determinism — replaces the reference's atomic/det comparison),
     plus exact-vs-fast segment-mode drift measurement.
"""

import argparse
import sys

import _common  # noqa: F401
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--den-fst", help="den.fst path (default: synthetic)")
    ap.add_argument("--egs", help="cegs ark with supervision FSTs (optional)")
    ap.add_argument("--pdfs", type=int, default=24)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--repeats", type=int, default=3)
    # default tolerance accounts for TPU fast-approximation exp/log (the CPU
    # backend matches the fp64 oracle to ~1e-7; TPU transcendentals drift at
    # ~1e-4..1e-3 relative — same magnitude the reference accepted between
    # its atomic and deterministic CUDA kernels, cmd/chainbench)
    ap.add_argument("--tol", type=float, default=2e-3)
    ap.add_argument("--topology", default="random",
                    choices=["random", "phone-lm"],
                    help="synthetic den graph shape: phone-lm routes to "
                         "the structured chain-decomposed kernels")
    args = ap.parse_args()

    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.graph import (
        DenominatorGraph, build_numerator_batch, make_simple_den_fst,
    )
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.numerator import numerator_forward_backward
    from kaldi_fp16_tpu.chain.objective import (
        ChainTrainingOpts, chain_objf_and_deriv,
    )
    from kaldi_fp16_tpu.chain.reference import (
        denominator_forward_backward_ref, numerator_forward_backward_ref,
    )
    from kaldi_fp16_tpu.io.fst import read_fst_file, Fst, FstArc, FstState
    from kaldi_fp16_tpu.io.sparse import fst_to_csr

    rng = np.random.default_rng(0)
    P, T, B = args.pdfs, args.frames, args.batch
    failures = 0

    def check(name, val, ref, tol):
        nonlocal failures
        err = abs(val - ref)
        ok = err <= tol * max(1.0, abs(ref))
        print(f"  {'OK ' if ok else 'FAIL'} {name}: got {val:.6f} "
              f"ref {ref:.6f} (|err|={err:.2e}, tol={tol})")
        if not ok:
            failures += 1

    # graphs
    if args.den_fst:
        fst = read_fst_file(args.den_fst)
        den_graph = DenominatorGraph.from_fst(fst, args.pdfs)
    elif args.topology == "phone-lm":
        from kaldi_fp16_tpu.chain.graph import make_phone_lm_den_fst
        den_graph = DenominatorGraph.from_fst(
            make_phone_lm_den_fst(num_pdfs=P, num_phones=6,
                                  states_per_phone=2, branching=3, seed=1),
            P)
    else:
        den_graph = DenominatorGraph.from_fst(
            make_simple_den_fst(num_pdfs=P, num_states=8, seed=1), P)
    den = DenominatorComputation(den_graph, leaky=1e-5)
    den_fast = DenominatorComputation(den_graph, leaky=1e-5, mode="fast")
    print(f"den graph: {den_graph.num_states} states, "
          f"{den_graph.num_transitions} arcs, layout={den.layout_used}")

    if args.egs:
        from kaldi_fp16_tpu.io.egs import read_examples
        exs = read_examples(args.egs, limit=B)
        csrs = [fst_to_csr(e.supervision.fst) for e in exs]
        T = exs[0].supervision.frames_per_seq
    else:
        def linear_fst():
            states = [FstState() for _ in range(T + 1)]
            for t in range(T):
                states[t].arcs.append(FstArc(int(rng.integers(1, P + 1)), 0.3, t + 1))
                states[t].arcs.append(FstArc(int(rng.integers(1, P + 1)), 1.0, t + 1))
            states[-1].final = 0.0
            return Fst(start=0, states=states)
        csrs = [fst_to_csr(linear_fst()) for _ in range(B)]
    num_graph = build_numerator_batch(csrs)

    # phase 1: zero output
    print("phase 1: zero-output logprobs vs fp64 oracle")
    zero = np.zeros((B, T, P), dtype=np.float32)
    num_lp, _ = numerator_forward_backward(num_graph, jnp.asarray(zero))
    den_lp = den.forward(jnp.asarray(zero))
    for b in range(B):
        ref_num, _ = numerator_forward_backward_ref(csrs[b], zero[b])
        check(f"num_logprob[{b}]", float(num_lp[b]), ref_num, args.tol)
    ref_den, _ = denominator_forward_backward_ref(den_graph, zero[0])
    check("den_logprob", float(den_lp[0]), ref_den, args.tol)

    # phase 2: random output posteriors
    print("phase 2: random-output posteriors vs fp64 oracle")
    out = (rng.normal(size=(B, T, P)) * 0.5).astype(np.float32)
    num_lp, num_post = numerator_forward_backward(num_graph, jnp.asarray(out))
    den_lp, den_post = den.forward_backward(jnp.asarray(out))
    max_num_err = max_den_err = 0.0
    for b in range(B):
        rl, rp = numerator_forward_backward_ref(csrs[b], out[b])
        check(f"num_logprob[{b}]", float(num_lp[b]), rl, args.tol)
        max_num_err = max(max_num_err, np.abs(np.asarray(num_post[b]) - rp).max())
        dl, dp = denominator_forward_backward_ref(den_graph, out[b])
        check(f"den_logprob[{b}]", float(den_lp[b]), dl, args.tol)
        max_den_err = max(max_den_err, np.abs(np.asarray(den_post[b]) - dp).max())
    print(f"  num posterior max |err| = {max_num_err:.2e}")
    print(f"  den posterior max |err| = {max_den_err:.2e}")
    if max_num_err > 1e-3 or max_den_err > 1e-3:
        failures += 1

    # phase 3: finite-difference gradient
    print("phase 3: analytic deriv vs central differences")
    opts = ChainTrainingOpts(out_of_range_regularize=0.0)
    result, deriv = chain_objf_and_deriv(num_graph, den, jnp.asarray(out),
                                         opts=opts)
    deriv = np.asarray(deriv)
    eps = 1e-3
    worst = 0.0
    for _ in range(8):
        b, t, p = rng.integers(B), rng.integers(T), rng.integers(P)
        o1, o2 = out.copy(), out.copy()
        o1[b, t, p] -= eps
        o2[b, t, p] += eps
        r1, _ = chain_objf_and_deriv(num_graph, den, jnp.asarray(o1), opts=opts)
        r2, _ = chain_objf_and_deriv(num_graph, den, jnp.asarray(o2), opts=opts)
        fd = (float(r2.total_objf) - float(r1.total_objf)) / (2 * eps)
        worst = max(worst, abs(fd - deriv[b, t, p]))
    print(f"  max |fd - analytic| = {worst:.2e}")
    # the finite difference itself carries ~|objf|*1e-7/eps ~ 1e-3 noise on
    # top of TPU transcendental drift; 1e-2 bounds both with margin
    if worst > 1e-2:
        failures += 1

    # phase 4: reproducibility + fast-mode drift
    print(f"phase 4: {args.repeats} repeat runs (bit-exactness) + fast drift")
    base_lp, base_post = den.forward_backward(jnp.asarray(out))
    for i in range(args.repeats - 1):
        lp, post = den.forward_backward(jnp.asarray(out))
        same = (np.array_equal(np.asarray(lp), np.asarray(base_lp))
                and np.array_equal(np.asarray(post), np.asarray(base_post)))
        print(f"  run {i + 2}: {'bit-identical' if same else 'MISMATCH'}")
        if not same:
            failures += 1
    f_lp, f_post = den_fast.forward_backward(jnp.asarray(out))
    drift_lp = np.abs(np.asarray(f_lp) - np.asarray(base_lp)).max()
    drift_post = np.abs(np.asarray(f_post) - np.asarray(base_post)).max()
    print(f"  fast-mode drift: logprob {drift_lp:.2e}, posterior {drift_post:.2e}")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
