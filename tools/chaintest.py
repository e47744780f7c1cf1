#!/usr/bin/env python
"""chaintest — end-to-end chain loss smoke test (ref: cmd/chaintest/main.go:
model -> forward -> per-seq subsample -> num/den fwd-bwd -> batch loss ->
gradient NaN/Inf/zero health checks + device memory report).

Usage: python tools/chaintest.py [--egs PATTERN --den-fst F] [--pdfs 3080]
       (with no --egs it generates a synthetic setup in a temp dir)
"""

import argparse
import subprocess
import sys
import tempfile

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--egs")
    ap.add_argument("--den-fst")
    ap.add_argument("--xconfig")
    ap.add_argument("--pdfs", type=int, default=48)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.graph import DenominatorGraph
    from kaldi_fp16_tpu.chain.objective import (
        ChainTrainingOpts, chain_objf_and_deriv,
    )
    from kaldi_fp16_tpu.io.dataloader import DataLoader, DataLoaderConfig
    from kaldi_fp16_tpu.io.fst import read_fst_file
    from kaldi_fp16_tpu.models.model import build_model, build_model_from_string
    from kaldi_fp16_tpu.models.network import (
        forward, init_params, subsample_output,
    )

    if not args.egs:
        tmp = tempfile.mkdtemp(prefix="chaintest_")
        subprocess.run([sys.executable, "tools/make_synthetic_egs.py", tmp,
                        "--pdfs", str(args.pdfs)], check=True)
        args.egs = f"{tmp}/cegs.*.ark"
        args.den_fst = f"{tmp}/den.fst"

    if args.xconfig:
        model = build_model(args.xconfig)
    else:
        model = build_model_from_string(f"""\
input name=ivector dim=100
input name=input dim=40
relu-batchnorm-layer name=tdnn1 input=Append(input, ReplaceIndex(ivector, t, 0)) dim=64
tdnnf-layer name=tdnnf2 dim=64 bottleneck-dim=16 time-stride=3
prefinal-layer name=prefinal-chain input=tdnnf2 big-dim=64 small-dim=32
output-layer name=output include-log-softmax=false dim={args.pdfs}
""")
    print(model.summary())
    params, state = init_params(model, jax.random.PRNGKey(0))

    den_graph = DenominatorGraph.from_fst(read_fst_file(args.den_fst), args.pdfs)
    den = DenominatorComputation(den_graph, leaky=1e-5)
    print(f"den graph: {den_graph.num_states} states, "
          f"{den_graph.num_transitions} transitions")

    dl = DataLoader(args.egs, DataLoaderConfig(batch_size=args.batch,
                                               label_dim=args.pdfs))
    batch = next(iter(dl))
    feats = jnp.asarray(batch.features)
    ivecs = (jnp.asarray(batch.ivectors)
             if batch.ivectors is not None else None)
    print(f"batch: features {feats.shape}, frames_per_seq "
          f"{batch.frames_per_seq}, left_context {batch.left_context}")

    @jax.jit
    def loss_and_deriv(params, state, feats, ivecs):
        outs, _ = forward(model, params, state, feats, ivecs, train=False)
        out = subsample_output(outs["output"], 3, batch.left_context,
                               batch.frames_per_seq)
        result, deriv = chain_objf_and_deriv(
            batch.num_graph, den, out, jnp.asarray(batch.weights),
            opts=ChainTrainingOpts())
        return result, deriv

    result, deriv = loss_and_deriv(params, state, feats, ivecs)
    d = np.asarray(deriv)
    print(f"objf/frame = {float(result.objf_per_frame):.6f}  "
          f"num = {np.asarray(result.num_logprob).mean():.4f}  "
          f"den = {np.asarray(result.den_logprob).mean():.4f}  "
          f"ok = {np.asarray(result.ok).tolist()}")

    failures = 0
    # gradient health (ref: chaintest main.go:226-266)
    n_nan, n_inf = np.isnan(d).sum(), np.isinf(d).sum()
    nonzero = float((d != 0).mean())
    print(f"deriv: shape {d.shape}, NaN={n_nan}, Inf={n_inf}, "
          f"nonzero={nonzero:.1%}, range=[{d.min():.4f}, {d.max():.4f}]")
    if n_nan or n_inf:
        print("FAIL: non-finite gradient values")
        failures += 1
    if nonzero < 0.05:
        print("FAIL: gradient almost entirely zero")
        failures += 1
    if not bool(np.asarray(result.ok).all()):
        print("FAIL: NaN containment fired")
        failures += 1
    # deriv rows for num-post minus den-post sum to ~0 per frame (both are
    # distributions) up to the OOR penalty
    row_sums = np.abs(d.sum(axis=2)).max()
    print(f"max |sum_p deriv[b,t,:]| = {row_sums:.4e} (should be small)")

    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            print(f"device memory: {stats.get('bytes_in_use', 0)/1e6:.1f} MB in use")
    except Exception:
        pass

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
