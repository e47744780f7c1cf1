#!/usr/bin/env python
"""loadtest — Kaldi model import: load an nnet3 text model into the network,
dump execution order, forward sanity (ref: cmd/loadtest/main.go).

With --model pointing at a Kaldi model file — binary .mdl/.raw (read
standalone, no Kaldi install) or `nnet3-copy --binary=false` text — it
imports that; without it, round-trips a freshly exported model
(export -> text AND binary -> import) so the tool is runnable anywhere.

Usage: python tools/loadtest.py [--xconfig F] [--model final.mdl|nnet3.txt]
"""

import argparse
import sys

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--xconfig", default="configs/cnn_tdnn.xconfig")
    ap.add_argument("--model",
                    help="Kaldi model: binary .mdl/.raw or nnet3 text")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.models.model import build_model
    from kaldi_fp16_tpu.models.network import forward, init_params
    from kaldi_fp16_tpu.models.kaldi_loader import (
        export_params_to_text, load_weights_from_file, load_weights_from_text,
    )

    model = build_model(args.xconfig)
    print(model.summary())
    print("execution order:",
          " -> ".join(l.name for l in model.execution_order()))

    params, state = init_params(model, jax.random.PRNGKey(0))
    params2, state2 = init_params(model, jax.random.PRNGKey(1))
    if args.model:
        params2, state2, report = load_weights_from_file(
            model, params2, state2, args.model)
    else:
        print("no --model given: round-tripping the exporter's own output "
              "through BOTH the text and binary containers")
        text = export_params_to_text(model, params, state)
        from kaldi_fp16_tpu.io.nnet3_binary import (
            Nnet3Model, components_from_text, write_nnet3,
        )
        from kaldi_fp16_tpu.models.kaldi_loader import parse_nnet3_text
        import tempfile, os
        comps = parse_nnet3_text(text)
        bpath = os.path.join(tempfile.mkdtemp(), "roundtrip.raw")
        write_nnet3(Nnet3Model(config_lines=[],
                               components=components_from_text(comps)), bpath)
        params2, state2, report = load_weights_from_file(
            model, params2, state2, bpath)
    total = sum(report.values())
    print(f"loaded {total:,} values into {len(report)} layers:")
    for name, n in report.items():
        print(f"  {name:24s} {n:>10,}")

    rng = np.random.default_rng(0)
    feat_dim = model.layer_map["input"].output_dim
    has_ivec = "ivector" in model.layer_map
    feats = jnp.asarray(rng.normal(size=(args.batch, args.frames, feat_dim))
                        .astype(np.float32))
    ivecs = (jnp.asarray(rng.normal(
        size=(args.batch, model.layer_map["ivector"].output_dim))
        .astype(np.float32)) if has_ivec else None)
    outs, _ = forward(model, params2, state2, feats, ivecs, train=False)
    failures = 0
    for name, out in outs.items():
        o = np.asarray(out)
        finite = np.isfinite(o).all()
        print(f"output {name}: shape {o.shape}, "
              f"range [{o.min():.3f}, {o.max():.3f}], finite={finite}")
        if not finite:
            failures += 1
    if not args.model:
        # round trip must reproduce the original forward
        outs0, _ = forward(model, params, state, feats, ivecs, train=False)
        err = max(float(np.abs(np.asarray(outs0[k]) - np.asarray(outs[k])).max())
                  for k in outs)
        print(f"round-trip forward max |err| = {err:.2e}")
        if err > 2e-2:
            failures += 1
    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
