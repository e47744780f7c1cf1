#!/usr/bin/env python
"""fwdtest — forward pass on a real xconfig + ark batch: per-layer shapes,
NaN checks, frames/s (ref: cmd/fwdtest/main.go).

Usage: python tools/fwdtest.py [--xconfig configs/cnn_tdnn.xconfig]
           [--egs PATTERN] [--batch 8] [--frames 150] [--iters 20]
"""

import argparse
import time

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--xconfig", default="configs/cnn_tdnn.xconfig")
    ap.add_argument("--egs", help="cegs ark glob (default: random inputs)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--bn-identity", action="store_true",
                    help="replace every batchnorm with identity — measures "
                         "the UPPER BOUND of any conv/BN eval-folding gain "
                         "(if this is within noise of the default run, "
                         "folding BN into the preceding affine cannot help: "
                         "XLA already fuses the scale+shift into adjacent "
                         "ops).  Outputs are numerically wrong; timing only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.models.model import build_model
    from kaldi_fp16_tpu.models.network import forward, init_params

    if args.bn_identity:
        import kaldi_fp16_tpu.models.network as _net
        _net._batchnorm = lambda x, bn_state, *a, **k: (x, bn_state)
        print("bn-identity: batchnorm replaced by identity (timing-only run)")

    model = build_model(args.xconfig)
    print(model.summary())
    params, state = init_params(model, jax.random.PRNGKey(0))

    feat_dim = model.layer_map["input"].output_dim
    has_ivec = "ivector" in model.layer_map
    ivec_dim = model.layer_map["ivector"].output_dim if has_ivec else 0

    if args.egs:
        from kaldi_fp16_tpu.io.dataloader import DataLoader, DataLoaderConfig
        dl = DataLoader(args.egs, DataLoaderConfig(batch_size=args.batch,
                                                   feat_dim=feat_dim,
                                                   ivector_dim=ivec_dim))
        batch = next(iter(dl))
        feats = jnp.asarray(batch.features)
        ivecs = (jnp.asarray(batch.ivectors)
                 if has_ivec and batch.ivectors is not None else None)
        print(f"loaded batch: {batch.features.shape} keys={batch.keys[:3]}...")
    else:
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.normal(size=(args.batch, args.frames, feat_dim))
                            .astype(np.float32))
        ivecs = (jnp.asarray(rng.normal(size=(args.batch, ivec_dim))
                             .astype(np.float32)) if has_ivec else None)

    @jax.jit
    def fwd(params, state, feats, ivecs):
        outs, _ = forward(model, params, state, feats, ivecs, train=False)
        return outs

    outs = fwd(params, state, feats, ivecs)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs)
    for name, o in outs.items():
        arr = np.asarray(o, dtype=np.float32)
        print(f"output {name}: {o.shape} finite={np.isfinite(arr).all()} "
              f"mean={arr.mean():.4f} std={arr.std():.4f}")

    t0 = time.perf_counter()
    for _ in range(args.iters):
        outs = fwd(params, state, feats, ivecs)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), outs)
    dt = time.perf_counter() - t0
    B, T = feats.shape[:2]
    print(f"throughput: {B * T * args.iters / dt:,.0f} frames/s")


if __name__ == "__main__":
    main()
