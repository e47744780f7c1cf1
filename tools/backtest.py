#!/usr/bin/env python
"""backtest — backward-pass verification (ref: cmd/backtest/main.go: per-op
unit tests, network fwd->bwd, numerical finite-difference gradient check).

The reference hand-routed every backward op and needed per-op checks; here
autodiff provides the backward, so the check is jax.grad vs central finite
differences per layer type and through the whole network.

Usage: python tools/backtest.py [--eps 1e-3] [--probes 6]
"""

import argparse
import sys

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--eps", type=float, default=1e-3)
    ap.add_argument("--probes", type=int, default=6)
    ap.add_argument("--tol", type=float, default=2e-2,
                    help="relative tolerance on |fd - analytic|")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.models.model import build_model_from_string
    from kaldi_fp16_tpu.models.network import forward, init_params

    rng = np.random.default_rng(0)
    failures = 0

    def gradcheck(name, cfg, B=2, T=8):
        nonlocal failures
        model = build_model_from_string(cfg)
        params, state = init_params(model, jax.random.PRNGKey(1))
        feat_dim = model.layer_map["input"].output_dim
        has_ivec = "ivector" in model.layer_map
        feats = rng.normal(size=(B, T, feat_dim)).astype(np.float32)
        ivecs = (rng.normal(size=(B, model.layer_map["ivector"].output_dim))
                 .astype(np.float32) if has_ivec else None)
        probe = jnp.asarray(rng.normal(size=1).astype(np.float32))

        def loss(params, feats):
            outs, _ = forward(model, params, state, jnp.asarray(feats),
                              None if ivecs is None else jnp.asarray(ivecs),
                              train=False, compute_dtype=jnp.float32)
            out = outs["output"].astype(jnp.float32)
            # a fixed random projection makes the scalar sensitive everywhere
            w = jax.random.normal(jax.random.PRNGKey(7), out.shape)
            return jnp.sum(out * w)

        g_analytic = jax.grad(loss)(params, feats)
        worst = 0.0
        flat, _ = jax.tree_util.tree_flatten_with_path(g_analytic)
        # probe a few random parameter coordinates per layer
        for path, g in flat:
            lname = path[0].key
            pname = path[1].key
            arr = np.asarray(params[lname][pname])
            if arr.size == 0:
                continue
            for _ in range(args.probes):
                idx = tuple(rng.integers(0, s) for s in arr.shape)
                p1 = jax.tree_util.tree_map(lambda x: x, params)
                a = np.array(arr)
                a[idx] += args.eps
                p1[lname][pname] = jnp.asarray(a)
                a2 = np.array(arr)
                a2[idx] -= args.eps
                p2 = jax.tree_util.tree_map(lambda x: x, params)
                p2[lname][pname] = jnp.asarray(a2)
                fd = (float(loss(p1, feats)) - float(loss(p2, feats))) / (2 * args.eps)
                ga = float(np.asarray(g)[idx])
                err = abs(fd - ga) / max(1.0, abs(fd), abs(ga))
                worst = max(worst, err)
        ok = worst <= args.tol
        print(f"  {'OK ' if ok else 'FAIL'} {name:28s} max rel err {worst:.2e}")
        if not ok:
            failures += 1

    print("per-layer-type gradient checks (jax.grad vs central differences):")
    gradcheck("linear", """\
input name=input dim=10
linear-component name=l1 dim=12
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("relu-batchnorm", """\
input name=input dim=10
relu-batchnorm-layer name=l1 dim=12
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("tdnnf (stride 3, bypass)", """\
input name=input dim=12
linear-component name=l0 dim=16
tdnnf-layer name=t1 dim=16 bottleneck-dim=8 time-stride=3
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("conv-relu-batchnorm", """\
input name=input dim=24
conv-relu-batchnorm-layer name=c1 height-in=8 height-out=8 time-offsets=-1,0,1 height-offsets=-1,0,1 num-filters-out=4
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("attention", """\
input name=input dim=16
attention-relu-batchnorm-layer name=a1 num-heads=2 value-dim=4 key-dim=4 num-left-inputs=2 num-right-inputs=1
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("prefinal+output", """\
input name=input dim=10
prefinal-layer name=pf big-dim=16 small-dim=8
output-layer name=output dim=6 include-log-softmax=false
""")
    gradcheck("full stack", """\
input name=ivector dim=8
input name=input dim=10
idct-layer name=idct input=input dim=10
linear-component name=iv dim=6 input=ReplaceIndex(ivector, t, 0)
linear-component name=l1 input=Append(idct, iv) dim=16
tdnnf-layer name=t1 dim=16 bottleneck-dim=8 time-stride=3
prefinal-layer name=pf big-dim=16 small-dim=8
output-layer name=output dim=6 include-log-softmax=false
""")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
