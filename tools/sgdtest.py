#!/usr/bin/env python
"""sgdtest — optimizer verification against CPU-computed expectations
(ref: cmd/sgdtest/main.go: basic / momentum / master-weights / max-change /
through-network).

The reference verified its fused CUDA kernel `v = mu*v + g; w32 -= lr*v;
w16 = half(w32)` against Go math with explicit FP16 rounding.  Here params
are structurally fp32 master weights (bf16 applied only inside the forward),
so the checks are: plain SGD math, momentum accumulation, per-component and
global max-change clipping, loss-scale overflow skip, and a through-network
step that must reduce a quadratic loss.
"""

import sys

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.training.optimizer import (
        SGDConfig, init_sgd_state, sgd_update,
    )
    from kaldi_fp16_tpu.training.loss_scale import (
        grads_finite, init_loss_scale, unscale_grads, update_loss_scale,
    )

    failures = 0

    def check(name, ok, detail=""):
        nonlocal failures
        print(f"  {'OK ' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            failures += 1

    rng = np.random.default_rng(0)
    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g0 = rng.normal(size=(4, 3)).astype(np.float32)
    params = {"l": {"w": jnp.asarray(w0)}}
    grads = {"l": {"w": jnp.asarray(g0)}}

    print("basic SGD (no momentum, no clip):")
    cfg = SGDConfig(learning_rate=0.1, momentum=0.0,
                    max_param_change=1e9, default_max_change=1e9)
    p1, s1, _ = sgd_update(params, grads, init_sgd_state(params), cfg)
    expect = w0 - 0.1 * g0
    check("w -= lr*g", np.allclose(np.asarray(p1["l"]["w"]), expect, atol=1e-6))

    print("momentum (2 steps):")
    cfg = SGDConfig(learning_rate=0.1, momentum=0.9,
                    max_param_change=1e9, default_max_change=1e9)
    st = init_sgd_state(params)
    p1, st, _ = sgd_update(params, grads, st, cfg)
    p2, st, _ = sgd_update(p1, grads, st, cfg)
    v1 = g0
    v2 = 0.9 * v1 + g0
    expect = w0 - 0.1 * v1 - 0.1 * v2
    check("v = mu*v + g accumulates",
          np.allclose(np.asarray(p2["l"]["w"]), expect, atol=1e-6))

    print("per-component max-change:")
    cfg = SGDConfig(learning_rate=1.0, momentum=0.0,
                    max_param_change=1e9, default_max_change=0.5)
    p1, _, stats = sgd_update(params, grads, init_sgd_state(params), cfg)
    delta = np.asarray(p1["l"]["w"]) - w0
    norm = np.linalg.norm(delta)
    check("||delta|| clipped to 0.5", abs(norm - 0.5) < 1e-4,
          f"(norm={norm:.4f})")

    print("global max-param-change over two components:")
    params2 = {"a": {"w": jnp.asarray(w0)}, "b": {"w": jnp.asarray(w0)}}
    grads2 = {"a": {"w": jnp.asarray(g0)}, "b": {"w": jnp.asarray(g0)}}
    cfg = SGDConfig(learning_rate=1.0, momentum=0.0,
                    max_param_change=0.4, default_max_change=1e9)
    p1, _, stats = sgd_update(params2, grads2, init_sgd_state(params2), cfg)
    total = np.sqrt(sum(np.linalg.norm(np.asarray(p1[k]["w"]) - w0) ** 2
                        for k in ("a", "b")))
    check("global norm clipped to 0.4", abs(total - 0.4) < 1e-4,
          f"(norm={total:.4f})")
    check("stats report the clip",
          abs(float(stats["param_change_norm"]) - 0.4) < 1e-4)

    print("learning-rate factor via hyper:")
    cfg = SGDConfig(learning_rate=0.1, momentum=0.0,
                    max_param_change=1e9, default_max_change=1e9)
    hyper = {"l": {"lr_factor": 0.5, "max_change": 0.0}}
    p1, _, _ = sgd_update(params, grads, init_sgd_state(params), cfg,
                          hyper=hyper)
    expect = w0 - 0.05 * g0
    check("lr * factor applied", np.allclose(np.asarray(p1["l"]["w"]),
                                             expect, atol=1e-6))

    print("loss-scale overflow skip:")
    cfg = SGDConfig(learning_rate=0.1, momentum=0.0,
                    max_param_change=1e9, default_max_change=1e9)
    bad = {"l": {"w": jnp.asarray(np.full((4, 3), np.inf, np.float32))}}
    finite = grads_finite(bad)
    check("overflow detected", not bool(finite))
    p1, s1, _ = sgd_update(params, bad, init_sgd_state(params), cfg,
                           skip=~finite)
    check("params untouched on skip",
          np.array_equal(np.asarray(p1["l"]["w"]), w0))
    check("step not incremented", int(s1["step"]) == 0)

    print("loss-scale schedule (init 65536, growth 2x/2000, backoff 0.5):")
    ls = init_loss_scale()
    check("init 65536", float(ls.scale) == 65536.0)
    ls2, skip2 = update_loss_scale(ls, jnp.asarray(False))
    check("backoff 0.5 on overflow", float(ls2.scale) == 32768.0)
    check("skip flagged on overflow", bool(skip2))
    ls3 = ls
    for _ in range(2000):
        ls3, _ = update_loss_scale(ls3, jnp.asarray(True))
    check("growth 2x after 2000 good steps", float(ls3.scale) == 131072.0,
          f"(scale={float(ls3.scale)})")
    g = {"l": {"w": jnp.asarray(g0 * float(ls.scale))}}
    gu = unscale_grads(g, ls)
    check("unscale divides by scale",
          np.allclose(np.asarray(gu["l"]["w"]), g0, atol=1e-6))

    print("through-network: 10 steps on a quadratic loss must descend:")
    import jax
    target = jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32))
    p = {"l": {"w": jnp.asarray(w0)}}
    st = init_sgd_state(p)
    cfg = SGDConfig(learning_rate=0.2, momentum=0.5)
    loss0 = None
    for i in range(10):
        loss, gr = jax.value_and_grad(
            lambda p: jnp.sum((p["l"]["w"] - target) ** 2))(p)
        if loss0 is None:
            loss0 = float(loss)
        p, st, _ = sgd_update(p, gr, st, cfg)
    lossN = float(jnp.sum((p["l"]["w"] - target) ** 2))
    check("loss decreased", lossN < loss0, f"({loss0:.4f} -> {lossN:.4f})")

    print("PASS" if failures == 0 else f"FAIL ({failures})")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
