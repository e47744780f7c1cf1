#!/usr/bin/env python
"""xvectortrain — speaker-ID training driver for the x-vector family.

Glues the pieces the reference's GoTorch stack provided as a capability
(ref: go/gotorch/cnn_tdnn.go:383-554 BuildCNNTDNN/XVectorConfig +
model.go SGD/Adam + StepLR/warmup; never wired into a driver there
either) into one runnable recipe: synthetic speaker-discriminative
features -> x-vector TDNN + stats pooling (models/xvector.py) ->
cross-entropy -> Adam with warmup + StepLR (training/schedulers.py).

Asserts training accuracy improves; prints one JSON line.

Usage: python tools/xvectortrain.py [--speakers 16] [--steps 120]
           [--batch 32] [--frames 80] [--cpu]
"""

import argparse
import json
import time

import _common  # noqa: F401
import numpy as np


def synth_batch(rng, centers, batch, frames, feat_dim, noise=1.0):
    """Speaker-colored Gaussian features: each speaker has a fixed mean
    vector; utterances are that mean + noise (classic synthetic
    speaker-id setup — separable but not trivially so)."""
    n_spk = centers.shape[0]
    labels = rng.integers(0, n_spk, size=batch)
    feats = (centers[labels][:, None, :]
             + noise * rng.normal(size=(batch, frames, feat_dim)))
    return feats.astype(np.float32), labels.astype(np.int32)


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--speakers", type=int, default=16)
    ap.add_argument("--steps", type=int, default=120)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--feat-dim", type=int, default=30)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--lr-step", type=int, default=60)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        _common.force_cpu()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.models.xvector import (
        XVectorConfig, init_xvector, xvector_forward, xvector_loss,
    )
    from kaldi_fp16_tpu.training.schedulers import (
        adam_update, init_adam_state, step_lr, warmup_lr,
    )

    # small recipe (the full 512-wide stack is overkill for a smoke)
    cfg = XVectorConfig(feat_dim=args.feat_dim,
                        tdnn_dims=(64, 64, 96),
                        tdnn_contexts=((-2, -1, 0, 1, 2), (-2, 0, 2), (0,)),
                        embed_dim=64, segment_dims=(64, 64),
                        num_speakers=args.speakers)
    params = init_xvector(cfg, jax.random.PRNGKey(args.seed))
    opt = init_adam_state(params)
    sched = warmup_lr(step_lr(args.lr, args.lr_step, gamma=0.5),
                      args.warmup)

    @jax.jit
    def train_step(params, opt, feats, labels, lr):
        loss, grads = jax.value_and_grad(
            lambda p: xvector_loss(cfg, p, feats, labels))(params)
        params, opt = adam_update(params, grads, opt, lr)
        return params, opt, loss

    @jax.jit
    def accuracy(params, feats, labels):
        _, logits = xvector_forward(cfg, params, feats)
        return (jnp.argmax(logits, axis=-1) == labels).mean()

    rng = np.random.default_rng(args.seed)
    centers = 2.0 * rng.normal(size=(args.speakers, args.feat_dim))
    eval_feats, eval_labels = synth_batch(rng, centers, 256, args.frames,
                                          args.feat_dim)

    acc0 = float(accuracy(params, eval_feats, eval_labels))
    losses = []
    t0 = time.perf_counter()
    for step in range(args.steps):
        feats, labels = synth_batch(rng, centers, args.batch, args.frames,
                                    args.feat_dim)
        params, opt, loss = train_step(params, opt, jnp.asarray(feats),
                                       jnp.asarray(labels),
                                       jnp.asarray(sched(step), jnp.float32))
        losses.append(float(loss))
    wall = time.perf_counter() - t0
    acc1 = float(accuracy(params, eval_feats, eval_labels))

    # cap the improvement requirement below 1.0: with few speakers
    # the untrained accuracy can already be ~1/2
    ok = (acc1 > max(min(2.0 * acc0, 0.9), 0.5)
          and losses[-1] < losses[0])
    print(json.dumps({
        "metric": "xvector_train_smoke",
        "initial_accuracy": round(acc0, 4),
        "final_accuracy": round(acc1, 4),
        "first_loss": round(losses[0], 4),
        "final_loss": round(losses[-1], 4),
        "steps": args.steps, "wall_s": round(wall, 1),
        "ok": bool(ok),
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    import sys
    sys.exit(main())
