#!/usr/bin/env python
"""trainbench — full chain TRAINING throughput on the flagship CNN-TDNN at
production scale: den.fst 7052 states / 113K arcs / 3080 pdfs, 150-frame
chunks, batched sequences.  Reports audio-seconds/s/chip (the BASELINE.json
north-star metric; 100 feature frames = 1 audio second).

Implied reference rate: the 4090 reference measured forward at 117K
frames/s and chain loss at ~91 ms per 8-sequence batch (BASELINE.md);
with backward ~2x forward and the per-sequence chain cost that bounds a
full train step at ~10-11 K frames/s ~= 100-110 audio-sec/s.

Usage: python tools/trainbench.py [--batch 32] [--frames 150] [--iters 10]
       [--natural-gradient]
"""

import argparse
import json
import time

import _common  # noqa: F401
import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--frames", type=int, default=150)   # input frames
    ap.add_argument("--pdfs", type=int, default=3080)
    ap.add_argument("--den-states", type=int, default=7052)
    ap.add_argument("--den-arcs", type=int, default=113380)
    ap.add_argument("--num-arcs", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--xconfig", default="configs/cnn_tdnn.xconfig")
    ap.add_argument("--natural-gradient", action="store_true")
    ap.add_argument("--mode", default="exact", choices=["exact", "fast"])
    ap.add_argument("--no-grid", action="store_true",
                    help="disable frame-grid subsampling (run the post-CNN "
                         "stack at the full input frame rate, the pre-r4 "
                         "behavior)")
    ap.add_argument("--remat", action="store_true",
                    help="jax.checkpoint the network forward (trade FLOPs "
                         "for activation HBM traffic)")
    ap.add_argument("--bn-lowp", action="store_true",
                    help="batchnorm in bf16 with fp32-accumulated stats "
                         "(no fp32 activation upcast; MFU experiment)")
    ap.add_argument("--topology", default="phone-lm",
                    choices=["phone-lm", "random"],
                    help="den graph: phone-lm (real topology class, "
                         "routes to the structured kernels — matches "
                         "bench.py) or random (generic blocked path)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.graph import (
        DenominatorGraph, NumeratorGraphBatch, LOG_ZERO,
    )
    from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
    from kaldi_fp16_tpu.models.model import build_model
    from kaldi_fp16_tpu.training.train_step import (
        TrainConfig, init_train_state, make_train_step,
    )

    rng = np.random.default_rng(0)
    B, T_in, P = args.batch, args.frames, args.pdfs
    S, A = args.den_states, args.den_arcs
    left = 3
    stride = 3
    T_out = (T_in - left + stride - 1) // stride

    model = build_model(args.xconfig)
    if args.bn_lowp:
        from kaldi_fp16_tpu.models.network import set_bn_lowp_stats
        set_bn_lowp_stats(True)
    if args.topology == "phone-lm":
        from kaldi_fp16_tpu.chain.graph import make_phone_lm_den_fst
        # defaults are the production shape (3526 phones / 7052 states);
        # scale the topology down with --pdfs for small smokes
        kw = {} if P >= 3080 else dict(
            num_phones=max(2, P // 2), states_per_phone=2,
            branching=min(8, max(2, P // 4)))
        graph = DenominatorGraph.from_fst(
            make_phone_lm_den_fst(num_pdfs=P, **kw), P)
    else:
        dst = np.sort(rng.integers(0, S, size=A).astype(np.int32))
        graph = DenominatorGraph(
            src=rng.integers(0, S, size=A).astype(np.int32), dst=dst,
            pdf=rng.integers(0, P, size=A).astype(np.int32),
            prob=rng.uniform(0.1, 1.0, size=A).astype(np.float32),
            initial=(lambda v: v / v.sum())(
                rng.uniform(0, 1, S).astype(np.float32)),
            num_states=S, num_pdfs=P, start_state=0)
    den = DenominatorComputation(graph, leaky=1e-5, mode=args.mode)

    # reachable linear chain of T_out arcs + parallel alternatives (see
    # bench.py: an unreachable final would run the containment path);
    # An must cover the full chain or the final is unreachable again
    An, Sn = max(args.num_arcs, T_out), T_out + 1
    num_graph = NumeratorGraphBatch(
        arc_src=np.tile(np.arange(An, dtype=np.int32) % T_out, (B, 1)),
        arc_dst=np.tile(np.arange(An, dtype=np.int32) % T_out + 1, (B, 1)),
        arc_pdf=rng.integers(0, P, size=(B, An)).astype(np.int32),
        arc_logw=np.zeros((B, An), np.float32),
        arc_mask=np.ones((B, An), np.float32),
        start=np.zeros(B, np.int32),
        final_logw=np.where(np.arange(Sn)[None, :] == Sn - 1, 0.0,
                            LOG_ZERO).astype(np.float32).repeat(B, 0),
        num_states=Sn, num_arcs=An)

    config = TrainConfig(learning_rate=1e-3, momentum=0.9,
                         frame_subsampling_factor=stride, left_context=left,
                         natural_gradient=args.natural_gradient,
                         remat=args.remat,
                         grid_subsample=not args.no_grid)
    step = make_train_step(model, den, num_graph, ChainTrainingOpts(), config,
                           num_frames_out=T_out, donate=True)
    params, net_state, opt_state, scale_state = init_train_state(
        model, jax.random.PRNGKey(0), config)

    batch = {
        "features": jnp.asarray(rng.normal(size=(B, T_in, 40))
                                .astype(np.float32)),
        "ivectors": jnp.asarray(rng.normal(size=(B, 100)).astype(np.float32)),
        "weights": jnp.ones(B, jnp.float32),
    }
    key = jax.random.PRNGKey(1)

    # warm up / compile
    key, sub = jax.random.split(key)
    params, net_state, opt_state, scale_state, out = step(
        params, net_state, opt_state, scale_state, batch, sub)
    jax.block_until_ready(out.loss)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        key, sub = jax.random.split(key)
        params, net_state, opt_state, scale_state, out = step(
            params, net_state, opt_state, scale_state, batch, sub)
    jax.block_until_ready(out.loss)
    dt = (time.perf_counter() - t0) / args.iters

    frames = B * T_in
    audio_s = frames / 100.0
    baseline = 105.0  # implied reference audio-sec/s (see docstring)
    print(json.dumps({
        "metric": "train_audio_sec_per_s_per_chip",
        "value": round(audio_s / dt, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(audio_s / dt / baseline, 3),
        "detail": {"step_ms": round(dt * 1e3, 2), "batch": B,
                   "frames_in": T_in, "frames_out": T_out,
                   "natural_gradient": args.natural_gradient,
                   "den_mode": args.mode, "remat": args.remat,
                   "bn_lowp": args.bn_lowp,
                   "den_topology": args.topology,
                   "den_layout": den.layout_used,
                   "num_logprob": float(out.num_logprob),
                   "loss": float(out.loss)},
    }))


if __name__ == "__main__":
    main()
