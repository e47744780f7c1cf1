#!/usr/bin/env python
"""dltest — DataLoader over ark files with global stats
(ref: cmd/dltest/main.go + cmd/gputest bf16 precision stats).

Usage: python tools/dltest.py 'egs/cegs.*.ark' [--batch 8] [--label-dim 0]
"""

import argparse
import time

import _common
_common.force_cpu()

import numpy as np


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("pattern")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--label-dim", type=int, default=0)
    ap.add_argument("--feat-dim", type=int, default=40)
    ap.add_argument("--ivector-dim", type=int, default=100)
    ap.add_argument("--workers", type=int, default=0,
                    help="N parser threads via MultiPrefetchLoader "
                         "(0 = single in-line DataLoader)")
    ap.add_argument("--process-workers", type=int, default=0,
                    help="N parser PROCESSES via ProcessLoader (scales "
                         "the GIL-held batch assembly too)")
    ap.add_argument("--no-bf16-check", action="store_true",
                    help="skip the per-batch bf16 round-trip check "
                         "(isolates pure parse+assemble throughput)")
    args = ap.parse_args()

    import jax.numpy as jnp
    from kaldi_fp16_tpu.io.dataloader import (
        DataLoader, DataLoaderConfig, MultiPrefetchLoader, ProcessLoader,
    )

    cfg = DataLoaderConfig(batch_size=args.batch,
                           label_dim=args.label_dim,
                           feat_dim=args.feat_dim,
                           ivector_dim=args.ivector_dim)
    if args.process_workers > 0:
        dl = ProcessLoader(args.pattern, cfg,
                           workers=args.process_workers)
    elif args.workers > 0:
        dl = MultiPrefetchLoader(args.pattern, cfg, workers=args.workers)
    else:
        dl = DataLoader(args.pattern, cfg)
    t0 = time.perf_counter()
    t_first = None
    n_batches = 0
    total_frames = 0
    frames_first = 0
    bf16_max_err = 0.0
    fmin, fmax = np.inf, -np.inf
    for batch in dl:
        if t_first is None:
            t_first = time.perf_counter()
            frames_first = batch.features.shape[0] * batch.features.shape[1]
        n_batches += 1
        total_frames += batch.features.shape[0] * batch.features.shape[1]
        fmin = min(fmin, float(batch.features.min()))
        fmax = max(fmax, float(batch.features.max()))
        if not args.no_bf16_check:
            # bf16 round-trip precision (the mixed-precision ingestion
            # path; analog of the reference's fp16 conversion stats)
            bf = jnp.asarray(batch.features).astype(jnp.bfloat16)
            err = np.abs(np.asarray(bf, np.float32) - batch.features).max()
            bf16_max_err = max(bf16_max_err, float(err))
    t_end = time.perf_counter()
    dt = t_end - t0
    print(dl.summary())
    print(f"batches={n_batches} frames={total_frames} "
          f"({total_frames / max(dt, 1e-9):,.0f} frames/s parse+assemble)")
    if t_first is not None and n_batches > 1:
        ss = (total_frames - frames_first) / max(t_end - t_first, 1e-9)
        print(f"steady-state (excl. startup+first batch): {ss:,.0f} frames/s")
    print(f"feature range [{fmin:.3f}, {fmax:.3f}], "
          f"bf16 round-trip max |err| = {bf16_max_err:.3e}")


if __name__ == "__main__":
    main()
