#!/usr/bin/env python
"""nscheck — batch metadata sanity print: NumSequences, FramesPerSeq per
sequence, weights (ref: cmd/nscheck/main.go).

Usage: python tools/nscheck.py EGS_PATTERN [--batch 8]
"""

import argparse

import _common  # noqa: F401


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("egs")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--max-batches", type=int, default=4)
    args = ap.parse_args()

    from kaldi_fp16_tpu.io.dataloader import DataLoader, DataLoaderConfig

    dl = DataLoader(args.egs, DataLoaderConfig(batch_size=args.batch))
    for i, b in enumerate(dl):
        if i >= args.max_batches:
            break
        print(f"batch {i}: B={len(b.keys)} T_in={b.features.shape[1]} "
              f"frames_per_seq={b.frames_per_seq} "
              f"left_context={b.left_context}")
        for k, w in zip(b.keys, b.weights):
            print(f"  {k}: weight={w}")
    print(dl.summary())


if __name__ == "__main__":
    main()
