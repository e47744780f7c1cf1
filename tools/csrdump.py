#!/usr/bin/env python
"""csrdump — supervision FST stats for the first N examples
(ref: cmd/csrdump/main.go).

Usage: python tools/csrdump.py EGS_PATTERN [--n 8]
"""

import argparse

import _common  # noqa: F401


def main():
    _common.enable_compile_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("egs")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    from kaldi_fp16_tpu.io.dataloader import EgsIterator
    from kaldi_fp16_tpu.io.sparse import fst_to_csr

    it = EgsIterator(args.egs)
    for i, ex in enumerate(it):
        if i >= args.n:
            break
        if ex.supervision is None or ex.supervision.fst is None:
            print(f"{ex.key}: no supervision FST")
            continue
        csr = fst_to_csr(ex.supervision.fst)
        print(f"{ex.key}: states={csr.num_states} arcs={csr.num_arcs} "
              f"start={csr.start_state} finals={len(csr.final_states)} "
              f"label_dim={csr.label_dim()} "
              f"frames_per_seq={ex.supervision.frames_per_seq} "
              f"weight={ex.supervision.weight}")


if __name__ == "__main__":
    main()
