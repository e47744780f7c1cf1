#!/usr/bin/env python
"""nnettest — xconfig parse + model summary + execution order
(ref: cmd/nnettest/main.go)."""

import argparse

import _common
_common.force_cpu()


def main():
    _common.enable_compile_cache()
    import os
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("xconfig", nargs="?",
                    default=os.path.join(root, "configs/cnn_tdnn.xconfig"))
    args = ap.parse_args()

    from kaldi_fp16_tpu.models.model import build_model
    model = build_model(args.xconfig)
    print(model.summary())
    print("\nexecution order:", " -> ".join(l.name for l in model.execution_order()))
    chain = model.chain_output()
    xent = model.xent_output()
    print(f"chain output: {chain.name if chain else None}, "
          f"xent output: {xent.name if xent else None}")


if __name__ == "__main__":
    main()
