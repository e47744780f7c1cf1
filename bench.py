"""Benchmark: flagship CNN-TDNN forward throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's forward pass, 117K frames/s on an RTX 4090 with
FP16 tensor cores (BASELINE.md: docs/kaldi_fp16_complete_report.md:547).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.models.model import build_model
    from kaldi_fp16_tpu.models.network import forward, init_params

    model = build_model("configs/cnn_tdnn.xconfig")
    params, state = init_params(model, jax.random.PRNGKey(0))

    B, T = 8, 150  # 1200 frames per step

    @jax.jit
    def fwd(params, state, features, ivectors):
        outs, _ = forward(model, params, state, features, ivectors,
                          train=False, compute_dtype=jnp.bfloat16)
        return outs["output"]

    rng = np.random.default_rng(0)
    features = jnp.asarray(rng.normal(size=(B, T, 40)).astype(np.float32))
    ivectors = jnp.asarray(rng.normal(size=(B, 100)).astype(np.float32))

    # warmup / compile
    fwd(params, state, features, ivectors).block_until_ready()

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, state, features, ivectors)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    frames_per_s = B * T * iters / dt
    baseline = 117_000.0
    print(json.dumps({
        "metric": "forward_frames_per_s",
        "value": round(frames_per_s, 1),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
