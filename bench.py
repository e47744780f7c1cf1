"""Benchmark: flagship CNN-TDNN chain TRAINING throughput on the real chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

The metric is BASELINE.json's north star: audio-seconds/s/chip of full
chain training (forward + LF-MMI numerator/denominator forward-backward +
backward + SGD) at production scale — den.fst 7052 states / 113,380 arcs /
3080 pdfs, 150-frame chunks, 128-sequence batch (the measured single-chip
throughput sweet spot: 1120 audio-sec/s vs 442 at B=64; B=256 adds only
~2% at twice the step latency), flagship CNN-TDNN
(cnn1-6 + tdnnf7-21 + dual heads).

Baseline: the reference's own numbers imply ~105 audio-sec/s on its
RTX 4090 (forward 117K frames/s + ~91 ms chain loss per 8-sequence batch +
~2x-forward backward; BASELINE.md rows 1-2).  vs_baseline > 1 = faster.
`detail` carries the forward-only throughput for continuity with earlier
rounds (117K frames/s reference).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.graph import (
        DenominatorGraph, NumeratorGraphBatch, LOG_ZERO,
    )
    from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
    from kaldi_fp16_tpu.models.model import build_model
    from kaldi_fp16_tpu.models.network import forward, init_params
    from kaldi_fp16_tpu.training.train_step import (
        TrainConfig, init_train_state, make_train_step,
    )

    rng = np.random.default_rng(0)
    B, T_in, P = 128, 150, 3080
    An = 256
    left = stride = 3
    T_out = (T_in - left + stride - 1) // stride

    model = build_model("configs/cnn_tdnn.xconfig")

    # ---- forward-only throughput (continuity metric) -----------------------
    # Measured with a chained in-jit scan: on this tunneled backend,
    # un-chained async dispatch measures the DISPATCH rate, not device
    # time (it once inflated this number ~20x — see docs/PERFORMANCE.md).
    params, state = init_params(model, jax.random.PRNGKey(0))
    K = 20

    @jax.jit
    def fwd_many(params, state, feats, ivecs):
        def body(x, _):
            outs, _ = forward(model, params, state, x, ivecs,
                              train=False, compute_dtype=jnp.bfloat16)
            return x + 1e-9 * outs["output"][:, :, :40], ()
        x, _ = jax.lax.scan(body, feats, None, length=K)
        return x.sum()

    feats8 = jnp.asarray(rng.normal(size=(8, T_in, 40)).astype(np.float32))
    ivecs8 = jnp.asarray(rng.normal(size=(8, 100)).astype(np.float32))
    float(fwd_many(params, state, feats8, ivecs8))
    t0 = time.perf_counter()
    for _ in range(3):
        float(fwd_many(params, state, feats8, ivecs8))
    fwd_frames_per_s = 8 * T_in * K * 3 / (time.perf_counter() - t0)

    # ---- full train step at production scale -------------------------------
    # den graph with the REAL topology class (phone-LM over L-R HMM chains,
    # 7052 states / ~113K arcs — what chain-make-den-fst produces), which
    # routes to the structured chain-decomposed kernels like a real den.fst
    # would.  The locality-free random graph used in earlier rounds ran the
    # generic blocked path within 6% of phone-lm (docs/PERFORMANCE.md), so
    # this is a fidelity upgrade, not benchmark flattery; chainbench
    # --topology uniform still measures the generic path.
    from kaldi_fp16_tpu.chain.graph import make_phone_lm_den_fst
    graph = DenominatorGraph.from_fst(make_phone_lm_den_fst(num_pdfs=P), P)
    den = DenominatorComputation(graph, leaky=1e-5)
    assert den.layout_used == "structured", den.layout_used

    # linear supervision chain of exactly T_out arcs (every chain arc
    # consumes one frame), tiled with parallel alternative-pdf arcs up to
    # An: the final state is REACHED in T_out steps, so the numerator is
    # finite and the bench exercises the real objective path, not the
    # NaN-containment fallback (which an unreachable final would trigger
    # every step, hiding genuine numerator breakage)
    Sn = T_out + 1
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
                         frame_subsampling_factor=stride, left_context=left)
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
    key, sub = jax.random.split(key)
    params, net_state, opt_state, scale_state, out = step(
        params, net_state, opt_state, scale_state, batch, sub)
    jax.block_until_ready(out.loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        key, sub = jax.random.split(key)
        params, net_state, opt_state, scale_state, out = step(
            params, net_state, opt_state, scale_state, batch, sub)
    jax.block_until_ready(out.loss)
    dt = (time.perf_counter() - t0) / iters
    # the containment fallback (objf := -10wT on NaN/-inf) leaves loss
    # FINITE — detect it via the numerator logprob, which goes to
    # LOG_ZERO when the supervision path is broken; benching the
    # fallback would hide genuine numerator breakage
    loss = float(out.loss)
    num_lp = float(out.num_logprob)
    assert np.isfinite(loss) and num_lp > -1e20, \
        f"bench step hit containment (loss={loss}, num_logprob={num_lp})"

    audio_per_s = B * T_in / 100.0 / dt
    baseline = 105.0
    print(json.dumps({
        "metric": "train_audio_sec_per_s_per_chip",
        "value": round(audio_per_s, 1),
        "unit": "audio-sec/s/chip",
        "vs_baseline": round(audio_per_s / baseline, 3),
        "detail": {
            "step_ms": round(dt * 1e3, 2),
            "batch": B, "frames_in": T_in, "frames_out": T_out,
            "forward_frames_per_s": round(fwd_frames_per_s, 1),
            "forward_vs_baseline": round(fwd_frames_per_s / 117_000.0, 2),
        },
    }))


def _wait_for_backend(max_wait_s: float = 1800.0) -> None:
    """The tunneled TPU backend has transient UNAVAILABLE windows
    (observed: tens of minutes, and init can HANG rather than raise).
    Probe in a subprocess with a hard timeout so a wedged tunnel is
    waited out instead of recording a failed round."""
    import subprocess
    import sys
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
             "(x @ x).block_until_ready()")
    deadline = time.time() + max_wait_s
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=150, capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print("# backend still unavailable; attempting bench anyway",
                  flush=True)
            return
        print("# backend unavailable; retrying in 60s", flush=True)
        time.sleep(60.0)


if __name__ == "__main__":
    _wait_for_backend()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # still emit a parseable line so the failure MODE is recorded
        # (e.g. a TPU-tunnel outage outlasting the wait) rather than
        # only a stack trace
        print(json.dumps({
            "metric": "train_audio_sec_per_s_per_chip",
            "value": None, "unit": "audio-sec/s/chip",
            "vs_baseline": None,
            "detail": {"error": f"{type(e).__name__}: {e}"[:300]},
        }))
        raise
