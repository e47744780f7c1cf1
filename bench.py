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
import os
import time

import numpy as np

METRIC = "train_audio_sec_per_s_per_chip"


def _emit(value, vs_baseline, detail):
    """One parseable JSON line.  Emitted at every stage boundary so a
    mid-bench SIGKILL from the driver still leaves the best measurement
    so far on stdout (the last parseable line wins)."""
    print(json.dumps({
        "metric": METRIC,
        "value": value,
        "unit": "audio-sec/s/chip",
        "vs_baseline": vs_baseline,
        "detail": detail,
    }), flush=True)


def _enable_compile_cache():
    """Persistent XLA compile cache: the flagship train step costs
    minutes to compile cold over the tunnel; the driver runs bench.py
    in a fresh process, so without this the compile can eat the whole
    driver window (BENCH_r02 was lost to exactly that failure shape)."""
    if os.environ.get("KALDI_TPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax
        path = os.path.join(os.path.expanduser("~"), ".cache",
                            "kaldi_fp16_tpu_xla")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:  # noqa: BLE001 — cache is an optimization only
        pass


def main():
    _enable_compile_cache()
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

    # partial record: if the driver kills us during the (much longer)
    # train-step compile below, the forward measurement still lands
    _emit(None, None, {
        "partial": "forward-only measured; train step pending",
        "forward_frames_per_s": round(fwd_frames_per_s, 1),
        "forward_vs_baseline": round(fwd_frames_per_s / 117_000.0, 2),
    })

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
    _emit(round(audio_per_s, 1), round(audio_per_s / baseline, 3), {
        "step_ms": round(dt * 1e3, 2),
        "batch": B, "frames_in": T_in, "frames_out": T_out,
        "forward_frames_per_s": round(fwd_frames_per_s, 1),
        "forward_vs_baseline": round(fwd_frames_per_s / 117_000.0, 2),
    })


def _wait_for_backend() -> bool:
    """The tunneled TPU backend has transient UNAVAILABLE windows
    (observed: tens of minutes, and init can HANG rather than raise).
    Probe in a subprocess with a hard timeout so a wedged tunnel is
    waited out instead of recording a failed round.

    The wait budget is capped (KALDI_TPU_BENCH_WAIT env, default 300s)
    to stay inside the driver's window: round 2 was lost because a
    1800s wait loop outlasted the window and the driver's SIGKILL left
    no parseable line (BENCH_r02.json rc=124).  On budget expiry a
    parseable value:null line is emitted HERE, from the loop — not
    from an exception handler a SIGKILL would never reach — and the
    bench is still attempted afterwards (a late-recovering backend can
    overwrite the null line with a real number)."""
    import subprocess
    import sys
    max_wait_s = float(os.environ.get("KALDI_TPU_BENCH_WAIT", "300"))
    probe = ("import jax, jax.numpy as jnp; x = jnp.ones((128, 128)); "
             "(x @ x).block_until_ready()")
    t0 = time.time()
    while True:
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               timeout=min(150.0, max(30.0, max_wait_s / 2)),
                               capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        waited = time.time() - t0
        if waited > max_wait_s:
            _emit(None, None, {
                "error": "backend unavailable after "
                         f"{waited:.0f}s wait; attempting bench anyway",
            })
            return False
        print(f"# backend unavailable ({waited:.0f}s); retrying in 30s",
              flush=True)
        time.sleep(30.0)


if __name__ == "__main__":
    _wait_for_backend()
    try:
        main()
    except Exception as e:  # noqa: BLE001
        # still emit a parseable line so the failure MODE is recorded
        # (e.g. a TPU-tunnel outage outlasting the wait) rather than
        # only a stack trace
        _emit(None, None, {"error": f"{type(e).__name__}: {e}"[:300]})
        raise
