"""profile_step — ablate the optimizer slice out of the flagship step.

How much of the ~94 ms flagship step is the optimizer (sgd_update +
max-change norms + orthonormal cond) vs the fwd+grad core?  Times the
full train step against a lean config (no momentum / max-change /
orthonormal) at identical geometry.  Measured r3 on TPU: full 93.9 ms,
lean 92.9 ms -> optimizer extras = **0.98 ms**.  The ~19 ms the r2
budget attributed to "optimizer + dispatch" actually lives in the
fwd+bwd/chain slices (their sub-measurements were taken in isolation,
where XLA fusion boundaries differ).  Run from the repo root:
python tools/profile_step.py
"""
import _common  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
from kaldi_fp16_tpu.chain.graph import (
    DenominatorGraph, NumeratorGraphBatch, LOG_ZERO, make_phone_lm_den_fst,
)
from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
from kaldi_fp16_tpu.models.model import build_model
from kaldi_fp16_tpu.training.train_step import (
    TrainConfig, init_train_state, make_train_step,
)

rng = np.random.default_rng(0)
B, T_in, P = 128, 150, 3080
left, stride = 3, 3
T_out = (T_in - left + stride - 1) // stride

model = build_model("configs/cnn_tdnn.xconfig")
graph = DenominatorGraph.from_fst(make_phone_lm_den_fst(num_pdfs=P), P)
den = DenominatorComputation(graph, leaky=1e-5, mode="exact")

An, Sn = max(256, T_out), T_out + 1
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

ITERS = 15


def bench_full():
    global params, net_state, opt_state, scale_state
    k = key
    k, sub = jax.random.split(k)
    p, ns, os_, ss, out = step(params, net_state, opt_state, scale_state,
                               batch, sub)
    jax.block_until_ready(out.loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        k, sub = jax.random.split(k)
        p, ns, os_, ss, out = step(p, ns, os_, ss, batch, sub)
    jax.block_until_ready(out.loss)
    return (time.perf_counter() - t0) / ITERS * 1e3


full_ms = bench_full()
print(f"full step        : {full_ms:7.2f} ms")

# grad-only at the same geometry: reuse the SAME step machinery but with
# lr=0 + no orthonormal + no momentum would still run the update ops, so
# instead re-derive a loss_fn-level jit via make_train_step's pieces is
# invasive; approximate the core as value_and_grad of the step's loss by
# rebuilding a minimal config that skips optimizer extras:
cfg2 = TrainConfig(learning_rate=1e-3, momentum=0.0,
                   frame_subsampling_factor=stride, left_context=left,
                   orthonormal_interval=0, max_param_change=0.0)
step2 = make_train_step(model, den, num_graph, ChainTrainingOpts(), cfg2,
                        num_frames_out=T_out, donate=True)
p2, ns2, os2, ss2 = init_train_state(model, jax.random.PRNGKey(0), cfg2)
k, sub = jax.random.split(key)
p2, ns2, os2, ss2, out2 = step2(p2, ns2, os2, ss2, batch, sub)
jax.block_until_ready(out2.loss)
t0 = time.perf_counter()
for _ in range(ITERS):
    k, sub = jax.random.split(k)
    p2, ns2, os2, ss2, out2 = step2(p2, ns2, os2, ss2, batch, sub)
jax.block_until_ready(out2.loss)
lean_ms = (time.perf_counter() - t0) / ITERS * 1e3
print(f"lean step (no momentum/max-change/orthonormal): {lean_ms:7.2f} ms")
print(f"optimizer-extras slice: {full_ms - lean_ms:7.2f} ms")
