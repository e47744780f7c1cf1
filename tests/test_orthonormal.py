"""Semi-orthogonal constraint (Kaldi ConstrainOrthonormal analog).

The reference parses orthonormal-constraint but never applies it
(layers.go:45,221); here it is enforced during training, so these tests
check both the update rule and its trainer integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.models.model import build_model_from_string
from kaldi_fp16_tpu.training.orthonormal import (
    constrain_orthonormal, orthonormal_targets,
)


def ortho_error(w, scale=None):
    """||M M^T - s^2 I||_F / r for the rows<=cols orientation of w."""
    m = w.T if w.shape[1] <= w.shape[0] else w
    p = np.asarray(m @ m.T, dtype=np.float64)
    r = p.shape[0]
    if scale is None:  # floating
        scale2 = np.sum(p * p) / np.trace(p)
    else:
        scale2 = scale ** 2
    return np.linalg.norm(p - scale2 * np.eye(r)) / r


class TestConstraintStep:
    def test_floating_converges(self):
        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(96, 24)).astype(np.float32) * 0.3)
        e0 = ortho_error(w)
        for _ in range(30):
            w = constrain_orthonormal(w, -1.0)
        assert ortho_error(w) < 1e-4 < e0

    def test_fixed_scale_converges(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32) * 0.5)
        for _ in range(50):
            w = constrain_orthonormal(w, 2.0)
        # rows<=cols orientation is w.T here: M M^T = w.T @ w
        np.testing.assert_allclose(np.asarray(w.T @ w),
                                   4.0 * np.eye(16), atol=1e-3)

    def test_wide_orientation(self):
        # out > in: update must run on w directly (rows=in <= cols=out).
        # Init near the target scale: like Kaldi, the update rule is only
        # stable in a basin around M M^T ~ s^2 I (training keeps it there
        # between applications; eigenvalues far above s^2 diverge).
        rng = np.random.default_rng(2)
        w = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32) * 0.15)
        for _ in range(50):
            w = constrain_orthonormal(w, 1.0)
        np.testing.assert_allclose(np.asarray(w @ w.T), np.eye(16),
                                   atol=1e-3)

    def test_orthogonal_is_fixed_point(self):
        q, _ = np.linalg.qr(np.random.default_rng(3).normal(size=(32, 32)))
        w = jnp.asarray(q[:, :8].astype(np.float32))      # [32, 8] cols ortho
        w2 = constrain_orthonormal(w, 1.0)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w2), atol=1e-5)


class TestTargets:
    def test_tdnnf_and_prefinal_default_on(self):
        model = build_model_from_string("""\
input name=input dim=16
tdnnf-layer name=tdnnf1 dim=32 bottleneck-dim=8 time-stride=1
prefinal-layer name=prefinal small-dim=8 big-dim=32
output-layer name=output dim=4 include-log-softmax=false
""")
        t = orthonormal_targets(model)
        assert ("tdnnf1", "linear_w", -1.0) in t
        assert ("prefinal", "small_w", -1.0) in t

    def test_explicit_off(self):
        model = build_model_from_string("""\
input name=input dim=16
tdnnf-layer name=tdnnf1 dim=32 bottleneck-dim=8 time-stride=1 orthonormal-constraint=0
output-layer name=output dim=4 include-log-softmax=false
""")
        assert orthonormal_targets(model) == []


class TestTrainerIntegration:
    def test_applied_on_interval(self):
        """After enough steps, the tdnnf bottleneck must be measurably
        more orthogonal than an unconstrained run."""
        from tests.test_parallel import _setup
        from kaldi_fp16_tpu.training.train_step import (
            TrainConfig, init_train_state, make_train_step,
        )
        from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
        import dataclasses

        model, den, num_graph, batch, config = _setup()
        errs = {}
        for interval in (0, 1):
            cfg = dataclasses.replace(config, orthonormal_interval=interval,
                                      learning_rate=1e-3)
            step = make_train_step(model, den, num_graph, ChainTrainingOpts(),
                                   cfg, num_frames_out=4, donate=False)
            params, ns, os_, ss = init_train_state(
                model, jax.random.PRNGKey(0), cfg)
            rng = jax.random.PRNGKey(7)
            for _ in range(6):
                rng, sub = jax.random.split(rng)
                params, ns, os_, ss, out = step(params, ns, os_, ss,
                                                batch, sub)
            assert np.isfinite(float(out.loss))
            errs[interval] = ortho_error(np.asarray(
                params["tdnnf1"]["linear_w"]))
        assert errs[1] < errs[0] * 0.5, errs
