"""Tests for ops/nn building blocks, low-precision analysis, schedulers,
Adam, profiling and metrics utilities."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.ops.nn import (
    avg_pool1d, conv1d, depthwise_separable_conv1d, dropout, layer_norm,
    max_pool1d, squeeze_excite, stats_pooling,
)
from kaldi_fp16_tpu.training.schedulers import (
    adam_update, exponential_decay_lr, init_adam_state, step_lr, warmup_lr,
)
from kaldi_fp16_tpu.utils.lowp import (
    analyze_conversion, f32_to_bf16, f32_to_f16,
)
from kaldi_fp16_tpu.utils.metrics import MetricsLogger
from kaldi_fp16_tpu.utils.profiling import StepTimer, profile_fn


class TestNNOps:
    def test_conv1d_identity(self):
        x = jnp.arange(12, dtype=jnp.float32).reshape(1, 6, 2)
        w = jnp.zeros((1, 2, 2)).at[0].set(jnp.eye(2))
        out = conv1d(x, w)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)

    def test_conv1d_kernel3(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 8, 3)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(3, 3, 4)).astype(np.float32))
        out = conv1d(x, w, padding="SAME")
        assert out.shape == (2, 8, 4)
        # manual check at interior position
        xn = np.asarray(x)
        wn = np.asarray(w)
        expect = sum(xn[0, 3 + k - 1] @ wn[k] for k in range(3))
        np.testing.assert_allclose(np.asarray(out[0, 3]), expect, rtol=1e-5, atol=1e-6)

    def test_max_pool(self):
        x = jnp.asarray([[1.0, 5.0, 2.0, 8.0]]).reshape(1, 4, 1)
        out = max_pool1d(x, window=2)
        np.testing.assert_array_equal(np.asarray(out).ravel(), [5.0, 8.0])

    def test_avg_pool(self):
        x = jnp.asarray([[2.0, 4.0, 6.0, 8.0]]).reshape(1, 4, 1)
        out = avg_pool1d(x, window=2)
        np.testing.assert_allclose(np.asarray(out).ravel(), [3.0, 7.0])

    def test_stats_pooling(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 50, 4)).astype(np.float32))
        out = stats_pooling(x)
        assert out.shape == (2, 8)
        np.testing.assert_allclose(np.asarray(out[:, :4]),
                                   np.asarray(x).mean(1), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out[:, 4:]),
                                   np.asarray(x).std(1), atol=1e-4)

    def test_stats_pooling_masked(self):
        x = jnp.ones((1, 4, 2)).at[0, 2:].set(99.0)
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        out = stats_pooling(x, mask=mask)
        np.testing.assert_allclose(np.asarray(out[0, :2]), 1.0, atol=1e-6)

    def test_layer_norm(self, rng):
        x = jnp.asarray(rng.normal(loc=3, scale=2, size=(2, 5, 16))
                        .astype(np.float32))
        out = np.asarray(layer_norm(x))
        np.testing.assert_allclose(out.mean(-1), 0.0, atol=1e-5)
        np.testing.assert_allclose(out.std(-1), 1.0, atol=1e-2)

    def test_depthwise_separable(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 6, 4)).astype(np.float32))
        dw = jnp.asarray(rng.normal(size=(3, 1, 4)).astype(np.float32))
        pw = jnp.asarray(rng.normal(size=(1, 4, 8)).astype(np.float32))
        out = depthwise_separable_conv1d(x, dw, pw)
        assert out.shape == (1, 6, 8)

    def test_squeeze_excite_gates(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 5, 4)).astype(np.float32))
        w1 = jnp.zeros((4, 2)); b1 = jnp.zeros(2)
        w2 = jnp.zeros((2, 4)); b2 = jnp.full(4, 100.0)  # sigmoid -> 1
        out = squeeze_excite(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)

    def test_dropout(self):
        x = jnp.ones((4, 100, 8))
        out = dropout(x, 0.5, jax.random.PRNGKey(0), train=True)
        zeros = float((np.asarray(out) == 0).mean())
        assert 0.3 < zeros < 0.7
        kept = np.asarray(out)[np.asarray(out) != 0]
        np.testing.assert_allclose(kept, 2.0, atol=1e-6)  # inverted scaling
        out_eval = dropout(x, 0.5, jax.random.PRNGKey(0), train=False)
        np.testing.assert_array_equal(np.asarray(out_eval), np.asarray(x))


class TestLowp:
    def test_f16_roundtrip_exact_values(self):
        x = np.array([0.0, 1.0, -2.5, 65504.0], dtype=np.float32)
        np.testing.assert_array_equal(f32_to_f16(x).astype(np.float32), x)

    def test_bf16_rounding(self):
        x = np.array([1.0 + 2 ** -9], dtype=np.float32)  # needs rounding
        out = f32_to_bf16(x)
        assert out[0] in (np.float32(1.0), np.float32(1.0078125))

    def test_bf16_preserves_nan_inf(self):
        x = np.array([np.nan, np.inf, -np.inf], dtype=np.float32)
        out = f32_to_bf16(x)
        assert np.isnan(out[0]) and np.isinf(out[1]) and np.isinf(out[2])

    def test_analyze_speech_range(self, rng):
        """Speech features (±40 MFCC range) survive both formats cleanly
        (BASELINE: 0 overflow/underflow over 6.5M examples)."""
        x = rng.normal(scale=10, size=10000).astype(np.float32)
        for fmt in ("fp16", "bfloat16"):
            st = analyze_conversion(x, fmt)
            assert st.overflow == 0
            assert st.ok() or st.underflow == 0

    def test_analyze_overflow_detection(self):
        st = analyze_conversion(np.array([1e5], dtype=np.float32), "fp16")
        assert st.overflow == 1
        st2 = analyze_conversion(np.array([1e5], dtype=np.float32), "bfloat16")
        assert st2.overflow == 0

    def test_analyze_underflow_detection(self):
        st = analyze_conversion(np.array([1e-6], dtype=np.float32), "fp16")
        assert st.underflow == 1


class TestSchedulers:
    def test_step_lr(self):
        lr = step_lr(1.0, step_size=10, gamma=0.1)
        assert lr(0) == 1.0 and lr(9) == 1.0
        assert abs(lr(10) - 0.1) < 1e-12
        assert abs(lr(25) - 0.01) < 1e-12

    def test_exponential(self):
        lr = exponential_decay_lr(1.0, 0.5)
        assert lr(3) == 0.125

    def test_warmup(self):
        lr = warmup_lr(lambda s: 1.0, warmup_steps=4)
        assert abs(lr(0) - 0.25) < 1e-12
        assert abs(lr(3) - 1.0) < 1e-12
        assert lr(10) == 1.0

    def test_adam_converges_quadratic(self):
        params = {"w": jnp.asarray([5.0, -3.0])}
        state = init_adam_state(params)
        for _ in range(200):
            grads = {"w": 2 * params["w"]}  # d/dw w^2
            params, state = adam_update(params, grads, state, lr=0.1)
        assert float(jnp.abs(params["w"]).max()) < 0.1
        assert int(state["step"]) == 200


class TestUtils:
    def test_step_timer(self):
        t = StepTimer(skip_first=1)
        for _ in range(3):
            with t:
                pass
        s = t.summary()
        assert s["steps"] == 2
        assert s["mean_ms"] >= 0

    def test_profile_fn(self):
        f = jax.jit(lambda x: x * 2)
        stats = profile_fn(f, jnp.ones(16), iters=3)
        assert stats["min_ms"] > 0

    def test_metrics_logger(self, tmp_path):
        p = str(tmp_path / "m.jsonl")
        log = MetricsLogger(p, echo=False)
        log.log(1, loss=1.5, objf=jnp.asarray(-0.25))
        log.log(2, loss=1.2)
        log.close()
        lines = [json.loads(l) for l in open(p)]
        assert lines[0]["step"] == 1 and lines[0]["loss"] == 1.5
        assert lines[0]["objf"] == -0.25
        assert lines[1]["step"] == 2


class TestLosses:
    """ops/losses.py — the GoTorch loss inventory (gotorch/ops.go)."""

    def test_cross_entropy_int_labels_matches_manual(self):
        import jax
        import jax.numpy as jnp
        from kaldi_fp16_tpu.ops.losses import cross_entropy
        rng = np.random.default_rng(0)
        logits = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
        labels = jnp.asarray(rng.integers(0, 7, size=5))
        got = float(cross_entropy(logits, labels))
        logp = np.asarray(jax.nn.log_softmax(logits, axis=-1))
        want = -np.mean([logp[i, labels[i]] for i in range(5)])
        assert abs(got - want) < 1e-6

    def test_cross_entropy_soft_labels_and_smoothing(self):
        import jax.numpy as jnp
        from kaldi_fp16_tpu.ops.losses import cross_entropy
        logits = jnp.asarray([[2.0, 0.0, -2.0]])
        soft = jnp.asarray([[0.5, 0.5, 0.0]])
        hard = jnp.asarray([0])
        assert float(cross_entropy(logits, soft)) > float(
            cross_entropy(logits, hard))
        # smoothing pulls toward uniform -> higher loss on a confident hit
        assert float(cross_entropy(logits, hard, label_smoothing=0.2)) > \
            float(cross_entropy(logits, hard))

    def test_cross_entropy_weights(self):
        import jax.numpy as jnp
        from kaldi_fp16_tpu.ops.losses import cross_entropy
        logits = jnp.asarray([[5.0, 0.0], [0.0, 5.0]])
        labels = jnp.asarray([0, 0])   # first right, second wrong
        w_right = float(cross_entropy(logits, labels,
                                      weights=jnp.asarray([1.0, 0.0])))
        w_wrong = float(cross_entropy(logits, labels,
                                      weights=jnp.asarray([0.0, 1.0])))
        assert w_right < 0.1 < w_wrong

    def test_mse(self):
        import jax.numpy as jnp
        from kaldi_fp16_tpu.ops.losses import mse
        a = jnp.asarray([[1.0, 2.0], [3.0, 4.0]])
        b = jnp.asarray([[1.0, 0.0], [3.0, 4.0]])
        assert abs(float(mse(a, b)) - 1.0) < 1e-6      # mean over all
        w = jnp.asarray([1.0, 0.0])
        assert abs(float(mse(a, b, weights=w)) - 2.0) < 1e-6
