"""Chain objective orchestration: gradient correctness through jax.grad,
out-of-range penalty, L2, NaN containment, supervision weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kaldi_fp16_tpu.io.sparse import fst_to_csr
from kaldi_fp16_tpu.chain.graph import (
    DenominatorGraph, build_numerator_batch, make_simple_den_fst,
)
from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
from kaldi_fp16_tpu.chain.objective import (
    ChainTrainingOpts, chain_objf_and_deriv, make_chain_objf,
)
from tests.test_chain_numerator import random_fst


NUM_PDFS = 6
T = 4
B = 2


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(7)
    den_graph = DenominatorGraph.from_fst(
        make_simple_den_fst(num_pdfs=NUM_PDFS, num_states=5, seed=1), NUM_PDFS)
    den = DenominatorComputation(den_graph, leaky=1e-4)
    csrs = [fst_to_csr(random_fst(rng, num_pdfs=NUM_PDFS, T=T)) for _ in range(B)]
    num_graph = build_numerator_batch(csrs)
    out = rng.normal(size=(B, T, NUM_PDFS)).astype(np.float32) * 0.5
    return den, num_graph, out


class TestObjfAndDeriv:
    def test_finite_diff_gradient(self, setup):
        """deriv == d objf/d out by central differences (no OOR active here,
        small outputs; the gold-standard check, ref backward_test.go)."""
        den, num_graph, out = setup
        opts = ChainTrainingOpts(out_of_range_regularize=0.0)
        result, deriv = chain_objf_and_deriv(num_graph, den, jnp.asarray(out),
                                             opts=opts)
        deriv = np.asarray(deriv)
        rng = np.random.default_rng(0)
        eps = 1e-3
        for _ in range(12):
            b = rng.integers(B)
            t = rng.integers(T)
            p = rng.integers(NUM_PDFS)
            o1, o2 = out.copy(), out.copy()
            o1[b, t, p] -= eps
            o2[b, t, p] += eps
            r1, _ = chain_objf_and_deriv(num_graph, den, jnp.asarray(o1), opts=opts)
            r2, _ = chain_objf_and_deriv(num_graph, den, jnp.asarray(o2), opts=opts)
            fd = (float(r2.total_objf) - float(r1.total_objf)) / (2 * eps)
            assert abs(fd - deriv[b, t, p]) < 5e-3, (b, t, p, fd, deriv[b, t, p])

    def test_custom_vjp_matches_deriv(self, setup):
        den, num_graph, out = setup
        opts = ChainTrainingOpts(out_of_range_regularize=0.0)
        _, deriv = chain_objf_and_deriv(num_graph, den, jnp.asarray(out), opts=opts)
        objf_fn = make_chain_objf(num_graph, den, opts)
        w = jnp.ones(B, dtype=jnp.float32)
        grad = jax.grad(lambda o: objf_fn(o, w)[0])(jnp.asarray(out))
        np.testing.assert_allclose(np.asarray(grad), np.asarray(deriv),
                                   rtol=1e-5, atol=1e-6)

    def test_supervision_weight_scales(self, setup):
        den, num_graph, out = setup
        opts = ChainTrainingOpts(out_of_range_regularize=0.0)
        w2 = jnp.full(B, 2.0, dtype=jnp.float32)
        r1, d1 = chain_objf_and_deriv(num_graph, den, jnp.asarray(out), opts=opts)
        r2, d2 = chain_objf_and_deriv(num_graph, den, jnp.asarray(out),
                                      weights=w2, opts=opts)
        np.testing.assert_allclose(float(r2.total_objf), 2 * float(r1.total_objf),
                                   rtol=1e-5)
        np.testing.assert_allclose(np.asarray(d2), 2 * np.asarray(d1),
                                   rtol=1e-4, atol=1e-7)

    def test_l2_term(self, setup):
        den, num_graph, out = setup
        opts = ChainTrainingOpts(out_of_range_regularize=0.0, l2_regularize=0.1)
        r, d = chain_objf_and_deriv(num_graph, den, jnp.asarray(out), opts=opts)
        expected_l2 = -0.5 * 0.1 * float((out.astype(np.float64) ** 2).sum())
        np.testing.assert_allclose(float(r.l2_term), expected_l2, rtol=1e-4)
        # deriv shifted by -l2*out vs the no-l2 deriv
        opts0 = ChainTrainingOpts(out_of_range_regularize=0.0)
        _, d0 = chain_objf_and_deriv(num_graph, den, jnp.asarray(out), opts=opts0)
        np.testing.assert_allclose(np.asarray(d), np.asarray(d0) - 0.1 * out,
                                   rtol=1e-4, atol=1e-6)

    def test_out_of_range_penalty(self, setup):
        den, num_graph, _ = setup
        out = np.zeros((B, T, NUM_PDFS), dtype=np.float32)
        out[0, 0, 0] = 35.0   # even frame -> penalized
        out[0, 1, 1] = 35.0   # odd frame -> skipped
        out[1, 2, 2] = -40.0  # even frame -> penalized
        r, d = chain_objf_and_deriv(num_graph, den, jnp.asarray(out))
        assert int(r.out_of_range_count) == 2
        d = np.asarray(d)
        scale = 2 * 0.01
        # penalty contribution: (limit - val) * scale on top of posterior part
        r0, d0 = chain_objf_and_deriv(
            num_graph, den, jnp.asarray(out),
            opts=ChainTrainingOpts(out_of_range_regularize=0.0))
        np.testing.assert_allclose(d[0, 0, 0] - d0[0, 0, 0], (30 - 35) * scale,
                                   atol=1e-6)
        np.testing.assert_allclose(d[0, 1, 1] - d0[0, 1, 1], 0.0, atol=1e-6)
        np.testing.assert_allclose(d[1, 2, 2] - d0[1, 2, 2], (-30 + 40) * scale,
                                   atol=1e-6)

    def test_nan_containment(self, setup):
        """Unreachable numerator (T mismatch impossible here) -> -inf objf
        must be contained: objf := -10*w*T, deriv zeroed for that sequence."""
        den, _, out = setup
        # numerator FST needing more frames than T -> total = LOG_ZERO
        rng = np.random.default_rng(3)
        bad = fst_to_csr(random_fst(rng, num_pdfs=NUM_PDFS, T=T + 2))
        good = fst_to_csr(random_fst(rng, num_pdfs=NUM_PDFS, T=T))
        graph = build_numerator_batch([bad, good])
        r, d = chain_objf_and_deriv(graph, den, jnp.asarray(out))
        ok = np.asarray(r.ok)
        assert not ok[0] and ok[1]
        d = np.asarray(d)
        assert np.abs(d[0]).max() == 0.0
        assert np.abs(d[1]).max() > 0.0
        assert np.isfinite(float(r.total_objf))

    def test_deriv_weights(self, setup):
        den, num_graph, out = setup
        dw = np.zeros((B, T), dtype=np.float32)
        dw[:, :2] = 1.0
        _, d = chain_objf_and_deriv(num_graph, den, jnp.asarray(out),
                                    deriv_weights=jnp.asarray(dw))
        d = np.asarray(d)
        assert np.abs(d[:, 2:]).max() == 0.0
        assert np.abs(d[:, :2]).max() > 0.0

    def test_result_fields(self, setup):
        den, num_graph, out = setup
        r, _ = chain_objf_and_deriv(num_graph, den, jnp.asarray(out))
        assert float(r.total_weight) == B * T
        np.testing.assert_allclose(
            float(r.objf_per_frame),
            float(r.total_objf) / (B * T), rtol=1e-6)
        # objf should be negative (log prob ratio of random outputs)
        assert float(r.num_logprob[0]) < 0 or float(r.den_logprob[0]) < 0
