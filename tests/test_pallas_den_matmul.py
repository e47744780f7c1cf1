"""Unit tests for the single-read split-bf16 den matmul kernel.

Runs the Pallas kernel in interpreter mode on the CPU backend (real-TPU
behavior is exercised by tools/profile_den.py and chainbench
--matmul-impl pallas; the hardware accuracy sweep is recorded in
docs/PERFORMANCE.md round 4).
"""
import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    # force interpreter mode for every pallas_call inside the module
    import kaldi_fp16_tpu.ops.pallas_den_matmul as mod
    monkeypatch.setattr(
        mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True))
    yield


def _case(F, N, terms, sparse=False, seed=0):
    from kaldi_fp16_tpu.ops.pallas_den_matmul import PallasDenMatmul
    rng = np.random.default_rng(seed)
    M = rng.random((F, F)).astype(np.float32)
    if sparse:
        M *= rng.random((F, F)) < 0.05
    v = rng.random((F, N)).astype(np.float32)
    ref = M.astype(np.float64) @ v.astype(np.float64)
    refT = M.T.astype(np.float64) @ v.astype(np.float64)
    pm = PallasDenMatmul(M, terms=terms)
    out = np.asarray(pm.apply(jnp.asarray(v), transpose=False), np.float64)
    outT = np.asarray(pm.apply(jnp.asarray(v), transpose=True), np.float64)
    rel = np.max(np.abs(out - ref) / (np.abs(ref) + 1e-8))
    relT = np.max(np.abs(outT - refT) / (np.abs(refT) + 1e-8))
    return rel, relT


class TestPallasDenMatmul:
    def test_exact_class_6_terms(self):
        rel, relT = _case(256, 128, terms=6)
        assert rel < 3e-6 and relT < 3e-6

    def test_three_terms_high_class(self):
        rel, relT = _case(256, 128, terms=3)
        assert rel < 1e-4 and relT < 1e-4

    def test_unaligned_dims_padded(self):
        # F not a multiple of the row tile, n not a lane multiple
        rel, relT = _case(300, 40, terms=6)
        assert rel < 3e-6 and relT < 3e-6

    def test_sparse_matrix(self):
        rel, relT = _case(256, 128, terms=6, sparse=True)
        assert rel < 3e-6 and relT < 3e-6

    def test_multidim_v_roundtrip_shape(self):
        from kaldi_fp16_tpu.ops.pallas_den_matmul import PallasDenMatmul
        rng = np.random.default_rng(1)
        F = 256
        M = rng.random((F, F)).astype(np.float32)
        v = rng.random((F, 2, 3)).astype(np.float32)
        pm = PallasDenMatmul(M, terms=6)
        out = pm.apply(jnp.asarray(v), transpose=False)
        assert out.shape == (F, 2, 3)
        ref = M.astype(np.float64) @ v.reshape(F, -1).astype(np.float64)
        np.testing.assert_allclose(np.asarray(out).reshape(F, -1), ref,
                                   rtol=3e-6, atol=1e-7)


class TestStructuredDenPallasImpl:
    def test_structured_den_pallas_matches_high(self):
        """DenominatorComputation(matmul_impl='pallas') parity with 'high'
        (kernel interpreted on CPU)."""
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        from kaldi_fp16_tpu.chain.graph import (
            DenominatorGraph, make_phone_lm_den_fst,
        )
        g = DenominatorGraph.from_fst(
            make_phone_lm_den_fst(24, 13, 2, 4, seed=3), 24)
        rng = np.random.default_rng(2)
        nnet = jnp.asarray(rng.normal(size=(2, 5, 24)).astype(np.float32))
        dh = DenominatorComputation(g, leaky=1e-4, matmul_impl="high")
        dp = DenominatorComputation(g, leaky=1e-4, matmul_impl="pallas")
        assert dp._structured.matmul_impl == "pallas"
        lh, ph = dh.forward_backward(nnet)
        lp, pp = dp.forward_backward(nnet)
        np.testing.assert_allclose(np.asarray(lh), np.asarray(lp),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(ph), np.asarray(pp),
                                   rtol=2e-4, atol=2e-6)
