"""Parity tests for the fused Pallas denominator scans (interpret mode).

The fused kernels (ops/pallas_den_scan.py) must produce the SAME
log-probs and posteriors as the XLA scan path at the structured-layout
tolerances.  Hardware perf is measured by tools/profile_den.py
--impls fused; here the kernels run interpreted on the CPU backend.
"""
import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import kaldi_fp16_tpu.ops.pallas_den_scan as mod
    monkeypatch.setattr(
        mod.pl, "pallas_call",
        functools.partial(pl.pallas_call, interpret=True))
    yield


def _make(num_pdfs=24, phones=13, states=2, branching=4, seed=3):
    from kaldi_fp16_tpu.chain.graph import (
        DenominatorGraph, make_phone_lm_den_fst,
    )
    fst = make_phone_lm_den_fst(num_pdfs, phones, states, branching,
                                seed=seed)
    return DenominatorGraph.from_fst(fst, num_pdfs)


class TestFusedDenScan:
    def test_fused_matches_xla(self):
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        g = _make()
        rng = np.random.default_rng(0)
        N, T = 128, 7   # N must be a lane multiple for the fused path
        nnet = jnp.asarray(
            rng.normal(size=(N, T, g.num_pdfs)).astype(np.float32))
        dx = DenominatorComputation(g, leaky=1e-4, scan_impl="xla")
        df = DenominatorComputation(g, leaky=1e-4, scan_impl="fused")
        assert df._structured._fused_ready
        assert df._structured._use_fused(N, True)
        lx, px = dx.forward_backward(nnet)
        lf, pf = df.forward_backward(nnet)
        np.testing.assert_allclose(np.asarray(lf), np.asarray(lx),
                                   rtol=2e-5, atol=2e-6)
        np.testing.assert_allclose(np.asarray(pf), np.asarray(px),
                                   rtol=2e-4, atol=2e-6)

    def test_fused_forward_only(self):
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        g = _make(seed=5)
        rng = np.random.default_rng(1)
        N, T = 128, 5
        nnet = jnp.asarray(
            rng.normal(size=(N, T, g.num_pdfs)).astype(np.float32))
        dx = DenominatorComputation(g, leaky=1e-4, scan_impl="xla")
        df = DenominatorComputation(g, leaky=1e-4, scan_impl="fused")
        np.testing.assert_allclose(np.asarray(df.forward(nnet)),
                                   np.asarray(dx.forward(nnet)),
                                   rtol=2e-5, atol=2e-6)

    def test_fused_fast_mode_close(self):
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        g = _make()
        rng = np.random.default_rng(2)
        N, T = 128, 5
        nnet = jnp.asarray(
            rng.normal(size=(N, T, g.num_pdfs)).astype(np.float32))
        de = DenominatorComputation(g, leaky=1e-4, scan_impl="fused")
        dfst = DenominatorComputation(g, leaky=1e-4, mode="fast",
                                      scan_impl="fused")
        le, pe = de.forward_backward(nnet)
        lf, pf = dfst.forward_backward(nnet)
        np.testing.assert_allclose(np.asarray(le), np.asarray(lf),
                                   rtol=2e-2)
        assert np.max(np.abs(np.asarray(pe) - np.asarray(pf))) < 2e-2

    def test_odd_batch_falls_back(self):
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        g = _make()
        d = DenominatorComputation(g, leaky=1e-4, scan_impl="fused")
        assert not d._structured._use_fused(3, True)

    def test_fp64_oracle(self):
        from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
        from kaldi_fp16_tpu.chain.reference import (
            denominator_forward_backward_ref,
        )
        g = _make(seed=7)
        rng = np.random.default_rng(4)
        N, T = 128, 5
        nnet = rng.normal(size=(N, T, g.num_pdfs)).astype(np.float32)
        df = DenominatorComputation(g, leaky=1e-4, scan_impl="fused")
        lf, pf = df.forward_backward(jnp.asarray(nnet))
        for n in (0, 77):
            lr, pr = denominator_forward_backward_ref(g, nnet[n],
                                                      leaky=1e-4)
            assert abs(float(lf[n]) - lr) < 5e-5
            np.testing.assert_allclose(np.asarray(pf[n]), pr,
                                       rtol=1e-3, atol=5e-5)
