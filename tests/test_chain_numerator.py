"""Numerator forward-backward: oracle vs brute force vs JAX, gradients by
finite differences (the reference's gold-standard test strategy, ref:
internal/nnet/backward_test.go)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
from kaldi_fp16_tpu.io.sparse import fst_to_csr
from kaldi_fp16_tpu.chain.graph import build_numerator_batch, LOG_ZERO
from kaldi_fp16_tpu.chain.numerator import numerator_forward_backward
from kaldi_fp16_tpu.chain.reference import (
    numerator_forward_backward_ref, numerator_brute_force,
)


def linear_fst(pdfs, weights=None, final_weight=0.0):
    states = [FstState() for _ in range(len(pdfs) + 1)]
    for i, p in enumerate(pdfs):
        w = 0.0 if weights is None else weights[i]
        states[i].arcs.append(FstArc(p, w, i + 1))
    states[-1].final = final_weight
    return Fst(start=0, states=states)


def diamond_fst():
    """Two paths of length 2: start -1-> a -2-> end, start -3-> b -4-> end."""
    s = [FstState() for _ in range(4)]
    s[0].arcs = [FstArc(1, 0.1, 1), FstArc(3, 0.7, 2)]
    s[1].arcs = [FstArc(2, 0.2, 3)]
    s[2].arcs = [FstArc(4, 0.3, 3)]
    s[3].final = 0.5
    return Fst(start=0, states=s)


def random_fst(rng, num_states=6, num_pdfs=5, arcs_per_state=2, T=4):
    """Random FST where every state reaches a final state in exactly the
    right number of steps: layered construction start->...->final."""
    layers = T + 1
    per = max(1, num_states // layers)
    ids = [[l * per + i for i in range(per)] for l in range(layers)]
    states = [FstState() for _ in range(per * layers)]
    for l in range(layers - 1):
        for sid in ids[l]:
            for _ in range(arcs_per_state):
                states[sid].arcs.append(FstArc(
                    int(rng.integers(1, num_pdfs + 1)),
                    float(rng.uniform(0, 1.5)),
                    int(rng.choice(ids[l + 1]))))
    for sid in ids[-1]:
        states[sid].final = float(rng.uniform(0, 1))
    return Fst(start=0, states=states)


class TestOracleVsBruteForce:
    def test_linear(self, rng):
        fst = linear_fst([1, 2, 3], weights=[0.5, 0.6, 0.7], final_weight=0.25)
        csr = fst_to_csr(fst)
        out = rng.normal(size=(3, 4))
        logp, _ = numerator_forward_backward_ref(csr, out)
        bf = numerator_brute_force(csr, out)
        assert abs(logp - bf) < 1e-10
        # manual: single path
        manual = (out[0, 0] + out[1, 1] + out[2, 2]
                  - 0.5 - 0.6 - 0.7 - 0.25)
        assert abs(logp - manual) < 1e-6  # CSR stores weights as float32

    def test_diamond(self, rng):
        csr = fst_to_csr(diamond_fst())
        out = rng.normal(size=(2, 4))
        logp, _ = numerator_forward_backward_ref(csr, out)
        assert abs(logp - numerator_brute_force(csr, out)) < 1e-10

    def test_random_layered(self, rng):
        fst = random_fst(rng, T=3)
        csr = fst_to_csr(fst)
        out = rng.normal(size=(3, 5))
        logp, _ = numerator_forward_backward_ref(csr, out)
        assert abs(logp - numerator_brute_force(csr, out)) < 1e-9


class TestOracleGradient:
    def test_posteriors_are_gradient(self, rng):
        """posteriors == d logprob / d nnet_output by finite differences."""
        csr = fst_to_csr(diamond_fst())
        out = rng.normal(size=(2, 4))
        logp, post = numerator_forward_backward_ref(csr, out)
        eps = 1e-6
        for t in range(2):
            for p in range(4):
                o2 = out.copy()
                o2[t, p] += eps
                lp2, _ = numerator_forward_backward_ref(csr, o2)
                fd = (lp2 - logp) / eps
                assert abs(fd - post[t, p]) < 1e-4, (t, p, fd, post[t, p])

    def test_posteriors_sum_to_one_per_frame(self, rng):
        """Every path emits exactly one pdf per frame -> posteriors sum to 1."""
        csr = fst_to_csr(diamond_fst())
        out = rng.normal(size=(2, 4))
        _, post = numerator_forward_backward_ref(csr, out)
        np.testing.assert_allclose(post.sum(axis=1), 1.0, atol=1e-9)


class TestJaxVsOracle:
    def test_single_sequence(self, rng):
        fst = random_fst(rng, T=4)
        csr = fst_to_csr(fst)
        out = rng.normal(size=(4, 5)).astype(np.float32)
        ref_logp, ref_post = numerator_forward_backward_ref(csr, out)

        batch = build_numerator_batch([csr])
        logp, post = numerator_forward_backward(batch, jnp.asarray(out[None]))
        assert abs(float(logp[0]) - ref_logp) < 1e-4
        np.testing.assert_allclose(np.asarray(post[0]), ref_post, atol=1e-4)

    def test_batch_with_padding(self, rng):
        """Different-sized FSTs padded to common shape must match per-seq refs."""
        fsts = [random_fst(rng, num_states=6, T=3),
                diamond_fst() and random_fst(rng, num_states=9, arcs_per_state=3, T=3)]
        csrs = [fst_to_csr(f) for f in fsts]
        outs = rng.normal(size=(2, 3, 5)).astype(np.float32)
        batch = build_numerator_batch(csrs)
        logp, post = numerator_forward_backward(batch, jnp.asarray(outs))
        for b, csr in enumerate(csrs):
            ref_logp, ref_post = numerator_forward_backward_ref(csr, outs[b])
            assert abs(float(logp[b]) - ref_logp) < 1e-4
            np.testing.assert_allclose(np.asarray(post[b]), ref_post, atol=1e-4)

    def test_epsilon_arcs_skipped(self, rng):
        """Label-0 arcs must not contribute (ref: chain.cu:113-118)."""
        fst = linear_fst([1, 2])
        fst.states[0].arcs.append(FstArc(0, 0.0, 1))  # epsilon arc, same route
        csr = fst_to_csr(fst)
        out = rng.normal(size=(2, 3)).astype(np.float32)
        batch = build_numerator_batch([csr])
        logp, _ = numerator_forward_backward(batch, jnp.asarray(out[None]))
        ref_logp, _ = numerator_forward_backward_ref(fst_to_csr(linear_fst([1, 2])), out)
        assert abs(float(logp[0]) - ref_logp) < 1e-5

    def test_unreachable_final_gives_logzero(self):
        """FST whose final state is unreachable in T steps -> LOG_ZERO total."""
        fst = linear_fst([1, 2, 3])  # needs exactly T=3
        csr = fst_to_csr(fst)
        out = np.zeros((2, 4), dtype=np.float32)  # T=2 < 3
        batch = build_numerator_batch([csr])
        logp, post = numerator_forward_backward(batch, jnp.asarray(out[None]))
        assert float(logp[0]) <= LOG_ZERO
        assert float(jnp.abs(post).max()) == 0.0
