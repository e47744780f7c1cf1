"""Pallas blocked segment reduce: correctness vs numpy on the CPU
interpreter (the kernel runs compiled on TPU; tests exercise the same
code path through the interpreter)."""

import numpy as np
import pytest

import jax.numpy as jnp

from kaldi_fp16_tpu.ops.pallas_reduce import blocked_segment_reduce


def _ref(vals, labels, sb):
    NB, K, N = vals.shape
    out = np.zeros((NB, sb, N), np.float64)
    for b in range(NB):
        for k in range(K):
            s = labels[b, k]
            if 0 <= s < sb:
                out[b, s] += vals[b, k]
    return out


@pytest.mark.parametrize("NB,K,N", [(2, 256, 8), (3, 384, 130), (1, 128, 1)])
def test_matches_reference(rng, NB, K, N):
    vals = rng.random((NB, K, N)).astype(np.float32)
    labels = rng.integers(0, 129, (NB, K)).astype(np.int32)  # incl padding
    out = blocked_segment_reduce(jnp.asarray(vals), jnp.asarray(labels),
                                 sb=128, exact=True)
    ref = _ref(vals, labels, 128)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fast_mode_bounded_drift(rng):
    vals = rng.random((2, 256, 16)).astype(np.float32)
    labels = rng.integers(0, 128, (2, 256)).astype(np.int32)
    out = blocked_segment_reduce(jnp.asarray(vals), jnp.asarray(labels),
                                 sb=128, exact=False)
    ref = _ref(vals, labels, 128)
    err = np.abs(np.asarray(out) - ref).max() / max(1.0, np.abs(ref).max())
    assert err < 5e-3  # bf16 rounding class


def test_padding_labels_contribute_nothing(rng):
    vals = np.ones((1, 128, 8), np.float32) * 7.0
    labels = np.full((1, 128), 128, np.int32)  # all padding
    out = blocked_segment_reduce(jnp.asarray(vals), jnp.asarray(labels),
                                 sb=128, exact=True)
    assert float(np.abs(np.asarray(out)).max()) == 0.0


def test_k_tiling_accumulates(rng):
    """K larger than k_block exercises the grid accumulation path."""
    vals = rng.random((1, 512, 8)).astype(np.float32)
    labels = rng.integers(0, 128, (1, 512)).astype(np.int32)
    out = blocked_segment_reduce(jnp.asarray(vals), jnp.asarray(labels),
                                 sb=128, exact=True, k_block=128)
    ref = _ref(vals, labels, 128)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
