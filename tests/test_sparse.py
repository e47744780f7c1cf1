"""Tests for CSR/COO FST conversion, weight negation, and batch merging."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
from kaldi_fp16_tpu.io.sparse import (
    fst_to_coo, fst_to_csr, coo_to_csr, csr_to_coo, merge_coo,
)


def tiny_fst():
    s0, s1, s2 = FstState(), FstState(), FstState()
    s0.arcs = [FstArc(1, 0.5, 1), FstArc(2, 1.5, 2)]
    s1.arcs = [FstArc(3, 0.25, 2)]
    s2.final = 0.75
    return Fst(start=0, states=[s0, s1, s2])


def test_weight_negation_both_paths():
    """Tropical -> log-prob negation must hit arcs AND finals in BOTH paths
    (ref bug history: sparse.go fixed only one path once)."""
    fst = tiny_fst()
    coo = fst_to_coo(fst)
    csr = fst_to_csr(fst)
    np.testing.assert_allclose(coo.weights, [-0.5, -1.5, -0.25])
    np.testing.assert_allclose(csr.weights, [-0.5, -1.5, -0.25])
    np.testing.assert_allclose(coo.final_weights, [-0.75])
    np.testing.assert_allclose(csr.final_weights, [-0.75])


def test_csr_structure():
    csr = fst_to_csr(tiny_fst())
    np.testing.assert_array_equal(csr.row_ptr, [0, 2, 3, 3])
    np.testing.assert_array_equal(csr.col_idx, [1, 2, 2])
    np.testing.assert_array_equal(csr.labels, [1, 2, 3])
    np.testing.assert_array_equal(csr.final_states, [2])
    assert csr.label_dim() == 3
    csr.validate()


def test_src_states_expansion():
    csr = fst_to_csr(tiny_fst())
    np.testing.assert_array_equal(csr.src_states(), [0, 0, 1])


def test_coo_csr_roundtrip():
    coo = fst_to_coo(tiny_fst())
    csr = coo_to_csr(coo)
    back = csr_to_coo(csr)
    np.testing.assert_array_equal(back.rows, coo.rows)
    np.testing.assert_array_equal(back.cols, coo.cols)
    np.testing.assert_array_equal(back.labels, coo.labels)
    np.testing.assert_allclose(back.weights, coo.weights)


def test_coo_to_csr_stable_sort():
    """Arc order within a row must be preserved (stable)."""
    from kaldi_fp16_tpu.io.sparse import COO
    coo = COO(num_states=2,
              rows=np.array([1, 0, 1, 0], dtype=np.int32),
              cols=np.array([0, 1, 1, 0], dtype=np.int32),
              labels=np.array([10, 20, 30, 40], dtype=np.int32),
              weights=np.array([1, 2, 3, 4], dtype=np.float32),
              final_states=np.array([], dtype=np.int32),
              final_weights=np.array([], dtype=np.float32))
    csr = coo_to_csr(coo)
    np.testing.assert_array_equal(csr.labels, [20, 40, 10, 30])
    np.testing.assert_array_equal(csr.row_ptr, [0, 2, 4])


def test_merge_coo_offsets():
    f1 = fst_to_coo(tiny_fst())   # 3 states
    f2 = fst_to_coo(tiny_fst())
    merged, offsets = merge_coo([f1, f2])
    np.testing.assert_array_equal(offsets, [0, 3])
    assert merged.num_states == 6
    assert merged.num_arcs == 6
    np.testing.assert_array_equal(merged.rows[3:], f2.rows + 3)
    np.testing.assert_array_equal(merged.cols[3:], f2.cols + 3)
    np.testing.assert_array_equal(merged.final_states, [2, 5])
    np.testing.assert_allclose(merged.final_weights, [-0.75, -0.75])


def test_merge_empty_raises():
    with pytest.raises(ValueError):
        merge_coo([])


def test_validate_catches_bad_colidx():
    csr = fst_to_csr(tiny_fst())
    csr.col_idx[0] = 99
    with pytest.raises(ValueError):
        csr.validate()
