"""Tests for the CM/CM2/CM3/FM matrix codecs, including bit-faithfulness of the
decode math against hand-computed reference values (the reference decoder is
byte-exact vs real Kaldi on 297 ark files, so matching its op-order pins us to
Kaldi's numerics)."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter
from kaldi_fp16_tpu.io import matrix as M


def _roundtrip(write_fn, read_fn, data):
    w = BinaryWriter()
    write_fn(w, data)
    r = BinaryReader(w.getvalue())
    tok = r.read_token()
    del tok
    return read_fn(r)


class TestUint16ToFloat:
    def test_exact_constant(self):
        # reference: min + range * 1.52590218966964e-05 * value, float32 ops
        got = M.uint16_to_float(np.float32(-2.0), np.float32(4.0),
                                np.array([0, 65535, 32768], dtype=np.uint16))
        exp0 = np.float32(-2.0)
        exp1 = np.float32(-2.0) + np.float32(4.0) * np.float32(1.52590218966964e-05) * np.float32(65535)
        assert got[0] == exp0
        assert got[1] == exp1
        assert abs(float(got[2]) - 0.0) < 1e-3


class TestCharToFloat:
    def test_branches(self):
        p0 = np.array([0.0], dtype=np.float32)
        p25 = np.array([1.0], dtype=np.float32)
        p75 = np.array([3.0], dtype=np.float32)
        p100 = np.array([10.0], dtype=np.float32)
        v = np.array([[0], [64], [128], [192], [255]], dtype=np.uint8)
        got = M.char_to_float(p0, p25, p75, p100, v)
        assert got[0, 0] == 0.0          # p0
        assert got[1, 0] == 1.0          # p25 (boundary: branch 1 at v=64)
        assert abs(got[2, 0] - 2.0) < 1e-6   # midpoint of [p25,p75]
        assert got[3, 0] == 3.0          # p75 (branch 2 boundary at v=192)
        assert abs(got[4, 0] - 10.0) < 1e-6  # p100

    def test_branch3_fp64_division(self):
        """The >192 branch must multiply fp32 then divide fp64 (Kaldi quirk)."""
        p75 = np.float32(0.1)
        p100 = np.float32(0.9000001)
        v = 200
        m32 = np.float32((p100 - p75) * np.float32(v - 192))
        expected = np.float32(np.float64(p75) + np.float64(m32) / 63.0)
        got = M.char_to_float(np.array([0.0], np.float32), np.array([0.05], np.float32),
                              np.array([p75]), np.array([p100]),
                              np.array([[v]], dtype=np.uint8))
        assert got[0, 0] == expected


class TestRoundTrips:
    def test_cm_roundtrip(self, rng):
        data = rng.normal(size=(50, 8)).astype(np.float32)
        out = _roundtrip(M.write_compressed_matrix_cm, M.read_compressed_matrix_cm, data)
        assert out.shape == data.shape
        # 1-byte piecewise quantization: tolerance scales with range
        assert np.abs(out - data).max() < 0.12

    def test_cm_column_major_layout(self):
        """Byte payload must be column-major: craft bytes directly."""
        rows, cols = 2, 3
        w = BinaryWriter()
        w.write_float32(0.0)   # min
        w.write_float32(1.0)   # range
        w.write_int32(rows)
        w.write_int32(cols)
        # per-col headers: p0=0, p25=16384(0.25), p75=49151(0.75), p100=65535
        hdr = np.array([[0, 16384, 49151, 65535]] * cols, dtype="<u2")
        w.write_bytes(hdr.tobytes())
        # column-major data: col0=[0,64], col1=[128,192], col2=[255,255]
        w.write_bytes(bytes([0, 64, 128, 192, 255, 255]))
        out = M.read_compressed_matrix_cm(BinaryReader(w.getvalue()))
        assert out.shape == (2, 3)
        # row 0 = first element of each column
        assert abs(out[0, 0] - 0.0) < 1e-4
        assert abs(out[1, 0] - 0.25) < 1e-3
        assert abs(out[0, 1] - 0.50) < 1e-3
        assert abs(out[1, 1] - 0.75) < 1e-3
        assert abs(out[0, 2] - 1.0) < 1e-3

    def test_cm2_roundtrip(self, rng):
        data = rng.normal(size=(1, 100)).astype(np.float32)
        out = _roundtrip(M.write_compressed_matrix_cm2, M.read_compressed_matrix_cm2, data)
        assert np.abs(out - data).max() < 1e-3

    def test_cm2_exact_decode(self):
        w = BinaryWriter()
        w.write_float32(-1.0)
        w.write_float32(2.0)
        w.write_int32(1)
        w.write_int32(2)
        w.write_bytes(np.array([0, 65535], dtype="<u2").tobytes())
        out = M.read_compressed_matrix_cm2(BinaryReader(w.getvalue()))
        inc = np.float32(2.0) / np.float32(65535.0)
        assert out[0, 0] == np.float32(-1.0)
        assert out[0, 1] == np.float32(-1.0) + np.float32(65535) * inc

    def test_cm3_roundtrip(self, rng):
        data = rng.normal(size=(7, 5)).astype(np.float32)
        out = _roundtrip(M.write_compressed_matrix_cm3, M.read_compressed_matrix_cm3, data)
        assert np.abs(out - data).max() < 0.05

    def test_fm_roundtrip(self, rng):
        data = rng.normal(size=(13, 4)).astype(np.float32)
        out = _roundtrip(M.write_full_matrix, M.read_full_matrix, data)
        np.testing.assert_array_equal(out, data)

    def test_constant_matrix(self):
        data = np.full((5, 3), 2.5, dtype=np.float32)
        out = _roundtrip(M.write_compressed_matrix_cm2, M.read_compressed_matrix_cm2, data)
        assert np.abs(out - 2.5).max() < 1e-3


class TestBadInput:
    def test_bad_dims(self):
        w = BinaryWriter()
        w.write_float32(0.0)
        w.write_float32(1.0)
        w.write_int32(-1)
        w.write_int32(10)
        with pytest.raises(ValueError):
            M.read_compressed_matrix_cm2(BinaryReader(w.getvalue()))

    def test_fm_bad_size_byte(self):
        r = BinaryReader(bytes([9, 0, 0, 0, 0]))
        with pytest.raises(ValueError):
            M.read_full_matrix(r)

    def test_truncated_payload(self):
        w = BinaryWriter()
        w.write_float32(0.0)
        w.write_float32(1.0)
        w.write_int32(4)
        w.write_int32(4)
        w.write_bytes(b"\x00" * 3)  # needs 32
        with pytest.raises(EOFError):
            M.read_compressed_matrix_cm2(BinaryReader(w.getvalue()))


class TestSparseMatrix:
    """SM/SV sparse GeneralMatrix payloads (ref: matrix.go:172-226,
    sm_parse_test.go:31-150)."""

    @staticmethod
    def _ref_basic_i32(v):
        """The reference's space-padded WriteBasicType framing."""
        import struct
        return b" \x04" + struct.pack("<i", v)

    @staticmethod
    def _ref_basic_f32(v):
        import struct
        return b" \x04" + struct.pack("<f", v)

    def test_reference_fixture_valid(self):
        """Byte-for-byte the reference's TestReadSparseMatrix_Valid."""
        data = self._ref_basic_i32(2)
        data += b"SV" + self._ref_basic_i32(5) + self._ref_basic_i32(2)
        data += self._ref_basic_i32(1) + self._ref_basic_f32(0.8)
        data += self._ref_basic_i32(3) + self._ref_basic_f32(0.2)
        data += b"SV" + self._ref_basic_i32(5) + self._ref_basic_i32(1)
        data += self._ref_basic_i32(4) + self._ref_basic_f32(1.0)
        sm = M.read_sparse_matrix(BinaryReader(data))
        assert sm.num_rows == 2 and sm.num_cols == 5
        d0, i0, v0 = sm.rows[0]
        assert d0 == 5 and list(i0) == [1, 3]
        np.testing.assert_allclose(v0, np.float32([0.8, 0.2]))
        d1, i1, v1 = sm.rows[1]
        assert d1 == 5 and list(i1) == [4] and v1[0] == 1.0
        dense = sm.to_dense()
        np.testing.assert_allclose(
            dense, np.float32([[0, 0.8, 0, 0.2, 0], [0, 0, 0, 0, 1.0]]),
            rtol=1e-6)

    def test_reference_fixture_empty_row(self):
        data = self._ref_basic_i32(1)
        data += b"SV" + self._ref_basic_i32(10) + self._ref_basic_i32(0)
        sm = M.read_sparse_matrix(BinaryReader(data))
        assert sm.num_rows == 1 and sm.rows[0][0] == 10
        assert len(sm.rows[0][1]) == 0

    def test_reference_fixture_invalid_num_rows(self):
        with pytest.raises(ValueError):
            M.read_sparse_matrix(BinaryReader(self._ref_basic_i32(-1)))

    def test_reference_fixture_bad_sv_token(self):
        data = self._ref_basic_i32(1) + b"XY"
        with pytest.raises(ValueError):
            M.read_sparse_matrix(BinaryReader(data))

    def test_num_elems_exceeds_dim(self):
        data = self._ref_basic_i32(1)
        data += b"SV" + self._ref_basic_i32(3) + self._ref_basic_i32(4)
        with pytest.raises(ValueError):
            M.read_sparse_matrix(BinaryReader(data))

    def test_roundtrip_kaldi_framing(self):
        """Our writer emits real-Kaldi framing (no space before basic
        types); the tolerant reader must parse it identically."""
        rng = np.random.default_rng(0)
        dense = np.where(rng.random((6, 11)) < 0.25,
                         rng.normal(size=(6, 11)), 0.0).astype(np.float32)
        got = _roundtrip(M.write_sparse_matrix, M.read_sparse_matrix, dense)
        np.testing.assert_array_equal(got.to_dense(), dense)

    def test_roundtrip_preserves_pairs(self):
        sm = M.SparseMatrix([(7, np.int32([2, 5]), np.float32([1.5, -2.0])),
                             (7, np.int32([], ), np.float32([]))])
        got = _roundtrip(M.write_sparse_matrix, M.read_sparse_matrix, sm)
        assert got.num_rows == 2
        assert list(got.rows[0][1]) == [2, 5]
        np.testing.assert_array_equal(got.rows[0][2], sm.rows[0][2])

    def test_duplicate_indices_accumulate(self):
        sm = M.SparseMatrix([(4, np.int32([1, 1]), np.float32([0.5, 0.25]))])
        np.testing.assert_allclose(sm.to_dense(),
                                   np.float32([[0, 0.75, 0, 0]]))
