"""External byte-level format fixtures.

Every expected byte sequence here is assembled BY HAND with struct.pack
from the reference's format documentation and its hand-crafted edge-case
fixtures — NOT with this repo's writers — so a shared misunderstanding
between our reader and writer cannot hide (the reference burned days on
exactly such bugs: CM column-major, branch-3 fp64 division, 16- vs
20-byte headers).

Sources re-derived (as data, independently re-encoded):
  * /root/reference/docs/kaldi-egs-format.md:30-98 — record framing,
    CM/CM2/CM3/FM byte layouts and decompression formulas.
  * /root/reference/internal/parser/parser_edge_test.go:62-380 — the 14
    index-vector / format-detection / FST edge cases.
Where the reference's fixtures use its space-padded WriteBasicType framing
(' ' + size + payload), both that form and real Kaldi's bare form
(size + payload) are asserted.
"""

import struct

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader
from kaldi_fp16_tpu.io import matrix as M
from kaldi_fp16_tpu.io.egs import read_index_vector, read_examples
from kaldi_fp16_tpu.io.fst import read_fst


def i32(v):
    return struct.pack("<i", v)


def f32(v):
    return struct.pack("<f", v)


def u64(v):
    return struct.pack("<Q", v)


def basic_i32_ref(v):
    """Reference framing: space + size + payload (parser_edge_test.go)."""
    return b" \x04" + i32(v)


def basic_i32_kaldi(v):
    """Real Kaldi WriteBasicType framing: size + payload."""
    return b"\x04" + i32(v)


# ---------------------------------------------------------------------------
# Index vectors (edge tests 1-8)
# ---------------------------------------------------------------------------

class TestIndexVectorFixtures:
    def test_normal_delta(self):
        # bytes {0, 1, 0}: t = 0, 1, 1 (test 2)
        got = read_index_vector(BinaryReader(bytes([0, 1, 0])), 3)
        assert [(i.n, i.t, i.x) for i in got] == [(0, 0, 0), (0, 1, 0),
                                                 (0, 1, 0)]

    @pytest.mark.parametrize("frame", [basic_i32_ref, basic_i32_kaldi])
    def test_long_format(self, frame):
        # byte 127 then (n=2, t=10, x=3) (test 3), both framings
        data = bytes([127]) + frame(2) + frame(10) + frame(3)
        got = read_index_vector(BinaryReader(data), 1)
        assert [(got[0].n, got[0].t, got[0].x)] == [(2, 10, 3)]

    def test_byte_0x80_is_minus_128(self):
        # test 4: 0x80 = int8 -128, a plain (large negative) delta
        got = read_index_vector(BinaryReader(bytes([0x80])), 1)
        assert got[0].t == -128

    def test_bytes_125_126_are_deltas(self):
        # test 5: 125/126 are ordinary deltas (only 127 is the escape)
        got = read_index_vector(BinaryReader(bytes([0, 125, 126])), 3)
        assert [i.t for i in got] == [0, 125, 251]

    def test_merged_egs_n_nonzero(self):
        # test 6: long form with n=1 (merged minibatch example)
        data = bytes([127]) + basic_i32_ref(1) + basic_i32_ref(0) \
            + basic_i32_ref(0)
        got = read_index_vector(BinaryReader(data), 1)
        assert got[0].n == 1

    def test_partial_eof_raises(self):
        # test 8: 2 of 5 indexes present
        with pytest.raises(Exception):
            read_index_vector(BinaryReader(bytes([0, 1])), 5)


# ---------------------------------------------------------------------------
# Compressed matrices (doc §3; all layouts hand-assembled)
# ---------------------------------------------------------------------------

class TestMatrixFixtures:
    def test_cm_hand_assembled(self):
        """CM: 16-byte global header, per-column uint16 percentile headers,
        COLUMN-major data bytes; piecewise-linear decode with the branch-3
        fp32-multiply / fp64-divide quirk."""
        gmin, grange = -2.0, 4.0
        rows, cols = 3, 2
        payload = f32(gmin) + f32(grange) + i32(rows) + i32(cols)
        # per-col headers (p0, p25, p75, p100) as uint16
        headers = [(0, 1000, 50000, 65535), (100, 20000, 30000, 60000)]
        for h in headers:
            payload += struct.pack("<4H", *h)
        # data bytes, COLUMN-major: col0 = [10, 100, 200], col1 = [0, 64, 255]
        col0 = [10, 100, 200]
        col1 = [0, 64, 255]
        payload += bytes(col0) + bytes(col1)

        got = M.read_compressed_matrix_cm(BinaryReader(payload))
        assert got.shape == (rows, cols)

        # expected values computed HERE from the documented formulas
        def pct(u):
            return np.float32(gmin) + np.float32(grange) * \
                np.float32(1.52590218966964e-05) * np.float32(u)

        def decode(h, v):
            p0, p25, p75, p100 = (pct(x) for x in h)
            if v <= 64:
                return np.float32(p0 + (p25 - p0) * np.float32(v)
                                  * np.float32(1.0 / 64.0))
            if v <= 192:
                return np.float32(p25 + (p75 - p25) * np.float32(v - 64)
                                  * np.float32(1.0 / 128.0))
            m32 = np.float32((p100 - p75) * np.float32(v - 192))
            return np.float32(np.float64(p75) + np.float64(m32) / 63.0)

        for r in range(rows):
            assert got[r, 0] == decode(headers[0], col0[r])
            assert got[r, 1] == decode(headers[1], col1[r])

    def test_cm2_hand_assembled(self):
        """CM2: uint16 global-linear, ROW-major."""
        gmin, grange = 1.0, 2.0
        payload = f32(gmin) + f32(grange) + i32(2) + i32(2)
        vals = [0, 65535, 32768, 1]
        payload += struct.pack("<4H", *vals)
        got = M.read_compressed_matrix_cm2(BinaryReader(payload))
        inc = np.float32(grange) / np.float32(65535.0)
        exp = np.float32(gmin) + np.float32(vals).reshape(2, 2) * inc
        np.testing.assert_array_equal(got, exp.astype(np.float32))

    def test_cm3_hand_assembled(self):
        """CM3: uint8 global-linear, ROW-major."""
        gmin, grange = -1.0, 2.0
        payload = f32(gmin) + f32(grange) + i32(1) + i32(4)
        payload += bytes([0, 128, 200, 255])
        got = M.read_compressed_matrix_cm3(BinaryReader(payload))
        inc = np.float32(grange) / np.float32(255.0)
        exp = np.float32(gmin) + np.float32([0, 128, 200, 255]) * inc
        np.testing.assert_array_equal(got[0], exp.astype(np.float32))

    def test_fm_hand_assembled(self):
        """FM: \\x04 rows \\x04 cols + row-major float32."""
        payload = b"\x04" + i32(2) + b"\x04" + i32(2)
        vals = [1.5, -2.25, 0.0, 3e7]
        for v in vals:
            payload += f32(v)
        got = M.read_full_matrix(BinaryReader(payload))
        np.testing.assert_array_equal(
            got, np.float32(vals).reshape(2, 2))

    def test_cm_header_is_16_bytes_not_20(self):
        """The format id lives in the token, NOT in the header — a 20-byte
        read (format i32 + header) would desync everything after."""
        gmin, grange = 0.0, 1.0
        payload = f32(gmin) + f32(grange) + i32(1) + i32(1)
        payload += struct.pack("<4H", 0, 1, 2, 3)
        payload += bytes([0])
        tail = b"TAIL"
        r = BinaryReader(payload + tail)
        M.read_compressed_matrix_cm(r)
        assert r.read_bytes(4) == tail  # positioned exactly after payload


# ---------------------------------------------------------------------------
# FSTs (edge tests 12-14)
# ---------------------------------------------------------------------------

def _fst_header(fst_type: bytes, num_states: int, num_arcs: int) -> bytes:
    data = struct.pack("<I", 0x7EB2FDD6)
    data += i32(len(fst_type)) + fst_type
    data += i32(len(b"standard")) + b"standard"
    data += i32(2)            # version
    data += i32(0)            # flags
    data += u64(0)            # properties
    data += u64(0)            # start
    data += u64(num_states)
    data += u64(num_arcs)
    return data


class TestFstFixtures:
    def test_bad_magic(self):
        # bad magic is a recoverable "not an FST" signal: None, not a crash
        assert read_fst(BinaryReader(struct.pack("<I", 0x12345678))) is None

    def test_compact_acceptor_minimal(self):
        """Test 14: 2 states, one arc 0->1 label 42, state 1 final w=0.
        nextstate == -1 marks a final-weight compact."""
        data = _fst_header(b"compact_acceptor", 2, 1)
        data += struct.pack("<I", 0)   # state 0 offset
        data += struct.pack("<I", 1)   # state 1 offset
        data += struct.pack("<I", 2)   # total compacts
        data += i32(42) + f32(0.0) + i32(1)     # arc 0->1, label 42
        data += i32(0) + f32(0.0) + i32(-1)     # final weight of state 1
        fst = read_fst(BinaryReader(data))
        assert fst.num_states == 2
        assert len(fst.states[0].arcs) == 1
        a = fst.states[0].arcs[0]
        assert a.label == 42 and a.next_state == 1
        assert fst.states[1].is_final and fst.states[1].final == 0.0
        assert not fst.states[0].is_final

    def test_vector_minimal(self):
        """vector format (den.fst): per-state final + narcs + 16-byte
        arcs [ilabel, olabel, weight, nextstate]."""
        data = _fst_header(b"vector", 2, 0)
        # state 0: final=+inf (not final), narcs (int64!) = 1
        data += f32(np.inf) + struct.pack("<q", 1)
        data += i32(7) + i32(7) + f32(0.5) + i32(1)
        # state 1: final=0.25, narcs=0
        data += f32(0.25) + struct.pack("<q", 0)
        fst = read_fst(BinaryReader(data))
        assert fst.num_states == 2
        a = fst.states[0].arcs[0]
        assert a.label == 7 and abs(a.weight - 0.5) < 1e-7
        assert a.next_state == 1
        assert not fst.states[0].is_final
        assert fst.states[1].final == 0.25


# ---------------------------------------------------------------------------
# Whole-record framing (doc §2) — full example assembled byte-by-byte
# ---------------------------------------------------------------------------

def _token(s: str) -> bytes:
    return s.encode() + b" "


def _minimal_example_bytes() -> bytes:
    """One complete Nnet3ChainEg record per the documented layout:
    key + ' \\0B' + tags, a CM3 feature block, CM2 ivector block,
    compact_acceptor supervision FST, DW2 deriv weights."""
    out = b"utt-fixture-1 \x00B"
    out += _token("<Nnet3ChainEg>")
    out += _token("<NumInputs>") + b"\x04" + i32(2)

    # input block: 4 frames x 3 dims, CM3
    out += _token("<NnetIo>") + _token("input")
    out += _token("<I1V>") + b"\x04" + i32(4)
    out += bytes([0x83, 1, 1, 1])        # t = -125, -124, -123, -122
    out += _token("CM3")
    out += f32(0.0) + f32(1.0) + i32(4) + i32(3)
    out += bytes(range(12))
    out += _token("</NnetIo>")

    # ivector block: 1 x 2, CM2
    out += _token("<NnetIo>") + _token("ivector")
    out += _token("<I1V>") + b"\x04" + i32(1)
    out += bytes([0])
    out += _token("CM2")
    out += f32(-1.0) + f32(2.0) + i32(1) + i32(2)
    out += struct.pack("<2H", 0, 65535)
    out += _token("</NnetIo>")

    out += _token("<NumOutputs>") + b"\x04" + i32(1)
    out += _token("<NnetChainSup>") + _token("output")
    out += _token("<I1V>") + b"\x04" + i32(2)
    out += bytes([0, 3])                 # t = 0, 3
    out += _token("<Supervision>")
    out += _token("<Weight>") + b"\x04" + f32(1.0)
    out += _token("<NumSequences>") + b"\x04" + i32(1)
    out += _token("<FramesPerSeq>") + b"\x04" + i32(2)
    out += _token("<LabelDim>") + b"\x04" + i32(5)
    out += _token("<End2End>") + b"F"
    # supervision FST: 3 states, 0 -(lbl 2)-> 1 -(lbl 3)-> 2(final)
    out += _fst_header(b"compact_acceptor", 3, 2)
    out += struct.pack("<III", 0, 1, 2)  # state offsets
    out += struct.pack("<I", 3)          # total compacts
    out += i32(2) + f32(0.125) + i32(1)
    out += i32(3) + f32(0.25) + i32(2)
    out += i32(0) + f32(0.0) + i32(-1)
    out += _token("</Supervision>")
    out += _token("<DW2>") + _token("FV") + b"\x04" + i32(2)
    out += f32(1.0) + f32(0.5)
    out += _token("</NnetChainSup>")
    out += _token("</Nnet3ChainEg>")
    return out


class TestWholeRecordFixture:
    @pytest.fixture()
    def ark(self, tmp_path):
        p = tmp_path / "fixture.ark"
        p.write_bytes(_minimal_example_bytes())
        return str(p)

    def _assert_example(self, ex):
        assert ex.key == "utt-fixture-1"
        assert len(ex.inputs) == 2
        feats = ex.input_named("input")
        assert feats.fmt == "CM3"
        assert [i.t for i in feats.indexes] == [-125, -124, -123, -122]
        inc = np.float32(1.0) / np.float32(255.0)
        exp = (np.float32(np.arange(12)) * inc).reshape(4, 3)
        np.testing.assert_array_equal(feats.data, exp.astype(np.float32))
        iv = ex.input_named("ivector")
        np.testing.assert_array_equal(
            iv.data, np.float32([[-1.0, 1.0]]))
        sup = ex.supervision
        assert sup.weight == 1.0 and sup.num_sequences == 1
        assert sup.frames_per_seq == 2 and sup.label_dim == 5
        assert not sup.end2end
        assert [i.t for i in sup.indexes] == [0, 3]
        np.testing.assert_array_equal(sup.deriv_weights,
                                      np.float32([1.0, 0.5]))
        fst = sup.fst
        assert fst.num_states == 3
        assert fst.states[0].arcs[0].label == 2
        assert abs(fst.states[0].arcs[0].weight - 0.125) < 1e-7
        assert fst.states[1].arcs[0].next_state == 2
        assert fst.states[2].is_final

    def test_python_parser(self, ark):
        exs = read_examples(ark)
        assert len(exs) == 1
        self._assert_example(exs[0])

    def test_native_parser(self, ark):
        from kaldi_fp16_tpu.io.native import NativeEgsReader, native_available
        if not native_available():
            pytest.skip("libcegs_parser.so not built")
        with NativeEgsReader(ark) as r:
            exs = list(r)
        assert len(exs) == 1
        self._assert_example(exs[0])
