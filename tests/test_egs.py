"""Tests for the cegs (NnetChainExample) ark reader/writer."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter
from kaldi_fp16_tpu.io.egs import (
    Example, Index, IoBlock, Supervision,
    EgsReader, read_examples, write_example, write_ark, example_to_text,
    read_index_vector, write_index_vector,
)
from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState


def make_supervision_fst(num_pdfs=8, frames=6):
    """Linear supervision FST with one arc per frame (pdf labels 1-indexed)."""
    states = [FstState() for _ in range(frames + 1)]
    rng = np.random.default_rng(1)
    for t in range(frames):
        pdf = int(rng.integers(1, num_pdfs + 1))
        states[t].arcs.append(FstArc(pdf, float(rng.uniform(0, 1)), t + 1))
    states[-1].final = 0.0
    return Fst(start=0, states=states)


def make_example(key="utt-0001", frames=12, feat_dim=40, ivec_dim=100,
                 num_pdfs=8, fps=4):
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(frames, feat_dim)).astype(np.float32)
    ivec = rng.normal(size=(1, ivec_dim)).astype(np.float32)
    sup = Supervision(
        name="output", weight=1.0, num_sequences=1, frames_per_seq=fps,
        label_dim=num_pdfs, end2end=False,
        fst=make_supervision_fst(num_pdfs, fps),
        indexes=[Index(0, t * 3, 0) for t in range(fps)],
        deriv_weights=np.ones(fps, dtype=np.float32),
    )
    return Example(
        key=key,
        inputs=[
            IoBlock("input", [Index(0, t - 3, 0) for t in range(frames)], feats, "CM"),
            IoBlock("ivector", [Index(0, 0, 0)], ivec, "CM2"),
        ],
        supervision=sup,
    )


class TestIndexVector:
    def test_short_form_roundtrip(self):
        idx = [Index(0, t, 0) for t in range(-31, 20)]
        w = BinaryWriter()
        write_index_vector(w, idx)
        # all deltas fit one byte each
        assert len(w.getvalue()) == len(idx)
        got = read_index_vector(BinaryReader(w.getvalue()), len(idx))
        assert [(i.n, i.t, i.x) for i in got] == [(i.n, i.t, i.x) for i in idx]

    def test_long_form_roundtrip(self):
        idx = [Index(2, 500, 1), Index(2, 503, 1), Index(3, 0, 0)]
        w = BinaryWriter()
        write_index_vector(w, idx)
        got = read_index_vector(BinaryReader(w.getvalue()), len(idx))
        assert [(i.n, i.t, i.x) for i in got] == [(i.n, i.t, i.x) for i in idx]

    def test_negative_first_t(self):
        idx = [Index(0, -124, 0), Index(0, -123, 0)]
        w = BinaryWriter()
        write_index_vector(w, idx)
        got = read_index_vector(BinaryReader(w.getvalue()), 2)
        assert got[0].t == -124 and got[1].t == -123

    def test_boundary_125_uses_long_form(self):
        idx = [Index(0, 125, 0)]
        w = BinaryWriter()
        write_index_vector(w, idx)
        assert w.getvalue()[0] == 127  # long form marker
        got = read_index_vector(BinaryReader(w.getvalue()), 1)
        assert got[0].t == 125


class TestExampleRoundtrip:
    def test_single_example(self):
        ex = make_example()
        w = BinaryWriter()
        write_example(w, ex)
        r = EgsReaderFromBytes(w.getvalue())
        got = r.read_example()
        assert got.key == "utt-0001"
        assert len(got.inputs) == 2
        assert got.inputs[0].name == "input"
        assert got.inputs[0].data.shape == (12, 40)
        # CM 1-byte quantization tolerance
        assert np.abs(got.inputs[0].data - ex.inputs[0].data).max() < 0.25
        assert got.inputs[1].name == "ivector"
        assert np.abs(got.inputs[1].data - ex.inputs[1].data).max() < 1e-3
        sup = got.supervision
        assert sup.weight == 1.0
        assert sup.num_sequences == 1
        assert sup.frames_per_seq == 4
        assert sup.label_dim == 8
        assert not sup.end2end
        assert sup.fst is not None
        assert sup.fst.num_states == 5
        assert sup.fst.states[-1].is_final
        np.testing.assert_allclose(sup.deriv_weights, np.ones(4), atol=1e-6)
        # index vectors survived
        assert [i.t for i in got.inputs[0].indexes] == list(range(-3, 9))
        assert [i.t for i in sup.indexes] == [0, 3, 6, 9]

    def test_multi_example_ark(self, tmp_path):
        exs = [make_example(key=f"utt-{i:04d}") for i in range(5)]
        p = str(tmp_path / "cegs.1.ark")
        write_ark(p, exs)
        got = read_examples(p)
        assert len(got) == 5
        assert [e.key for e in got] == [f"utt-{i:04d}" for i in range(5)]

    def test_limit(self, tmp_path):
        exs = [make_example(key=f"utt-{i}") for i in range(4)]
        p = str(tmp_path / "cegs.ark")
        write_ark(p, exs)
        assert len(read_examples(p, limit=2)) == 2

    def test_dw_byte_format(self):
        ex = make_example()
        ex.supervision.deriv_weights = np.array([0.0, 0.5, 1.0, 1.0], dtype=np.float32)
        ex.supervision.deriv_weights_fmt = "DW"
        w = BinaryWriter()
        write_example(w, ex)
        got = EgsReaderFromBytes(w.getvalue()).read_example()
        np.testing.assert_allclose(got.supervision.deriv_weights,
                                   [0.0, 128 / 255, 1.0, 1.0], atol=1e-6)

    def test_validate(self):
        ex = make_example()
        ok, _ = ex.validate(label_dim=8)
        assert ok
        ok, reason = ex.validate(label_dim=3080)
        assert not ok and "label_dim" in reason
        ex2 = make_example()
        ex2.supervision.weight = 0.0
        ok, reason = ex2.validate(label_dim=8)
        assert not ok and "weight" in reason

    def test_totext(self):
        txt = example_to_text(make_example())
        assert "<Nnet3ChainEg>" in txt
        assert "utt-0001" in txt
        assert "<FramesPerSeq> 4" in txt


class EgsReaderFromBytes:
    def __init__(self, data: bytes):
        from kaldi_fp16_tpu.io.egs import _find_example_start, _parse_example
        self._r = BinaryReader(data)
        self._find = _find_example_start
        self._parse = _parse_example

    def read_example(self):
        key = self._find(self._r)
        if key is None:
            return None
        ex = self._parse(self._r)
        ex.key = key
        return ex


def test_count_examples_matches_reader(tmp_path):
    """count_examples scans record markers without decoding; must agree
    with the full parse (used for LR-schedule sizing in tools/train.py)."""
    from kaldi_fp16_tpu.io.egs import count_examples, read_examples, write_ark
    exs = [make_example(key=f"utt-{i:03d}") for i in range(7)]
    p = str(tmp_path / "c.ark")
    write_ark(p, exs)
    assert count_examples(p) == len(read_examples(p)) == 7


class TestSparseInput:
    """SM GeneralMatrix payloads embedded in an egs NnetIo block
    (ref: matrix.go:172-226; parity closes the last codec hole)."""

    def _sm_example(self):
        ex = make_example(key="utt-sm-01")
        rng = np.random.default_rng(7)
        dense = np.where(rng.random((3, 100)) < 0.05,
                         rng.normal(size=(3, 100)), 0.0).astype(np.float32)
        dense[0, 0] = 1.0   # guarantee at least one nonzero
        ex.inputs[1] = IoBlock("ivector", [Index(0, 0, 0)],
                               dense[:1], "SM")
        return ex, dense[:1]

    def test_sm_roundtrip_in_ark(self, tmp_path):
        ex, dense = self._sm_example()
        path = str(tmp_path / "sm.ark")
        write_ark(path, [ex, make_example(key="utt-plain-2")])
        got = read_examples(path)
        assert len(got) == 2
        io = got[0].input_named("ivector")
        assert io.fmt == "SM"
        assert io.sparse is not None
        np.testing.assert_array_equal(io.data, dense)
        # second (non-SM) example unaffected
        assert got[1].input_named("ivector").fmt == "CM2"

    def test_sm_rewrite_preserves_bytes(self, tmp_path):
        """read -> write of an SM-bearing ark reproduces the payload."""
        ex, dense = self._sm_example()
        p1 = str(tmp_path / "a.ark")
        write_ark(p1, [ex])
        got = read_examples(p1)
        p2 = str(tmp_path / "b.ark")
        write_ark(p2, got)
        again = read_examples(p2)
        np.testing.assert_array_equal(
            again[0].input_named("ivector").data, dense)
        with open(p1, "rb") as f1, open(p2, "rb") as f2:
            assert f1.read() == f2.read()
