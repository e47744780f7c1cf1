"""Tests for OpenFst binary reader/writer (compact_acceptor + vector)."""

import math

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter
from kaldi_fp16_tpu.io.fst import (
    FST_MAGIC, Fst, FstArc, FstState,
    read_fst, write_fst_compact_acceptor, write_fst_vector,
    read_fst_file, write_fst_file,
)


def linear_fst(labels, weight=0.5, final_weight=0.25):
    """Chain-shaped FST: state i --label--> state i+1, last state final."""
    states = [FstState() for _ in range(len(labels) + 1)]
    for i, lab in enumerate(labels):
        states[i].arcs.append(FstArc(lab, weight, i + 1))
    states[-1].final = final_weight
    return Fst(start=0, states=states)


def branchy_fst():
    s0, s1, s2 = FstState(), FstState(), FstState()
    s0.arcs = [FstArc(1, 0.1, 1), FstArc(2, 0.2, 2)]
    s1.arcs = [FstArc(3, 0.3, 2)]
    s1.final = 1.5
    s2.final = 0.0
    return Fst(start=0, states=[s0, s1, s2])


@pytest.mark.parametrize("writer", [write_fst_compact_acceptor, write_fst_vector])
def test_roundtrip(writer):
    fst = branchy_fst()
    w = BinaryWriter()
    writer(w, fst)
    got = read_fst(BinaryReader(w.getvalue()))
    assert got is not None
    assert got.start == 0
    assert got.num_states == 3
    assert got.num_arcs == 3
    assert got.states[0].arcs[0].label == 1
    assert abs(got.states[0].arcs[1].weight - 0.2) < 1e-6
    assert got.states[0].arcs[1].next_state == 2
    assert abs(got.states[1].final - 1.5) < 1e-6
    assert got.states[2].final == 0.0
    assert not got.states[0].is_final
    assert math.isinf(got.states[0].final)


def test_linear_roundtrip():
    fst = linear_fst([5, 6, 7])
    w = BinaryWriter()
    write_fst_compact_acceptor(w, fst)
    got = read_fst(BinaryReader(w.getvalue()))
    assert got.num_states == 4
    assert [s.arcs[0].label for s in got.states[:3]] == [5, 6, 7]
    assert got.states[3].is_final


def test_bad_magic():
    w = BinaryWriter()
    w.write_uint32(0xDEADBEEF)
    assert read_fst(BinaryReader(w.getvalue() + b"\x00" * 64)) is None


def test_bad_arc_type():
    w = BinaryWriter()
    w.write_uint32(FST_MAGIC)
    for s in ("vector", "log"):  # arc_type "log" unsupported
        b = s.encode()
        w.write_uint32(len(b))
        w.write_bytes(b)
    assert read_fst(BinaryReader(w.getvalue())) is None


def test_unknown_fst_type():
    w = BinaryWriter()
    w.write_uint32(FST_MAGIC)
    for s in ("const", "standard"):
        b = s.encode()
        w.write_uint32(len(b))
        w.write_bytes(b)
    w.write_bytes(b"\x00" * 40)
    assert read_fst(BinaryReader(w.getvalue())) is None


def test_file_roundtrip(tmp_path):
    fst = branchy_fst()
    p = str(tmp_path / "den.fst")
    write_fst_file(p, fst, fmt="vector")
    got = read_fst_file(p)
    assert got.num_arcs == 3
    assert abs(got.states[1].final - 1.5) < 1e-6


@pytest.mark.parametrize("seed", [3, 13, 31])
@pytest.mark.parametrize("writer", [write_fst_compact_acceptor,
                                    write_fst_vector])
def test_fuzz_roundtrip(writer, seed):
    """Randomized round-trips through both binary containers: arbitrary
    graphs (isolated states, multiple finals, zero/large weights,
    parallel arcs, self-loops, epsilon labels in the vector form) must
    reproduce start/arcs/finals exactly.  compact_acceptor is an
    acceptor: olabels are not carried, everything else must survive."""
    rng = np.random.default_rng(seed)
    for _ in range(20):
        n = int(rng.integers(1, 24))
        states = [FstState() for _ in range(n)]
        for s in range(n):
            for _ in range(int(rng.integers(0, 4))):
                lab = int(rng.integers(0 if writer is write_fst_vector
                                       else 1, 50))
                arc = FstArc(lab,
                             float(np.float32(rng.choice(
                                 [0.0, 1e-4, 7.25, 123.5, -2.0]))),
                             int(rng.integers(0, n)),
                             olabel=int(rng.integers(0, 9)))
                states[s].arcs.append(arc)
            if rng.random() < 0.4:
                states[s].final = float(np.float32(rng.uniform(0, 5)))
        start = int(rng.integers(0, n))
        fst = Fst(start=start, states=states)
        w = BinaryWriter()
        writer(w, fst)
        got = read_fst(BinaryReader(w.getvalue()))
        assert got is not None and got.start == start
        assert got.num_states == n
        for sa, sb in zip(fst.states, got.states):
            assert sa.is_final == sb.is_final
            if sa.is_final:
                assert abs(sa.final - sb.final) < 1e-6
            assert len(sa.arcs) == len(sb.arcs)
            for aa, ab in zip(sa.arcs, sb.arcs):
                assert (aa.label, aa.next_state) == (ab.label,
                                                     ab.next_state)
                assert abs(aa.weight - ab.weight) < 1e-6
                if writer is write_fst_vector:
                    assert aa.olabel == ab.olabel
