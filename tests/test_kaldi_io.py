"""Unit tests for the low-level Kaldi binary stream primitives."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.kaldi_io import BinaryReader, BinaryWriter


def test_scalar_roundtrip():
    w = BinaryWriter()
    w.write_int32(-7)
    w.write_uint32(0x7EB2FDD6)
    w.write_int64(-(1 << 40))
    w.write_uint64(1 << 60)
    w.write_float32(3.25)
    w.write_float64(-1e-300)
    r = BinaryReader(w.getvalue())
    assert r.read_int32() == -7
    assert r.read_uint32() == 0x7EB2FDD6
    assert r.read_int64() == -(1 << 40)
    assert r.read_uint64() == 1 << 60
    assert r.read_float32() == 3.25
    assert r.read_float64() == -1e-300


def test_basic_int_with_and_without_space():
    # token-context: space + size + payload
    w = BinaryWriter()
    w.write_basic_int(12345)
    r = BinaryReader(w.getvalue())
    assert r.read_basic_int() == 12345
    # raw binary context (Kaldi WriteBasicType): size + payload only
    w2 = BinaryWriter()
    w2.write_byte(4)
    w2.write_int32(-99)
    r2 = BinaryReader(w2.getvalue())
    assert r2.read_basic_int() == -99


def test_basic_int_one_byte_form():
    r = BinaryReader(bytes([0x20, 1, 0xFF]))  # space, size 1, payload -1
    assert r.read_basic_int() == -1


def test_token_roundtrip():
    w = BinaryWriter()
    w.write_token("<Nnet3ChainEg>")
    w.write_token("<NumInputs>")
    r = BinaryReader(w.getvalue())
    assert r.read_token() == "<Nnet3ChainEg>"
    r.expect_token("<NumInputs>")


def test_unread_byte():
    r = BinaryReader(b"ab")
    b = r.read_byte()
    r.unread_byte(b)
    assert r.read_bytes(2) == b"ab"


def test_eof():
    r = BinaryReader(b"")
    assert r.try_read_byte() is None
    with pytest.raises(EOFError):
        r.read_byte()
    r2 = BinaryReader(b"ab")
    with pytest.raises(EOFError):
        r2.read_bytes(3)


def test_ark_record_header():
    w = BinaryWriter()
    w.write_ark_record_header("utt-001")
    assert w.getvalue() == b"utt-001 \x00B"


def test_gz_open(tmp_path):
    import gzip
    p = tmp_path / "x.bin.gz"
    with gzip.open(p, "wb") as f:
        f.write(b"\x2a\x00\x00\x00")
    with BinaryReader.open(str(p)) as r:
        assert r.read_int32() == 42
