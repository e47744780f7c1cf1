"""Native (C++) cegs parser vs the pure-Python parser: outputs must be
bit-identical on the same files.  Skipped when the shared library isn't
built (`make -C cpp`)."""

import subprocess
import time

import numpy as np
import pytest

from kaldi_fp16_tpu.io.egs import EgsReader, read_examples, write_ark
from kaldi_fp16_tpu.io.native import NativeEgsReader, best_reader, native_available
from tests.test_egs import make_example

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="libcegs_parser.so not built")


@pytest.fixture(scope="module")
def ark(tmp_path_factory):
    d = tmp_path_factory.mktemp("native")
    exs = [make_example(key=f"utt-{i:03d}", frames=12 + (i % 3), fps=4 + (i % 3))
           for i in range(10)]
    # exercise DW byte format on one example
    exs[3].supervision.deriv_weights_fmt = "DW"
    path = str(d / "cegs.1.ark")
    write_ark(path, exs)
    return path


def test_native_matches_python_exactly(ark):
    py = read_examples(ark)
    with NativeEgsReader(ark) as r:
        nat = list(r)
    assert len(nat) == len(py) == 10
    for a, b in zip(nat, py):
        assert a.key == b.key
        assert len(a.inputs) == len(b.inputs)
        for ia, ib in zip(a.inputs, b.inputs):
            assert ia.name == ib.name
            np.testing.assert_array_equal(ia.data, ib.data)  # bit-identical
            assert [(i.n, i.t, i.x) for i in ia.indexes] == \
                   [(i.n, i.t, i.x) for i in ib.indexes]
        sa, sb = a.supervision, b.supervision
        assert sa.weight == sb.weight
        assert sa.num_sequences == sb.num_sequences
        assert sa.frames_per_seq == sb.frames_per_seq
        assert sa.label_dim == sb.label_dim
        np.testing.assert_array_equal(sa.deriv_weights, sb.deriv_weights)
        assert sa.fst.num_states == sb.fst.num_states
        assert sa.fst.start == sb.fst.start
        fa = [(s, arc.label, arc.weight, arc.next_state)
              for s, st in enumerate(sa.fst.states) for arc in st.arcs]
        fb = [(s, arc.label, arc.weight, arc.next_state)
              for s, st in enumerate(sb.fst.states) for arc in st.arcs]
        assert fa == fb
        finals_a = [(s, st.final) for s, st in enumerate(sa.fst.states)
                    if st.is_final]
        finals_b = [(s, st.final) for s, st in enumerate(sb.fst.states)
                    if st.is_final]
        assert finals_a == finals_b


def test_validate_passes(ark):
    with NativeEgsReader(ark) as r:
        for ex in r:
            ok, reason = ex.validate(label_dim=8)
            assert ok, reason


def test_best_reader_selection(ark, tmp_path):
    r = best_reader(ark)
    assert isinstance(r, NativeEgsReader)
    r.close()
    gz = str(tmp_path / "x.ark.gz")
    import gzip
    with open(ark, "rb") as f, gzip.open(gz, "wb") as g:
        g.write(f.read())
    r2 = best_reader(gz)
    assert isinstance(r2, EgsReader)
    got = list(r2)
    assert len(got) == 10
    r2.close()


def test_native_faster_than_python(tmp_path):
    exs = [make_example(key=f"utt-{i:04d}", frames=50, fps=16)
           for i in range(60)]
    path = str(tmp_path / "big.ark")
    write_ark(path, exs)

    # best-of-3 each to shrug off scheduler noise (single runs flake under
    # full-suite load)
    t_py = min(_timed(lambda: len(read_examples(path))) for _ in range(3))

    def read_native():
        with NativeEgsReader(path) as r:
            return sum(1 for _ in r)

    t_nat = min(_timed(read_native) for _ in range(3))

    assert len(read_examples(path)) == read_native() == 60
    assert t_nat < t_py, (t_nat, t_py)
    print(f"python {t_py * 1000:.1f}ms native {t_nat * 1000:.1f}ms "
          f"speedup {t_py / t_nat:.1f}x")


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def test_eof_handling(tmp_path):
    p = str(tmp_path / "empty.ark")
    with open(p, "wb") as f:
        f.write(b"\x00" * 16)
    with NativeEgsReader(p) as r:
        assert r.read_example() is None


def test_lazy_views_semantics(ark):
    """LazyIndexList / LazyStates: sequence semantics, equality, and the
    flat-array fast path used by sparse conversions."""
    from kaldi_fp16_tpu.io.native import LazyIndexList, LazyStates
    from kaldi_fp16_tpu.io.sparse import fst_to_csr
    py = read_examples(ark)
    with NativeEgsReader(ark) as r:
        nat = list(r)
    ex_n, ex_p = nat[0], py[0]
    idx = ex_n.inputs[0].indexes
    assert isinstance(idx, LazyIndexList)
    assert len(idx) == len(ex_p.inputs[0].indexes)
    assert idx[0] == ex_p.inputs[0].indexes[0]
    assert idx[-1] == ex_p.inputs[0].indexes[-1]
    assert idx == ex_p.inputs[0].indexes          # vs plain list
    assert list(idx[:2]) == ex_p.inputs[0].indexes[:2]
    assert isinstance(ex_n.supervision.fst.states, LazyStates)
    assert hasattr(ex_n.supervision.fst, "flat")
    # flat fast path vs object path must give identical CSR
    ca = fst_to_csr(ex_n.supervision.fst)
    cb = fst_to_csr(ex_p.supervision.fst)
    np.testing.assert_array_equal(ca.row_ptr, cb.row_ptr)
    np.testing.assert_array_equal(ca.col_idx, cb.col_idx)
    np.testing.assert_array_equal(ca.labels, cb.labels)
    np.testing.assert_array_equal(ca.weights, cb.weights)
    np.testing.assert_array_equal(ca.final_states, cb.final_states)
    np.testing.assert_array_equal(ca.final_weights, cb.final_weights)


def test_multi_prefetch_loader(ark, tmp_path):
    """MultiPrefetchLoader: deterministic round-robin merge covers every
    example exactly once."""
    import shutil
    from kaldi_fp16_tpu.io.dataloader import (
        DataLoader, DataLoaderConfig, MultiPrefetchLoader,
    )
    files = []
    for i in range(3):
        p = str(tmp_path / f"cegs.{i}.ark")
        shutil.copy(ark, p)
        files.append(p)
    # drop_remainder=False: per-worker shards change which bucket
    # remainders exist (exactly like multi-host file sharding), so exact
    # coverage needs partial batches kept
    cfg = DataLoaderConfig(batch_size=2, label_dim=0, drop_remainder=False)
    single = [b.keys for b in DataLoader(files, cfg)]
    multi = MultiPrefetchLoader(files, cfg, workers=3)
    got = [b.keys for b in multi]
    multi.close()
    flat = sorted(k for b in got for k in b)
    want = sorted(k for b in single for k in b)
    assert flat == want
    # same call twice -> same order (deterministic merge)
    multi2 = MultiPrefetchLoader(files, cfg, workers=3)
    got2 = [b.keys for b in multi2]
    multi2.close()
    assert [list(b) for b in got] == [list(b) for b in got2]


def test_native_parses_sm_input(tmp_path):
    """SM sparse GeneralMatrix inside an NnetIo block: native parser must
    densify identically to the Python parser."""
    from kaldi_fp16_tpu.io.egs import IoBlock, Index

    ex = make_example(key="utt-sm-001")
    rng = np.random.default_rng(11)
    dense = np.where(rng.random((1, 100)) < 0.1,
                     rng.normal(size=(1, 100)), 0.0).astype(np.float32)
    dense[0, 0] = 2.5
    ex.inputs[1] = IoBlock("ivector", [Index(0, 0, 0)], dense, "SM")
    path = str(tmp_path / "sm.ark")
    write_ark(path, [ex])

    py = read_examples(path)
    with NativeEgsReader(path) as r:
        nat = list(r)
    assert len(nat) == len(py) == 1
    iv_n = nat[0].input_named("ivector")
    iv_p = py[0].input_named("ivector")
    assert iv_n.fmt == iv_p.fmt == "SM"
    np.testing.assert_array_equal(iv_n.data, iv_p.data)
    np.testing.assert_array_equal(iv_n.data, dense)


def test_native_sm_wide_onehot_matches_python(tmp_path):
    """A one-hot SM supervision-style block with dim > 10000 pdfs: the
    native parser must accept the same inputs as the Python reader
    (it once hard-capped dim at 10000 and silently diverged from the
    fallback when use_native=True)."""
    from kaldi_fp16_tpu.io.egs import IoBlock, Index

    ex = make_example(key="utt-sm-wide")
    dim = 20000
    dense = np.zeros((3, dim), np.float32)
    dense[0, 17] = 1.0
    dense[1, 15999] = 1.0
    dense[2, dim - 1] = 0.5
    ex.inputs[1] = IoBlock("ivector", [Index(0, t, 0) for t in range(3)],
                           dense, "SM")
    path = str(tmp_path / "smwide.ark")
    write_ark(path, [ex])

    py = read_examples(path)
    with NativeEgsReader(path) as r:
        nat = list(r)
    assert len(nat) == len(py) == 1
    iv_n = nat[0].input_named("ivector")
    iv_p = py[0].input_named("ivector")
    assert iv_n.fmt == iv_p.fmt == "SM"
    np.testing.assert_array_equal(iv_n.data, iv_p.data)
    np.testing.assert_array_equal(iv_n.data, dense)


def _assert_examples_equal(nat, py):
    assert len(nat) == len(py)
    for a, b in zip(nat, py):
        assert a.key == b.key
        assert len(a.inputs) == len(b.inputs)
        for ia, ib in zip(a.inputs, b.inputs):
            assert ia.name == ib.name
            np.testing.assert_array_equal(ia.data, ib.data)
            assert [(i.n, i.t, i.x) for i in ia.indexes] == \
                   [(i.n, i.t, i.x) for i in ib.indexes]
        sa, sb = a.supervision, b.supervision
        assert (sa.weight, sa.num_sequences, sa.frames_per_seq,
                sa.label_dim) == (sb.weight, sb.num_sequences,
                                  sb.frames_per_seq, sb.label_dim)
        np.testing.assert_array_equal(sa.deriv_weights, sb.deriv_weights)
        fa = [(s, arc.label, arc.weight, arc.next_state)
              for s, st in enumerate(sa.fst.states) for arc in st.arcs]
        fb = [(s, arc.label, arc.weight, arc.next_state)
              for s, st in enumerate(sb.fst.states) for arc in st.arcs]
        assert sa.fst.start == sb.fst.start and fa == fb


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_differential_fuzz(seed, tmp_path):
    """Randomized differential check: arbitrary (valid) examples across
    every matrix codec, index-encoding form, FST shape, and weight
    layout must parse bit-identically through both parsers.  Hunts the
    framing-bug class the fixed fixtures can't enumerate (the Go
    reference's long-form index bug is exactly this class)."""
    from kaldi_fp16_tpu.io.egs import Example, Index, IoBlock, Supervision
    from kaldi_fp16_tpu.io.fst import Fst, FstArc, FstState
    rng = np.random.default_rng(seed)
    exs = []
    for i in range(24):
        fps = int(rng.integers(1, 14))
        frames = int(rng.integers(fps, 3 * fps + 8))
        feat_dim = int(rng.integers(1, 64))
        fmt = str(rng.choice(["CM", "CM2", "CM3", "FM"]))
        feats = rng.normal(size=(frames, feat_dim)).astype(np.float32)
        style = int(rng.integers(0, 4))
        if style == 1:
            feats[:] = feats[0, 0]               # constant (CM degenerate)
        elif style == 2:
            feats *= 1e4                          # wide range
        elif style == 3:
            feats[::2] = 0.0                      # zero rows
        # index forms: short deltas, long-form jumps, n/x variation
        t0 = int(rng.integers(-200, 200))
        step = int(rng.choice([1, 3, 97]))        # 97 forces long form
        n = int(rng.integers(0, 3))
        x = int(rng.integers(0, 2))
        idx = [Index(n, t0 + t * step, x) for t in range(frames)]
        blocks = [IoBlock("input", idx, feats, fmt)]
        if rng.random() < 0.5:
            iv = rng.normal(size=(1, int(rng.integers(1, 32)))
                            ).astype(np.float32)
            blocks.append(IoBlock("ivector", [Index(0, 0, 0)], iv,
                                  str(rng.choice(["CM2", "FM"]))))
        # random acyclic FST: arcs from t to t+1 (1..3 parallel arcs)
        num_pdfs = int(rng.integers(2, 40))
        states = [FstState() for _ in range(fps + 1)]
        for t in range(fps):
            for _ in range(int(rng.integers(1, 4))):
                states[t].arcs.append(FstArc(
                    int(rng.integers(1, num_pdfs + 1)),
                    float(np.float32(rng.uniform(0, 9))), t + 1))
        states[-1].final = float(np.float32(rng.uniform(0, 2)))
        dw = rng.uniform(0, 1, size=fps).astype(np.float32)
        dw[rng.random(fps) < 0.3] = 0.0
        sup = Supervision(name="output", weight=float(np.float32(
                              rng.uniform(0.1, 2.0))),
                          num_sequences=1, frames_per_seq=fps,
                          label_dim=num_pdfs, end2end=False,
                          fst=Fst(start=0, states=states),
                          indexes=[Index(0, t * 3, 0) for t in range(fps)],
                          deriv_weights=dw)
        ex = Example(key=f"fuzz-{seed}-{i:03d}", inputs=blocks,
                     supervision=sup)
        if rng.random() < 0.3:
            ex.supervision.deriv_weights_fmt = "DW"
        exs.append(ex)
    path = str(tmp_path / "fuzz.ark")
    write_ark(path, exs)
    with NativeEgsReader(path) as r:
        nat = list(r)
    _assert_examples_equal(nat, read_examples(path))


def test_malformed_input_never_crashes(ark, tmp_path):
    """Truncations and single-byte corruptions of a valid ark must
    produce a clean Python-level error (or a shorter stream) from the
    C++ parser — never a segfault, hang, or unbounded allocation.  The
    sweep runs in one subprocess so a crash fails THIS test instead of
    killing the suite."""
    import sys as _sys
    script = r'''
import sys
import numpy as np
from kaldi_fp16_tpu.io.native import NativeEgsReader
raw = open(sys.argv[1], "rb").read()
rng = np.random.default_rng(7)
n = len(raw)
cases = [("trunc", int(o), raw[:int(o)])
         for o in sorted(rng.choice(np.arange(1, n), 40, replace=False))]
for _ in range(40):
    pos = int(rng.integers(0, n)); val = int(rng.integers(0, 256))
    b = bytearray(raw); b[pos] = val
    cases.append(("flip", pos, bytes(b)))
for kind, off, data in cases:
    open(sys.argv[2], "wb").write(data)
    try:
        with NativeEgsReader(sys.argv[2]) as r:
            for _ex in r:
                pass
    except (ValueError, OSError, MemoryError):
        pass
print("SWEEP_OK")
'''
    r = subprocess.run(
        [_sys.executable, "-c", script, ark, str(tmp_path / "m.ark")],
        capture_output=True, text=True, timeout=180)
    assert r.returncode == 0, (r.returncode, r.stderr[-1000:])
    assert "SWEEP_OK" in r.stdout
