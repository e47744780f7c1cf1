"""DataLoader + batch assembly tests over synthetic cegs ark files."""

import numpy as np
import pytest

from kaldi_fp16_tpu.io.batch import bucket_key, example_left_context, make_batch
from kaldi_fp16_tpu.io.dataloader import (
    DataLoader, DataLoaderConfig, EgsIterator, shard_files,
)
from kaldi_fp16_tpu.io.egs import write_ark
from tests.test_egs import make_example


def _write_arks(tmp_path, n_files=3, per_file=6, frames=12, fps=4):
    files = []
    k = 0
    for i in range(n_files):
        exs = []
        for _ in range(per_file):
            exs.append(make_example(key=f"utt-{k:04d}", frames=frames, fps=fps))
            k += 1
        p = str(tmp_path / f"cegs.{i + 1}.ark")
        write_ark(p, exs)
        files.append(p)
    return files


class TestEgsIterator:
    def test_multi_file_iteration(self, tmp_path):
        _write_arks(tmp_path, n_files=3, per_file=4)
        it = EgsIterator(str(tmp_path / "cegs.*.ark"))
        keys = [ex.key for ex in it]
        assert len(keys) == 12
        assert keys[0] == "utt-0000"
        assert it.files_done == 3

    def test_reset(self, tmp_path):
        _write_arks(tmp_path, n_files=1, per_file=2)
        it = EgsIterator(str(tmp_path / "cegs.*.ark"))
        assert len(list(it)) == 2
        it.reset()
        assert len(list(it)) == 2

    def test_shuffle_files_deterministic(self, tmp_path):
        files = _write_arks(tmp_path, n_files=5, per_file=1)
        it1 = EgsIterator(files, shuffle=True, seed=3)
        it2 = EgsIterator(files, shuffle=True, seed=3)
        assert it1.files == it2.files
        it3 = EgsIterator(files, shuffle=True, seed=4)
        assert it1.files != it3.files or len(files) < 3

    def test_missing_pattern_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            EgsIterator(str(tmp_path / "nope.*.ark"))

    def test_skips_corrupt_file(self, tmp_path):
        files = _write_arks(tmp_path, n_files=2, per_file=2)
        bad = tmp_path / "cegs.0.ark"
        bad.write_bytes(b"\x00" * 64)
        it = EgsIterator([str(bad)] + files)
        assert len(list(it)) == 4


class TestBatch:
    def test_make_batch(self, tmp_path):
        exs = [make_example(key=f"u{i}", frames=12, fps=4) for i in range(4)]
        batch = make_batch(exs)
        assert batch.features.shape == (4, 12, 40)
        assert batch.ivectors.shape == (4, 100)
        assert batch.weights.shape == (4,)
        assert batch.frames_per_seq == 4
        assert batch.num_graph.batch_size == 4
        assert batch.keys == ["u0", "u1", "u2", "u3"]
        assert batch.deriv_weights.shape == (4, 4)

    def test_left_context(self):
        ex = make_example(frames=12, fps=4)
        # input t starts at -3, supervision t starts at 0
        assert example_left_context(ex) == 3

    def test_mixed_bucket_raises(self):
        a = make_example(frames=12, fps=4)
        b = make_example(frames=15, fps=5)
        assert bucket_key(a) != bucket_key(b)
        with pytest.raises(ValueError):
            make_batch([a, b])

    def test_fst_padding_targets(self):
        exs = [make_example(key=f"u{i}", frames=12, fps=4) for i in range(2)]
        batch = make_batch(exs, max_fst_states=32, max_fst_arcs=64)
        assert batch.num_graph.num_states == 32
        assert batch.num_graph.num_arcs == 64


class TestDataLoader:
    def test_batches(self, tmp_path):
        _write_arks(tmp_path, n_files=2, per_file=6)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=4, label_dim=8))
        batches = list(dl)
        assert len(batches) == 3
        assert all(b.batch_size == 4 for b in batches)
        assert dl.stats.examples_read == 12
        assert dl.stats.examples_skipped == 0

    def test_skip_invalid(self, tmp_path):
        # note: ark record keys must be >= 3 chars (scanner requirement,
        # matching reference parser.go:146)
        exs = [make_example(key=f"utt{i}") for i in range(4)]
        exs[1].supervision.weight = 0.0
        from kaldi_fp16_tpu.io.egs import write_ark as wa
        wa(str(tmp_path / "cegs.1.ark"), exs)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=3, label_dim=8))
        batches = list(dl)
        assert len(batches) == 1
        assert dl.stats.examples_skipped == 1
        assert "weight" in " ".join(dl.stats.skip_reasons)

    def test_drop_remainder_false(self, tmp_path):
        _write_arks(tmp_path, n_files=1, per_file=5)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=4, label_dim=8,
                                         drop_remainder=False))
        batches = list(dl)
        assert [b.batch_size for b in batches] == [4, 1]

    def test_bucketing_separates_shapes(self, tmp_path):
        exs = ([make_example(key=f"aaa{i}", frames=12, fps=4) for i in range(2)]
               + [make_example(key=f"bbb{i}", frames=15, fps=5) for i in range(2)])
        write_ark(str(tmp_path / "cegs.1.ark"), exs)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=2, label_dim=8))
        batches = list(dl)
        shapes = sorted(b.features.shape for b in batches)
        assert shapes == [(2, 12, 40), (2, 15, 40)]

    def test_shuffle_buffer(self, tmp_path):
        _write_arks(tmp_path, n_files=1, per_file=8)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=8, label_dim=8,
                                         shuffle_buffer=4, seed=1))
        batches = list(dl)
        assert len(batches) == 1
        keys = batches[0].keys
        assert sorted(keys) == [f"utt-{i:04d}" for i in range(8)]
        assert keys != sorted(keys)  # order actually shuffled

    def test_summary(self, tmp_path):
        _write_arks(tmp_path, n_files=1, per_file=2)
        dl = DataLoader(str(tmp_path / "cegs.*.ark"),
                        DataLoaderConfig(batch_size=2, label_dim=8))
        list(dl)
        s = dl.summary()
        assert "examples=2" in s and "batches=1" in s


def test_shard_files():
    files = [f"f{i}" for i in range(10)]
    s0 = shard_files(files, 0, 4)
    s1 = shard_files(files, 1, 4)
    assert s0 == ["f0", "f4", "f8"]
    assert s1 == ["f1", "f5", "f9"]
    all_shards = sum((shard_files(files, i, 4) for i in range(4)), [])
    assert sorted(all_shards) == files


class TestPrefetchLoader:
    def test_same_batches_as_direct(self, tmp_path):
        from kaldi_fp16_tpu.io.dataloader import (
            DataLoader, DataLoaderConfig, PrefetchLoader,
        )
        files = _write_arks(tmp_path, n_files=1, per_file=9)
        cfg = DataLoaderConfig(batch_size=3)
        direct = list(DataLoader(files, cfg))
        pre = list(PrefetchLoader(DataLoader(files, cfg), depth=2))
        assert len(pre) == len(direct) == 3
        for a, b in zip(direct, pre):
            assert a.keys == b.keys
            np.testing.assert_array_equal(a.features, b.features)

    def test_producer_error_reraised(self):
        from kaldi_fp16_tpu.io.dataloader import PrefetchLoader

        def bad():
            yield 1
            raise ValueError("boom")

        it = iter(PrefetchLoader(bad(), depth=1))
        assert next(it) == 1
        import pytest as _pytest
        with _pytest.raises(ValueError, match="boom"):
            list(it)

    def test_close_stops_blocked_producer(self):
        import itertools
        import time as _time
        from kaldi_fp16_tpu.io.dataloader import PrefetchLoader
        pl = PrefetchLoader(itertools.count(), depth=1)  # endless producer
        it = iter(pl)
        assert next(it) == 0
        pl.close()
        _time.sleep(0.1)
        assert not pl._thread.is_alive()


class TestProcessLoader:
    def test_same_batches_as_direct(self, tmp_path):
        from kaldi_fp16_tpu.io.dataloader import (
            DataLoader, DataLoaderConfig, ProcessLoader,
        )
        files = _write_arks(tmp_path, n_files=4, per_file=6)
        cfg = DataLoaderConfig(batch_size=3)
        direct_keys = [b.keys for b in DataLoader(files, cfg)]
        pl = ProcessLoader(files, cfg, workers=2)
        got = list(pl)
        pl.close()
        # deterministic round-robin merge over 2 file shards: same
        # multiset of batches, same per-shard order as MultiPrefetch
        assert sorted(map(tuple, (b.keys for b in got))) == \
            sorted(map(tuple, direct_keys))
        for b in got:
            assert np.isfinite(b.features).all()

    def test_worker_error_propagates(self):
        """Corrupt/missing FILES are skip-with-reason by design, so the
        error path is a genuine crash: the worker body must capture it
        as an ('error', ...) message and the parent must re-raise."""
        import multiprocessing as mp
        from kaldi_fp16_tpu.io.dataloader import (
            DataLoaderConfig, ProcessLoader, _process_worker_main,
        )
        q = mp.get_context("spawn").Queue()
        _process_worker_main([], DataLoaderConfig(batch_size=2), True, q)
        kind, payload = q.get(timeout=5)
        assert kind == "error" and "no ark files" in payload

        pl = ProcessLoader.__new__(ProcessLoader)
        pl.workers = 1
        q2 = mp.get_context("spawn").Queue()
        q2.put(("error", "boom"))
        pl._queues, pl._procs, pl._summaries = [q2], [], []
        with pytest.raises(RuntimeError, match="worker 0 failed: boom"):
            list(pl)
