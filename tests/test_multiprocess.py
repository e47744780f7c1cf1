"""Multi-PROCESS distributed training test (SURVEY §2.7 / §4.4).

Launches N OS processes (tools/mpworker.py), each with its own
jax.distributed.initialize(coordinator, N, i) on CPU devices, shards ark
files per process, assembles the global batch with
jax.make_array_from_process_local_data, runs sharded train steps, and
saves/restores a checkpoint under the multi-process mesh.  The sharded
losses must match a single-process run on the concatenated batch —
covering process-boundary bugs the single-process virtual-mesh tests
(test_parallel.py) cannot see.

Skipped when local TCP sockets are unavailable.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

NUM_PDFS = 8
T_IN, T_OUT, STRIDE = 12, 4, 3
FST_PAD_STATES, FST_PAD_ARCS = 16, 40
NPROC = 2
LOCAL_B = 4

MP_XCONFIG = f"""\
input name=input dim=16
linear-component name=linear1 dim=32
batchnorm-component name=bn1
tdnnf-layer name=tdnnf1 dim=32 bottleneck-dim=16 time-stride=1 bypass-scale=0.66
prefinal-layer name=prefinal small-dim=16 big-dim=32
output-layer name=output dim={NUM_PDFS} include-log-softmax=false
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _sockets_available() -> bool:
    try:
        _free_port()
        return True
    except OSError:
        return False


def _write_arks(d, num_files=NPROC, per_file=LOCAL_B):
    """`num_files` ark files x `per_file` examples with dim-16 features and
    random supervision FSTs (seeded per example for reproducibility)."""
    from kaldi_fp16_tpu.io.egs import (
        Example, Index, IoBlock, Supervision, write_ark,
    )
    from tests.test_chain_numerator import random_fst

    paths = []
    k = 0
    for fi in range(num_files):
        exs = []
        for _ in range(per_file):
            rng = np.random.default_rng(100 + k)
            feats = rng.normal(size=(T_IN, 16)).astype(np.float32)
            fst = random_fst(rng, num_pdfs=NUM_PDFS, T=T_OUT,
                             num_states=2 * (T_OUT + 1))
            sup = Supervision(
                name="output", weight=1.0, num_sequences=1,
                frames_per_seq=T_OUT, label_dim=NUM_PDFS, fst=fst,
                indexes=[Index(0, t * STRIDE, 0) for t in range(T_OUT)])
            exs.append(Example(
                key=f"utt-{fi}-{k:03d}",
                inputs=[IoBlock("input",
                                [Index(0, t, 0) for t in range(T_IN)],
                                feats, "FM")],
                supervision=sup))
            k += 1
        p = str(d / f"cegs.{fi + 1}.ark")
        write_ark(p, exs)
        paths.append(p)
    return paths


@pytest.mark.skipif(not _sockets_available(), reason="no local sockets")
def test_multiprocess_matches_single_process(tmp_path):
    arks = _write_arks(tmp_path)
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    ckpt = str(tmp_path / "ckpt")

    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base["PYTHONPATH"] = repo

    procs = []
    for pid in range(NPROC):
        out = str(tmp_path / f"out_{pid}.json")
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(repo, "tools", "mpworker.py"),
             "--coordinator", coordinator, "--nproc", str(NPROC),
             "--pid", str(pid), "--egs", str(tmp_path / "cegs.*.ark"),
             "--out", out, "--ckpt", ckpt,
             "--steps", "3", "--local-batch", str(LOCAL_B)],
            cwd=repo, env=env_base,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    outs = []
    for p in procs:
        try:
            so, se = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("worker timed out")
        outs.append((p.returncode, so.decode(), se.decode()))
    for rc, so, se in outs:
        assert rc == 0, f"worker failed rc={rc}\n{so}\n{se}"

    results = []
    for pid in range(NPROC):
        with open(tmp_path / f"out_{pid}.json") as f:
            results.append(json.load(f))

    # all processes observed the same global mesh and the same losses
    for r in results:
        assert r["process_count"] == NPROC
        assert r["global_devices"] == NPROC * 2
        assert r["losses"] == results[0]["losses"]
        assert r["ckpt_ok"], "checkpoint save/restore failed under mp mesh"
    # round-robin file sharding: different files per process
    assert results[0]["local_files"] != results[1]["local_files"]

    # ---- single-process reference on the concatenated global batch -------
    import jax
    import jax.numpy as jnp
    from kaldi_fp16_tpu.io.egs import read_examples
    from kaldi_fp16_tpu.io.dataloader import shard_files
    from kaldi_fp16_tpu.io.sparse import fst_to_csr
    from kaldi_fp16_tpu.chain.graph import (
        DenominatorGraph, build_numerator_batch, make_simple_den_fst,
    )
    from kaldi_fp16_tpu.chain.denominator import DenominatorComputation
    from kaldi_fp16_tpu.chain.objective import ChainTrainingOpts
    from kaldi_fp16_tpu.models.model import build_model_from_string
    from kaldi_fp16_tpu.training.train_step import (
        TrainConfig, init_train_state, make_train_step,
    )

    # global order = concat of process shards in pid order (matches
    # make_array_from_process_local_data device order)
    exs = []
    for pid in range(NPROC):
        for f in shard_files(arks, pid, NPROC):
            exs.extend(read_examples(f)[:LOCAL_B])
    feats = jnp.asarray(np.stack([e.features for e in exs]))
    weights = jnp.asarray([e.supervision.weight for e in exs],
                          dtype=jnp.float32)
    g = build_numerator_batch([fst_to_csr(e.supervision.fst) for e in exs],
                              max_states=FST_PAD_STATES,
                              max_arcs=FST_PAD_ARCS)

    model = build_model_from_string(MP_XCONFIG)
    den = DenominatorComputation(DenominatorGraph.from_fst(
        make_simple_den_fst(num_pdfs=NUM_PDFS, num_states=5, seed=9),
        NUM_PDFS), leaky=1e-4)
    config = TrainConfig(learning_rate=0.01, momentum=0.5,
                         frame_subsampling_factor=STRIDE,
                         compute_dtype="float32")
    step = make_train_step(model, den, None, ChainTrainingOpts(), config,
                           num_frames_out=T_OUT, donate=False,
                           graph_in_args=True)
    params, net_state, opt_state, scale_state = init_train_state(
        model, jax.random.PRNGKey(0), config)
    rng = jax.random.PRNGKey(5)
    lr = jnp.asarray(config.learning_rate, jnp.float32)
    lc = jnp.asarray(0, jnp.int32)
    ref_losses = []
    batch = {"features": feats, "weights": weights}
    for _ in range(3):
        params, net_state, opt_state, scale_state, out = step(
            params, net_state, opt_state, scale_state, batch,
            jnp.asarray(g.arc_src), jnp.asarray(g.arc_dst),
            jnp.asarray(g.arc_pdf), jnp.asarray(g.arc_logw),
            jnp.asarray(g.arc_mask), jnp.asarray(g.start),
            jnp.asarray(g.final_logw), rng, lr, lc)
        ref_losses.append(float(out.loss))

    np.testing.assert_allclose(results[0]["losses"], ref_losses,
                               rtol=2e-4, atol=1e-5)


def _launch_workers(tmp_path, nproc, steps=3, local_batch=LOCAL_B,
                    extra=None, per_pid_extra=None, timeout=600,
                    devices_per_proc=2):
    """Start `nproc` mpworker processes; returns list of
    (returncode, stdout, stderr, out_json_path).  `extra`: args for every
    worker; `per_pid_extra`: {pid: [args]} for specific workers."""
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    ckpt = str(tmp_path / "ckpt")
    env_base = {k: v for k, v in os.environ.items()
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env_base["JAX_PLATFORMS"] = "cpu"
    env_base["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={devices_per_proc}")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base["PYTHONPATH"] = repo

    procs, outs_paths = [], []
    for pid in range(nproc):
        out = str(tmp_path / f"out_{nproc}p_{pid}.json")
        outs_paths.append(out)
        cmd = [sys.executable, os.path.join(repo, "tools", "mpworker.py"),
               "--coordinator", coordinator, "--nproc", str(nproc),
               "--pid", str(pid), "--egs", str(tmp_path / "cegs.*.ark"),
               "--out", out, "--ckpt", ckpt,
               "--steps", str(steps), "--local-batch", str(local_batch)]
        cmd += list(extra or [])
        cmd += list((per_pid_extra or {}).get(pid, []))
        procs.append(subprocess.Popen(
            cmd, cwd=repo, env=env_base,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE))
    results = []
    for p, op in zip(procs, outs_paths):
        try:
            so, se = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("worker timed out (no clean error propagation)")
        results.append((p.returncode, so.decode(), se.decode(), op))
    return results


@pytest.mark.skipif(not _sockets_available(), reason="no local sockets")
def test_nproc4_uneven_file_shards(tmp_path):
    """4 processes over 6 ark files: shard_files gives 2/2/1/1 files per
    process — the uneven split must still produce one consistent global
    batch and identical losses on every process."""
    _write_arks(tmp_path, num_files=6, per_file=LOCAL_B)
    results = _launch_workers(tmp_path, nproc=4, steps=2)
    for rc, so, se, _ in results:
        assert rc == 0, f"worker failed rc={rc}\n{so}\n{se}"
    data = []
    for _, _, _, op in results:
        with open(op) as f:
            data.append(json.load(f))
    counts = sorted(len(d["local_files"]) for d in data)
    assert counts == [1, 1, 2, 2], counts
    for d in data:
        assert d["process_count"] == 4
        assert d["losses"] == data[0]["losses"]
        assert all(np.isfinite(x) for x in d["losses"])
        assert d["ckpt_ok"]
    # no ark file is read by two processes
    seen = [f for d in data for f in d["local_files"]]
    assert len(seen) == len(set(seen))


@pytest.mark.skipif(not _sockets_available(), reason="no local sockets")
def test_worker_death_propagates(tmp_path):
    """SIGKILL one worker mid-run: the survivor must ERROR OUT within the
    heartbeat timeout (blocked collectives must not hang forever)."""
    _write_arks(tmp_path)
    results = _launch_workers(
        tmp_path, nproc=NPROC, steps=50,
        extra=["--heartbeat", "10"],
        per_pid_extra={1: ["--die-at-step", "5"]},
        timeout=240)
    rc0, so0, se0, op0 = results[0]
    rc1, _, _, op1 = results[1]
    assert rc1 == -9, f"victim should die by SIGKILL, rc={rc1}"
    assert rc0 != 0, (
        f"survivor must fail once the peer dies, rc={rc0}\n{so0}\n{se0}")
    assert not os.path.exists(op0), "survivor must not report success"
    assert not os.path.exists(op1)


@pytest.mark.skipif(not _sockets_available(), reason="no local sockets")
def test_elastic_resume_mp2_to_mp4(tmp_path):
    """Checkpoint saved under a 2-process mesh, restored under a
    4-process mesh (elastic resume): the restored replicated params must
    be bit-identical to what mp2 saved, and training must continue."""
    _write_arks(tmp_path, num_files=4, per_file=LOCAL_B)

    # phase 1: mp2 trains 2 steps and saves at step 2
    r2 = _launch_workers(tmp_path, nproc=2, steps=2)
    for rc, so, se, _ in r2:
        assert rc == 0, f"mp2 worker failed rc={rc}\n{so}\n{se}"
    with open(r2[0][3]) as f:
        saved = json.load(f)
    assert saved["ckpt_ok"]

    # phase 2: mp4 restores step 2 and trains 1 more step
    r4 = _launch_workers(tmp_path, nproc=4, steps=1,
                         extra=["--restore-step", "2"])
    for rc, so, se, _ in r4:
        assert rc == 0, f"mp4 worker failed rc={rc}\n{so}\n{se}"
    for _, _, _, op in r4:
        with open(op) as f:
            d = json.load(f)
        assert d["process_count"] == 4
        np.testing.assert_allclose(d["restored_param_sums"],
                                   saved["param_sums"], rtol=1e-12)
        assert all(np.isfinite(x) for x in d["losses"])
        assert d["ckpt_ok"]   # re-saved at step 3 under the mp4 mesh
