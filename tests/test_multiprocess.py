"""Multi-PROCESS execution (VERDICT r4 missing #2).

Everything else in the suite runs one process with a forced 8-device host
platform. These tests exercise the genuinely distributed path the comm-
backend row of SURVEY §2.8 names: two OS processes, each with 4 local CPU
devices, joined by ``jax.distributed.initialize`` over a localhost
coordinator (gloo collectives), feeding per-process local data into global
arrays via ``jax.make_array_from_process_local_data``.

Parity claim: one data-parallel FDGAN train step over the 2-process global
mesh produces the same losses and post-step parameter norms as the same
step in a single process with 8 local devices (DP means are row-
permutation-invariant, so per-process slicing cannot hide a mismatch).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "mp_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(nprocs, tmp_path, timeout=600, mode="dp"):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    outs = [str(tmp_path / f"w{i}.json") for i in range(nprocs)]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nprocs), str(port), outs[i], mode],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(nprocs)
    ]
    logs = [p.communicate(timeout=timeout)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    return [json.load(open(o)) for o in outs]


def _single_process_reference():
    """The same step on this process's 8 forced-CPU devices."""
    import jax

    from fdgan_tpu.dist.mesh import make_mesh, shard_batch, shard_params
    from fdgan_tpu.train import create_train_state, make_train_step

    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
    step = make_train_step(tx_g, tx_d)
    mesh = make_mesh(n_data=8, n_spatial=1)
    state.g_params = shard_params(state.g_params, mesh)
    state.d_params = shard_params(state.d_params, mesh)
    rng = np.random.default_rng(123)
    haze = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    gt = rng.uniform(size=(8, 32, 32, 3)).astype(np.float32)
    batch = shard_batch((haze, gt), mesh)
    state, metrics = step(state, batch[0], batch[1], jax.random.PRNGKey(1))
    norms = {
        jax.tree_util.keystr(kp): float(np.linalg.norm(np.asarray(v).ravel()))
        for kp, v in jax.tree_util.tree_flatten_with_path(state.g_params)[0][:8]
    }
    return {k: float(v) for k, v in metrics.items()}, norms


def test_two_process_dp_step_matches_single_process(tmp_path):
    results = _run_workers(2, tmp_path)
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 8 for r in results)
    # both processes observed the identical (replicated) result
    assert results[0]["metrics"] == pytest.approx(results[1]["metrics"], rel=1e-6)
    assert results[0]["g_norms"] == pytest.approx(results[1]["g_norms"], rel=1e-6)

    ref_metrics, ref_norms = _single_process_reference()
    got = results[0]["metrics"]
    assert set(got) == set(ref_metrics)
    for k in ref_metrics:
        # same program, same global data; only cross-process reduction
        # order may differ (r3 calibration: GSPMD reassociation ~1e-3)
        assert got[k] == pytest.approx(ref_metrics[k], rel=2e-3, abs=2e-5), k
    for k in ref_norms:
        assert results[0]["g_norms"][k] == pytest.approx(ref_norms[k], rel=1e-3), k


def test_two_process_sp_step_matches_single_process(tmp_path):
    """Spatial (H) sharding across the PROCESS boundary: the conv halo
    exchanges run over the inter-process transport, which no single-process
    mesh test can exercise. One SP+rematStages train step at 1@64² over the
    2-process (1×8) mesh matches the single-process 8-device value."""
    import jax

    from fdgan_tpu.dist.mesh import make_mesh, shard_batch, shard_params
    from fdgan_tpu.train import create_train_state, make_train_step

    results = _run_workers(2, tmp_path, mode="sp")
    assert results[0]["metrics"] == pytest.approx(results[1]["metrics"], rel=1e-6)

    state, tx_g, tx_d = create_train_state(jax.random.PRNGKey(0))
    step = make_train_step(tx_g, tx_d, remat="stages")
    mesh = make_mesh(n_data=1, n_spatial=8)
    state.g_params = shard_params(state.g_params, mesh)
    state.d_params = shard_params(state.d_params, mesh)
    rng = np.random.default_rng(123)
    haze = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    gt = rng.uniform(size=(1, 64, 64, 3)).astype(np.float32)
    batch = shard_batch((haze, gt), mesh, spatial=True)
    state, metrics = step(state, batch[0], batch[1], jax.random.PRNGKey(1))
    ref_metrics = {k: float(v) for k, v in metrics.items()}

    got = results[0]["metrics"]
    assert set(got) == set(ref_metrics)
    for k in ref_metrics:
        assert got[k] == pytest.approx(ref_metrics[k], rel=2e-3, abs=2e-5), k


def test_train_cli_multiprocess_smoke(tmp_path):
    """cli/train end-to-end under FDGAN_TPU_DIST: 2 processes, per-process
    h5 shard, one epoch at 8@32² (global), main process writes the log and
    checkpoint, the other writes nothing."""
    import h5py

    data = tmp_path / "ds"
    data.mkdir()
    rng = np.random.default_rng(0)
    for i in range(16):
        with h5py.File(data / f"{i}.h5", "w") as f:
            f.create_dataset("gt", data=rng.uniform(size=(32, 32, 3)).astype(np.float32))
            f.create_dataset("haze", data=rng.uniform(size=(32, 32, 3)).astype(np.float32))

    port = _free_port()
    exps = [tmp_path / "exp0", tmp_path / "exp1"]
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["FDGAN_TPU_DIST"] = "1"
        env["FDGAN_TPU_DIST_COORD"] = f"localhost:{port}"
        env["FDGAN_TPU_DIST_NPROCS"] = "2"
        env["FDGAN_TPU_DIST_PID"] = str(i)
        # 4 CPU devices per process; force the cpu platform around the axon
        # plugin the same way the CLIs are driven in this environment
        env["FDGAN_TPU_PLATFORM"] = "cpu"
        env["JAX_NUM_CPU_DEVICES"] = "4"
        env["JAX_CPU_COLLECTIVES_IMPLEMENTATION"] = "gloo"
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "fdgan_tpu.cli.train",
             "--dataroot", str(data), "--imageSize", "32",
             "--batchSize", "8", "--epochs", "1", "--poolSize", "0",
             "--exp", str(exps[i]), "--logEvery", "1", "--ckptEvery", "1",
             "--lrD", "5e-5", "--lambdaAdv", "0.5"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    logs = [p.communicate(timeout=900)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"train process failed:\n{log[-4000:]}"
    assert "multi-process: 2 processes x 4 local devices = 8 global" in logs[0]
    # main process wrote log + checkpoint; the other wrote nothing
    log_path = exps[0] / "train_log.jsonl"
    assert log_path.exists()
    entries = [json.loads(l) for l in open(log_path)]
    assert entries and all(np.isfinite(e.get("g_total", 0.0)) for e in entries)
    assert any(f.suffix == ".msgpack" for f in exps[0].iterdir())
    assert not (exps[1] / "train_log.jsonl").exists()
    assert not any(f.suffix == ".msgpack" for f in exps[1].iterdir())
