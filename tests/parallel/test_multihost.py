"""Multi-host smoke: 2 jax.distributed CPU processes on localhost.

Validates the production multi-process path (`utils/runtime.py`
setup_runtime -> jax.distributed.initialize): both workers join the
cluster, the global mesh spans 4 devices (2 per process), and one real
``ab_train_step`` over the cross-process ``('data',)`` mesh produces the
same loss and updated-parameter checksum as a single-process run of the
identical step.  Removes the "multi-host is plumbed but untested" caveat.
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import yaml

REPO = Path(__file__).resolve().parent.parent.parent
WORKER = Path(__file__).resolve().parent / "multihost_worker.py"


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _make_mock(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "mock_tvsum.h5", "w") as f:
        for i, n_seq in enumerate([20, 24, 28, 24]):
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, 16).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, -1, keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            b = np.linspace(0, n_frames, 11, dtype=np.int32)
            g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
            g["n_frame_per_seg"] = b[1:] - b[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(2, n_frames) > 0.8).astype(
                np.float32)
    keys = [f"d/mock_tvsum.h5/video_{i}" for i in range(4)]
    with open(tmp_path / "mock.yml", "w") as f:
        yaml.dump([{"train_keys": keys, "test_keys": keys[:1]}], f)


def test_two_process_cluster_matches_single_process(tmp_path):
    _make_mock(tmp_path)
    port = _free_port()

    procs, outs = [], []
    for pid in range(2):
        out = tmp_path / f"worker{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update({
            "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
            "JAX_NUM_PROCESSES": "2",
            "JAX_PROCESS_ID": str(pid),
            "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
            "PYTHONPATH": str(REPO),
        })
        env.pop("JAX_PLATFORMS", None)  # worker forces cpu via config
        procs.append(subprocess.Popen(
            [sys.executable, str(WORKER), str(tmp_path), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT))

    logs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(stdout.decode(errors="replace"))

    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    for pid, r in enumerate(results):
        assert r["process_count"] == 2, r
        assert r["process_index"] == pid, r
        assert r["global_devices"] == 4, r
        assert r["local_devices"] == 2, r
    # both processes observe identical (replicated) step results
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], abs=1e-6)
    assert results[0]["checksum"] == pytest.approx(
        results[1]["checksum"], rel=1e-6)

    # single-process baseline of the same step, same 4-wide mesh
    from tests.parallel.multihost_worker import run_step
    base = run_step(str(tmp_path), mesh_size=4)
    assert results[0]["loss"] == pytest.approx(base["loss"], abs=1e-5)
    assert results[0]["checksum"] == pytest.approx(
        base["checksum"], rel=1e-5)
