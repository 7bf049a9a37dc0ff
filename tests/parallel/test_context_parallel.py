"""--context-parallel e2e: ring attention reachable from the evaluate CLI.

Trains a small attention-backbone model, then evaluates the checkpoint
twice on the 8-virtual-device mesh — once on the single-device path, once
with --context-parallel 8 routing the backbone through
parallel/ring_attention.py (sequence axis sharded, ppermute K/V rotation,
online-softmax merge).  The reported F-scores must match and the ring path
must actually have been taken.
"""
import re

import numpy as np
import pytest
import yaml


def _make_mock(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    with h5py.File(tmp_path / "mock_tvsum.h5", "w") as f:
        for i, n_seq in enumerate([56, 64, 60]):
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, 32).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, -1, keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            b = np.linspace(0, n_frames, 13, dtype=np.int32)
            g["change_points"] = np.stack([b[:-1], b[1:] - 1], 1)
            g["n_frame_per_seg"] = b[1:] - b[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(2, n_frames) > 0.8).astype(
                np.float32)
    keys = [f"d/mock_tvsum.h5/video_{i}" for i in range(3)]
    with open(tmp_path / "mock.yml", "w") as f:
        yaml.dump([{"train_keys": keys[:2], "test_keys": keys[2:]}], f)


def _fscore_from(capsys):
    out = capsys.readouterr().out
    m = re.findall(r"F-score: ([0-9.]+)", out)
    assert m, f"no F-score in output:\n{out[-2000:]}"
    return float(m[-1])


def test_evaluate_cli_context_parallel_matches(tmp_path, capsys,
                                               monkeypatch):
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import evaluate as evaluate_cli
    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    common = ["anchor-based", "--base-model", "attention",
              "--splits", str(tmp_path / "mock.yml"),
              "--data-root", str(tmp_path),
              "--model-dir", str(tmp_path / "m"),
              "--num-feature", "32", "--num-hidden", "8",
              "--fc-depth", "1", "--num-head", "2",
              "--bucket-size", "64", "--batch-size", "2",
              "--anchor-scales", "8"]
    train_cli.main(common + ["--max-epoch", "2"])
    capsys.readouterr()

    evaluate_cli.main(common)
    f_base = _fscore_from(capsys)

    calls = {"n": 0}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        evaluate_cli.main(common + ["--context-parallel", "8",
                                    "--cp-min-len", "64"])
    finally:
        base_lib.set_context_parallel(0)
    f_cp = _fscore_from(capsys)

    assert calls["n"] > 0, "ring attention was never invoked"
    assert f_cp == pytest.approx(f_base, abs=2e-4), (f_cp, f_base)


def _train_fscore(train_cli, tmp_path, name, extra, capsys):
    train_cli.main(["anchor-based", "--base-model", "attention",
                    "--splits", str(tmp_path / "mock.yml"),
                    "--data-root", str(tmp_path),
                    "--model-dir", str(tmp_path / name),
                    "--num-feature", "32", "--num-hidden", "8",
                    "--fc-depth", "1", "--num-head", "2",
                    "--bucket-size", "64", "--batch-size", "2",
                    "--anchor-scales", "8", "--max-epoch", "2"] + extra)
    out = capsys.readouterr().out
    m = re.findall(r"mean F-score ([0-9.]+)", out)
    assert m, f"no mean F-score in output:\n{out[-2000:]}"
    return float(m[-1])


def test_train_cli_ring_on_submesh_and_with_tp(tmp_path, capsys,
                                               monkeypatch):
    """--context-parallel SMALLER than the device count, alone and
    combined with --tensor-parallel, trains + device-evals end-to-end.

    Regression: the ring used to build a private 2-device mesh while the
    trainer's params/batches were committed to the full 8-device mesh —
    JAX rejects mixed device sets inside one jit, so any cp < device
    count (and every cp x tp combination) crashed in eval_fscore_device.
    Now the ring rides a reshape of the full set (make_ring_mesh,
    registered via models.base.set_ring_mesh), composing dp x sp x tp on
    one mesh; best F must equal the unparallelized run's exactly (same
    padded shapes, same RNG streams — the ring is eval-only math)."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    f_base = _train_fscore(train_cli, tmp_path, "m_base", [], capsys)

    calls = {"n": 0, "meshes": set()}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        calls["meshes"].add(tuple(kw["mesh"].shape.items()))
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        f_cp = _train_fscore(
            train_cli, tmp_path, "m_cp",
            ["--context-parallel", "2", "--cp-min-len", "64"], capsys)
        n_cp_only = calls["n"]
        f_cptp = _train_fscore(
            train_cli, tmp_path, "m_cptp",
            ["--context-parallel", "2", "--cp-min-len", "64",
             "--tensor-parallel", "2"], capsys)
    finally:
        base_lib.set_context_parallel(0)

    assert n_cp_only > 0, "ring attention never ran on the cp submesh"
    assert calls["n"] > n_cp_only, "ring attention never ran under cp x tp"
    assert (("data", 4), ("seq", 2)) in calls["meshes"], calls["meshes"]
    assert (("data", 2), ("seq", 2), ("model", 2)) in calls["meshes"], \
        calls["meshes"]
    assert f_cp == pytest.approx(f_base, abs=2e-4), (f_cp, f_base)
    assert f_cptp == pytest.approx(f_base, abs=2e-4), (f_cptp, f_base)
    # set_context_parallel(0) must also clear the registered ring mesh
    assert base_lib.get_ring_mesh() is None


def test_train_cli_cp_too_few_devices_stays_off(tmp_path, capsys,
                                                monkeypatch):
    """--context-parallel on a mesh too small for a ring really stays off.

    Regression: the 'ring attention stays off' warn branch left the
    CLI-registered all-devices ring mesh in place (and the module's baked
    context_parallel would otherwise hit the standalone private-mesh
    fallback), so `--num-devices 1 --context-parallel 2` crashed at the
    first epoch eval with 'Received incompatible devices for jitted
    computation' — a 1-device batch jit cannot host an 8-device
    shard_map.  The trainer now registers RING_DISABLED."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    calls = {"n": 0}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        f = _train_fscore(
            train_cli, tmp_path, "m_cp_1dev",
            ["--num-devices", "1", "--context-parallel", "2",
             "--cp-min-len", "64"], capsys)
    finally:
        base_lib.set_context_parallel(0)
    assert np.isfinite(f)
    assert calls["n"] == 0, "ring attention must stay off on a 1-device mesh"


def test_train_cli_cp1_is_noop(tmp_path, capsys, monkeypatch):
    """--context-parallel 1 trains on the dense path like cp=0.

    Regression: cp=1 is truthy, so the trainer called make_ring_mesh(1)
    which raises 'ring mesh needs >=2 sequence-axis devices' and aborted
    training — before the ring-rides-the-training-mesh rework the same
    flag was a harmless no-op."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    calls = {"n": 0}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        f = _train_fscore(train_cli, tmp_path, "m_cp1",
                          ["--context-parallel", "1",
                           "--cp-min-len", "64"], capsys)
    finally:
        base_lib.set_context_parallel(0)
    assert np.isfinite(f)
    assert calls["n"] == 0


def test_train_cli_cp_clamped_to_tp_capacity(tmp_path, capsys, monkeypatch):
    """cp requests above the devices left after tp are CLAMPED, not fatal.

    Regression: cp_eff was clamped to mesh.size instead of
    mesh.size // tp, so `--tensor-parallel 2 --context-parallel 8` on 8
    devices aborted in make_ring_mesh ('must divide the device count')
    even though the (1, 4, 2) ('data','seq','model') mesh is valid."""
    import jax
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")

    from edsnet_tpu import train as train_cli
    from edsnet_tpu.models import base as base_lib
    from edsnet_tpu.parallel import ring_attention as ring_lib

    _make_mock(tmp_path)
    calls = {"n": 0, "meshes": set()}
    real = ring_lib.ring_attention

    def counting(*a, **kw):
        calls["n"] += 1
        calls["meshes"].add(tuple(kw["mesh"].shape.items()))
        return real(*a, **kw)

    monkeypatch.setattr(ring_lib, "ring_attention", counting)
    try:
        f = _train_fscore(
            train_cli, tmp_path, "m_cp_clamp",
            ["--context-parallel", "8", "--tensor-parallel", "2",
             "--cp-min-len", "64"], capsys)
    finally:
        base_lib.set_context_parallel(0)
    assert np.isfinite(f)
    assert calls["n"] > 0, "clamped ring never ran"
    assert (("data", 1), ("seq", 4), ("model", 2)) in calls["meshes"], \
        calls["meshes"]
