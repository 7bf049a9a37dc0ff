"""Checkpoint/resume: training continues from the saved train state,
composes with the async fast path, and survives mid-run crashes."""
import argparse

import numpy as np
import yaml


def _make_mock_h5(tmp_path):
    import h5py

    rng = np.random.RandomState(0)
    h5_path = tmp_path / "mock_tvsum.h5"
    with h5py.File(h5_path, "w") as f:
        for i, n_seq in enumerate([20, 24, 28]):
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
    keys = [f"d/mock_tvsum.h5/video_{i}" for i in range(3)]
    split_path = tmp_path / "mock.yml"
    with open(split_path, "w") as f:
        yaml.dump([{"train_keys": keys[:2], "test_keys": keys[2:]}], f)
    return split_path


def _train_args(tmp_path, model_dir, max_epoch, resume=True):
    return argparse.Namespace(
        model="anchor-based", model_depth="shallow", base_model="linear",
        orientation="paper", pooling_type="roi", num_feature=16,
        num_hidden=8, num_head=2, fc_depth=1, attention_depth=1,
        encoder_type="classic", anchor_scales=(4,), lr=1e-3,
        weight_decay=0.0, lambda_reg=1.0, lambda_ctr=1.0, cls_loss="focal",
        reg_loss="soft-iou", nms_thresh=0.5, max_epoch=max_epoch, seed=0,
        data_root=str(tmp_path), batch_size=2, bucket_size=32,
        num_devices=1, model_dir=str(tmp_path / model_dir), profile=False,
        eval_every=1, resume=resume,
        neg_sample_ratio=2.0, incomplete_sample_ratio=1.0,
        pos_iou_thresh=0.6, neg_iou_thresh=0.0, incomplete_iou_thresh=0.3)


def test_resume_continues_training(tmp_path):
    from edsnet_tpu.train import main

    split_path = _make_mock_h5(tmp_path)

    args = ["anchor-based", "--base-model", "linear",
            "--splits", str(split_path), "--data-root", str(tmp_path),
            "--model-dir", str(tmp_path / "m"),
            "--num-feature", "16", "--num-hidden", "8", "--fc-depth", "1",
            "--num-head", "2", "--bucket-size", "32", "--batch-size", "2",
            "--anchor-scales", "4", "--resume"]

    main(args + ["--max-epoch", "2"])
    state_path = tmp_path / "m" / "checkpoint" / "mock.yml.0.pt.state"
    assert state_path.exists()

    from flax import serialization
    raw = serialization.msgpack_restore(state_path.read_bytes())
    assert raw["epoch"] == 2

    # resume to epoch 4; the snapshot must advance
    main(args + ["--max-epoch", "4"])
    raw = serialization.msgpack_restore(state_path.read_bytes())
    assert raw["epoch"] == 4


def test_resume_matches_uninterrupted(tmp_path):
    """2 epochs + resume-to-4 must equal an uninterrupted 4-epoch run
    bitwise: the snapshot carries both RNG streams (numpy batch
    composition + jax per-step key), so the resumed half replays the
    exact batches, dropout draws and negative samples."""
    from flax import serialization

    from edsnet_tpu.data.dataset import load_yaml
    from edsnet_tpu.trainer import train

    split_path = _make_mock_h5(tmp_path)
    split = load_yaml(split_path)[0]

    train(_train_args(tmp_path, "a", 4), split, tmp_path / "a.pt")
    train(_train_args(tmp_path, "b", 2), split, tmp_path / "b.pt")
    train(_train_args(tmp_path, "b", 4), split, tmp_path / "b.pt")

    raw_a = serialization.msgpack_restore((tmp_path / "a.pt.state")
                                          .read_bytes())
    raw_b = serialization.msgpack_restore((tmp_path / "b.pt.state")
                                          .read_bytes())
    assert raw_a["epoch"] == raw_b["epoch"] == 4
    assert raw_a["best_fscore"] == raw_b["best_fscore"]
    flat_a = jax_flatten(raw_a["state"]["params"])
    flat_b = jax_flatten(raw_b["state"]["params"])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(flat_a[k], flat_b[k], err_msg=k)


def jax_flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(jax_flatten(v, f"{prefix}{k}/"))
        else:
            out[f"{prefix}{k}"] = v
    return out


def test_async_crash_leaves_best_checkpoint(tmp_path):
    """A crash mid-run must leave the best-so-far checkpoint on disk: the
    async loop flushes it at logging epochs (here epochs 0 and 30), so a
    death at epoch 35 loses at most one logging window."""
    import pytest

    from edsnet_tpu.data.dataset import load_yaml
    from edsnet_tpu.parallel import eval_device
    from edsnet_tpu.trainer import train

    split_path = _make_mock_h5(tmp_path)
    split = load_yaml(split_path)[0]

    calls = {"n": 0}
    real = eval_device.eval_fscore_device

    def dying(*a, **kw):
        calls["n"] += 1
        if calls["n"] > 35:
            raise RuntimeError("simulated crash")
        return real(*a, **kw)

    eval_device.eval_fscore_device = dying
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            train(_train_args(tmp_path, "c", 60, resume=False), split,
                  tmp_path / "c.pt")
    finally:
        eval_device.eval_fscore_device = real

    assert calls["n"] == 36, calls
    # pre-round-3 the async path wrote the checkpoint only at the end of
    # training: this file would not exist
    assert (tmp_path / "c.pt").exists()
    payload = serialization_restore(tmp_path / "c.pt")
    assert "params" in payload


def serialization_restore(path):
    from flax import serialization
    return serialization.msgpack_restore(path.read_bytes())


def test_state_save_every_tightens_crash_window(tmp_path):
    """--state-save-every N persists the resumable state between logging
    epochs: a crash at a non-logging epoch resumes from that epoch, not
    from the last logging epoch (~30 epochs earlier by default)."""
    import pytest
    from flax import serialization

    from edsnet_tpu.data.dataset import load_yaml
    from edsnet_tpu.parallel import eval_device
    from edsnet_tpu.trainer import train

    split_path = _make_mock_h5(tmp_path)
    split = load_yaml(split_path)[0]

    def run(model_dir, state_save_every):
        args = _train_args(tmp_path, model_dir, 60)
        args.state_save_every = state_save_every
        calls = {"n": 0}
        real = eval_device.eval_fscore_device

        def dying(*a, **kw):
            calls["n"] += 1
            if calls["n"] > 5:   # die after the epoch-4 eval (epoch 5)
                raise RuntimeError("simulated crash")
            return real(*a, **kw)

        eval_device.eval_fscore_device = dying
        try:
            with pytest.raises(RuntimeError, match="simulated crash"):
                train(args, split, tmp_path / f"{model_dir}.pt")
        finally:
            eval_device.eval_fscore_device = real
        raw = serialization.msgpack_restore(
            (tmp_path / f"{model_dir}.pt.state").read_bytes())
        return raw["epoch"]

    # default: last state save was the logging epoch 0 (records epoch 1)
    assert run("defcad", 0) == 1
    # knob: the state is persisted every epoch BEFORE the eval/logging
    # gate (round-4 fix: previously it only fired on eval epochs, so
    # --eval-every M silently widened the promised N-epoch window).  The
    # crash hits epoch 5's eval AFTER that epoch's training persisted ->
    # resume replays nothing and restarts at epoch 6.
    assert run("tight", 1) == 6


def test_mid_cadence_save_never_outruns_checkpoint(tmp_path):
    """The best F recorded by a mid-cadence --state-save-every snapshot
    must always have a matching best-params checkpoint already on disk.
    Round-4 bug: best_f_dev advances at every eval epoch but the best
    params were flushed only at logging epochs (every 30), so a
    crash+resume restored a high watermark whose params were gone."""
    import pytest
    from flax import serialization

    from edsnet_tpu.data.dataset import load_yaml
    from edsnet_tpu.parallel import eval_device
    from edsnet_tpu.trainer import train
    from edsnet_tpu.utils import checkpoint as ckpt_lib

    split_path = _make_mock_h5(tmp_path)
    split = load_yaml(split_path)[0]

    args = _train_args(tmp_path, "outrun", 60)
    args.state_save_every = 2

    calls = {"n": 0}
    events = []  # ("ckpt", evals_done_at_flush) / ("state", best_fscore)
    real_eval = eval_device.eval_fscore_device
    real_ckpt = ckpt_lib.save_checkpoint
    real_state = ckpt_lib.save_train_state

    def rising_eval(*a, **kw):
        import jax.numpy as jnp
        calls["n"] += 1
        if calls["n"] > 5:  # crash at epoch 5's eval, AFTER its mid-save
            raise RuntimeError("simulated crash")
        return jnp.float32(0.1 * calls["n"])

    def spy_ckpt(variables, path):
        events.append(("ckpt", calls["n"]))
        return real_ckpt(variables, path)

    def spy_state(state, epoch, best_fscore, path, **kw):
        events.append(("state", best_fscore))
        return real_state(state, epoch, best_fscore, path, **kw)

    eval_device.eval_fscore_device = rising_eval
    ckpt_lib.save_checkpoint = spy_ckpt
    ckpt_lib.save_train_state = spy_state
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            train(args, split, tmp_path / "outrun.pt")
    finally:
        eval_device.eval_fscore_device = real_eval
        ckpt_lib.save_checkpoint = real_ckpt
        ckpt_lib.save_train_state = real_state

    # eval F at call n is 0.1*n, so a flush after n evals persists params
    # worth F=0.1*n: every recorded state save must be covered by a flush
    flushed = 0.0
    for kind, val in events:
        if kind == "ckpt":
            flushed = max(flushed, 0.1 * val)
        else:
            assert val <= flushed + 1e-6, (
                f"state save recorded best F={val} but only F={flushed} "
                f"was ever flushed to disk: {events}")

    # the crash (epoch 5's eval) follows the epoch-5 mid-save, which saw
    # best through epoch 4 (0.5) and must therefore have flushed it
    raw = serialization.msgpack_restore(
        (tmp_path / "outrun.pt.state").read_bytes())
    assert abs(raw["best_fscore"] - 0.5) < 1e-6
    assert (tmp_path / "outrun.pt").exists()
