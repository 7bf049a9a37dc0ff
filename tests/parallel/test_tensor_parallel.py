"""Tensor parallelism: Megatron-style head sharding of the MHA backbone
(parallel/tensor_parallel.py) == the replicated forward, with the params
genuinely distributed and the per-layer all-reduce visible in the
compiled HLO.  Runs on the conftest's 8 virtual CPU devices."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from edsnet_tpu.parallel.tensor_parallel import (make_model_mesh,
                                                 shard_params_tp,
                                                 tp_shardings)


def test_tp_attention_extractor_matches_replicated():
    from edsnet_tpu.models.attention import AttentionExtractor

    n_dev = len(jax.devices())
    assert n_dev >= 2, "conftest should provide 8 virtual devices"
    feat, n, h = 8 * n_dev, 48, n_dev
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, n, feat).astype(np.float32))
    mask = jnp.asarray(rng.rand(2, n) < 0.9)

    model = AttentionExtractor(num_head=h, num_feature=feat)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, mask)
    ref = jax.jit(model.apply)(variables, x, mask)

    mesh = make_model_mesh(n_dev)
    tp_vars = shard_params_tp(variables, mesh, num_heads=h)
    # the params really are distributed: each device holds F/P columns
    # of the Q projection (whole heads) ...
    q_kernel = tp_vars["params"]["Q"]["kernel"]
    assert {s.data.shape for s in q_kernel.addressable_shards} \
        == {(feat, feat // n_dev)}
    # ... and F/P rows of the output projection
    fc_kernel = tp_vars["params"]["fc"]["kernel"]
    assert {s.data.shape for s in fc_kernel.addressable_shards} \
        == {(feat // n_dev, feat)}

    rep = NamedSharding(mesh, P())
    fn = jax.jit(model.apply, out_shardings=rep)
    xr, mr = jax.device_put((x, mask), rep)
    hlo = fn.lower(tp_vars, xr, mr).compile().as_text()
    assert "all-reduce" in hlo, \
        "the row-sharded fc must complete via an all-reduce"
    out = fn(tp_vars, xr, mr)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_tp_full_model_matches_replicated():
    """Head sharding through the FULL anchor-based model: every
    AttentionExtractor inside the deep backbone is detected structurally
    (Q/K/V/fc siblings) and sharded; the head's fc trunk and encoder
    params stay replicated."""
    from edsnet_tpu.models.model_zoo import get_model

    n_dev = len(jax.devices())
    feat, n, h = 8 * n_dev, 32, n_dev
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, n, feat).astype(np.float32))
    mask = jnp.asarray(rng.rand(1, n) < 0.9)

    model = get_model(
        "anchor-based", model_depth="shallow", base_model="attention",
        num_feature=feat, num_hidden=8, anchor_scales=(4,), num_head=h,
        fc_depth=1, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, mask)

    ref_cls, ref_loc = jax.jit(model.apply)(variables, x, mask)

    mesh = make_model_mesh(n_dev)
    specs = tp_shardings(variables, mesh, num_heads=h)
    flat_specs = jax.tree.leaves(
        specs, is_leaf=lambda s: isinstance(s, NamedSharding))
    assert any(s.spec != P() for s in flat_specs), \
        "no attention module detected"

    tp_vars = shard_params_tp(variables, mesh, num_heads=h)
    rep = NamedSharding(mesh, P())
    fn = jax.jit(model.apply, out_shardings=(rep, rep))
    xr, mr = jax.device_put((x, mask), rep)
    tp_cls, tp_loc = fn(tp_vars, xr, mr)
    np.testing.assert_allclose(np.asarray(tp_cls), np.asarray(ref_cls),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(tp_loc), np.asarray(ref_loc),
                               atol=2e-4)


def test_tp_shardings_biased_dense_keeps_bias_replicated():
    """Rank-1 leaves under Q/K/V/fc stay replicated.

    Regression: tp_shardings blanketed every leaf under the attention
    names with the rank-2 matrix specs, so a biased Dense (the repo-wide
    dense() default) crashed jax.device_put with a rank mismatch — and a
    row-sharded fc bias would have been summed once per shard by the
    layer's all-reduce."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    f = 8

    def dense_p(rng):
        return {"kernel": jnp.asarray(rng.randn(f, f), jnp.float32),
                "bias": jnp.asarray(rng.randn(f), jnp.float32)}

    rng = np.random.RandomState(0)
    variables = {"params": {"attn": {k: dense_p(rng)
                                     for k in ("Q", "K", "V", "fc")}}}
    mesh = make_model_mesh(2)
    tp_vars = shard_params_tp(variables, mesh, num_heads=2)
    q = tp_vars["params"]["attn"]["Q"]
    assert {s.data.shape for s in q["kernel"].addressable_shards} \
        == {(f, f // 2)}
    assert {s.data.shape for s in q["bias"].addressable_shards} == {(f,)}
    fc = tp_vars["params"]["attn"]["fc"]
    assert {s.data.shape for s in fc["kernel"].addressable_shards} \
        == {(f // 2, f)}
    assert {s.data.shape for s in fc["bias"].addressable_shards} == {(f,)}


def test_oversized_device_requests_raise():
    """make_mesh / make_ring_mesh refuse requests beyond the devices
    present instead of silently truncating (make_mesh used to train on
    fewer devices than --num-devices asked for, silently changing the
    batch-padding quantum and RNG streams; make_ring_mesh died in a
    cryptic numpy reshape)."""
    from edsnet_tpu.parallel.mesh import make_mesh, make_ring_mesh

    n_dev = len(jax.devices())
    with pytest.raises(ValueError, match="available"):
        make_mesh(n_dev + 1)
    with pytest.raises(ValueError, match="available"):
        make_ring_mesh(2, tp=1, num_devices=2 * n_dev)


def test_tp_rejects_split_heads():
    from edsnet_tpu.models.attention import AttentionExtractor

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    feat, h = 8 * n_dev, n_dev // 2  # fewer heads than mesh devices
    model = AttentionExtractor(num_head=h, num_feature=feat)
    x = jnp.zeros((1, 16, feat))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           jnp.ones((1, 16), bool))
    with pytest.raises(ValueError, match="whole heads"):
        shard_params_tp(variables, make_model_mesh(n_dev), num_heads=h)


def test_dp_tp_train_step_matches_dp_only():
    """The FULL jitted anchor-based train step runs unchanged on a 2-D
    ('data','model') mesh — batch sharded over data, attention heads over
    model (make_dp_tp_mesh composes shard_batch's P('data') with
    tp_shardings' P(...,'model')) — and its 3-step loss trajectory matches
    the pure-dp replicated-params run on identical shapes and seeds."""
    from edsnet_tpu.models.model_zoo import get_model
    from edsnet_tpu.parallel import make_mesh, shard_batch
    from edsnet_tpu.parallel.steps import (TrainState, ab_train_step,
                                           make_optimizer)
    from edsnet_tpu.parallel.tensor_parallel import make_dp_tp_mesh

    n_dev = len(jax.devices())
    if n_dev < 4:
        pytest.skip("needs >=4 devices for a 2x2 mesh")
    dp, tp = n_dev // 2, 2
    feat, n, h = 32, 32, 2
    scales = (4, 8)
    s = len(scales)
    b = dp
    rng = np.random.RandomState(0)
    batch = {
        "seq": rng.randn(b, n, feat).astype(np.float32),
        "mask": np.ones((b, n), bool),
        "video_valid": np.ones((b,), bool),
        "cls_pos": (rng.rand(b, n, s) > 0.9).astype(np.int32),
        "loc_label": rng.randn(b, n, s, 2).astype(np.float32) * 0.1,
        "neg_eligible": rng.rand(b, n, s) > 0.5,
        "inc_eligible": rng.rand(b, n, s) > 0.8,
        "num_pos": np.full((b,), 4, np.int32),
    }

    model = get_model(
        "anchor-based", model_depth="shallow", base_model="attention",
        num_feature=feat, num_hidden=8, anchor_scales=scales, num_head=h,
        fc_depth=1, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.asarray(batch["seq"]),
                           jnp.asarray(batch["mask"]))

    def run(mesh, place_params):
        # the jitted step donates the state, so each run needs its own
        # copies — donation would delete the shared `variables` buffers
        fresh = jax.tree.map(jnp.copy, variables)
        state = TrainState.create(
            apply_fn=model.apply, params=place_params(fresh["params"]),
            tx=make_optimizer(5e-5, 1e-5),
            constants={k: v for k, v in fresh.items() if k != "params"})
        dev_batch = shard_batch(batch, mesh)
        losses = []
        for i in range(3):
            state, metrics = ab_train_step(
                state, dev_batch, jax.random.PRNGKey(2 + i), lambda_reg=1.0,
                neg_ratio=2.0, inc_ratio=1.0)
            losses.append(float(metrics["loss"]))
        return losses, state

    losses_dp, _ = run(make_mesh(dp), lambda p: p)

    mesh2d = make_dp_tp_mesh(dp, tp)
    tp_place = lambda p: shard_params_tp(p, mesh2d, num_heads=h)
    losses_tp, state_tp = run(mesh2d, tp_place)

    np.testing.assert_allclose(losses_tp, losses_dp, rtol=1e-4, atol=1e-5)
    # params are STILL head-sharded after the optimizer update (the step
    # did not silently regather them)
    leaf_specs = [x.sharding.spec for x in jax.tree.leaves(state_tp.params)]
    assert any("model" in str(spec) for spec in leaf_specs), \
        "updated params lost their tensor-parallel sharding"


def test_trainer_tensor_parallel_flag_matches_dp(tmp_path):
    """`--tensor-parallel 2` trains the attention model end-to-end through
    trainer.train on a (dp=4, tp=2) mesh — params head-sharded before the
    optimizer init so Adam moments inherit the sharding — and lands on the
    same best F-score as the pure-dp run with identical padded batch
    shapes and seeds."""
    import h5py

    from edsnet_tpu.config import get_arguments
    from edsnet_tpu.trainer import train

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8 virtual devices")

    feat = 16
    rng = np.random.RandomState(11)
    n_total = 7
    with h5py.File(tmp_path / "tp.h5", "w") as f:
        for i in range(n_total):
            n_seq = int(rng.choice([18, 24]))
            n_frames = n_seq * 15
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, feat).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, axis=-1,
                                                   keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            bounds = np.linspace(0, n_frames, 11, dtype=np.int32)
            g["change_points"] = np.stack([bounds[:-1], bounds[1:] - 1], 1)
            g["n_frame_per_seg"] = bounds[1:] - bounds[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(3, n_frames) > 0.8).astype(
                np.float32)
    keys = [f"../x/tp.h5/video_{i}" for i in range(n_total)]
    split = {"train_keys": keys[:-2], "test_keys": keys[-2:]}

    def _run(extra, tag):
        args = get_arguments([
            "anchor-based", "--base-model", "attention",
            "--data-root", str(tmp_path),
            "--model-dir", str(tmp_path / f"model_{tag}"),
            "--max-epoch", "2", "--num-feature", str(feat),
            "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
            "--attention-depth", "1", "--bucket-size", "32",
            "--batch-size", "2", "--anchor-scales", "4", "8",
            "--pad-batch-to", "4"] + extra)
        ckpt_dir = tmp_path / f"model_{tag}" / "checkpoint"
        ckpt_dir.mkdir(parents=True)
        best, f1s, _ = train(args, split, ckpt_dir / "tp.yml.0.pt")
        assert all(np.isfinite(f1s)), f1s
        return best

    best_dp = _run(["--num-devices", "4"], "dp")
    best_tp = _run(["--num-devices", "8", "--tensor-parallel", "2"], "tp")
    assert abs(best_dp - best_tp) < 1e-4, (best_dp, best_tp)


def test_trainer_tp_resume_keeps_head_sharding(tmp_path, monkeypatch):
    """--resume under --tensor-parallel restores the head shardings.

    Regression: load_train_state goes through flax from_state_dict, which
    replaces every leaf with host numpy; without re-placement the resumed
    run silently recompiled with fully replicated params and Adam moments
    — no error, but the memory/compute win tp exists for was gone for the
    rest of the run."""
    import h5py

    import edsnet_tpu.trainer as trainer_mod
    from edsnet_tpu.config import get_arguments
    from edsnet_tpu.trainer import train

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8 virtual devices")

    feat = 16
    rng = np.random.RandomState(5)
    with h5py.File(tmp_path / "tpr.h5", "w") as f:
        for i in range(5):
            n_seq, n_frames = 20, 300
            g = f.create_group(f"video_{i}")
            feats = rng.randn(n_seq, feat).astype(np.float32)
            g["features"] = feats / np.linalg.norm(feats, axis=-1,
                                                   keepdims=True)
            g["gtscore"] = rng.rand(n_seq).astype(np.float32)
            bounds = np.linspace(0, n_frames, 9, dtype=np.int32)
            g["change_points"] = np.stack([bounds[:-1], bounds[1:] - 1], 1)
            g["n_frame_per_seg"] = bounds[1:] - bounds[:-1]
            g["n_frames"] = n_frames
            g["picks"] = np.arange(n_seq, dtype=np.int32) * 15
            g["user_summary"] = (rng.rand(2, n_frames) > 0.8).astype(
                np.float32)
    keys = [f"../x/tpr.h5/video_{i}" for i in range(5)]
    split = {"train_keys": keys[:-1], "test_keys": keys[-1:]}

    def _args(max_epoch, extra=()):
        return get_arguments([
            "anchor-based", "--base-model", "attention",
            "--data-root", str(tmp_path),
            "--model-dir", str(tmp_path / "model_tpr"),
            "--max-epoch", str(max_epoch), "--num-feature", str(feat),
            "--num-hidden", "8", "--fc-depth", "1", "--num-head", "2",
            "--attention-depth", "1", "--bucket-size", "32",
            "--batch-size", "2", "--anchor-scales", "4",
            "--num-devices", "8", "--tensor-parallel", "2",
            "--resume", "--state-save-every", "1"] + list(extra))

    ckpt_dir = tmp_path / "model_tpr" / "checkpoint"
    ckpt_dir.mkdir(parents=True)
    save_path = ckpt_dir / "tpr.yml.0.pt"
    train(_args(2), split, save_path)
    assert (tmp_path / "model_tpr" / "checkpoint" /
            "tpr.yml.0.pt.state").exists()

    captured = []
    real_step = trainer_mod.ab_train_step

    def spy(state, *a, **kw):
        if not captured:
            captured.append([str(x.sharding.spec)
                             for x in jax.tree.leaves(state.params)])
        return real_step(state, *a, **kw)

    monkeypatch.setattr(trainer_mod, "ab_train_step", spy)
    train(_args(4), split, save_path)
    assert captured, "resumed run never took a train step"
    assert any("model" in s for s in captured[0]), \
        "resumed params lost their tensor-parallel sharding"
