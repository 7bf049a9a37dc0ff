"""On-device evaluation must match the host evaluator exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.data.dataset import VideoRecord
from edsnet_tpu.evaluate import evaluate
from edsnet_tpu.models.model_zoo import get_model
from edsnet_tpu.parallel.eval_device import evaluate_on_device

FEAT = 16


def _records(n_videos=3, tvsum=True):
    rng = np.random.RandomState(3)
    records = []
    for i, n_seq in enumerate([20, 24, 28][:n_videos]):
        n_frames = n_seq * 15
        feats = rng.randn(n_seq, FEAT).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        bounds = np.linspace(0, n_frames, 11, dtype=np.int32)
        cps = np.stack([bounds[:-1], bounds[1:] - 1], axis=1)
        records.append(VideoRecord(
            key=f"x/{'tvsum' if tvsum else 'summe'}_{i}",
            seq=feats,
            gtscore=rng.rand(n_seq).astype(np.float32),
            cps=cps, n_frames=n_frames,
            nfps=(bounds[1:] - bounds[:-1]).astype(np.int32),
            picks=np.arange(n_seq, dtype=np.int32) * 15,
            user_summary=(rng.rand(4, n_frames) > 0.8).astype(np.float32)))
    return records


def _ragged_user_records():
    return [r._replace(user_summary=(
        np.random.RandomState(users).rand(users, r.n_frames) > 0.8
    ).astype(np.float32))
        for r, users in zip(_records(n_videos=3), (15, 16, 17))]


def test_prepare_eval_batches_rounds_user_dim():
    """The annotator dim is bucketed like the other dims.

    Regression: u_max was the chunk's raw max user count, so videos with
    15 vs 16 annotators in the same (seq, shots, frames) bucket compiled
    two distinct XLA programs — minutes-expensive on the remote-compile
    platform.  Rounding to a multiple of 4 collapses SumMe's 15-18 user
    range onto two programs; padded users are masked via user_valid, so
    results are unchanged (pinned below on the same ragged records)."""
    from edsnet_tpu.parallel.eval_device import prepare_eval_batches

    records = _ragged_user_records()
    batches = list(prepare_eval_batches(records, batch_size=1,
                                        bucket_size=32))
    u_dims = sorted(np.asarray(b["jb"]["user_summary"]).shape[1]
                    for b in batches)
    assert u_dims == [16, 16, 20], u_dims

    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=FEAT, num_hidden=8,
                      anchor_scales=(4, 8), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))
    host_f, host_d = evaluate(model, variables, records, nms_thresh=0.5,
                              batch_size=2, bucket_size=32)
    dev_f, dev_d = evaluate_on_device(model, variables, records,
                                      nms_thresh=0.5, batch_size=2,
                                      bucket_size=32)
    assert abs(host_f - dev_f) < 1e-5, (host_f, dev_f)
    assert abs(host_d - dev_d) < 1e-4, (host_d, dev_d)


@pytest.mark.parametrize("model_type,tvsum", [
    ("anchor-based", True), ("anchor-based", False), ("anchor-free", True)])
def test_device_eval_matches_host(model_type, tvsum):
    model = get_model(model_type, model_depth="shallow", base_model="linear",
                      num_feature=FEAT, num_hidden=8, anchor_scales=(4, 8),
                      num_head=2, fc_depth=1, attention_depth=1,
                      encoder_type="classic", orientation="paper",
                      pooling_type="roi")
    records = _records(tvsum=tvsum)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))

    host_f, host_d = evaluate(model, variables, records, nms_thresh=0.5,
                              batch_size=2, bucket_size=32)
    dev_f, dev_d = evaluate_on_device(model, variables, records,
                                      nms_thresh=0.5, batch_size=2,
                                      bucket_size=32)
    assert abs(host_f - dev_f) < 1e-5, (host_f, dev_f)
    assert abs(host_d - dev_d) < 1e-4, (host_d, dev_d)


def test_device_eval_matches_host_motion_head():
    """Cross-attention motion head: device eval == host eval (the round-1
    silent fallback at trainer.py is gone)."""
    f = 1024  # d_model hard-coded in the reference decoder (dsnet.py:293)
    model = get_model("anchor-based", model_depth="cross-attention",
                      base_model="linear", num_feature=f, num_hidden=8,
                      anchor_scales=(4,), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rng = np.random.RandomState(5)
    records = [
        r._replace(seq=rng.randn(r.seq.shape[0], f).astype(np.float32),
                   motion_features=rng.randn(max(r.seq.shape[0] // 2, 4),
                                             f).astype(np.float32))
        for r in _records()]

    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, f)),
                           jnp.zeros((1, 16, f)), jnp.ones((1, 32), bool),
                           jnp.ones((1, 16), bool))

    host_f, host_d = evaluate(model, variables, records, nms_thresh=0.5,
                              batch_size=2, bucket_size=32)
    dev_f, dev_d = evaluate_on_device(model, variables, records,
                                      nms_thresh=0.5, batch_size=2,
                                      bucket_size=32)
    assert abs(host_f - dev_f) < 1e-5, (host_f, dev_f)
    assert abs(host_d - dev_d) < 1e-4, (host_d, dev_d)


def test_device_eval_matches_host_nonuniform_picks():
    """Irregular pick spacing must fall back to the exact searchsorted
    upsample and still match the host evaluator."""
    rng = np.random.RandomState(11)
    records = []
    for i, n_seq in enumerate([20, 24]):
        # strictly increasing but non-uniform picks
        picks = np.cumsum(rng.randint(5, 25, n_seq)).astype(np.int32)
        picks -= picks[0]
        n_frames = int(picks[-1]) + 10
        bounds = np.linspace(0, n_frames, 9, dtype=np.int32)
        feats = rng.randn(n_seq, FEAT).astype(np.float32)
        records.append(VideoRecord(
            key=f"x/tvsum_nu_{i}",
            seq=feats / np.linalg.norm(feats, axis=-1, keepdims=True),
            gtscore=rng.rand(n_seq).astype(np.float32),
            cps=np.stack([bounds[:-1], bounds[1:] - 1], axis=1),
            n_frames=n_frames,
            nfps=(bounds[1:] - bounds[:-1]).astype(np.int32),
            picks=picks,
            user_summary=(rng.rand(3, n_frames) > 0.8).astype(np.float32)))

    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=FEAT, num_hidden=8,
                      anchor_scales=(4,), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))
    host_f, _ = evaluate(model, variables, records, nms_thresh=0.5,
                         batch_size=2, bucket_size=32)
    dev_f, _ = evaluate_on_device(model, variables, records,
                                  nms_thresh=0.5, batch_size=2,
                                  bucket_size=32)
    assert abs(host_f - dev_f) < 1e-5, (host_f, dev_f)


def test_partial_motion_data_fine_for_nonmotion_model():
    """A dataset where only SOME videos carry motion_features must still
    evaluate under a model that never consumes motion (make_dataset writes
    such h5s when a motion .npy is missing)."""
    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=FEAT, num_hidden=8,
                      anchor_scales=(4, 8), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rng = np.random.RandomState(11)
    records = _records()
    records[1] = records[1]._replace(
        motion_features=rng.randn(8, FEAT).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))
    plain = [r._replace(motion_features=None) for r in records]
    f_mixed, _ = evaluate_on_device(model, variables, records,
                                    nms_thresh=0.5, batch_size=2,
                                    bucket_size=32)
    f_plain, _ = evaluate_on_device(model, variables, plain,
                                    nms_thresh=0.5, batch_size=2,
                                    bucket_size=32)
    assert abs(f_mixed - f_plain) < 1e-6


def test_missing_motion_raises_for_motion_model():
    from edsnet_tpu.parallel.eval_device import prepare_eval_batches
    records = _records()   # no motion_features at all
    with pytest.raises(ValueError, match="motion_features missing"):
        prepare_eval_batches(records, 2, 32, need_motion=True)


def test_partial_motion_data_fine_for_nonmotion_model_host_path():
    """Same partial-motion input through the HOST evaluator (--host-eval):
    must match the all-plain result instead of crashing in batching."""
    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=FEAT, num_hidden=8,
                      anchor_scales=(4, 8), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    rng = np.random.RandomState(12)
    records = _records()
    records[1] = records[1]._replace(
        motion_features=rng.randn(8, FEAT).astype(np.float32))
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))
    plain = [r._replace(motion_features=None) for r in records]
    f_mixed, _ = evaluate(model, variables, records, nms_thresh=0.5,
                          batch_size=2, bucket_size=32)
    f_plain, _ = evaluate(model, variables, plain, nms_thresh=0.5,
                          batch_size=2, bucket_size=32)
    assert abs(f_mixed - f_plain) < 1e-6


def test_mesh_sharded_eval_matches_unsharded():
    """prepare_eval_batches(mesh=...) commits rows sharded over 'data' and
    the F-score equals the unsharded device eval bit-for-bit.

    Without the mesh, eval inputs are uncommitted and GSPMD replicates the
    whole eval on every device of a data-parallel run; with it, the
    per-row vmap partitions across the mesh.  Row padding (batch_size
    rounds up to the mesh size) is masked exactly, so F is unchanged."""
    from jax.sharding import NamedSharding
    from edsnet_tpu.parallel import make_mesh
    from edsnet_tpu.parallel.eval_device import prepare_eval_batches

    model = get_model("anchor-based", model_depth="shallow",
                      base_model="linear", num_feature=FEAT, num_hidden=8,
                      anchor_scales=(4, 8), num_head=2, fc_depth=1,
                      attention_depth=1, encoder_type="classic",
                      orientation="paper", pooling_type="roi")
    records = _records()
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, jnp.zeros((1, 32, FEAT)),
                           jnp.ones((1, 32), bool))

    mesh = make_mesh(8)
    prepared = prepare_eval_batches(records, batch_size=2, bucket_size=32,
                                    mesh=mesh)
    # rows committed sharded over the full data axis (batch_size 2 -> 8)
    for entry in prepared:
        seq = entry["jb"]["seq"]
        assert seq.shape[0] == 8, seq.shape
        assert isinstance(seq.sharding, NamedSharding)
        assert seq.sharding.spec == jax.sharding.PartitionSpec("data")
        assert len(seq.sharding.mesh.devices.ravel()) == 8

    sharded_f, sharded_d = evaluate_on_device(
        model, variables, records, nms_thresh=0.5, prepared=prepared)
    plain_f, plain_d = evaluate_on_device(
        model, variables, records, nms_thresh=0.5, batch_size=2,
        bucket_size=32)
    assert abs(sharded_f - plain_f) < 1e-6, (sharded_f, plain_f)
    assert abs(sharded_d - plain_d) < 1e-6, (sharded_d, plain_d)
    # the trainer's end-to-end 8-vs-1-device F parity (which now rides
    # this sharded path) is covered by
    # tests/parallel/test_multichip_pipeline.py
