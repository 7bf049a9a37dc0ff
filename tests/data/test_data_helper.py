"""Data-layer tests — AverageMeter values from reference
tests/helpers/test_data_helper.py; dataset/batching behavior."""
import numpy as np
import pytest

from edsnet_tpu.data import batching
from edsnet_tpu.data.dataset import AverageMeter, get_ckpt_path


def test_average_meter():
    meter = AverageMeter("loss", "acc")
    meter.update(loss=1.0)
    meter.update(loss=3.0, acc=0.5)
    assert meter.loss == 2.0
    assert meter.acc == 0.5
    with pytest.raises(AttributeError):
        meter.update(bogus=1.0)
    # unqueried key with no updates -> 0.0
    meter2 = AverageMeter("x")
    assert meter2.x == 0.0


def test_ckpt_path_contract():
    p = get_ckpt_path("models/m", "splits/tvsum.yml", 3)
    assert str(p).endswith("models/m/checkpoint/tvsum.yml.3.pt")


def _item(n, feat=8, key="k"):
    return batching.TrainItem(
        key=key, seq=np.ones((n, feat), np.float32),
        target=np.ones(n, np.int32))


def test_bucketing_and_masks():
    items = [_item(10), _item(60), _item(70), _item(12)]
    batches = list(batching.batch_items(items, batch_size=4, bucket_size=64,
                                        shuffle=False))
    # lengths 10,12 -> bucket 64; 60 -> 64; 70 -> 128
    sizes = sorted(b["seq"].shape[1] for b in batches)
    assert sizes == [64, 128]
    for b in batches:
        assert (b["mask"].sum(-1) <= b["seq"].shape[1]).all()
        # padded region must be zero
        assert (b["seq"][~b["mask"]] == 0).all()


def test_batch_padding_to_mesh():
    items = [_item(10), _item(11), _item(12)]
    batches = list(batching.batch_items(items, batch_size=4, bucket_size=16,
                                        shuffle=False, pad_batch_to=8))
    assert batches[0]["seq"].shape[0] == 8
    assert batches[0]["video_valid"].sum() == 3


def test_make_target_nan_skip():
    from edsnet_tpu.data.dataset import VideoRecord
    rec = VideoRecord(
        key="x", seq=np.ones((4, 8), np.float32),
        gtscore=np.array([np.nan, 1, 1, 1], np.float32),
        cps=np.array([[0, 29], [30, 59]], np.int32), n_frames=60,
        nfps=np.array([30, 30], np.int32),
        picks=np.arange(4, dtype=np.int32) * 15, user_summary=None)
    assert batching.make_target(rec) is None


def test_make_target_follows_picks_not_fixed_rate():
    """The target downsample indexes the video's own picks.

    Regression: the fixed ::15 downsample desynchronized the target from
    the seq length for h5s built with a non-15 --sample-rate (e.g. rate
    10: seq ceil(n/10) rows, target ceil(n/15) — the tail of every video
    trained against padded all-negative labels)."""
    from edsnet_tpu.data.dataset import VideoRecord

    rate, n_seq = 10, 9
    n_frames = n_seq * rate
    bounds = np.linspace(0, n_frames, 10, dtype=np.int32)  # 9 x 10-frame
    rec = VideoRecord(
        key="x", seq=np.ones((n_seq, 8), np.float32),
        gtscore=np.linspace(0, 1, n_seq).astype(np.float32),
        cps=np.stack([bounds[:-1], bounds[1:] - 1], 1).astype(np.int32),
        n_frames=n_frames, nfps=(bounds[1:] - bounds[:-1]).astype(np.int32),
        picks=np.arange(n_seq, dtype=np.int32) * rate, user_summary=None)
    target = batching.make_target(rec)
    assert target is not None and target.shape == (n_seq,)
    from edsnet_tpu.ops import summary as summ_ops
    keyshot = summ_ops.get_keyshot_summ(rec.gtscore, rec.cps, n_frames,
                                        rec.nfps, rec.picks)
    np.testing.assert_array_equal(target, keyshot[rec.picks].astype(np.int32))


def test_mixed_motion_chunk_raises_clearly():
    """A chunk mixing motion-bearing and motion-less items errors loudly.

    Regression: _stack_chunk gated motion on chunk[0] alone, so a mixed
    chunk crashed with AttributeError or silently dropped motion
    depending only on the epoch's shuffle order."""
    import pytest as _pytest

    items = [_item(10, key="a"), _item(12, key="b")]
    items[0].motion = np.ones((4, 16), np.float32)
    with _pytest.raises(ValueError, match="motion_features missing"):
        list(batching.batch_items(items, batch_size=2, bucket_size=16,
                                  shuffle=False))


def test_average_meter_getattr_contract():
    """Unknown keys raise AttributeError (not assert), so getattr
    defaults and hasattr work."""
    meter = AverageMeter("loss")
    assert getattr(meter, "acc", 0.5) == 0.5
    assert not hasattr(meter, "acc")
    with pytest.raises(AttributeError):
        meter.update(acc=1.0)
