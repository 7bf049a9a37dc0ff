"""Label precomputation + length-bucketed padded batching.

The reference regenerates training labels from scratch inside the epoch loop
for every video (keyshot summary + knapsack + anchor IoU labeling on the
host, `src/anchor_based/train.py:77-108`) even though they are
epoch-invariant.  Here all deterministic labels are computed once per video
at dataset-wrap time; only negative sampling (random per step in the
reference, anchor_helper.py:53-71) stays dynamic and runs *on device* inside
the jitted train step.

Batches are buckets of videos padded to a common length (a multiple of
``bucket_size``, default 64 = nystromformer landmark count and TPU lane
width) with boolean masks, stacked for data-parallel sharding over the mesh.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np


from edsnet_tpu.data.dataset import VideoDataset, VideoRecord
from edsnet_tpu.ops import anchor_free as af_ops
from edsnet_tpu.ops import anchors as anchor_ops
from edsnet_tpu.ops import bbox as bbox_ops
from edsnet_tpu.ops import summary as summ_ops


def _round8(x: int) -> int:
    return max(8, ((x + 7) // 8) * 8)


@dataclass
class TrainItem:
    """One video with precomputed labels (anchor-based and/or anchor-free)."""
    key: str
    seq: np.ndarray                 # [N, F]
    target: np.ndarray              # [N] downsampled keyshot summary (0/1)
    # anchor-based labels
    cls_pos: Optional[np.ndarray] = None        # [N, S] int32
    loc_label: Optional[np.ndarray] = None      # [N, S, 2] float32
    neg_eligible: Optional[np.ndarray] = None   # [N, S] bool
    inc_eligible: Optional[np.ndarray] = None   # [N, S] bool
    num_pos: int = 0
    # anchor-free labels
    af_loc: Optional[np.ndarray] = None         # [N, 2]
    af_ctr: Optional[np.ndarray] = None         # [N]
    # optional motion features for the cross-attention head
    motion: Optional[np.ndarray] = None         # [M, 1024]


def make_target(record: VideoRecord) -> Optional[np.ndarray]:
    """gtscore -> keyshot summary -> per-pick 0/1 target.

    Mirrors anchor_based/train.py:79-89 incl. the NaN-skip and
    empty-target-skip behavior (returns None to skip the video).  The
    downsample indexes the frame summary at the video's ``picks`` —
    identical to the reference's hard-coded ``[::15]`` for the standard
    eccv16 layout (picks == arange(N)*15), but also correct for h5s built
    with a non-15 ``--sample-rate`` (a fixed ::15 would desynchronize the
    target length from the seq length, training the tail against padded
    all-negative labels).
    """
    try:
        keyshot = summ_ops.get_keyshot_summ(
            record.gtscore, record.cps, record.n_frames, record.nfps,
            record.picks)
    except ValueError as e:
        if "NaN" in str(e):
            return None
        raise
    picks = np.clip(np.asarray(record.picks, np.int64), 0,
                    max(int(record.n_frames) - 1, 0))
    target = keyshot[picks]
    if not target.any():
        return None
    return target.astype(np.int32)


def prepare_ab_item(record: VideoRecord, anchor_scales: Sequence[int],
                    pos_iou: float, neg_iou: float, inc_iou: float,
                    bucket_size: int = 64) -> Optional[TrainItem]:
    """Anchor-based labels for one video. (anchor_based/train.py:77-108)"""
    target = make_target(record)
    if target is None:
        return None
    n = target.shape[0]
    # label math is pure numpy on the host: the accelerator runtime never
    # sees it (per-video shapes would otherwise each pay a remote compile)
    n_pad = _bucket_len(n, bucket_size)
    target_bboxes = bbox_ops.seq2bbox(target)
    t = target_bboxes.shape[0]
    target_cw = np.stack(
        [(target_bboxes[:, 0] + target_bboxes[:, 1]) * 0.5,
         (target_bboxes[:, 1] - target_bboxes[:, 0]).astype(np.float32)],
        axis=-1) if t else np.zeros((0, 2), np.float32)
    t_pad = _round8(t)
    target_cw_pad = np.zeros((t_pad, 2), np.float32)
    target_cw_pad[:t] = target_cw
    target_cw_pad[t:, 1] = 1.0  # nonzero width keeps iou math finite
    t_valid = np.arange(t_pad) < t

    anchors = anchor_ops.get_anchors_np(n_pad, anchor_scales)
    cls_pos, loc_label = anchor_ops.get_pos_label_np(
        anchors, target_cw_pad, pos_iou, target_valid=t_valid)
    cls_at_neg, _ = anchor_ops.get_pos_label_np(
        anchors, target_cw_pad, neg_iou, target_valid=t_valid)
    cls_at_inc, _ = anchor_ops.get_pos_label_np(
        anchors, target_cw_pad, inc_iou, target_valid=t_valid)

    cls_pos = np.asarray(cls_pos)[:n]
    loc_label = np.asarray(loc_label)[:n]
    num_pos = int(cls_pos.sum())
    neg_eligible = np.asarray(cls_at_neg)[:n] == 0
    # reference forces entries with iou <= neg_iou to 1 so only the
    # "incomplete overlap" band stays eligible (train.py:103-104)
    inc_eligible = (np.asarray(cls_at_inc)[:n] == 0) & ~neg_eligible

    return TrainItem(key=record.key, seq=record.seq, target=target,
                     cls_pos=cls_pos.astype(np.int32), loc_label=loc_label,
                     neg_eligible=neg_eligible, inc_eligible=inc_eligible,
                     num_pos=num_pos, motion=record.motion_features)


def prepare_af_item(record: VideoRecord) -> Optional[TrainItem]:
    """Anchor-free labels for one video. (anchor_free/train.py:55-67)"""
    target = make_target(record)
    if target is None:
        return None
    n = target.shape[0]
    loc = af_ops.get_loc_label_np(target)
    ctr = af_ops.get_ctr_label_np(target, loc)
    return TrainItem(key=record.key, seq=record.seq, target=target,
                     af_loc=loc, af_ctr=ctr,
                     motion=record.motion_features)


def prepare_items(dataset: VideoDataset, kind: str,
                  anchor_scales: Sequence[int] = (),
                  pos_iou: float = 0.6, neg_iou: float = 0.0,
                  inc_iou: float = 0.3,
                  bucket_size: int = 64,
                  need_motion: bool = True) -> List[TrainItem]:
    """``need_motion`` is what the MODEL consumes: False drops the h5's
    motion_features from the items so a non-motion model trains fine on a
    motion-bearing dataset (the reference's non-motion heads never read
    that key, src/anchor_based/train.py:110-116)."""
    items = []
    for i in range(len(dataset)):
        record = dataset[i]
        if kind == "anchor-based":
            item = prepare_ab_item(record, anchor_scales, pos_iou, neg_iou,
                                   inc_iou, bucket_size)
        else:
            item = prepare_af_item(record)
        if item is not None:
            if not need_motion:
                item.motion = None
            items.append(item)
    return items


def _bucket_len(n: int, bucket_size: int) -> int:
    return max(bucket_size, ((n + bucket_size - 1) // bucket_size)
               * bucket_size)


def _pad_to(x: np.ndarray, length: int) -> np.ndarray:
    pad = [(0, length - x.shape[0])] + [(0, 0)] * (x.ndim - 1)
    return np.pad(x, pad)


def batch_items(items: List[TrainItem], batch_size: int, bucket_size: int,
                shuffle: bool, rng: Optional[np.random.RandomState] = None,
                pad_batch_to: int = 1) -> Iterator[Dict[str, np.ndarray]]:
    """Yield padded, masked batches grouped by length bucket.

    Each batch dict has: seq [B,L,F], mask [B,L], video_valid [B], plus the
    stacked label arrays present on the items.  B is padded up to a multiple
    of ``pad_batch_to`` (the data mesh size) with dummy rows
    (video_valid=False).
    """
    order = np.arange(len(items))
    if shuffle:
        (rng or np.random).shuffle(order)

    buckets: Dict[int, List[TrainItem]] = {}
    for idx in order:
        item = items[idx]
        blen = _bucket_len(item.seq.shape[0], bucket_size)
        buckets.setdefault(blen, []).append(item)

    bucket_keys = list(buckets)
    if shuffle:
        (rng or np.random).shuffle(bucket_keys)

    for blen in bucket_keys:
        group = buckets[blen]
        for i in range(0, len(group), batch_size):
            chunk = group[i:i + batch_size]
            yield _stack_chunk(chunk, blen, pad_batch_to)


def _stack_motion(motions: List[np.ndarray], b_pad: int):
    """(motion [B,M,Fm], motion_mask [B,M]) with M rounded up to 16.

    One definition serves the train (_stack_chunk) and eval
    (batch_eval_records) paths so the rounding/mask conventions cannot
    drift between them.
    """
    m_len = max(m.shape[0] for m in motions)
    m_len = ((m_len + 15) // 16) * 16
    arrs = [_pad_to(np.asarray(m, np.float32), m_len) for m in motions]
    arrs += [np.zeros_like(arrs[0])] * (b_pad - len(motions))
    mmask = [np.arange(m_len) < m.shape[0] for m in motions]
    mmask += [np.zeros(m_len, bool)] * (b_pad - len(motions))
    return np.stack(arrs), np.stack(mmask)


def _stack_chunk(chunk: List[TrainItem], blen: int,
                 pad_batch_to: int) -> Dict[str, np.ndarray]:
    b = len(chunk)
    b_pad = ((b + pad_batch_to - 1) // pad_batch_to) * pad_batch_to

    def stack(get, dtype=None):
        arrs = [_pad_to(np.asarray(get(it)), blen) for it in chunk]
        arrs += [np.zeros_like(arrs[0])] * (b_pad - b)
        out = np.stack(arrs)
        return out.astype(dtype) if dtype else out

    batch = {
        "seq": stack(lambda it: it.seq, np.float32),
        "mask": np.stack(
            [np.arange(blen) < it.seq.shape[0] for it in chunk]
            + [np.zeros(blen, bool)] * (b_pad - b)),
        "video_valid": np.asarray([True] * b + [False] * (b_pad - b)),
        "target": stack(lambda it: it.target, np.int32),
        "keys": [it.key for it in chunk],
    }
    first = chunk[0]
    if first.cls_pos is not None:
        batch["cls_pos"] = stack(lambda it: it.cls_pos, np.int32)
        batch["loc_label"] = stack(lambda it: it.loc_label, np.float32)
        batch["neg_eligible"] = stack(lambda it: it.neg_eligible, bool)
        batch["inc_eligible"] = stack(lambda it: it.inc_eligible, bool)
        batch["num_pos"] = np.asarray(
            [it.num_pos for it in chunk] + [0] * (b_pad - b), np.int32)
    if first.af_loc is not None:
        batch["af_loc"] = stack(lambda it: it.af_loc, np.float32)
        batch["af_ctr"] = stack(lambda it: it.af_ctr, np.float32)
    motions = [it.motion for it in chunk]
    if any(m is not None for m in motions):
        # all-or-nothing per chunk, like the eval path's
        # resolve_build_motion — gating on chunk[0] alone would make a
        # mixed chunk crash or silently drop motion depending only on
        # the epoch's shuffle order
        if not all(m is not None for m in motions):
            missing = [it.key for it, m in zip(chunk, motions)
                       if m is None]
            raise ValueError(
                f"motion_features missing for {missing[:3]} — a "
                f"cross-attention model needs motion for every video")
        batch["motion"], batch["motion_mask"] = _stack_motion(motions,
                                                              b_pad)
    return batch


def pool_items(items: List[TrainItem], bucket_size: int
               ) -> List[Dict[str, np.ndarray]]:
    """Stack ALL of each length-bucket's videos into one device-resident
    pool (no batch padding).  Per-epoch batches are then composed on device
    by gathering rows from the pool — recomposition costs an on-device
    gather, not a host re-upload, so the fast batch_size>1 path can
    reshuffle batch membership every epoch like the reference's video loop
    (src/anchor_based/train.py:70-77) instead of freezing compositions.
    """
    buckets: Dict[int, List[TrainItem]] = {}
    for item in items:
        blen = _bucket_len(item.seq.shape[0], bucket_size)
        buckets.setdefault(blen, []).append(item)
    return [_stack_chunk(group, blen, pad_batch_to=1)
            for blen, group in sorted(buckets.items())]


def resolve_build_motion(chunk: List[VideoRecord],
                         need_motion: bool | None) -> bool:
    """Whether to build motion arrays for this chunk.

    ``need_motion`` is what the MODEL consumes: False skips motion arrays
    entirely (partial-motion h5s evaluate fine under non-motion models),
    True requires motion_features on every record, None infers from the
    data (all-or-nothing per chunk).  Shared by batch_eval_records and
    parallel/eval_device.batch_eval_device so the gating cannot drift.
    """
    has_motion = [r.motion_features is not None for r in chunk]
    if need_motion is False:
        return False
    if (need_motion is True and not all(has_motion)) or \
            (need_motion is None and any(has_motion)
             and not all(has_motion)):
        missing = [r.key for r, h in zip(chunk, has_motion) if not h]
        raise ValueError(
            f"motion_features missing for {missing[:3]} — a "
            f"cross-attention model needs motion for every video")
    return has_motion[0]


def batch_eval_records(records: List[VideoRecord], batch_size: int,
                       bucket_size: int, pad_batch_to: int = 1,
                       need_motion: bool | None = None) -> Iterator[Dict]:
    """Padded eval batches: model inputs + per-video host metadata.

    ``need_motion`` mirrors parallel/eval_device.batch_eval_device: what
    the MODEL consumes — False skips motion arrays (partial-motion h5s
    evaluate fine under non-motion models), True requires motion for
    every record, None infers from the data (all-or-nothing per chunk).
    """
    buckets: Dict[int, List[VideoRecord]] = {}
    for r in records:
        blen = _bucket_len(r.seq.shape[0], bucket_size)
        buckets.setdefault(blen, []).append(r)
    for blen, group in buckets.items():
        for i in range(0, len(group), batch_size):
            chunk = group[i:i + batch_size]
            b = len(chunk)
            b_pad = ((b + pad_batch_to - 1) // pad_batch_to) * pad_batch_to
            seq = np.stack([_pad_to(r.seq.astype(np.float32), blen)
                            for r in chunk]
                           + [np.zeros((blen,) + chunk[0].seq.shape[1:],
                                       np.float32)] * (b_pad - b))
            mask = np.stack([np.arange(blen) < r.seq.shape[0] for r in chunk]
                            + [np.zeros(blen, bool)] * (b_pad - b))
            out = {"seq": seq, "mask": mask, "records": chunk}
            if resolve_build_motion(chunk, need_motion):
                out["motion"], out["motion_mask"] = _stack_motion(
                    [r.motion_features for r in chunk], b_pad)
            yield out
