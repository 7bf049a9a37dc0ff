"""h5 dataset layer (eccv16 schema), splits yaml, run utilities.

Reference: `src/helpers/data_helper.py`.  The reference hard-codes
kaggle/local directory roots (data_helper.py:44-56) and re-parses sys.argv
inside the dataset (data_helper.py:15); here the dataset takes an explicit
``data_root`` and resolves each split key `<dir>/<file.h5>/<video>` by
trying: the key's own path, then data_root/<relative>, then
data_root/<file.h5>.
"""
from __future__ import annotations

import random
from os import PathLike
from pathlib import Path
from typing import Any, Dict, List, NamedTuple, Optional

import h5py
import numpy as np
import yaml


class VideoRecord(NamedTuple):
    key: str
    seq: np.ndarray          # [N, F] float32
    gtscore: np.ndarray      # [N] float32, min-max normalized
    cps: np.ndarray          # [S, 2] int32 (first, last) inclusive
    n_frames: int
    nfps: np.ndarray         # [S] int32
    picks: np.ndarray        # [N] int32
    user_summary: Optional[np.ndarray]  # [U, n_frames] float32 or None
    motion_features: Optional[np.ndarray] = None


def _resolve_h5(key: str, data_root: Optional[str]) -> Path:
    p = Path(key).parent
    candidates = [p]
    if data_root is not None:
        root = Path(data_root)
        candidates += [root / p, root / p.name]
        # strip leading '../' style segments
        parts = [q for q in p.parts if q not in ("..", ".")]
        if parts:
            candidates.append(root.joinpath(*parts))
    for c in candidates:
        if c.is_file():
            return c
    raise FileNotFoundError(
        f"Cannot resolve dataset file for key {key!r}; tried {candidates}. "
        f"Pass --data-root pointing at the directory with the .h5 files.")


class VideoDataset:
    """Reads per-video groups from eccv16-format h5 files.

    Schema per video (data_helper.py:25-33): features (N,1024), gtscore (N),
    change_points (S,2), n_frames, n_frame_per_seg (S), picks (N), optional
    user_summary (U,F), optional motion_features.
    """

    def __init__(self, keys: List[str], data_root: Optional[str] = None):
        self.keys = keys
        self.data_root = data_root
        self._files: Dict[str, h5py.File] = {}
        for key in keys:
            parent = str(Path(key).parent)
            if parent not in self._files:
                self._files[parent] = h5py.File(
                    str(_resolve_h5(key, data_root)), "r")

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, index: int) -> VideoRecord:
        key = self.keys[index]
        video_path = Path(key)
        video_file = self._files[str(video_path.parent)][video_path.name]

        seq = video_file["features"][...].astype(np.float32)
        gtscore = video_file["gtscore"][...].astype(np.float32)
        cps = video_file["change_points"][...].astype(np.int32)
        n_frames = int(np.asarray(video_file["n_frames"][...]))
        nfps = video_file["n_frame_per_seg"][...].astype(np.int32)
        picks = video_file["picks"][...].astype(np.int32)
        user_summary = None
        if "user_summary" in video_file:
            user_summary = video_file["user_summary"][...].astype(np.float32)
        motion = None
        if "motion_features" in video_file:
            motion = video_file["motion_features"][...].astype(np.float32)

        gtscore = gtscore - gtscore.min()
        maxv = gtscore.max()
        gtscore = gtscore / maxv if maxv > 0 else gtscore

        return VideoRecord(key, seq, gtscore, cps, n_frames, nfps, picks,
                           user_summary, motion)

    def close(self):
        for f in self._files.values():
            f.close()


class DataLoader:
    """Hand-rolled loader, batch-size-1 iteration. (data_helper.py:60-78)"""

    def __init__(self, dataset: VideoDataset, shuffle: bool):
        self.dataset = dataset
        self.shuffle = shuffle
        self.data_idx = list(range(len(dataset)))

    def __iter__(self):
        self.iter_idx = 0
        if self.shuffle:
            random.shuffle(self.data_idx)
        return self

    def __next__(self) -> VideoRecord:
        if self.iter_idx == len(self.dataset):
            raise StopIteration
        record = self.dataset[self.data_idx[self.iter_idx]]
        self.iter_idx += 1
        return record


class AverageMeter:
    """Named running means. (data_helper.py:81-99)"""

    def __init__(self, *keys: str):
        self.totals = {key: 0.0 for key in keys}
        self.counts = {key: 0 for key in keys}

    def update(self, **kwargs: float) -> None:
        for key, value in kwargs.items():
            self._check_attr(key)
            self.totals[key] += value
            self.counts[key] += 1

    def __getattr__(self, attr: str) -> float:
        if attr in ("totals", "counts"):
            raise AttributeError(attr)
        self._check_attr(attr)
        total = self.totals[attr]
        count = self.counts[attr]
        return total / count if count else 0.0

    def _check_attr(self, attr: str) -> None:
        # AttributeError (not assert) keeps the __getattr__ contract:
        # getattr(meter, k, default) / hasattr only swallow
        # AttributeError, and `python -O` strips asserts entirely
        if attr not in self.totals or attr not in self.counts:
            raise AttributeError(attr)


def get_ckpt_dir(model_dir: PathLike) -> Path:
    return Path(model_dir) / "checkpoint"


def get_ckpt_path(model_dir: PathLike, split_path: PathLike,
                  split_index: int) -> Path:
    """{model_dir}/checkpoint/{split_file}.{idx}.pt (data_helper.py:106-110)"""
    split_path = Path(split_path)
    return get_ckpt_dir(model_dir) / f"{split_path.name}.{split_index}.pt"


def load_yaml(path: PathLike) -> Any:
    with open(path) as f:
        return yaml.safe_load(f)


def dump_yaml(obj: Any, path: PathLike) -> None:
    with open(path, "w") as f:
        yaml.dump(obj, f)
