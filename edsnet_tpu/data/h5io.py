"""Shared h5 / shot-table helpers for the dataset tooling CLIs.

Behavioral contracts come from the reference tools (`src/make_split.py`,
`src/make_shots.py`, `src/make_dataset.py`, `src/helpers/video_helper.py:
109-126`); the structure here is our own — one place for the h5 key
enumeration, the group writer, and the KTS boundary -> shot-table
conversion that the reference repeats inline in three files.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np


def dataset_keys(h5_path) -> List[str]:
    """Split-file keys for every video group: '<h5 path>/<video name>'."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        return [str(Path(h5_path) / name) for name in f.keys()]


def write_group(h5file, key: str, fields: Dict[str, np.ndarray]) -> None:
    """Write one video group; skips None values."""
    for name, value in fields.items():
        if value is not None:
            h5file.create_dataset(f"{key}/{name}", data=value)


def shot_table(boundaries: np.ndarray, sample_rate: int,
               n_frames: int) -> Tuple[np.ndarray, np.ndarray]:
    """KTS boundary indices (subsampled domain) -> change-point table.

    Returns (change_points [S, 2] as inclusive (begin, end-1) frame pairs,
    n_frame_per_seg [S]) — the eccv16 convention
    (video_helper.py:117-124).
    """
    edges = np.hstack((0, np.asarray(boundaries) * sample_rate, n_frames))
    spans = np.stack((edges[:-1], edges[1:] - 1), axis=1)
    return spans, edges[1:] - edges[:-1]


def segment_features(features: np.ndarray, sample_rate: int,
                     n_frames: Optional[int] = None,
                     device: bool = False
                     ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Linear-kernel KTS over frame features -> (cps, nfps, picks).

    ``device=True`` routes through the jitted on-accelerator DP
    (ops/kts.py:cpd_auto_device); both paths return identical shots
    (equality pinned by tests/ops/test_kts_dwt.py).
    """
    from edsnet_tpu.ops import kts

    seq_len = len(features)
    if n_frames is None:
        n_frames = seq_len * sample_rate - 1
    picks = np.arange(seq_len) * sample_rate
    gram = features @ features.T
    solver = kts.cpd_auto_device if device else kts.cpd_auto
    boundaries, _ = solver(gram, seq_len - 1, 1)
    cps, nfps = shot_table(boundaries, sample_rate, n_frames)
    return cps, nfps, picks


def copy_optional(src_group, names: Iterable[str]) -> Dict[str, np.ndarray]:
    """Fetch optional float datasets from an h5 group (absent -> skipped)."""
    out = {}
    for name in names:
        if name in src_group:
            out[name] = src_group[name][...].astype(np.float32)
    return out
