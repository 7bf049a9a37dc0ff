"""Train/test split generator over an h5 dataset.

Behavioral contract from `src/make_split.py`: N random 80/20 shuffles or a
cross-validation partition; with ``--extra-datasets`` every fold's train
side also absorbs all videos of the extra h5 files (the aug / transfer
settings of `README.md:64-72`).  Structure and RNG handling are our own
(an isolated random.Random seeded by --seed instead of the global state).
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path
from typing import Dict, List

import yaml

from edsnet_tpu.data.h5io import dataset_keys


def _fold(universe: List[str], test_keys: List[str]) -> Dict[str, list]:
    return {"train_keys": sorted(set(universe) - set(test_keys)),
            "test_keys": list(test_keys)}


def random_folds(keys: List[str], n_test: int, n_folds: int,
                 rng: random.Random) -> List[Dict[str, list]]:
    """Independent shuffles; first n_test of each become the test side."""
    folds = []
    pool = list(keys)
    for _ in range(n_folds):
        rng.shuffle(pool)
        folds.append(_fold(pool, pool[:n_test]))
    return folds


def crossval_folds(keys: List[str], n_test: int,
                   rng: random.Random) -> List[Dict[str, list]]:
    """One shuffle, then disjoint test chunks covering every video."""
    pool = list(keys)
    rng.shuffle(pool)
    return [_fold(pool, pool[lo:lo + n_test])
            for lo in range(0, len(pool), n_test)]


def augment_train_side(folds: List[Dict[str, list]],
                       extra_keys: List[str], rng: random.Random) -> None:
    for fold in folds:
        fold["train_keys"] = fold["train_keys"] + list(extra_keys)
        rng.shuffle(fold["train_keys"])


def main(argv=None):
    parser = argparse.ArgumentParser(
        description="Generate train/test split yaml for an h5 dataset")
    parser.add_argument("--dataset", type=str, required=True,
                        help="Path to h5 dataset")
    parser.add_argument("--extra-datasets", type=str, nargs="+", default=[],
                        help="Extra h5 files merged into every train side")
    parser.add_argument("--save-path", type=str, required=True,
                        help="Where to write the split yaml")
    parser.add_argument("--num-splits", type=int, default=5)
    parser.add_argument("--train-ratio", type=float, default=0.8)
    parser.add_argument("--method", type=str, default="random",
                        choices=["random", "cross"])
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    rng = random.Random(args.seed)
    keys = dataset_keys(args.dataset)
    n_test = len(keys) - round(len(keys) * args.train_ratio)

    if args.method == "random":
        folds = random_folds(keys, n_test, args.num_splits, rng)
    else:
        folds = crossval_folds(keys, n_test, rng)

    extra = [k for path in args.extra_datasets for k in dataset_keys(path)]
    if extra:
        augment_train_side(folds, extra, rng)

    out = Path(args.save_path)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(yaml.dump(folds))
    print(f"Wrote {len(folds)} folds ({len(keys)} videos, "
          f"{n_test} test each) -> {out}")


if __name__ == "__main__":
    main()
