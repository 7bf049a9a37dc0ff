"""Split maker: random or cross-validation train/test splits over an h5.

Reference: `src/make_split.py` (random shuffles, 80/20 default, optional
extra datasets appended to every train set for the aug/transfer settings).
"""
from __future__ import annotations

import argparse
import random
from pathlib import Path

import h5py
import yaml


def make_random_splits(keys, num_test, num_splits):
    splits = []
    for _ in range(num_splits):
        random.shuffle(keys)
        test_keys = keys[:num_test]
        train_keys = sorted(set(keys) - set(test_keys))
        splits.append({"train_keys": train_keys, "test_keys": test_keys})
    return splits


def make_cross_val_splits(keys, num_videos, num_test):
    random.shuffle(keys)
    splits = []
    for i in range(0, num_videos, num_test):
        test_keys = keys[i:i + num_test]
        train_keys = sorted(set(keys) - set(test_keys))
        splits.append({"train_keys": train_keys, "test_keys": test_keys})
    return splits


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True,
                        help="Path to h5 dataset")
    parser.add_argument("--extra-datasets", type=str, nargs="+", default=[],
                        help="Extra datasets to append to train set")
    parser.add_argument("--save-path", type=str, required=True,
                        help="Path to save generated splits")
    parser.add_argument("--num-splits", type=int, default=5)
    parser.add_argument("--train-ratio", type=float, default=0.8)
    parser.add_argument("--method", type=str, default="random",
                        choices=["random", "cross"])
    parser.add_argument("--seed", type=int, default=None)
    args = parser.parse_args(argv)

    if args.seed is not None:
        random.seed(args.seed)

    with h5py.File(args.dataset, "r") as dataset:
        keys = [str(Path(args.dataset) / key) for key in dataset.keys()]

    extra_keys = []
    for extra_path in args.extra_datasets:
        with h5py.File(extra_path, "r") as extra:
            extra_keys += [str(Path(extra_path) / key) for key in extra.keys()]

    num_videos = len(keys)
    num_train = round(num_videos * args.train_ratio)
    num_test = num_videos - num_train

    if args.method == "random":
        splits = make_random_splits(keys, num_test, args.num_splits)
    else:
        splits = make_cross_val_splits(keys, num_videos, num_test)

    if extra_keys:
        for split in splits:
            split["train_keys"] += extra_keys
            random.shuffle(split["train_keys"])

    save_path = Path(args.save_path)
    save_path.parent.mkdir(parents=True, exist_ok=True)
    with open(save_path, "w") as f:
        yaml.dump(splits, f)


if __name__ == "__main__":
    main()
