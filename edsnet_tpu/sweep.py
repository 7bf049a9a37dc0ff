"""Paper-benchmark sweep runner: canonical + augmented + transfer settings.

One command reproduces the reference's published experiment matrix
(`/root/reference/README.md:57-72`: anchor-based, nystromformer backbone,
ROI pooling, anchor_scales=12 over tvsum/summe x canonical/aug/transfer
splits) against real eccv16 h5 datasets and writes a BASELINE-style
results JSON — the artifact to diff against the paper table the moment
the datasets are reachable.

    python -m edsnet_tpu.sweep --data-root /path/to/datasets \
        --output results/paper_sweep.json

Split files whose datasets are missing are reported and skipped, so the
same command degrades gracefully on machines that only carry a subset.
"""
from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

SETTING_SPLITS = {
    "canonical": ["tvsum.yml", "summe.yml"],
    "aug": ["tvsum_aug.yml", "summe_aug.yml"],
    "transfer": ["tvsum_trans.yml", "summe_trans.yml"],
}

# reference README.md:57 — the paper's headline configuration
PAPER_CONFIG = ["--base-model", "nystromformer", "--pooling-type", "roi",
                "--anchor-scales", "12"]


def missing_datasets(split_path: Path, data_root: str):
    """h5 files a split references that are absent under data_root."""
    import yaml

    from edsnet_tpu.data.dataset import _resolve_h5

    missing = set()
    for fold in yaml.safe_load(split_path.read_text()):
        for key in fold.get("train_keys", []) + fold.get("test_keys", []):
            try:
                _resolve_h5(key, data_root)
            except FileNotFoundError:
                missing.add(str(Path(key).parent.name))
    return sorted(missing)


def eval_diversity(train_args, split_path: Path) -> tuple:
    """Per-fold summary diversity from the best checkpoints, the second
    column the reference's evaluator logs next to F-score
    (`/root/reference/src/evaluate.py:36-38`, metric defined at
    vsumm_helper.py:119-140).

    The trainer's per-epoch device eval tracks F only, so diversity
    costs one post-training eval pass per fold on the flushed best
    checkpoint; the F-score that pass computes anyway is returned too
    as ``fscores_from_ckpt`` — a free integrity cross-check that the
    on-disk checkpoint reproduces the training-time best F."""
    import yaml

    from edsnet_tpu.evaluate import eval_fold_from_checkpoint
    from edsnet_tpu.models.model_zoo import get_model

    model = get_model(train_args.model, **vars(train_args))
    divs, ckpt_fs = {}, {}
    folds = yaml.safe_load(Path(split_path).read_text())
    for fold_idx, fold in enumerate(folds):
        fscore, diversity = eval_fold_from_checkpoint(
            train_args, model, split_path, fold_idx, fold["test_keys"])
        divs[f"split{fold_idx}"] = float(diversity)
        ckpt_fs[f"split{fold_idx}"] = float(fscore)
    vals = list(divs.values())
    divs["mean"] = sum(vals) / max(len(vals), 1)
    return divs, ckpt_fs


def run_sweep(argv=None) -> dict:
    parser = argparse.ArgumentParser(
        description="Run the paper's canonical/aug/transfer benchmark "
                    "matrix and record a results JSON")
    parser.add_argument("--data-root", type=str, required=True,
                        help="directory holding the eccv16 h5 datasets")
    parser.add_argument("--splits-dir", type=str,
                        default=str(Path(__file__).resolve().parent.parent
                                    / "splits"))
    parser.add_argument("--output", type=str,
                        default="paper_sweep_results.json")
    parser.add_argument("--model-root", type=str, default="sweep_models")
    parser.add_argument("--settings", type=str, nargs="+",
                        default=["canonical", "aug", "transfer"],
                        choices=list(SETTING_SPLITS))
    parser.add_argument("--max-epoch", type=int, default=300)
    parser.add_argument("--extra", type=str, nargs=argparse.REMAINDER,
                        default=[],
                        help="extra flags forwarded to the trainer (after "
                             "--extra)")
    args = parser.parse_args(argv)

    from edsnet_tpu import config as config_lib
    from edsnet_tpu.train import train_split_file
    from edsnet_tpu.utils.runtime import setup_runtime

    setup_runtime("auto")
    splits_dir = Path(args.splits_dir)
    report = {
        "config": {"model": "anchor-based", "paper_config": PAPER_CONFIG,
                   "max_epoch": args.max_epoch, "extra": args.extra},
        "settings": {},
    }

    for setting in args.settings:
        report["settings"][setting] = {}
        for split_name in SETTING_SPLITS[setting]:
            split_path = splits_dir / split_name
            entry: dict = {}
            report["settings"][setting][split_path.stem] = entry
            if not split_path.exists():
                entry["status"] = f"missing split file {split_path}"
                print(f"[{setting}/{split_path.stem}] SKIP: no split file")
                continue
            absent = missing_datasets(split_path, args.data_root)
            if absent:
                entry["status"] = "missing datasets"
                entry["missing"] = absent
                print(f"[{setting}/{split_path.stem}] SKIP: missing "
                      f"{', '.join(absent)}")
                continue

            model_dir = Path(args.model_root) / setting / split_path.stem
            train_args = config_lib.get_arguments(
                ["anchor-based", "--data-root", args.data_root,
                 "--model-dir", str(model_dir),
                 "--max-epoch", str(args.max_epoch)]
                + PAPER_CONFIG + list(args.extra))
            from edsnet_tpu.data.dataset import get_ckpt_dir
            get_ckpt_dir(model_dir).mkdir(parents=True, exist_ok=True)

            print(f"[{setting}/{split_path.stem}] training "
                  f"({args.max_epoch} epochs per fold)")
            t0 = time.time()
            results = train_split_file(train_args, split_path)
            entry["status"] = "ok"
            entry["fscores"] = results
            entry["diversity"], entry["fscores_from_ckpt"] = \
                eval_diversity(train_args, split_path)
            entry["wall_clock_s"] = round(time.time() - t0, 1)
            print(f"[{setting}/{split_path.stem}] mean F-score "
                  f"{results['mean']:.4f} diversity "
                  f"{entry['diversity']['mean']:.4f} "
                  f"in {entry['wall_clock_s']}s")

    out = Path(args.output)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(report, indent=2))
    print(f"sweep report -> {out}")
    return report


def main(argv=None):
    run_sweep(argv)


if __name__ == "__main__":
    main()
