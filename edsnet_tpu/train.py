"""Train CLI: sweep every split of every split file, record F-scores.

Behavioral contract from `src/train.py`: args snapshot to
``{model_dir}/args.yml``, per-split-file results yaml
``{model_dir}/{stem}.yml`` with per-split and mean F-scores, checkpoints
under the reference path contract (utils/checkpoint.py).  Orchestration
structure is our own.
"""
from __future__ import annotations

import logging
from pathlib import Path

from edsnet_tpu import config as config_lib
from edsnet_tpu.data.dataset import (dump_yaml, get_ckpt_dir, get_ckpt_path,
                                     load_yaml)
from edsnet_tpu.trainer import train

logger = logging.getLogger()


def train_split_file(args, split_path: Path) -> dict:
    """Train every fold of one split yaml; returns the results mapping."""
    folds = load_yaml(split_path)
    scores = []
    for fold_idx, fold in enumerate(folds):
        logger.info(f"[{split_path.stem}] training fold "
                    f"{fold_idx + 1}/{len(folds)}")
        ckpt_path = get_ckpt_path(args.model_dir, split_path, fold_idx)
        best_fscore, _, _ = train(args, fold, ckpt_path)
        logger.info(f"[{split_path.stem}] fold {fold_idx} best F-score "
                    f"{best_fscore:.4f}")
        scores.append(float(best_fscore))

    results = {f"split{i}": s for i, s in enumerate(scores)}
    results["mean"] = sum(scores) / max(len(scores), 1)
    return results


def main(argv=None):
    args = config_lib.get_arguments(argv)
    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(args.device,
                  matmul_precision=getattr(args, "matmul_precision", None))
    if getattr(args, "use_pallas", None) is not None:
        from edsnet_tpu.models.base import set_use_pallas
        set_use_pallas(args.use_pallas)
    if getattr(args, "context_parallel", 0):
        # the trainer re-registers the ring mesh tp-aware (trainer.py);
        # this sets the flags + a default all-devices mesh for the
        # pre-trainer model-construction path
        from edsnet_tpu.models.base import configure_context_parallel
        configure_context_parallel(args.context_parallel,
                                   getattr(args, "cp_min_len", 1024))

    config_lib.init_logger(args.model_dir, args.log_file)
    config_lib.set_random_seed(args.seed)
    logger.info(vars(args))

    model_dir = Path(args.model_dir)
    get_ckpt_dir(model_dir).mkdir(parents=True, exist_ok=True)
    dump_yaml(vars(args), model_dir / "args.yml")

    for split_path in map(Path, args.splits):
        results = train_split_file(args, split_path)
        dump_yaml(results, model_dir / f"{split_path.stem}.yml")
        msg = (f"{split_path.stem}: sweep finished, mean F-score "
               f"{results['mean']:.4f}")
        logger.info(msg)
        print(msg)


if __name__ == "__main__":
    main()
