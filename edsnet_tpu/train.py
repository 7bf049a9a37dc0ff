"""Train CLI: per split-file, per split-index training + result aggregation.

Reference: `src/train.py` (TRAINER dispatch, args.yml dump, per-split
F-score yaml).  Both model types route to the unified trainer.
"""
from __future__ import annotations

import logging
from pathlib import Path

from edsnet_tpu import config as config_lib
from edsnet_tpu.data.dataset import (AverageMeter, dump_yaml, get_ckpt_dir,
                                     get_ckpt_path, load_yaml)
from edsnet_tpu.trainer import train

logger = logging.getLogger()


def main(argv=None):
    args = config_lib.get_arguments(argv)
    from edsnet_tpu.utils.runtime import setup_runtime
    setup_runtime(args.device, matmul_precision=getattr(args, 'matmul_precision', None))
    if getattr(args, "use_pallas", False):
        from edsnet_tpu.models.base import set_use_pallas
        set_use_pallas(True)

    config_lib.init_logger(args.model_dir, args.log_file)
    config_lib.set_random_seed(args.seed)
    logger.info(vars(args))

    model_dir = Path(args.model_dir)
    model_dir.mkdir(parents=True, exist_ok=True)
    get_ckpt_dir(model_dir).mkdir(parents=True, exist_ok=True)

    dump_yaml(vars(args), model_dir / "args.yml")

    for split_path in args.splits:
        split_path = Path(split_path)
        splits = load_yaml(split_path)

        results = {}
        stats = AverageMeter("fscore")

        for split_idx, split in enumerate(splits):
            logger.info(f"Start training on {split_path.stem}: "
                        f"split {split_idx}")
            ckpt_path = get_ckpt_path(model_dir, split_path, split_idx)
            fscore, _, _ = train(args, split, ckpt_path)
            stats.update(fscore=fscore)
            results[f"split{split_idx}"] = float(fscore)

        results["mean"] = float(stats.fscore)
        dump_yaml(results, model_dir / f"{split_path.stem}.yml")

        msg = (f"Training done on {split_path.stem}. "
               f"F-score: {stats.fscore:.4f}")
        logger.info(msg)
        print(msg)


if __name__ == "__main__":
    main()
