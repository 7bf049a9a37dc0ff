from edsnet_tpu.data.dataset import (AverageMeter, DataLoader, VideoDataset,
                                     dump_yaml, get_ckpt_dir, get_ckpt_path,
                                     load_yaml)  # noqa: F401
