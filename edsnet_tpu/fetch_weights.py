"""Pretrained-weight fetcher for the frame/motion feature extractors.

The feature contract is the reference's (video_helper.py:62-73): GoogLeNet
pool5 (default), Swin-V2-B, or ConvNeXt-Base producing 1024-d L2-normed
per-frame features; motion features come from an I3D RGB network
(motion_feature_extractor/feature_extractor.py:28-112).  This environment
has no egress, so weights cannot ship with the repo — this tool downloads
them into the torch hub cache when a network IS reachable, after which
`infer.py` / `make_dataset.py` with the pretrained extractors work fully
offline.  Integrity: every file name carries the first 8 hex chars of its
sha256 (the torchvision convention) and torch.hub verifies it on
download; --verify re-hashes cached files.

    python -m edsnet_tpu.fetch_weights                 # google-net only
    python -m edsnet_tpu.fetch_weights --all           # + swin/convnext/i3d
    python -m edsnet_tpu.fetch_weights --verify        # check cached hashes
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
from pathlib import Path

# torchvision release URLs; the 8-hex suffix is the sha256 prefix that
# torch.hub checks after download.
WEIGHTS = {
    "google-net": {
        "url": "https://download.pytorch.org/models/googlenet-1378be20.pth",
        "sha256_prefix": "1378be20",
    },
    "swin-transformer": {
        "url": "https://download.pytorch.org/models/"
               "swin_v2_b-781e5279.pth",
        "sha256_prefix": "781e5279",
    },
    "convnext": {
        "url": "https://download.pytorch.org/models/"
               "convnext_base-6075fbad.pth",
        "sha256_prefix": "6075fbad",
    },
    # I3D RGB (Kinetics+ImageNet init) from the standard PyTorch port of
    # the reference's TF1 checkpoint (feature_extractor.py:28-112).
    "i3d-rgb": {
        "url": "https://github.com/piergiaj/pytorch-i3d/raw/master/"
               "models/rgb_imagenet.pt",
        "sha256_prefix": None,   # upstream publishes no digest
    },
}


def hub_dir() -> Path:
    try:
        import torch
        return Path(torch.hub.get_dir()) / "checkpoints"
    except ImportError:
        # torch.hub.get_dir()'s documented default chain, computed without
        # torch so cache PROBES work in torch-less environments:
        # $TORCH_HOME, else $XDG_CACHE_HOME/torch, else ~/.cache/torch
        base = os.environ.get("TORCH_HOME")
        if base is None:
            xdg = os.environ.get(
                "XDG_CACHE_HOME",
                os.path.join(os.path.expanduser("~"), ".cache"))
            base = os.path.join(xdg, "torch")
        return Path(base) / "hub" / "checkpoints"


def cached_path(name: str) -> Path:
    return hub_dir() / WEIGHTS[name]["url"].rsplit("/", 1)[-1]


def verify(name: str) -> bool:
    """Re-hash a cached file against its embedded sha256 prefix."""
    path = cached_path(name)
    if not path.exists():
        print(f"{name}: not cached ({path})")
        return False
    prefix = WEIGHTS[name]["sha256_prefix"]
    if prefix is None:
        print(f"{name}: cached, no published digest to check")
        return True
    digest = hashlib.sha256(path.read_bytes()).hexdigest()
    ok = digest.startswith(prefix)
    print(f"{name}: {'OK' if ok else 'HASH MISMATCH'} "
          f"({digest[:8]} vs {prefix})")
    return ok


def fetch(name: str) -> bool:
    import torch

    spec = WEIGHTS[name]
    try:
        # download-only: load_state_dict_from_url would also DESERIALIZE
        # through torch.load's pickle path, executing whatever a
        # compromised upstream file contains; consumers later load with
        # weights_only=True
        hub_dir().mkdir(parents=True, exist_ok=True)
        torch.hub.download_url_to_file(
            spec["url"], str(cached_path(name)), progress=True,
            hash_prefix=spec["sha256_prefix"])
    except Exception as e:   # no egress, bad proxy, upstream moved...
        print(f"{name}: download failed ({type(e).__name__}: "
              f"{str(e)[:120]})")
        return False
    return verify(name)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="Download pretrained extractor weights into the torch "
                    "hub cache")
    parser.add_argument("--models", type=str, nargs="+",
                        default=["google-net"], choices=list(WEIGHTS))
    parser.add_argument("--all", action="store_true",
                        help="fetch every known weight file")
    parser.add_argument("--verify", action="store_true",
                        help="only check hashes of already-cached files")
    args = parser.parse_args(argv)

    names = list(WEIGHTS) if args.all else args.models
    action = verify if args.verify else fetch
    results = {name: action(name) for name in names}
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
