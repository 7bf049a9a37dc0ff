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
    python -m edsnet_tpu.fetch_weights --all --pin     # print full sha256s

NETWORKED PLAYBOOK (the ONE command a machine with egress needs to flip
the three real-weight contract skips):

    python -m edsnet_tpu.fetch_weights --all && python -m pytest \
        tests/parity/test_googlenet.py tests/parity/test_convnext.py \
        tests/parity/test_swin.py -q

That downloads into the torch hub cache with torch.hub's sha256-prefix
check, re-verifies the digests, and runs the checksum-gated parity tests
(each skipif re-hashes the cached file, so a fabricated .pth can never
un-skip them).  Afterwards run `--verify --pin` and paste the printed
full digests into ``WEIGHTS[...]["sha256_full"]`` below to upgrade the
32-bit prefix pin (the strongest digest torchvision publishes) to the
full 256-bit one; ``--verify`` checks ``sha256_full`` whenever it is set.
"""
from __future__ import annotations

import argparse
import hashlib
import os
import sys
from pathlib import Path

# torchvision release URLs; the 8-hex suffix is the sha256 prefix that
# torch.hub checks after download.  ``sha256_full``: populate from a
# networked `--verify --pin` run to upgrade the pin to the full digest
# (this box has zero egress, so the 32-bit torchvision prefix is the
# strongest value recordable offline).
WEIGHTS = {
    "google-net": {
        "url": "https://download.pytorch.org/models/googlenet-1378be20.pth",
        "sha256_prefix": "1378be20",
        "sha256_full": None,
    },
    "swin-transformer": {
        "url": "https://download.pytorch.org/models/"
               "swin_v2_b-781e5279.pth",
        "sha256_prefix": "781e5279",
        "sha256_full": None,
    },
    "convnext": {
        "url": "https://download.pytorch.org/models/"
               "convnext_base-6075fbad.pth",
        "sha256_prefix": "6075fbad",
        "sha256_full": None,
    },
    # I3D RGB (Kinetics+ImageNet init) from the standard PyTorch port of
    # the reference's TF1 checkpoint (feature_extractor.py:28-112).
    "i3d-rgb": {
        "url": "https://github.com/piergiaj/pytorch-i3d/raw/master/"
               "models/rgb_imagenet.pt",
        "sha256_prefix": None,   # upstream publishes no digest
        "sha256_full": None,     # pin via --verify --pin on first fetch
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


def verify(name: str, pin: bool = False) -> bool:
    """Re-hash a cached file against the strongest recorded digest:
    ``sha256_full`` when pinned, else the torchvision 8-hex prefix.
    ``pin=True`` additionally prints the full digest as a paste-ready
    WEIGHTS line."""
    path = cached_path(name)
    if not path.exists():
        print(f"{name}: not cached ({path})")
        return False
    spec = WEIGHTS[name]
    with path.open("rb") as f:
        # stream: these checkpoints are hundreds of MB (read_bytes would
        # hold the whole file in RAM on the constrained tunnel host)
        digest = hashlib.file_digest(f, "sha256").hexdigest()
    if pin:
        print(f'        "sha256_full": "{digest}",   # {name}')
    if spec.get("sha256_full"):
        ok = digest == spec["sha256_full"]
        print(f"{name}: {'OK (full pin)' if ok else 'HASH MISMATCH'} "
              f"({digest[:8]}…)")
        return ok
    if spec["sha256_prefix"] is None:
        print(f"{name}: cached, no published digest to check "
              f"(sha256 {digest[:8]}…; pin it with --pin)")
        return True
    ok = digest.startswith(spec["sha256_prefix"])
    print(f"{name}: {'OK' if ok else 'HASH MISMATCH'} "
          f"({digest[:8]} vs {spec['sha256_prefix']})")
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
    parser.add_argument("--pin", action="store_true",
                        help="with --verify: also print each cached "
                             "file's FULL sha256 as a paste-ready "
                             "sha256_full line for WEIGHTS")
    args = parser.parse_args(argv)

    names = list(WEIGHTS) if args.all else args.models
    if args.verify:
        results = {name: verify(name, pin=args.pin) for name in names}
    else:
        results = {name: fetch(name) for name in names}
        if args.pin:   # pin straight after the first fetch
            results = {name: results[name] and verify(name, pin=True)
                       for name in names}
    return 0 if all(results.values()) else 1


if __name__ == "__main__":
    sys.exit(main())
