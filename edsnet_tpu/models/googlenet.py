"""Flax GoogLeNet-pool5: the frame-feature CNN, on device.

The reference extracts 1024-d pool5 features with torchvision's GoogLeNet
minus its last two children (dropout, fc) — `src/helpers/video_helper.py:
36-45` — run per frame on the host GPU.  This is the same network as a
flax module (NHWC), so make_dataset/infer can extract features on the TPU
once `fetch_weights` has cached the torchvision checkpoint;
``convert_torch_state_dict`` maps that checkpoint's exact key naming to
the flax variables (parity-pinned with random weights in
tests/parity/test_googlenet.py).

Architecture notes (torchvision bug-compat, matching the weights):
- every conv is Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU;
- the "5x5" inception branch actually uses a 3x3 kernel;
- maxpools use ceil_mode=True (emulated with -inf edge padding);
- output = adaptive-avg-pool to 1x1 -> (B, 1024).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# (in, ch1x1, ch3x3red, ch3x3, ch5x5red, ch5x5, pool_proj) per block —
# torchvision's GoogLeNet constructor arguments
INCEPTION_CFG = {
    "inception3a": (192, 64, 96, 128, 16, 32, 32),
    "inception3b": (256, 128, 128, 192, 32, 96, 64),
    "inception4a": (480, 192, 96, 208, 16, 48, 64),
    "inception4b": (512, 160, 112, 224, 24, 64, 64),
    "inception4c": (512, 128, 128, 256, 24, 64, 64),
    "inception4d": (512, 112, 144, 288, 32, 64, 64),
    "inception4e": (528, 256, 160, 320, 32, 128, 128),
    "inception5a": (832, 256, 160, 320, 32, 128, 128),
    "inception5b": (832, 384, 192, 384, 48, 128, 128),
}

# torchvision's ImageNet preprocessing constants (video_helper.py:29-34)
IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def _max_pool_ceil(x, window: int, stride: int, padding: int = 0):
    """torch MaxPool2d(window, stride, padding, ceil_mode=True) in NHWC.

    ceil_mode windows may overhang the right/bottom edge; torch takes the
    max over the in-range elements only, which -inf edge padding
    reproduces.  torch additionally drops a trailing window that would
    start entirely inside the (explicit) padding.
    """
    b, h, w, c = x.shape

    def out_size(n):
        out = -(-(n + 2 * padding - window) // stride) + 1
        if (out - 1) * stride >= n + padding:   # window starts past input
            out -= 1
        return out

    oh, ow = out_size(h), out_size(w)
    # pad to AT LEAST the extent the oh/ow windows cover, then crop to
    # EXACTLY that extent: if torch's drop rule makes the needed trailing
    # pad smaller than `padding` (possible for pool configs GoogLeNet does
    # not use), cropping removes the excess so VALID pooling cannot emit
    # an extra row/column
    th, tw = (oh - 1) * stride + window, (ow - 1) * stride + window
    x = jnp.pad(x, ((0, 0), (padding, max(th - h - padding, 0)),
                    (padding, max(tw - w - padding, 0)), (0, 0)),
                constant_values=-jnp.inf)
    x = x[:, :th, :tw]
    return nn.max_pool(x, (window, window), strides=(stride, stride),
                       padding="VALID")


class BasicConv2d(nn.Module):
    """torchvision BasicConv2d: conv(bias=False) + BN(eps=1e-3) + relu."""
    features: int
    kernel: Tuple[int, int] = (1, 1)
    strides: Tuple[int, int] = (1, 1)
    padding: int = 0

    @nn.compact
    def __call__(self, x):
        p = self.padding
        x = nn.Conv(self.features, self.kernel, strides=self.strides,
                    padding=[(p, p), (p, p)], use_bias=False,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         momentum=0.9, name="bn")(x)
        return nn.relu(x)


class Inception(nn.Module):
    """torchvision Inception block; submodule names mirror the torch
    state_dict ('branch2.0' -> 'branch2_0' etc.)."""
    cfg: Tuple[int, int, int, int, int, int, int]

    @nn.compact
    def __call__(self, x):
        _, c1, c3r, c3, c5r, c5, pp = self.cfg
        b1 = BasicConv2d(c1, name="branch1")(x)
        b2 = BasicConv2d(c3r, name="branch2_0")(x)
        b2 = BasicConv2d(c3, kernel=(3, 3), padding=1, name="branch2_1")(b2)
        b3 = BasicConv2d(c5r, name="branch3_0")(x)
        # torchvision quirk: the "5x5" branch is really 3x3 (matches the
        # released weights)
        b3 = BasicConv2d(c5, kernel=(3, 3), padding=1, name="branch3_1")(b3)
        b4 = _max_pool_ceil(x, 3, 1, padding=1)
        b4 = BasicConv2d(pp, name="branch4_1")(b4)
        return jnp.concatenate([b1, b2, b3, b4], axis=-1)


class GoogLeNetPool5(nn.Module):
    """(B, 224, 224, 3) normalized NHWC -> (B, 1024) pool5 features."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(64, kernel=(7, 7), strides=(2, 2), padding=3,
                        name="conv1")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = BasicConv2d(64, name="conv2")(x)
        x = BasicConv2d(192, kernel=(3, 3), padding=1, name="conv3")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = Inception(INCEPTION_CFG["inception3a"], name="inception3a")(x)
        x = Inception(INCEPTION_CFG["inception3b"], name="inception3b")(x)
        x = _max_pool_ceil(x, 3, 2)
        x = Inception(INCEPTION_CFG["inception4a"], name="inception4a")(x)
        x = Inception(INCEPTION_CFG["inception4b"], name="inception4b")(x)
        x = Inception(INCEPTION_CFG["inception4c"], name="inception4c")(x)
        x = Inception(INCEPTION_CFG["inception4d"], name="inception4d")(x)
        x = Inception(INCEPTION_CFG["inception4e"], name="inception4e")(x)
        x = _max_pool_ceil(x, 2, 2)
        x = Inception(INCEPTION_CFG["inception5a"], name="inception5a")(x)
        x = Inception(INCEPTION_CFG["inception5b"], name="inception5b")(x)
        return jnp.mean(x, axis=(1, 2))   # adaptive avg pool to 1x1


def convert_torch_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """torchvision googlenet state_dict -> flax variables for
    GoogLeNetPool5.

    Accepts the full checkpoint (aux/fc entries are skipped).  Keys follow
    torchvision's naming: ``conv1.conv.weight``, ``inception3a.branch2.0.
    bn.running_mean`` ...  Values may be torch tensors or numpy arrays.
    """
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def as_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    def slot(tree, path):
        node = tree
        for p in path:
            node = node.setdefault(p, {})
        return node

    for key, value in sd.items():
        parts = key.split(".")
        if parts[0] in ("aux1", "aux2", "fc") or "num_batches_tracked" in key:
            continue
        block = parts[0]                      # conv1 / inception3a / ...
        if parts[1].startswith("branch"):
            # branch1.conv.w | branch2.0.conv.w -> branch2_0
            if parts[2] in ("conv", "bn"):
                sub = parts[1]
                layer, leaf = parts[2], parts[3]
            else:
                sub = f"{parts[1]}_{parts[2]}"
                layer, leaf = parts[3], parts[4]
            path = (block, sub, layer)
        else:
            layer, leaf = parts[1], parts[2]  # conv1.conv.weight
            path = (block, layer)
        v = as_np(value)
        if layer == "conv" and leaf == "weight":
            slot(params, path)["kernel"] = v.transpose(2, 3, 1, 0)
        elif layer == "bn" and leaf == "weight":
            slot(params, path)["scale"] = v
        elif layer == "bn" and leaf == "bias":
            slot(params, path)["bias"] = v
        elif leaf == "running_mean":
            slot(stats, path)["mean"] = v
        elif leaf == "running_var":
            slot(stats, path)["var"] = v
        else:
            raise ValueError(f"unexpected checkpoint entry {key}")
    return {"params": params, "batch_stats": stats}


def preprocess_frame(img: np.ndarray) -> np.ndarray:
    """RGB uint8 HWC frame -> (224, 224, 3) normalized float32 (NHWC).

    Reproduces the reference transform stack (video_helper.py:29-34):
    PIL bilinear resize of the short edge to 256, center crop 224,
    scale to [0,1], ImageNet mean/std normalize.
    """
    from PIL import Image

    pil = Image.fromarray(img)
    w, h = pil.size
    # torchvision semantics: short edge -> 256, long edge TRUNCATED int
    if w < h:
        nw, nh = 256, int(h * 256 / w)
    else:
        nw, nh = int(w * 256 / h), 256
    pil = pil.resize((nw, nh), Image.BILINEAR)
    # torchvision center crop rounds the offsets
    left = int(round((nw - 224) / 2.0))
    top = int(round((nh - 224) / 2.0))
    arr = np.asarray(pil.crop((left, top, left + 224, top + 224)),
                     dtype=np.float32) / 255.0
    return (arr - IMAGENET_MEAN) / IMAGENET_STD
