"""Base-model (token-mixing backbone) factory.

Reference: `src/modules/models.py:118-147`.  All 10 advertised CLI choices
work here, including 'linformer' (whose factory branch is commented out at
HEAD, models.py:138-139 — a documented latent break we fix).
"""
from __future__ import annotations

from flax import linen as nn

from edsnet_tpu.models.attention import AttentionExtractor
from edsnet_tpu.models.common import dense
from edsnet_tpu.models.dwt_net import DwtNet
from edsnet_tpu.models.fnet import FNetLayer
from edsnet_tpu.models.gcn import GCNExtractor
from edsnet_tpu.models.linformer import Linformer
from edsnet_tpu.models.lstm import BiLSTMExtractor, LSTMExtractor
from edsnet_tpu.models.nystromformer import NystromAttention
from edsnet_tpu.models.performer import Performer

BASE_MODELS = ("linear", "lstm", "bilstm", "gcn", "attention",
               "nystromformer", "fourier", "linformer", "performer", "dwt")

_USE_PALLAS = False
_CONTEXT_PARALLEL = 0
_CP_MIN_LEN = 1024


def set_use_pallas(enabled: bool) -> None:
    """Route the attention backbone's deterministic path through the
    Pallas flash-attention kernel (--use-pallas)."""
    global _USE_PALLAS
    _USE_PALLAS = bool(enabled)


def set_context_parallel(num_devices: int, min_len: int = 1024) -> None:
    """Shard the attention backbone's sequence axis over the device mesh
    via ring attention (--context-parallel): 0 = off, -1 = all local
    devices, >0 = that many.  Applies to deterministic (predict/eval)
    passes on sequences >= ``min_len`` that divide the mesh size."""
    global _CONTEXT_PARALLEL, _CP_MIN_LEN
    _CONTEXT_PARALLEL = int(num_devices)
    _CP_MIN_LEN = int(min_len)


class LinearExtractor(nn.Module):
    """Position-wise linear mixing. (models.py:123-124)"""
    num_feature: int

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        return dense(self.num_feature, name="linear")(x)


def build_base_model(base_type: str, num_feature: int, num_head: int,
                     orientation: str = "paper", name: str = "base_model"
                     ) -> nn.Module:
    """(B, N, F) -> (B, N, F) mixing module by name. (models.py:118-147)"""
    if base_type == "linear":
        return LinearExtractor(num_feature, name=name)
    if base_type == "lstm":
        return LSTMExtractor(num_feature, name=name)
    if base_type == "bilstm":
        return BiLSTMExtractor(num_feature, name=name)
    if base_type == "gcn":
        return GCNExtractor(num_feature, name=name)
    if base_type == "attention":
        return AttentionExtractor(num_head, num_feature,
                                  use_pallas=_USE_PALLAS,
                                  context_parallel=_CONTEXT_PARALLEL,
                                  cp_min_len=_CP_MIN_LEN, name=name)
    if base_type == "nystromformer":
        # factory config at models.py:135
        return NystromAttention(dim=num_feature, dim_head=64, heads=num_head,
                                num_landmarks=64, pinv_iterations=6,
                                residual=True, residual_conv_kernel=33,
                                name=name)
    if base_type == "fourier":
        return FNetLayer(num_feature, dropout=0.5, orientation=orientation,
                         name=name)
    if base_type == "linformer":
        # intended config at models.py:139 (commented out at HEAD)
        return Linformer(dim=num_feature, depth=1, heads=num_head,
                         dim_head=64, seq_len=5000, k=1000, dropout=0.5,
                         mlp_dim=1024, name=name)
    if base_type == "performer":
        return Performer(dim=num_feature, depth=1, heads=num_head,
                         mlp_dim=1024, dim_head=64, dropout=0.5, name=name)
    if base_type == "dwt":
        return DwtNet(num_feature=num_feature, dropout=0.5, name=name)
    raise ValueError(f"Invalid base model {base_type}")
