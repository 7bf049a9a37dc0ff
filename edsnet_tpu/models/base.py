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

# tri-state: None = auto (flash ON for deterministic N >= 2048 at
# "highest" kernel precision — <=1e-3 vs the f32 oracle); True =
# --use-pallas (ON from N >= 1024, "default" MXU precision, the
# benchmarked 3.5x config); False = --no-pallas (always the XLA path)
_USE_PALLAS = None
_CONTEXT_PARALLEL = 0
_CP_MIN_LEN = 1024
_PALLAS_AUTO_MIN_LEN = 2048


def set_use_pallas(enabled) -> None:
    """Route the attention backbone's deterministic path through the
    Pallas flash-attention kernel (--use-pallas / --no-pallas); None
    restores the auto default (on from N >= 2048, highest precision)."""
    global _USE_PALLAS
    _USE_PALLAS = enabled if enabled is None else bool(enabled)


def _pallas_config():
    """(use_pallas, min_len, precision) for the attention backbone.

    The auto default only engages on a real TPU backend: elsewhere the
    kernel would run in the Pallas INTERPRETER (kernels/flash_attention.
    _interpret) — numerically exact but far slower than the XLA path it
    replaces.  --use-pallas still forces it anywhere (tests exercise the
    interpreter on CPU deliberately)."""
    if _USE_PALLAS is None:
        import jax
        on_tpu = jax.default_backend() == "tpu"
        return on_tpu, _PALLAS_AUTO_MIN_LEN, "highest"
    if _USE_PALLAS:
        return True, 1024, "default"
    return False, 1024, "default"


def set_context_parallel(num_devices: int, min_len: int = 1024) -> None:
    """Shard the attention backbone's sequence axis over the device mesh
    via ring attention (--context-parallel): 0 = off, -1 = all local
    devices, >0 = that many.  Applies to deterministic (predict/eval)
    passes on sequences >= ``min_len`` that divide the mesh size."""
    global _CONTEXT_PARALLEL, _CP_MIN_LEN, _RING_MESH
    _CONTEXT_PARALLEL = int(num_devices)
    _CP_MIN_LEN = int(min_len)
    # any earlier registration — a mesh from a previous run in this
    # process, or a trainer's RING_DISABLED — is stale now; callers
    # (configure_context_parallel, the trainer) re-register afterwards
    _RING_MESH = None


# (mesh, seq_axis, batch_axis, head_axis) registered by trainer/evaluate:
# inside one jit every mesh must span the same device set, so when params
# or batches are committed to a global mesh the ring cannot build its own
# smaller sub-mesh (JAX rejects the mixed device sets) — it rides a
# reshape of the full set instead (parallel/mesh.py:make_ring_mesh)
_RING_MESH = None

# Distinct from None (= unset, the standalone per-call mesh fallback in
# attention._ring_plan may still engage): RING_DISABLED forces the
# dense/flash path even on modules constructed with context_parallel > 0.
# The trainer registers it when the training device set cannot host a
# ring (1-device mesh, or tp takes every device) — there the standalone
# fallback would build a private mesh clashing with arrays committed to
# the training mesh.
RING_DISABLED = object()


def set_ring_mesh(mesh, seq_axis: str = "seq",
                  batch_axis=None, head_axis=None) -> None:
    """Register the global mesh ring attention must ride (None clears).

    ``batch_axis``/``head_axis`` name mesh axes to also shard the batch
    and attention heads over, composing the ring with data and tensor
    parallelism on the one mesh (ring_attention batch_axis/head_axis)."""
    global _RING_MESH
    _RING_MESH = None if mesh is None else (mesh, seq_axis, batch_axis,
                                            head_axis)


def disable_ring_attention() -> None:
    """Force the dense/flash attention path for subsequent calls, even on
    modules baked with ``context_parallel`` at construction.  Cleared by
    ``set_ring_mesh`` / ``set_context_parallel(0)``."""
    global _RING_MESH
    _RING_MESH = RING_DISABLED


def get_ring_mesh():
    return _RING_MESH


def configure_context_parallel(num_devices: int,
                               min_len: int = 1024) -> None:
    """CLI entry helper: set_context_parallel + best-effort registration
    of the all-devices ring mesh (('data','seq') reshape spanning every
    local device — a cp < device-count sub-mesh would clash with arrays
    committed to the full set, and the spare devices shard the batch axis
    for free).  Skipped when the reshape can't be built (1 device, or cp
    doesn't divide the count): the standalone per-call ring mesh then
    still serves callers that commit nothing to a global mesh.  The
    trainer re-registers with its tp-aware mesh (trainer.py)."""
    set_context_parallel(num_devices, min_len)
    if not num_devices:
        return
    import jax
    total = len(jax.devices())
    cp_eff = min(num_devices, total) if num_devices > 0 else total
    if total >= 2 and cp_eff >= 2 and total % cp_eff == 0:
        from edsnet_tpu.parallel.mesh import make_ring_mesh
        set_ring_mesh(make_ring_mesh(cp_eff), "seq", batch_axis="data")


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
        use_pallas, min_len, prec = _pallas_config()
        return AttentionExtractor(num_head, num_feature,
                                  use_pallas=use_pallas,
                                  pallas_min_len=min_len,
                                  pallas_precision=prec,
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
