"""Flax model zoo: token-mixing backbones, encoders, and detection heads."""

from edsnet_tpu.models.model_zoo import get_model  # noqa: F401
from edsnet_tpu.models.base import build_base_model  # noqa: F401
