"""Model registry: name + depth -> head module.

Reference: `src/modules/model_zoo.py` (which re-parses sys.argv deep inside
the stack at model_zoo.py:10,24 — replaced here by explicit arguments).
"""
from __future__ import annotations

from flax import linen as nn

from edsnet_tpu.models.dsnet import (DSNet, DSNetDeepAttention,
                                     DSNetMotionFeatures,
                                     DSNetMultiAttention, DSNetOriginal)
from edsnet_tpu.models.dsnet_af import (DSNetAF, DSNetAFDeepAttention,
                                        DSNetAFMultiAttention,
                                        DSNetAFOriginal)

MODEL_TYPES = ("anchor-based", "anchor-free")
MODEL_DEPTHS = ("shallow", "deep", "local-global-attention", "original",
                "cross-attention")


def get_anchor_based(base_model, num_feature, num_hidden, anchor_scales,
                     num_head, fc_depth, attention_depth, encoder_type,
                     orientation, pooling_type, model_depth="shallow",
                     **kwargs) -> nn.Module:
    if model_depth == "shallow":
        return DSNet(base_model, num_feature, num_hidden, anchor_scales,
                     num_head, fc_depth, orientation, pooling_type)
    if model_depth == "deep":
        return DSNetDeepAttention(base_model, num_feature, num_hidden,
                                  anchor_scales, num_head, fc_depth,
                                  attention_depth, orientation)
    if model_depth == "local-global-attention":
        return DSNetMultiAttention(base_model, num_feature, num_hidden,
                                   anchor_scales, num_head, fc_depth,
                                   orientation)
    if model_depth == "cross-attention":
        return DSNetMotionFeatures(base_model, num_feature, num_hidden,
                                   anchor_scales, num_head, attention_depth,
                                   encoder_type, orientation)
    if model_depth == "original":
        return DSNetOriginal(base_model, num_feature, num_hidden,
                             anchor_scales, num_head)
    raise ValueError(f"Invalid model depth {model_depth}")


def get_anchor_free(base_model, num_feature, num_hidden, num_head, fc_depth,
                    orientation, model_depth="shallow", **kwargs) -> nn.Module:
    if model_depth == "shallow":
        return DSNetAF(base_model, num_feature, num_hidden, num_head,
                       fc_depth, orientation)
    if model_depth == "deep":
        return DSNetAFDeepAttention(base_model, num_feature, num_hidden,
                                    num_head, fc_depth, orientation)
    if model_depth == "original":
        return DSNetAFOriginal(base_model, num_feature, num_hidden, num_head)
    if model_depth == "local-global-attention":
        return DSNetAFMultiAttention(base_model, num_feature, num_hidden,
                                     num_head, fc_depth, orientation)
    raise ValueError(f"Invalid model depth {model_depth}")


def get_model(model_type: str, **kwargs) -> nn.Module:
    """Build a head module. (model_zoo.py:35-41)"""
    kwargs.pop("model", None)
    if isinstance(kwargs.get("anchor_scales"), list):
        # modules must stay hashable for jit static args
        kwargs["anchor_scales"] = tuple(kwargs["anchor_scales"])
    if model_type == "anchor-based":
        return get_anchor_based(**_filter(kwargs, get_anchor_based))
    if model_type == "anchor-free":
        return get_anchor_free(**_filter(kwargs, get_anchor_free))
    raise ValueError(f"Invalid model type {model_type}")


def _filter(kwargs, fn):
    import inspect
    sig = inspect.signature(fn)
    names = {p for p in sig.parameters if p != "kwargs"}
    return {k: v for k, v in kwargs.items() if k in names}
