"""torch state_dict -> flax params converters for every model pair.

Conventions:
- torch nn.Linear stores weight as (out, in); flax Dense kernel is
  (in, out)  -> transpose.
- torch nn.LayerNorm weight/bias -> flax scale/bias.
- torch nn.LSTM packs gates (i, f, g, o) row-blocks in weight_ih/weight_hh
  with two bias vectors; flax (Optimized)LSTMCell splits them into dense
  submodules ii/if/ig/io (input, no bias) and hi/hf/hg/ho (hidden, bias)
  -> the flax bias is b_ih + b_hh.
"""
from __future__ import annotations

import numpy as np


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def lin(sd, p, bias=True):
    p = p + "." if p else ""
    d = {"kernel": t2n(sd[p + "weight"]).T}
    if bias:
        d["bias"] = t2n(sd[p + "bias"])
    return d


def ln(sd, p):
    return {"scale": t2n(sd[p + ".weight"]), "bias": t2n(sd[p + ".bias"])}


def lstm_cell(sd, p, hidden):
    """torch nn.LSTM layer-0 (fwd or bwd suffix) -> flax LSTMCell dict."""
    suffix = "" if not p else p
    w_ih = t2n(sd[f"weight_ih_l0{suffix}"])     # (4H, F)
    w_hh = t2n(sd[f"weight_hh_l0{suffix}"])     # (4H, H)
    b = t2n(sd[f"bias_ih_l0{suffix}"]) + t2n(sd[f"bias_hh_l0{suffix}"])
    gates = {}
    for gi, g in enumerate(("i", "f", "g", "o")):
        rows = slice(gi * hidden, (gi + 1) * hidden)
        gates[f"i{g}"] = {"kernel": w_ih[rows].T}
        gates[f"h{g}"] = {"kernel": w_hh[rows].T, "bias": b[rows]}
    return gates


# ---------------------------------------------------------------- backbones

def backbone_params(base_type: str, tmod, num_feature: int):
    """Convert a reference backbone module -> our flax params subtree.

    Returns (params_dict, constants_dict_or_None).
    """
    sd = tmod.state_dict()
    if base_type == "linear":
        return {"linear": lin(sd, "")}, None
    if base_type == "attention":
        return {
            "Q": lin(sd, "Q", bias=False),
            "K": lin(sd, "K", bias=False),
            "V": lin(sd, "V", bias=False),
            "fc": lin(sd, "fc.0", bias=False),
        }, None
    if base_type == "lstm":
        return {"OptimizedLSTMCell_0": lstm_cell(sd, "", num_feature)}, None
    if base_type == "bilstm":
        h = num_feature // 2
        return {"OptimizedLSTMCell_0": lstm_cell(sd, "", h),
                "OptimizedLSTMCell_1": lstm_cell(sd, "_reverse", h)}, None
    if base_type == "gcn":
        return {"lin": {"kernel": t2n(sd["gcn.lin.weight"]).T},
                "bias": t2n(sd["gcn.bias"])}, None
    if base_type == "nystromformer":
        return {
            "to_qkv": lin(sd, "to_qkv", bias=False),
            "to_out": lin(sd, "to_out.0"),
            "res_conv": t2n(sd["res_conv.weight"]),
        }, None
    if base_type == "fourier":
        return {
            "skip_norm": ln(sd, "fft_skip.layernorm"),
            "fc": lin(sd, "fc.0"),
            "out_norm": ln(sd, "layernorm"),
        }, None
    if base_type == "dwt":
        w = t2n(sd["transconv.weight"])          # (1, 1, 2)
        return {
            "fc": lin(sd, "fc.0"),
            "norm": ln(sd, "layernorm"),
            "transconv_kernel": w.transpose(2, 0, 1),   # -> (2, 1, 1)
            "transconv_bias": t2n(sd["transconv.bias"]),
        }, None
    if base_type == "performer":
        params = {
            "attn_norm_0": ln(sd, "layers.0.0.norm"),
            "attn_0": {
                "to_q": lin(sd, "layers.0.0.fn.to_q"),
                "to_k": lin(sd, "layers.0.0.fn.to_k"),
                "to_v": lin(sd, "layers.0.0.fn.to_v"),
                "to_out": lin(sd, "layers.0.0.fn.to_out"),
            },
            "ff_norm_0": ln(sd, "layers.0.1.norm"),
            "ff1_0": lin(sd, "layers.0.1.fn.net.0"),
            "ff2_0": lin(sd, "layers.0.1.fn.net.3"),
        }
        constants = {"attn_0": {"projection": t2n(
            sd["layers.0.0.fn.fast_attention.projection_matrix"])}}
        return params, constants
    raise ValueError(f"no converter for backbone {base_type}")


# -------------------------------------------------------------------- heads

def fc_trunk_params(sd, fc1_prefix="fc1", block_prefix="fc_block"):
    """Reference fc1 + (tied) fc_block -> our _FcTrunk subtree."""
    return {
        "fc1": lin(sd, fc1_prefix),
        "fc_block": {
            "Dense_0": lin(sd, block_prefix + ".0"),
            "LayerNorm_0": ln(sd, block_prefix + ".3"),
        },
    }


def ab_heads_params(sd, cls_prefix="fc_cls.0", loc_prefix="fc_loc.0"):
    return {"fc_cls": lin(sd, cls_prefix), "fc_loc": lin(sd, loc_prefix)}


def af_heads_params(sd):
    return {"fc_cls": lin(sd, "fc_cls"), "fc_loc": lin(sd, "fc_loc"),
            "fc_ctr": lin(sd, "fc_ctr")}


def pooling_params(sd, prefix="poolings"):
    return {"fc_kernel": t2n(sd[prefix + ".fc.0.weight"]).T,
            "fc_bias": t2n(sd[prefix + ".fc.0.bias"])}


def multi_attention_params(tmod, base_type, num_feature, num_segments):
    """Reference encoder.MultiAttention -> our MultiAttention subtree."""
    sd = tmod.state_dict()
    out = {"fc": lin(sd, "fc.0")}
    gp, gc = backbone_params(
        base_type, tmod.global_attention, num_feature)
    out["global_attention"] = gp
    constants = {}
    if gc:
        constants["global_attention"] = gc
    for i in range(num_segments):
        lp, lc = backbone_params(
            base_type, tmod.local_attention[i], num_feature)
        out[f"local_attention_{i}"] = lp
        if lc:
            constants[f"local_attention_{i}"] = lc
    return out, (constants or None)


def local_global_params(tmod, base_type, num_feature, num_segments):
    """Reference encoder.LocalGlobalEncoder -> our LocalGlobalEncoder."""
    sd = tmod.state_dict()
    ma, consts = multi_attention_params(
        tmod.multi_attention, base_type, num_feature, num_segments)
    params = {
        "multi_attention": ma,
        "layer_norm": ln(sd, "layer_norm"),
        "fc": lin(sd, "fc.0"),
    }
    constants = {"multi_attention": consts} if consts else None
    return params, constants
