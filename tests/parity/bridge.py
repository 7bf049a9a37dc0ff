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
    # np.array (copy) rather than np.asarray (view): jnp.asarray on CPU can
    # alias aligned numpy buffers zero-copy, so a view of torch storage
    # would let later in-place torch optimizer steps silently mutate the
    # "converted" jax params (bit us in the trajectory tests).
    return np.array(t.detach().cpu().numpy())


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


# ------------------------------------------------------- full head models

def dsnet_params(tmod, base_type, pooling_type, num_feature):
    """Reference anchor_based.dsnet.DSNet -> our models.dsnet.DSNet."""
    sd = tmod.state_dict()
    bp, bc = backbone_params(base_type, tmod.base_model, num_feature)
    params = {
        "base_model": bp,
        "layer_norm": ln(sd, "layer_norm"),
        "trunk": fc_trunk_params(sd),
        "heads": ab_heads_params(sd),
    }
    if pooling_type in ("fft", "dwt", "flat-pooling"):
        params["pooling"] = pooling_params(sd, "poolings")
    constants = {"base_model": bc} if bc else None
    return params, constants


def dsnet_original_params(tmod, num_feature):
    sd = tmod.state_dict()
    bp, _ = backbone_params("attention", tmod.base_model, num_feature)
    return {
        "base_model": bp,
        "layer_norm": ln(sd, "layer_norm"),
        "fc1": lin(sd, "fc1.0"),
        "fc1_norm": ln(sd, "fc1.3"),
        "fc_cls": lin(sd, "fc_cls"),
        "fc_loc": lin(sd, "fc_loc"),
    }


def dsnet_deep_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    bp, bc = backbone_params(base_type, tmod.base_model1, num_feature)
    params = {
        "base_model1": bp,
        "trunk": fc_trunk_params(sd),
        "heads": ab_heads_params(sd),
    }
    constants = {"base_model1": bc} if bc else None
    return params, constants


def dsnet_multi_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    lg, lgc = local_global_params(tmod.multiattentionblock, base_type,
                                  num_feature, num_segments=4)
    params = {
        "multiattentionblock": lg,
        "trunk": fc_trunk_params(sd),
        "heads": ab_heads_params(sd),
    }
    constants = {"multiattentionblock": lgc} if lgc else None
    return params, constants


def dsnet_af_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    bp, bc = backbone_params(base_type, tmod.base_model, num_feature)
    params = {
        "base_model": bp,
        "layer_norm": ln(sd, "layer_norm"),
        "trunk": fc_trunk_params(sd),
        "heads": af_heads_params(sd),
    }
    constants = {"base_model": bc} if bc else None
    return params, constants


def dsnet_af_original_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    bp, _ = backbone_params(base_type, tmod.base_model, num_feature)
    return {
        "base_model": bp,
        "layer_norm": ln(sd, "layer_norm"),
        "fc1": lin(sd, "fc1.0"),
        "fc1_norm": ln(sd, "fc1.3"),
        "heads": af_heads_params(sd),
    }


def dsnet_af_deep_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    b1, _ = backbone_params(base_type, tmod.base_model1, num_feature)
    b2, _ = backbone_params(base_type, tmod.base_model2, num_feature)
    return {
        "base_model1": b1,
        "base_model2": b2,
        "layer_norm": ln(sd, "layer_norm"),
        "trunk": fc_trunk_params(sd),
        "heads": af_heads_params(sd),
    }


def dsnet_af_multi_params(tmod, base_type, num_feature):
    sd = tmod.state_dict()
    lg, lgc = local_global_params(tmod.multiattention, base_type,
                                  num_feature, num_segments=4)
    params = {
        "multiattention": lg,
        "trunk": fc_trunk_params(sd),
        "heads": af_heads_params(sd),
    }
    constants = {"multiattention": lgc} if lgc else None
    return params, constants


def mha_torch_to_flax(sd, prefix, num_heads, d_model):
    """torch nn.MultiheadAttention -> flax MultiHeadDotProductAttention."""
    dh = d_model // num_heads
    w = t2n(sd[prefix + ".in_proj_weight"])     # (3F, F)
    b = t2n(sd[prefix + ".in_proj_bias"])       # (3F,)
    out = {}
    for i, name in enumerate(("query", "key", "value")):
        wi = w[i * d_model:(i + 1) * d_model]   # (F, F): y = x @ wi.T
        bi = b[i * d_model:(i + 1) * d_model]
        out[name] = {"kernel": wi.T.reshape(d_model, num_heads, dh),
                     "bias": bi.reshape(num_heads, dh)}
    wo = t2n(sd[prefix + ".out_proj.weight"])   # (F, F)
    bo = t2n(sd[prefix + ".out_proj.bias"])
    out["out"] = {"kernel": wo.T.reshape(num_heads, dh, d_model),
                  "bias": bo}
    return out


def decoder_layer_params(sd, prefix, num_heads=8, d_model=1024):
    """torch nn.TransformerDecoderLayer -> our _CrossAttentionDecoderLayer."""
    return {
        "self_attn": mha_torch_to_flax(sd, prefix + ".self_attn",
                                       num_heads, d_model),
        "cross_attn": mha_torch_to_flax(sd, prefix + ".multihead_attn",
                                        num_heads, d_model),
        "ff1": lin(sd, prefix + ".linear1"),
        "ff2": lin(sd, prefix + ".linear2"),
        "norm1": ln(sd, prefix + ".norm1"),
        "norm2": ln(sd, prefix + ".norm2"),
        "norm3": ln(sd, prefix + ".norm3"),
    }


def motion_params(tmod, base_type, num_feature, attention_depth):
    """Reference DSNetMotionFeatures -> our DSNetMotionFeatures."""
    sd = tmod.state_dict()
    enc_sd = tmod.encoder.state_dict()
    bp, _ = backbone_params(base_type, tmod.encoder.base_model, num_feature)
    params = {
        "encoder": {
            "base_model": bp,
            "fc1": lin(enc_sd, "fc1"),
        },
        "layer_norm": ln(sd, "layer_norm"),
        "fcb1": lin(sd, "fc_block.0"),
        "fcb2": lin(sd, "fc_block.1"),
        "fcb_norm": ln(sd, "fc_block.4"),
        "fc_cls": lin(sd, "fc_cls"),
        "fc_loc": lin(sd, "fc_loc"),
    }
    for i in range(attention_depth):
        params[f"decoder_{i}"] = decoder_layer_params(
            sd, f"multiheadcrossattention.layers.{i}")
    return params


def linformer_params(tmod):
    """Reference transformer.linformer.Linformer -> our Linformer."""
    sd = tmod.state_dict()
    return {
        "attn_norm_0": ln(sd, "layers.0.0.norm"),
        "attn_0": {
            "to_q": lin(sd, "layers.0.0.fn.to_q", bias=False),
            "to_k": lin(sd, "layers.0.0.fn.to_k", bias=False),
            "to_v": lin(sd, "layers.0.0.fn.to_v", bias=False),
            "to_out": lin(sd, "layers.0.0.fn.to_out"),
            "proj_k": t2n(sd["layers.0.0.fn.proj_k"]),
            "proj_v": t2n(sd["layers.0.0.fn.proj_v"]),
        },
        "ff_norm_0": ln(sd, "layers.0.1.norm"),
        "ff1_0": lin(sd, "layers.0.1.fn.net.0"),
        "ff2_0": lin(sd, "layers.0.1.fn.net.3"),
    }
