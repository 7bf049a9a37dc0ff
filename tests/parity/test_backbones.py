"""Forward parity: every token-mixing backbone, torch reference vs flax.

Identical weights are copied from the torch module into the flax twin and
outputs asserted equal (<=1e-4) in eval mode on the same random input.
Reference constructors: src/modules/models.py:118-147.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from edsnet_tpu.models.base import build_base_model
from edsnet_tpu.models.nystromformer import NystromAttention
from tests.parity.bridge import backbone_params
from tests.parity.conftest import assert_close

F_DIM = 64
N_HEAD = 4


def make_input(n, f=F_DIM, seed=1):
    rng = np.random.RandomState(seed)
    return rng.randn(1, n, f).astype(np.float32)


def run_flax(module, x, params, constants=None):
    variables = {"params": params}
    if constants:
        variables["constants"] = constants
    return module.apply(variables, jnp.asarray(x), None, True)


def init_flax(module, x):
    return module.init(jax.random.PRNGKey(0), jnp.asarray(x), None, True)


def check_tree_match(template, converted, path=""):
    """Every leaf in the flax template must be provided with same shape."""
    t_keys = set(template.keys())
    c_keys = set(converted.keys())
    assert t_keys == c_keys, (
        f"{path}: template keys {sorted(t_keys)} vs converted "
        f"{sorted(c_keys)}")
    for k in template:
        t, c = template[k], converted[k]
        if isinstance(t, dict):
            check_tree_match(t, c, f"{path}/{k}")
        else:
            assert tuple(t.shape) == tuple(np.shape(c)), \
                f"{path}/{k}: {t.shape} vs {np.shape(c)}"


def convert_and_check(base_type, tmod, module, x):
    variables = init_flax(module, x)
    params, constants = backbone_params(base_type, tmod, F_DIM)
    check_tree_match(jax.tree.map(lambda v: v, variables["params"]),
                     params)
    return run_flax(module, x, params, constants)


@pytest.mark.parametrize("n", [50, 64])
def test_linear_parity(ref, n):
    tmod = ref.models.build_base_model("linear", F_DIM, N_HEAD).eval()
    x = make_input(n)
    ours = build_base_model("linear", F_DIM, N_HEAD)
    out = convert_and_check("linear", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, what="linear")


@pytest.mark.parametrize("n", [50, 64])
def test_attention_parity(ref, n):
    tmod = ref.models.build_base_model("attention", F_DIM, N_HEAD).eval()
    x = make_input(n)
    ours = build_base_model("attention", F_DIM, N_HEAD)
    out = convert_and_check("attention", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, what="attention")


@pytest.mark.parametrize("base", ["lstm", "bilstm"])
def test_lstm_parity(ref, base):
    """Intended-semantics oracle: the reference factory builds nn.LSTM
    without batch_first (models.py:108-114,126-129), so at HEAD the (1,N,F)
    input is read as (T=1, B=N) and the 'lstm' backbone degenerates to a
    per-frame MLP — a latent break of the fork (the DSNet lineage uses
    batch_first=True).  The oracle here is the same nn.LSTM with
    batch_first=True, i.e. the evident intent our backbone implements."""
    hidden = F_DIM if base == "lstm" else F_DIM // 2
    tmod = torch.nn.LSTM(F_DIM, hidden, batch_first=True,
                         bidirectional=(base == "bilstm")).eval()
    x = make_input(70)
    ours = build_base_model(base, F_DIM, N_HEAD)
    out = convert_and_check(base, tmod, ours, x)
    with torch.no_grad():
        t_out, _ = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=2e-5, what=base)


def test_gcn_parity(ref):
    tmod = ref.models.build_base_model("gcn", F_DIM, N_HEAD).eval()
    # positive-ish features keep every node degree positive, the regime
    # where torch_geometric's rsqrt normalization is well-defined
    rng = np.random.RandomState(3)
    x = (0.5 + 0.1 * rng.rand(1, 40, F_DIM)).astype(np.float32)
    ours = build_base_model("gcn", F_DIM, N_HEAD)
    out = convert_and_check("gcn", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=1e-4, rtol=1e-4, what="gcn")


@pytest.mark.parametrize("n", [128, 100])
def test_nystromformer_parity(ref, n):
    """n=128 is the aligned path; n=100 exercises the front-pad path."""
    tmod = ref.models.build_base_model("nystromformer", F_DIM,
                                       N_HEAD).eval()
    x = make_input(n)
    # pinv z0 uses the per-video max — identical to the reference's
    # global max at its batch size of 1
    ours = NystromAttention(dim=F_DIM, dim_head=64, heads=N_HEAD,
                            num_landmarks=64, pinv_iterations=6,
                            residual=True, residual_conv_kernel=33)
    out = convert_and_check("nystromformer", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=5e-5, rtol=1e-4, what="nystromformer")


@pytest.mark.parametrize("orientation",
                         ["temporal", "feature_wise", "paper"])
def test_fourier_parity(ref, orientation):
    tmod = ref.models.build_base_model("fourier", F_DIM, N_HEAD,
                                       orientation).eval()
    x = make_input(48)
    ours = build_base_model("fourier", F_DIM, N_HEAD, orientation)
    out = convert_and_check("fourier", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=2e-5, what=f"fourier/{orientation}")


@pytest.mark.parametrize("n", [64, 51])
def test_dwt_parity(ref, n):
    """n=51 exercises pywt's odd-length symmetric boundary."""
    tmod = ref.models.build_base_model("dwt", F_DIM, N_HEAD).eval()
    x = make_input(n)
    ours = build_base_model("dwt", F_DIM, N_HEAD)
    out = convert_and_check("dwt", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=2e-5, what="dwt")


def test_performer_parity(ref):
    tmod = ref.models.build_base_model("performer", F_DIM, N_HEAD).eval()
    x = make_input(80)
    ours = build_base_model("performer", F_DIM, N_HEAD)
    out = convert_and_check("performer", tmod, ours, x)
    with torch.no_grad():
        t_out = tmod(torch.from_numpy(x))
    assert_close(out, t_out, atol=5e-5, rtol=1e-4, what="performer")
