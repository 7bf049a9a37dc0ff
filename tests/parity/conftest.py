"""Fixtures for the cross-framework parity harness."""
from __future__ import annotations

import os

import numpy as np
import pytest

if not os.path.isdir("/root/reference/src"):
    pytest.skip("reference checkout not present at /root/reference",
                allow_module_level=True)

import torch

from tests.parity.refload import load_reference

# torch.qr was removed from modern torch; the reference's performer uses it
# (performer.py:95). Restore the old (q, r) contract.
if not hasattr(torch, "qr"):
    def _qr(a, some=True):
        return torch.linalg.qr(a, mode="reduced" if some else "complete")
    torch.qr = _qr


@pytest.fixture(scope="session")
def ref():
    torch.manual_seed(0)
    return load_reference()


@pytest.fixture(autouse=True)
def _torch_deterministic():
    torch.manual_seed(0)
    np.random.seed(0)


def assert_close(jx, tt, atol=1e-5, rtol=1e-5, what=""):
    a = np.asarray(jx)
    b = tt.detach().cpu().numpy() if isinstance(tt, torch.Tensor) \
        else np.asarray(tt)
    assert a.shape == b.shape, f"{what}: shape {a.shape} vs {b.shape}"
    np.testing.assert_allclose(a, b, atol=atol, rtol=rtol, err_msg=what)
