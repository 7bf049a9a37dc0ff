"""Import the reference PyTorch source as a test oracle.

The reference repo depends on a few pip packages that are not in this
environment (local_attention, axial_positional_embedding,
performer_pytorch, linformer, pywt, torch_geometric, ortools).  The
reference only *touches* tiny, well-specified corners of them, so each is
stubbed here with a faithful minimal implementation:

- local_attention / axial_positional_embedding: imported but never
  instantiated by the code paths under test (Performer is built with
  local_attn_heads=0, performer.py:333).
- performer_pytorch.reversible / linformer.reversible: only
  SequentialSequence is exercised (depth-1, non-reversible); implemented
  as the standard residual applier.
- pywt.dwt: single-level 'haar'/'db1' DWT with symmetric edge padding
  (pywt's default mode), the only call shape the reference uses
  (dwt_attention.py:13, poolings.py:28).
- torch_geometric.nn.GCNConv: dense re-implementation of the documented
  GCNConv semantics (add_self_loops=True, symmetric normalization,
  bias=True), enough for GCNExtractor (models.py:77-105).
- ortools knapsack solver: exact 0/1 DP backed by our host knapsack
  (values/weights are ints, so DP == branch-and-bound).

NOTE: the reference's GCNExtractor edge decode uses float division
(models.py:103) which crashes real torch_geometric; the stub floors it —
the semantics our GCN implements and documents.
"""
from __future__ import annotations

import sys
import types

import numpy as np

_REF_SRC = "/root/reference/src"
_installed = False


def _module(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _install_stubs() -> None:
    import torch
    from torch import nn

    if "local_attention" not in sys.modules:
        m = _module("local_attention")

        class LocalAttention(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

            def forward(self, *a, **k):  # pragma: no cover
                raise NotImplementedError("stub: local heads unused")

        m.LocalAttention = LocalAttention

    if "axial_positional_embedding" not in sys.modules:
        m = _module("axial_positional_embedding")

        class AxialPositionalEmbedding(nn.Module):
            def __init__(self, *a, **k):
                super().__init__()

        m.AxialPositionalEmbedding = AxialPositionalEmbedding

    class SequentialSequence(nn.Module):
        def __init__(self, layers, args_route=None):
            super().__init__()
            self.layers = layers

        def forward(self, x, **kwargs):
            for f, g in self.layers:
                x = x + f(x, **kwargs)
                x = x + g(x)
            return x

    class ReversibleSequence(nn.Module):  # pragma: no cover
        def __init__(self, *a, **k):
            super().__init__()

    for pkg_name in ("performer_pytorch", "linformer"):
        if pkg_name not in sys.modules:
            pkg = _module(pkg_name)
            sub = _module(pkg_name + ".reversible")
            sub.SequentialSequence = SequentialSequence
            sub.ReversibleSequence = ReversibleSequence
            pkg.reversible = sub

    if "pywt" not in sys.modules:
        m = _module("pywt")

        def dwt(data, wavelet, mode="symmetric", axis=-1):
            assert wavelet in ("haar", "db1"), wavelet
            assert mode == "symmetric", mode
            x = np.moveaxis(np.asarray(data), axis, -1)
            if x.shape[-1] % 2:
                x = np.concatenate([x, x[..., -1:]], axis=-1)
            s = np.asarray(2.0 ** -0.5, x.dtype)
            ca = (x[..., 0::2] + x[..., 1::2]) * s
            cd = (x[..., 0::2] - x[..., 1::2]) * s
            return np.moveaxis(ca, -1, axis), np.moveaxis(cd, -1, axis)

        m.dwt = dwt

    if "torch_geometric" not in sys.modules:
        pkg = _module("torch_geometric")
        nn_mod = _module("torch_geometric.nn")
        pkg.nn = nn_mod

        class GCNConv(nn.Module):
            def __init__(self, in_channels, out_channels):
                super().__init__()
                self.lin = nn.Linear(in_channels, out_channels, bias=False)
                self.bias = nn.Parameter(torch.zeros(out_channels))

            def forward(self, x, edge_index, edge_weight):
                n = x.shape[0]
                src = edge_index[0].long()
                dst = edge_index[1].long()
                adj = torch.zeros((n, n), dtype=x.dtype)
                adj[dst, src] += edge_weight
                adj = adj + torch.eye(n, dtype=x.dtype)
                deg = adj.sum(dim=-1)
                dinv = torch.where(deg > 0, deg.rsqrt(),
                                   torch.zeros_like(deg))
                norm_adj = adj * dinv[:, None] * dinv[None, :]
                return norm_adj @ self.lin(x) + self.bias

        nn_mod.GCNConv = GCNConv

    if "ortools" not in sys.modules:
        from edsnet_tpu.ops.knapsack import knapsack as dp_knapsack

        ortools = _module("ortools")
        algorithms = _module("ortools.algorithms")
        python_mod = _module("ortools.algorithms.python")
        solver_mod = _module("ortools.algorithms.python.knapsack_solver")
        ortools.algorithms = algorithms
        algorithms.python = python_mod
        python_mod.knapsack_solver = solver_mod

        class SolverType:
            KNAPSACK_MULTIDIMENSION_BRANCH_AND_BOUND_SOLVER = 0

        class KnapsackSolver:
            def __init__(self, solver_type, name):
                self._picked = set()

            def init(self, values, weights, capacities):
                self._values = values
                self._weights = weights[0]
                self._capacity = capacities[0]

            def solve(self):
                picked = dp_knapsack(self._values, self._weights,
                                     self._capacity)
                self._picked = set(int(i) for i in picked)
                return sum(self._values[i] for i in self._picked)

            def best_solution_contains(self, i):
                return i in self._picked

        solver_mod.SolverType = SolverType
        solver_mod.KnapsackSolver = KnapsackSolver


def load_reference():
    """Install stubs + sys.path and return the reference module namespace."""
    global _installed
    if not _installed:
        _install_stubs()
        if _REF_SRC not in sys.path:
            sys.path.insert(0, _REF_SRC)
        _installed = True

    import anchor_based.dsnet as ab_dsnet
    import anchor_based.losses as ab_losses
    import anchor_based.poolings as ab_poolings
    import anchor_based.anchor_helper as anchor_helper
    import anchor_free.anchor_free_helper as af_helper
    import anchor_free.dsnet_af as af_dsnet
    import anchor_free.losses as af_losses
    import helpers.bbox_helper as bbox_helper
    import helpers.vsumm_helper as vsumm_helper
    import modules.encoder as encoder
    import modules.models as models
    import modules.frequency_inspired.dwt_attention as dwt_attention
    import modules.frequency_inspired.fourier_attention as fourier_attention
    import transformer.nystroformer as nystroformer
    import transformer.performer as performer
    import transformer.linformer as linformer

    return types.SimpleNamespace(
        ab_dsnet=ab_dsnet, ab_losses=ab_losses, ab_poolings=ab_poolings,
        anchor_helper=anchor_helper, af_helper=af_helper, af_dsnet=af_dsnet,
        af_losses=af_losses, bbox_helper=bbox_helper,
        vsumm_helper=vsumm_helper, encoder=encoder, models=models,
        dwt_attention=dwt_attention, fourier_attention=fourier_attention,
        nystroformer=nystroformer, performer=performer, linformer=linformer)
