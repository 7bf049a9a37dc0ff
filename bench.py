"""Benchmark: frames-scored/sec of the flagship scoring pipeline on TPU.

Measures the jitted batched forward+decode (anchor-based DSNet,
nystromformer backbone, ROI pooling, anchor_scales=12 — the paper config at
reference README.md:57) and compares against a PyTorch-CPU batch-size-1
baseline equivalent to the reference's execution model (torch is the only
executable baseline in this image; the reference's own GPU numbers are not
published — see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

SEQ_LEN = 512          # typical TVSum video is a few hundred picks
BATCH = 8
FEAT = 1024
STEPS = 20
WARMUP = 3


def _timed_chain(k: int, run_k, x0) -> float:
    """Run a k-iteration jitted chain and fence with a scalar fetch."""
    t0 = time.perf_counter()
    out = run_k(x0, jnp_int32(k))
    _ = float(out)  # device_get is the only reliable fence on this stack
    return time.perf_counter() - t0


def jnp_int32(v):
    import jax.numpy as jnp
    return jnp.asarray(v, jnp.int32)


def bench_ours() -> float:
    """Slope-based timing: K predict steps inside one jitted fori_loop,
    throughput from (t(K2) - t(K1)) / (K2 - K1).

    Rationale: on tunneled platforms `block_until_ready` can return before
    device completion and a host sync can cost seconds; running the whole
    chain device-side and differencing two chain lengths cancels both the
    dispatch and the sync overhead.
    """
    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.model_zoo import get_model

    model = get_model(
        "anchor-based", model_depth="shallow", base_model="nystromformer",
        num_feature=FEAT, num_hidden=128, anchor_scales=(12,), num_head=8,
        fc_depth=7, attention_depth=2, encoder_type="classic",
        orientation="paper", pooling_type="roi")

    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(BATCH, SEQ_LEN, FEAT).astype(np.float32))
    mask = jnp.ones((BATCH, SEQ_LEN), bool)
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x0, mask)

    def body(i, x):
        cls, boxes = model.apply(variables, x, mask, method="predict")
        # feed a zero-scaled summary of the output back into the input so
        # every iteration depends on the previous one
        return x + 0.0 * (jnp.sum(cls) + jnp.sum(boxes))

    @jax.jit
    def run_k(x, k):
        x = jax.lax.fori_loop(0, k, body, x)
        return jnp.sum(x[0, 0])

    for _ in range(WARMUP):
        float(run_k(x0, jnp_int32(1)))

    # median of 5 slope estimates over a long chain: the tunneled platform
    # shows run-to-run variance of +-20%; the median is robust to both
    # slow outliers (noise inflates t2) and fast ones (noise deflates the
    # difference), where min/max would bias the estimate
    k1, k2 = 5, 105
    slopes = []
    for _ in range(5):
        t1 = _timed_chain(k1, run_k, x0)
        t2 = _timed_chain(k2, run_k, x0)
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-9))
    step_time = float(np.median(slopes))
    return BATCH * SEQ_LEN / step_time


def bench_torch_baseline(budget_s: float = 60.0) -> float:
    """Reference-style execution: torch CPU, batch-1 python loop, same
    nystromformer-DSNet architecture and sizes."""
    import torch
    from torch import nn

    torch.set_num_threads(max(torch.get_num_threads(), 1))

    heads, dim_head, landmarks = 8, 64, 64
    inner = heads * dim_head

    class TorchNystromDSNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.to_qkv = nn.Linear(FEAT, inner * 3, bias=False)
            self.to_out = nn.Linear(inner, FEAT)
            self.res_conv = nn.Conv2d(heads, heads, (33, 1),
                                      padding=(16, 0), groups=heads,
                                      bias=False)
            self.norm = nn.LayerNorm(FEAT)
            self.fc1 = nn.Linear(FEAT, 128)
            self.fc_block = nn.Sequential(nn.Linear(128, 128), nn.ReLU(),
                                          nn.LayerNorm(128))
            self.pool = nn.AvgPool1d(12, stride=1, padding=6)
            self.fc_cls = nn.Linear(128, 1)
            self.fc_loc = nn.Linear(128, 2)

        def forward(self, x):
            b, n, _ = x.shape
            q, k, v = self.to_qkv(x).chunk(3, dim=-1)

            def split(t):
                return t.view(b, n, heads, dim_head).permute(0, 2, 1, 3)

            q, k, v = split(q) * dim_head ** -0.5, split(k), split(v)
            m = landmarks
            l = max(n // m, 1)
            q_l = q.reshape(b, heads, m, l, dim_head).mean(dim=3)
            k_l = k.reshape(b, heads, m, l, dim_head).mean(dim=3)
            s1 = (q @ k_l.transpose(-1, -2)).softmax(-1)
            s2 = (q_l @ k_l.transpose(-1, -2)).softmax(-1)
            s3 = (q_l @ k.transpose(-1, -2)).softmax(-1)
            z = s2.transpose(-1, -2) / (s2.abs().sum(-1).max()
                                        * s2.abs().sum(-2).max())
            eye = torch.eye(m)
            for _ in range(6):
                xz = s2 @ z
                z = 0.25 * z @ (13 * eye - xz @ (15 * eye - xz @ (7 * eye - xz)))
            out = (s1 @ z) @ (s3 @ v) + self.res_conv(v)
            out = out.permute(0, 2, 1, 3).reshape(b, n, inner)
            out = self.to_out(out)
            out = self.norm(out + x)
            h = self.fc1(out)
            for _ in range(7):
                h = self.fc_block(h)
            pooled = self.pool(h.transpose(2, 1)).transpose(2, 1)[:, :n]
            return torch.sigmoid(self.fc_cls(pooled)), self.fc_loc(pooled)

    model = TorchNystromDSNet().eval()
    x = torch.randn(1, SEQ_LEN, FEAT)
    with torch.no_grad():
        model(x)  # warmup
        n_iter = 0
        t0 = time.perf_counter()
        while time.perf_counter() - t0 < budget_s and n_iter < BATCH * STEPS:
            model(x)
            n_iter += 1
        dt = time.perf_counter() - t0
    return (n_iter * SEQ_LEN) / dt


def main():
    ours = bench_ours()
    try:
        base = bench_torch_baseline()
        vs = ours / base
    except Exception:
        base = None
        vs = 0.0
    print(json.dumps({
        "metric": "frames_scored_per_sec",
        "value": round(ours, 2),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2),
    }))


if __name__ == "__main__":
    main()
