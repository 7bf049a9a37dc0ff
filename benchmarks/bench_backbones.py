"""Per-backbone forward benchmark at the paper's data shape.

Usage: python benchmarks/bench_backbones.py [--batch 8] [--seq 512]
Prints one JSON line per backbone: ms/step and frames/sec on the current
jax backend (the real TPU chip by default on this box).
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--seq", type=int, default=512)
    parser.add_argument("--feat", type=int, default=1024)
    parser.add_argument("--steps", type=int, default=20)
    parser.add_argument("--backbones", type=str, nargs="+", default=None)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from edsnet_tpu.models.base import BASE_MODELS, build_base_model
    from edsnet_tpu.utils.runtime import setup_runtime

    setup_runtime()
    b, n, f = args.batch, args.seq, args.feat
    rng = np.random.RandomState(0)
    xs = [jnp.asarray(rng.randn(b, n, f).astype(np.float32))
          for _ in range(3)]
    mask = jnp.ones((b, n), bool)

    names = args.backbones or BASE_MODELS
    for name in names:
        try:
            model = build_base_model(name, f, 8)
            variables = model.init(
                {"params": jax.random.PRNGKey(0),
                 "dropout": jax.random.PRNGKey(1)}, xs[0], mask)
            def body(i, x, model=model, variables=variables):
                out = model.apply(variables, x, mask)
                return x + 0.0 * out  # chain iterations

            @jax.jit
            def run_k(x, k, body=body):
                return jnp.sum(jax.lax.fori_loop(0, k, body, x)[0, 0])

            # slope timing: two chain lengths inside one jitted fori_loop;
            # differencing cancels tunnel dispatch/sync overhead (see
            # bench.py docstring)
            def timed(k):
                t0 = time.perf_counter()
                float(run_k(xs[0], jnp.int32(k)))
                return time.perf_counter() - t0

            float(run_k(xs[0], jnp.int32(1)))  # warmup/compile
            k1, k2 = 5, 5 + args.steps
            # min-of-5 per chain length (tunnel noise is additive), then
            # difference the two robust estimates (see bench.py)
            t1 = min(timed(k1) for _ in range(5))
            t2 = min(timed(k2) for _ in range(5))
            dt = max(t2 - t1, 1e-9)
            print(json.dumps({
                "backbone": name,
                "ms_per_step": round(dt / args.steps * 1e3, 3),
                "frames_per_sec": round(b * n * args.steps / dt),
                "batch": b, "seq": n, "feat": f,
                "backend": jax.default_backend(),
            }))
        except Exception as e:  # keep the sweep alive
            print(json.dumps({"backbone": name, "error": str(e)[:200]}))


if __name__ == "__main__":
    main()
