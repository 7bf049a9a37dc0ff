"""On-chip flash-attention parity + throughput at both kernel precisions.

Run on a live TPU (the pytest suite runs the kernels in interpret mode on
CPU, where they are exact; this script measures the COMPILED kernels):

    python benchmarks/bench_flash_parity.py [N]

Reports, for precision in {default, highest}:
  - fwd+bwd relative max error vs the f32 XLA oracle
    (einsum/softmax at Precision.HIGHEST)
  - fwd+bwd wall-clock vs the XLA attention path

The round-3 record was <=1.1e-2 relative (default MXU precision on both
sides).  The shipped auto-default routes deterministic N>=2048 through
the kernel at precision="highest", whose bound this script certifies
(<=1e-3 target, VERDICT r3 item 7).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from edsnet_tpu.kernels.flash_attention import flash_attention

B, H, D = 2, 8, 128


def _oracle_f32(q, k, v, mask):
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   precision=jax.lax.Precision.HIGHEST) / jnp.sqrt(
        jnp.asarray(d, jnp.float32))
    s = jnp.where(mask[:, None, None, :], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v,
                      precision=jax.lax.Precision.HIGHEST)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b).max() + 1e-12)))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(B, H, n, D), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(n)[None, :] < np.array([n, n - 37])[:, None])
    w = jnp.asarray(rng.randn(B, H, n, D), jnp.float32)

    def loss_oracle(q, k, v):
        return jnp.sum(_oracle_f32(q, k, v, mask) * w)

    g_oracle = jax.jit(jax.grad(loss_oracle, argnums=(0, 1, 2)))
    o_oracle = jax.jit(lambda q, k, v: _oracle_f32(q, k, v, mask))
    ref_out = o_oracle(q, k, v)
    ref_g = g_oracle(q, k, v)
    jax.block_until_ready((ref_out, ref_g))

    def timed(fn, *a):
        fn(*a)  # compile
        jax.block_until_ready(fn(*a))
        t0 = time.perf_counter()
        for _ in range(10):
            r = fn(*a)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / 10 * 1e3

    t_oracle = timed(lambda q, k, v: (o_oracle(q, k, v),
                                      g_oracle(q, k, v)), q, k, v)
    print(f"N={n}  XLA oracle fwd+bwd: {t_oracle:.2f} ms")

    for prec in ("default", "highest"):
        def loss_flash(q, k, v, prec=prec):
            return jnp.sum(flash_attention(q, k, v, mask,
                                           precision=prec) * w)

        o_flash = jax.jit(lambda q, k, v, prec=prec: flash_attention(
            q, k, v, mask, precision=prec))
        g_flash = jax.jit(jax.grad(loss_flash, argnums=(0, 1, 2)))

        e_fwd = _rel_err(o_flash(q, k, v), ref_out)
        g = g_flash(q, k, v)
        e_bwd = max(_rel_err(a, b) for a, b in zip(g, ref_g))
        t = timed(lambda q, k, v: (o_flash(q, k, v), g_flash(q, k, v)),
                  q, k, v)
        verdict = ""
        if prec == "highest":
            verdict = "  [PASS <=1e-3]" if max(e_fwd, e_bwd) <= 1e-3 \
                else "  [FAIL >1e-3]"
        print(f"  flash precision={prec}: fwd err {e_fwd:.2e}, "
              f"bwd err {e_bwd:.2e}, fwd+bwd {t:.2f} ms "
              f"({t_oracle / t:.2f}x vs XLA){verdict}")


if __name__ == "__main__":
    main()
