"""Single-level Haar/db1 DWT as XLA-friendly strided ops.

The reference round-trips to pywt on the CPU inside model forwards
(`src/modules/frequency_inspired/dwt_attention.py:12-14`,
`src/anchor_based/poolings.py:28`), breaking gradient flow and device
residency.  Haar analysis is a fixed 2-tap stride-2 filter pair; here it is a
pure reshape/arithmetic op, fully differentiable and fusable.

pywt conventions reproduced (mode='symmetric', 'haar'/'db1'):
- cA[j] = (x[2j] + x[2j+1]) / sqrt(2)
- cD[j] = (x[2j] - x[2j+1]) / sqrt(2)
- odd length: last sample is symmetric-extended (x[n-1] repeated), giving
  cA[-1] = x[n-1] * sqrt(2), cD[-1] = 0.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

_INV_SQRT2 = 0.7071067811865476


def haar_dwt(x, axis: int = 1) -> Tuple[jax.Array, jax.Array]:
    """Single-level Haar DWT along ``axis``. Returns (cA, cD).

    Output length along axis is ceil(n / 2), matching pywt.
    """
    x = jnp.asarray(x)
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    if n % 2 == 1:
        x = jnp.concatenate([x, x[-1:]], axis=0)
    even = x[0::2]
    odd = x[1::2]
    ca = (even + odd) * _INV_SQRT2
    cd = (even - odd) * _INV_SQRT2
    return jnp.moveaxis(ca, 0, axis), jnp.moveaxis(cd, 0, axis)


def haar_idwt(ca, cd, axis: int = 1) -> jax.Array:
    """Inverse single-level Haar DWT (exact for even-length originals)."""
    ca = jnp.moveaxis(jnp.asarray(ca), axis, 0)
    cd = jnp.moveaxis(jnp.asarray(cd), axis, 0)
    even = (ca + cd) * _INV_SQRT2
    odd = (ca - cd) * _INV_SQRT2
    out = jnp.stack([even, odd], axis=1).reshape((-1,) + ca.shape[1:])
    return jnp.moveaxis(out, 0, axis)
