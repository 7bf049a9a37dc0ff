"""Numeric / algorithmic kernels (pure jnp, jit-friendly) + host wrappers.

Replaces the reference's NumPy/ortools/pywt host layer
(`src/helpers/bbox_helper.py`, `src/helpers/vsumm_helper.py`,
`src/anchor_based/anchor_helper.py`, `src/anchor_free/anchor_free_helper.py`,
`src/kts/`) with jittable equivalents so train/eval steps are single XLA
programs.
"""

from edsnet_tpu.ops import anchor_free, anchors, bbox, dwt, knapsack, kts, losses, summary  # noqa: F401
