"""Pallas TPU kernels for the hot ops (with jnp reference fallbacks)."""
