"""Runtime helpers: compute-dtype auto resolution."""
from edsnet_tpu.utils.runtime import resolve_compute_dtype


def test_auto_resolves_by_backend():
    import jax
    expect = "bfloat16" if jax.default_backend() == "tpu" else "float32"
    assert resolve_compute_dtype("auto") == expect
    assert resolve_compute_dtype(None) == expect


def test_explicit_dtype_passes_through():
    assert resolve_compute_dtype("float32") == "float32"
    assert resolve_compute_dtype("bfloat16") == "bfloat16"
