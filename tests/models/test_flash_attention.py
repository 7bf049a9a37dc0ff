"""Flash-attention kernel vs the XLA oracle (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.kernels.flash_attention import (_attention_xla,
                                                flash_attention)


def _qkv(b=2, h=2, n=192, d=64, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
    return mk(), mk(), mk()


def _oracle(q, k, v, mask):
    b, h, n, d = q.shape
    if mask is None:
        mask = jnp.ones((b, n), bool)
    m = jnp.broadcast_to(mask[:, None, :], (b, h, n)).reshape(b * h, n)
    out = _attention_xla(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                         v.reshape(b * h, n, d), m)
    return out.reshape(b, h, n, d)


def test_flash_matches_xla_unmasked():
    q, k, v = _qkv()
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, None)),
                               rtol=1e-5, atol=1e-5)


def test_flash_matches_xla_masked():
    q, k, v = _qkv(seed=1)
    n = q.shape[2]
    mask = jnp.asarray(np.arange(n)[None, :] <
                       np.asarray([150, 100])[:, None])
    out = flash_attention(q, k, v, mask, block_q=64, block_k=64)
    ref = _oracle(q, k, v, mask)
    # compare only real query rows (padded rows are garbage by design)
    np.testing.assert_allclose(np.asarray(out)[0, :, :150],
                               np.asarray(ref)[0, :, :150],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out)[1, :, :100],
                               np.asarray(ref)[1, :, :100],
                               rtol=1e-5, atol=1e-5)


def test_flash_non_multiple_length_padding():
    q, k, v = _qkv(n=100, seed=2)   # not a multiple of 64
    out = flash_attention(q, k, v, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, None)),
                               rtol=1e-5, atol=1e-5)


def test_flash_gradients_flow():
    q, k, v = _qkv(b=1, h=1, n=64, d=64, seed=3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64)**2)

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_flash_backward_masked_multiblock():
    """Pallas dq/dk/dv kernels vs the XLA oracle: multiple q/k blocks,
    per-video key masks, loss restricted to real query rows."""
    q, k, v = _qkv(b=2, h=2, n=192, d=64, seed=4)
    n = q.shape[2]
    lens = np.asarray([150, 100])
    mask = jnp.asarray(np.arange(n)[None, :] < lens[:, None])
    row_w = jnp.asarray(
        (np.arange(n)[None, None, :, None] < lens[:, None, None, None])
        .astype(np.float32))

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, block_q=64, block_k=64)
        return jnp.sum((out * row_w) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum((_oracle(q, k, v, mask) * row_w) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name}")


def test_flash_backward_non_multiple_length():
    """Gradients through the internal pad+crop path (n=100 -> 128)."""
    q, k, v = _qkv(b=1, h=2, n=100, d=64, seed=6)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, block_q=64, block_k=64)**2)

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name}")


def test_attention_extractor_pallas_path_matches():
    from edsnet_tpu.models.attention import AttentionExtractor
    n, f = 128, 64
    x = jnp.asarray(np.random.RandomState(5).randn(1, n, f), jnp.float32)
    ref_mod = AttentionExtractor(4, f)
    flash_mod = AttentionExtractor(4, f, use_pallas=True, pallas_min_len=64)
    variables = ref_mod.init(jax.random.PRNGKey(0), x, None, True)
    out_ref = ref_mod.apply(variables, x, None, True)
    out_flash = flash_mod.apply(variables, x, None, True)
    np.testing.assert_allclose(np.asarray(out_flash), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("n,real", [(128, 96), (100, 77)])
def test_flash_backward_fully_masked_row(n, real):
    """A row whose mask is entirely False: the stored (m, l) pair keeps the
    backward's P equal to the oracle softmax's uniform 1/N (a collapsed
    logsumexp m + log(l) would round to m in f32 and inflate grads ~N x).
    n=100 exercises the time-axis pad: the uniform fallback must run over
    the REAL length (pad keys are mask-level -1), not n_pad."""
    q, k, v = _qkv(b=2, h=2, n=n, d=64, seed=5)
    mask = jnp.asarray(np.arange(n)[None, :] < np.asarray([real, 0])[:, None])

    out = flash_attention(q, k, v, mask, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, mask)),
                               rtol=1e-4, atol=1e-5)

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, mask, block_q=64, block_k=64)
        return jnp.sum(out ** 2)   # unmasked sum touches the dead row too

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, mask) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g1, g2, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4,
                                   err_msg=f"d{name}")


def test_flash_highest_precision_matches_oracle():
    """precision="highest" (the auto-default's kernel config) stays exact
    in interpret mode, forward and backward."""
    q, k, v = _qkv(n=160)
    mask = jnp.asarray(np.arange(160)[None, :] < np.array([160, 123])[:, None])
    out = flash_attention(q, k, v, mask, block_q=64, block_k=64,
                          precision="highest")
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_oracle(q, k, v, mask)),
                               rtol=1e-5, atol=1e-5)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, mask, block_q=64,
                                       block_k=64,
                                       precision="highest") ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_oracle(q, k, v, mask) ** 2)

    g1 = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_auto_default_routing():
    """Unset --use-pallas: attention routes deterministic N>=2048 through
    flash at 'highest' precision; --use-pallas lowers the threshold at
    'default' precision; --no-pallas disables."""
    from edsnet_tpu.models import base as base_mod

    import jax

    prev = base_mod._USE_PALLAS
    try:
        base_mod.set_use_pallas(None)
        m = base_mod.build_base_model("attention", 64, 4)
        # auto engages only on a real TPU backend (elsewhere the kernel
        # would run in the slow Pallas interpreter); the config it would
        # ship there is (N>=2048, highest precision)
        on_tpu = jax.default_backend() == "tpu"
        assert (m.use_pallas, m.pallas_min_len, m.pallas_precision) == \
            (on_tpu, 2048, "highest")

        base_mod.set_use_pallas(True)
        m = base_mod.build_base_model("attention", 64, 4)
        assert (m.use_pallas, m.pallas_min_len, m.pallas_precision) == \
            (True, 1024, "default")

        base_mod.set_use_pallas(False)
        m = base_mod.build_base_model("attention", 64, 4)
        assert m.use_pallas is False
    finally:
        base_mod.set_use_pallas(prev)


def test_cli_pallas_tristate():
    from edsnet_tpu.config import get_arguments
    assert get_arguments(["anchor-based"]).use_pallas is None
    assert get_arguments(["anchor-based", "--use-pallas"]).use_pallas is True
    assert get_arguments(["anchor-based", "--no-pallas"]).use_pallas is False
