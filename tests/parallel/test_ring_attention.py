"""Ring attention over the 8-virtual-device mesh == single-device oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edsnet_tpu.kernels.flash_attention import _attention_xla
from edsnet_tpu.parallel import make_mesh
from edsnet_tpu.parallel.ring_attention import ring_attention


def _oracle(q, k, v, mask):
    b, h, n, d = q.shape
    m = jnp.broadcast_to(mask[:, None, :], (b, h, n)).reshape(b * h, n)
    out = _attention_xla(q.reshape(b * h, n, d), k.reshape(b * h, n, d),
                         v.reshape(b * h, n, d), m.astype(jnp.int32))
    return out.reshape(b, h, n, d)


@pytest.mark.parametrize("masked", [False, True])
def test_ring_attention_matches_full(masked):
    mesh = make_mesh(8)
    b, h, n, d = 2, 2, 64, 16
    rng = np.random.RandomState(0)
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
               for _ in range(3))
    if masked:
        mask = jnp.asarray(np.arange(n)[None, :]
                           < np.asarray([50, 33])[:, None])
    else:
        mask = jnp.ones((b, n), bool)

    out = ring_attention(q, k, v, mask, mesh=mesh)
    ref = _oracle(q, k, v, mask)
    lens = [50, 33] if masked else [n, n]
    for i, ln in enumerate(lens):
        np.testing.assert_allclose(np.asarray(out)[i, :, :ln],
                                   np.asarray(ref)[i, :, :ln],
                                   rtol=1e-5, atol=1e-5)


def test_ring_attention_composes_dp_sp_tp():
    """One 3-D ('data','seq','model') mesh: batch sharded 2-way, sequence
    ring 2-way, heads (Megatron tp, parallel/tensor_parallel.py) 2-way —
    output == dense oracle and the only cross-device collective is the
    ring's collective-permute (no all-gather/all-reduce: the dp and tp
    axes never synchronize inside the ring)."""
    from jax.sharding import Mesh, NamedSharding

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(2, 2, 2),
                ("data", "seq", "model"))
    b, h, n, d = 2, 4, 64, 16
    rng = np.random.RandomState(2)
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
               for _ in range(3))
    mask = jnp.asarray(np.arange(n)[None, :]
                       < np.asarray([60, 41])[:, None])

    qkv_s = NamedSharding(mesh, jax.sharding.PartitionSpec(
        "data", "model", "seq", None))
    m_s = NamedSharding(mesh, jax.sharding.PartitionSpec("data", "seq"))
    fn = jax.jit(
        lambda q, k, v, m: ring_attention(
            q, k, v, m, mesh=mesh, axis_name="seq",
            batch_axis="data", head_axis="model"),
        in_shardings=(qkv_s, qkv_s, qkv_s, m_s))

    out = fn(jax.device_put(q, qkv_s), jax.device_put(k, qkv_s),
             jax.device_put(v, qkv_s), jax.device_put(mask, m_s))
    ref = _oracle(q, k, v, mask)
    for i, ln in enumerate([60, 41]):
        np.testing.assert_allclose(np.asarray(out)[i, :, :ln],
                                   np.asarray(ref)[i, :, :ln],
                                   rtol=1e-5, atol=1e-5)
    # every device holds a [B/2, H/2, N/2, D] block
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, 2, 32, 16)}, shard_shapes

    hlo = fn.lower(q, k, v, mask).compile().as_text()
    assert "collective-permute" in hlo
    for coll in ("all-gather", "all-reduce", "all-to-all"):
        assert coll not in hlo, f"unexpected {coll} in composed ring HLO"


def test_ring_attention_output_stays_sequence_sharded():
    mesh = make_mesh(8)
    b, h, n, d = 1, 2, 64, 16
    rng = np.random.RandomState(1)
    q, k, v = (jnp.asarray(rng.randn(b, h, n, d), jnp.float32)
               for _ in range(3))
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh=mesh))(
        q, k, v)
    # each device holds one N/8 slice of the sequence axis
    shard_shapes = {s.data.shape for s in out.addressable_shards}
    assert shard_shapes == {(1, 2, 8, 16)}, shard_shapes
