"""Ring attention (shard_map + ppermute KV rotation) vs full attention on
the virtual 8-device mesh."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.models.attention import attention
from wanq_tpu.parallel import make_mesh
from wanq_tpu.parallel.ring import ring_attention


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    shape = (2, 64, 4, 32)  # B, S, H, D — S divisible by 8
    return tuple(jnp.asarray(rng.normal(size=shape).astype(np.float32)) for _ in range(3))


@pytest.mark.parametrize("ring", [2, 4, 8])
def test_ring_matches_full_attention(qkv, ring):
    q, k, v = qkv
    mesh = make_mesh(1, 1, 1, ring)
    got = np.asarray(ring_attention(q, k, v, mesh, axis="ring"))
    want = np.asarray(attention(q, k, v, force_reference=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ring_with_kv_mask(qkv):
    q, k, v = qkv
    mesh = make_mesh(1, 1, 1, 4)
    got = np.asarray(ring_attention(q, k, v, mesh, k_valid_len=40))
    want = np.asarray(attention(q, k, v, k_valid_len=40, force_reference=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_ring_under_jit(qkv):
    q, k, v = qkv
    mesh = make_mesh(1, 1, 1, 8)
    f = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))
    got = np.asarray(f(q, k, v))
    want = np.asarray(attention(q, k, v, force_reference=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_hybrid_ulysses_ring_spec(qkv):
    """Heads over 'sp' × seq over 'ring' — the xfuser hybrid layout
    (xdit_context_parallel.py:179-184) via qkv_spec."""
    from jax.sharding import PartitionSpec as P

    q, k, v = qkv
    mesh = make_mesh(1, 1, 2, 2)
    spec = P("dp", "ring", "sp", None)
    got = np.asarray(
        ring_attention(q, k, v, mesh, axis="ring", qkv_spec=spec,
                       k_valid_len=40)
    )
    want = np.asarray(attention(q, k, v, k_valid_len=40, force_reference=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)
