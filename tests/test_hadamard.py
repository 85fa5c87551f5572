"""Hadamard / QuaRot rotation tests.

Direct analog of the reference's numerical-equivalence probe
(qdiff/quarot/hadamard_utils/test_quarot.py:12-38): rotation invariance
x·wᵀ ≈ (xQ)(wQ)ᵀ, plus orthogonality of the Paley-constructed bases that
replace the reference's hard-coded matrix literals."""

import numpy as np
import jax.numpy as jnp
import pytest

from wanq_tpu.quant import hadamard as H

# every base order the Wan2.1 dims need + extras covered by Paley-I
PALEY_ORDERS = [4, 12, 20, 60, 108, 140]


@pytest.mark.parametrize("order", PALEY_ORDERS)
def test_paley_hadamard_is_hadamard(order):
    h = H.paley_hadamard(order).astype(np.int64)
    assert set(np.unique(h)) <= {-1, 1}
    np.testing.assert_array_equal(h @ h.T, order * np.eye(order, dtype=np.int64))


@pytest.mark.parametrize(
    "n,expected_k",
    [
        (1536, 12),   # Wan 1.3B dim   = 12·128
        (5120, 20),   # Wan 14B dim    = 20·256
        (8960, 140),  # Wan 1.3B ffn   = 140·64
        (13824, 108), # Wan 14B ffn    = 108·128
        (4096, 1),    # pow2 (t5 dim)
        (256, 1),
    ],
)
def test_get_hadK_wan_dims(n, expected_k):
    hadK, k = H.get_hadK(n)
    assert k == expected_k
    if k == 1:
        assert hadK is None
    else:
        assert hadK.shape == (k, k)


@pytest.mark.parametrize("n", [64, 96, 1536 // 4])
def test_matmul_hadU_orthonormal(rng, n):
    x = rng.normal(size=(5, n)).astype(np.float32)
    y = np.asarray(H.matmul_hadU(jnp.asarray(x)))
    # orthonormal transform preserves norms
    np.testing.assert_allclose(
        np.linalg.norm(y, axis=1), np.linalg.norm(x, axis=1), rtol=1e-4
    )
    # matches the host float64 path
    y64 = H.matmul_hadU_np(x)
    np.testing.assert_allclose(y, y64, rtol=1e-4, atol=1e-5)


def test_random_hadamard_matrix_orthogonal():
    q = H.random_hadamard_matrix(96, seed=7)
    np.testing.assert_allclose(q @ q.T, np.eye(96), atol=1e-10)
    # deterministic given seed
    q2 = H.random_hadamard_matrix(96, seed=7)
    np.testing.assert_array_equal(q, q2)
    q3 = H.random_hadamard_matrix(96, seed=8)
    assert not np.array_equal(q, q3)


@pytest.mark.parametrize("n", [96, 1536 // 8])
def test_rotation_invariance(rng, n):
    """x·wᵀ ≈ (xQ)(wQ)ᵀ — ref test_quarot.py:12-38."""
    x = rng.normal(size=(7, n))
    w = rng.normal(size=(13, n))
    q = H.random_hadamard_matrix(n, seed=3)
    lhs = x @ w.T
    rhs = (x @ q) @ (w @ q).T
    np.testing.assert_allclose(lhs, rhs, rtol=1e-8, atol=1e-8)


def test_rotation_invariance_f32_error_is_benign(rng):
    """The f64→f32 deviation documented in hadamard.py: rel error < 1e-5."""
    n = 384
    x = rng.normal(size=(4, n)).astype(np.float32)
    w = rng.normal(size=(8, n)).astype(np.float32)
    q32 = H.rotation_for_dim(n, seed=0).astype(np.float32)
    lhs = x @ w.T
    rhs = (x @ q32) @ (w @ q32).T
    rel = np.abs(rhs - lhs).max() / np.abs(lhs).max()
    assert rel < 1e-5


def test_rotation_shared_per_dim():
    assert np.array_equal(H.rotation_for_dim(96, 0), H.rotation_for_dim(96, 0))
    assert not np.array_equal(H.rotation_for_dim(96, 0), H.rotation_for_dim(96, 1))


def test_rotate_weight_fwht_matches_dense(rng):
    """FWHT weight rotation == dense Qᵀ·W (the O(n log n) PTQ fast path)."""
    n, m = 96, 24
    w = rng.normal(size=(n, m))
    seed = H.derived_rotation_seed(n, 0)
    q = H.rotation_for_dim(n, seed=0)
    want = q.T @ w
    got = H.rotate_weight_fwht(w, seed)
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_native_fwht_matches_numpy_fallback(rng, monkeypatch):
    """The C++ butterfly (wanq_tpu/native) and the numpy fallback are
    bit-equivalent paths through matmul_hadU_np."""
    from wanq_tpu import native

    x = rng.normal(size=(5, 96))
    with_native = H.matmul_hadU_np(x)
    monkeypatch.setattr(native, "fwht_rows_f64", lambda a, k: None)
    without = H.matmul_hadU_np(x)
    if native.get_lib() is None:
        pytest.skip("no C++ toolchain in this environment")
    np.testing.assert_allclose(with_native, without, atol=1e-12)


def test_native_fwht_direct(rng):
    from wanq_tpu import native

    if native.get_lib() is None:
        pytest.skip("no C++ toolchain in this environment")
    x = rng.normal(size=(3, 64))
    got = native.fwht_rows_f64(x, 1)
    # unnormalized Hadamard transform: H_64 @ row
    h = np.asarray(H.matmul_hadU_np(np.eye(64))) * np.sqrt(64)
    want = x @ h.T
    np.testing.assert_allclose(got, want, atol=1e-9)
