"""Hadamard / QuaRot rotation utilities.

TPU-native redesign of ViDiT-Q/quant_utils/qdiff/quarot/quarot_utils.py
(get_hadK :100-154, matmul_hadU :158-179, random_hadamard_matrix :186-192).

Two deliberate deviations from the reference, both documented in SURVEY.md §7:

1. The reference hard-codes ~95k lines of Hadamard matrix literals
   (get_had12..get_had172). We *construct* the non-power-of-two base
   matrices with the Paley type-I construction (order q+1 for prime
   q ≡ 3 mod 4), which covers every base order the Wan2.1 dims need:
   1536 = 12·128, 5120 = 20·256, 8960 = 140·64, 13824 = 108·128.
   Any Hadamard base gives a mathematically equivalent randomized rotation
   (orthonormality is what QuaRot relies on), so scale-dict parity is
   preserved at the formula level.

2. The reference does rotations in float64 on GPU; TPUs have no f64 units,
   so the offline (weight-side) rotation is done on host in numpy float64
   and the online (activation-side) rotation runs in float32 on the MXU.
   The rotation matrix is orthonormal, so the f32 error is benign
   (validated in tests/test_hadamard.py).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def is_pow2(n: int) -> bool:
    return n > 0 and (n & (n - 1)) == 0


def _is_prime(n: int) -> bool:
    if n < 2:
        return False
    if n % 2 == 0:
        return n == 2
    f = 3
    while f * f <= n:
        if n % f == 0:
            return False
        f += 2
    return True


@functools.lru_cache(maxsize=None)
def paley_hadamard(order: int) -> np.ndarray:
    """Hadamard matrix of the given order via the Paley type-I construction.

    Requires q = order - 1 to be a prime with q ≡ 3 (mod 4). Returns an
    int8 ±1 matrix H with H @ H.T == order * I.
    """
    q = order - 1
    if not (_is_prime(q) and q % 4 == 3):
        raise ValueError(
            f"Paley-I construction needs order-1 prime ≡ 3 (mod 4); got order={order}"
        )
    # quadratic-residue character chi(x): +1 if x is a nonzero QR mod q,
    # -1 if a non-residue, 0 if x == 0.
    residues = {(i * i) % q for i in range(1, q)}
    chi = np.zeros(q, dtype=np.int8)
    for x in range(1, q):
        chi[x] = 1 if x in residues else -1
    # Jacobsthal matrix Q[i, j] = chi(i - j)
    idx = (np.arange(q)[:, None] - np.arange(q)[None, :]) % q
    Q = chi[idx]
    # H = S + I with skew S = [[0, 1...1], [-1...-1, Q]]: core is Q + I.
    H = np.ones((order, order), dtype=np.int8)
    H[1:, 0] = -1
    H[1:, 1:] = Q + np.eye(q, dtype=np.int8)
    assert np.array_equal(H @ H.T.astype(np.int64), order * np.eye(order, dtype=np.int64))
    return H


@functools.lru_cache(maxsize=None)
def get_hadK(n: int) -> Tuple[Optional[np.ndarray], int]:
    """Decompose n = K · 2^m and return (had_K or None, K).

    Mirrors the role of the reference get_hadK (quarot_utils.py:100-154) but
    derives K from n's odd part instead of a fixed lookup: K = odd(n) · 2^j
    for the smallest j ≥ 2 such that K is Paley-I constructible (K=1 when n
    is a power of two).
    """
    if is_pow2(n):
        return None, 1
    odd = n
    while odd % 2 == 0:
        odd //= 2
    k = odd * 4  # Hadamard orders > 2 are multiples of 4
    while k <= n:
        q = k - 1
        if _is_prime(q) and q % 4 == 3:
            return paley_hadamard(k), k
        k *= 2
    raise ValueError(
        f"no Paley-I constructible Hadamard base found for n={n} (odd part {odd})"
    )


def matmul_hadU(x: jax.Array) -> jax.Array:
    """x @ H_n / sqrt(n) over the last axis, for n = K · 2^m.

    Same butterfly-then-base algorithm as the reference matmul_hadU
    (quarot_utils.py:158-179): fast Walsh–Hadamard butterflies collapse the
    2^m factor, then the K×K base matrix is applied blockwise.
    Pure jnp — jit/Pallas-free (XLA fuses the butterflies well; the final
    base-matmul rides the MXU).
    """
    n = x.shape[-1]
    hadK, K = get_hadK(n)
    orig_shape = x.shape
    inp = x.reshape(-1, n, 1)
    L = n
    while L > K:
        inp = inp.reshape(inp.shape[0], L // 2, 2, inp.shape[-1])
        a = inp[:, :, 0, :]
        b = inp[:, :, 1, :]
        inp = jnp.stack([a + b, a - b], axis=2)
        inp = inp.reshape(inp.shape[0], L // 2, -1)
        L //= 2
        inp = inp.reshape(inp.shape[0], L, -1)
    if K > 1:
        base = jnp.asarray(hadK, dtype=inp.dtype)
        inp = jnp.einsum("kj,bjr->bkr", base, inp)
    return (inp.reshape(orig_shape) / math.sqrt(n)).astype(x.dtype)


def matmul_hadU_np(x: np.ndarray) -> np.ndarray:
    """Host/float64 version of matmul_hadU for offline weight rotation.

    Uses the native C++ butterfly (wanq_tpu/native) when the toolchain is
    available — allocation-free in-place stages vs a numpy temp per stage —
    with a numpy fallback."""
    n = x.shape[-1]
    hadK, K = get_hadK(n)
    orig_shape = x.shape

    from wanq_tpu import native

    flat = np.asarray(x, dtype=np.float64).reshape(-1, n)
    out = native.fwht_rows_f64(flat, K)
    if out is not None:
        inp = out.reshape(-1, K, n // K)
    else:
        inp = flat.reshape(-1, n, 1)
        L = n
        while L > K:
            inp = inp.reshape(inp.shape[0], L // 2, 2, inp.shape[-1])
            inp = np.stack([inp[:, :, 0, :] + inp[:, :, 1, :],
                            inp[:, :, 0, :] - inp[:, :, 1, :]], axis=2)
            L //= 2
            inp = inp.reshape(inp.shape[0], L, -1)
    if K > 1:
        inp = np.einsum("kj,bjr->bkr", hadK.astype(np.float64), inp)
    return inp.reshape(orig_shape) / math.sqrt(n)


def random_hadamard_matrix(size: int, seed: int) -> np.ndarray:
    """Randomized orthonormal Hadamard rotation Q = diag(±1) · H / sqrt(n).

    ref: quarot_utils.py:186-192 (QuIP#-style randomized Hadamard transform).
    Deterministic given ``seed`` — unlike the reference, which draws an
    unseeded random sign vector on every load (quant_model.py:145), we key
    the rotation so PTQ and inference provably share the same Q.
    Returned as float64 on host; cast to f32 before device use.
    """
    return matmul_hadU_np(np.diag(rotation_signs(size, seed)))


def derived_rotation_seed(size: int, seed: int = 0) -> int:
    """Per-dimension rotation seed (shared across layers of a dim, like the
    reference's 'same across layers' note, quant_model.py:172)."""
    return (seed * 1000003 + size) & 0x7FFFFFFF


def rotation_signs(size: int, seed: int) -> np.ndarray:
    """The ±1 diagonal of the randomized rotation for a given seed."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, size=size).astype(np.float64) * 2.0 - 1.0


def rotate_weight_fwht(w_in_out: np.ndarray, size_seed: int) -> np.ndarray:
    """Weight-side rotation Qᵀ·W via the fast Walsh–Hadamard transform.

    Q = diag(s)·Mᵀ (see random_hadamard_matrix), so Qᵀ W = M·diag(s)·W,
    which is the FWHT applied down each weight column — O(C_in·log C_in·
    C_out) instead of the dense O(C_in²·C_out) matmul (hours → seconds for
    the 14B ffn dims). f64 on host, matching the reference's rotation
    precision (quarot_quant_layer.py:41)."""
    n = w_in_out.shape[0]
    s = rotation_signs(n, size_seed)
    return matmul_hadU_np((s[:, None] * np.asarray(w_in_out, np.float64)).T).T


def rotation_for_dim(size: int, seed: int = 0) -> np.ndarray:
    """The per-in_features rotation used by QuaRot/ViDiT-Q layers.

    The reference shares one rotation across all layers of the same
    in_features (quant_model.py:172 'same across layers'); we key the seed by
    (global seed, size) for the same sharing semantics.
    """
    return random_hadamard_matrix(size, seed=derived_rotation_seed(size, seed))
