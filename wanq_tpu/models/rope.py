"""3D rotary position embedding for the Wan DiT.

TPU-native redesign of the reference rope (wan/modules/model.py:31-70):
the reference builds complex128 tensors and loops over samples in Python;
here the (f, h, w) rotation angles are precomputed once per grid as real
float32 cos/sin tables (static shapes, jit-friendly, batch-broadcast), and
application is a vectorized real-valued rotation on the MXU-adjacent VPU.

Numerics: reference uses float64 angle math on CPU at trace time — we
compute the tables in float64 on host (numpy) too, then store float32,
so table values match the reference to f32 rounding.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rope_freqs_1d(max_len: int, dim: int, theta: float = 10000.0) -> np.ndarray:
    """Angle table [max_len, dim//2] (ref rope_params, model.py:31-39)."""
    pos = np.arange(max_len, dtype=np.float64)
    inv = 1.0 / np.power(theta, np.arange(0, dim, 2, dtype=np.float64) / dim)
    return np.outer(pos, inv)  # angles, not complex


@functools.lru_cache(maxsize=8)
def rope_tables(
    grid: Tuple[int, int, int], head_dim: int, max_len: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) tables [seq_len, head_dim//2] for a (F, H, W) patch grid.

    Mirrors the reference's per-axis split (model.py:526-531 build and
    :47 apply-side split): with c = head_dim//2,
      f-axis gets c - 2*(c//3) freqs, h and w axes get c//3 each.
    """
    f, h, w = grid
    c = head_dim // 2
    parts = (c - 2 * (c // 3), c // 3, c // 3)
    ang_f = _rope_freqs_1d(max_len, 2 * parts[0])[:f]  # [f, c_f]
    ang_h = _rope_freqs_1d(max_len, 2 * parts[1])[:h]  # [h, c_h]
    ang_w = _rope_freqs_1d(max_len, 2 * parts[2])[:w]  # [w, c_w]

    ang = np.concatenate(
        [
            np.broadcast_to(ang_f[:, None, None, :], (f, h, w, parts[0])),
            np.broadcast_to(ang_h[None, :, None, :], (f, h, w, parts[1])),
            np.broadcast_to(ang_w[None, None, :, :], (f, h, w, parts[2])),
        ],
        axis=-1,
    ).reshape(f * h * w, c)
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def rope_apply(
    x: jax.Array, cos: jax.Array, sin: jax.Array, seq_offset: int = 0
) -> jax.Array:
    """Apply the rotation to x: [B, S, N, D] → [B, S, N, D] (float32).

    Adjacent feature pairs (2i, 2i+1) form the complex components, matching
    the reference's view_as_complex layout (model.py:55).
    ``seq_offset`` slices the tables for sequence-parallel shards (the
    reference's rank-offset RoPE, xdit_context_parallel.py:52-57).
    """
    b, s, n, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, s, n, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    cs = jax.lax.dynamic_slice_in_dim(cos, seq_offset, s, axis=0)[None, :, None, :]
    sn = jax.lax.dynamic_slice_in_dim(sin, seq_offset, s, axis=0)[None, :, None, :]
    o0 = x0 * cs - x1 * sn
    o1 = x0 * sn + x1 * cs
    return jnp.stack([o0, o1], axis=-1).reshape(b, s, n, d)


def rope_apply_padded(
    x: jax.Array, cos: jax.Array, sin: jax.Array, valid_len: int
) -> jax.Array:
    """Rotate the first ``valid_len`` tokens, pass the zero-padding tail
    through unchanged (ref model.py:66 keeps x[seq_len:] unrotated)."""
    b, s, n, d = x.shape
    if valid_len >= s:
        return rope_apply(x, cos, sin)
    # tables are defined for valid_len tokens; pad with identity rotation
    pad = s - valid_len
    cos_p = jnp.concatenate([cos[:valid_len], jnp.ones((pad, cos.shape[1]), cos.dtype)])
    sin_p = jnp.concatenate([sin[:valid_len], jnp.zeros((pad, sin.shape[1]), sin.dtype)])
    return rope_apply(x, cos_p, sin_p)


# ---------------------------------------------------------------------------
# layout-friendly formulation (the TPU hot path)
#
# The pair convention out[2i] = x[2i]·c − x[2i+1]·s, out[2i+1] = x[2i]·s +
# x[2i+1]·c is algebraically  out = x·ca + (x @ P)·sb  with interleaved
# tables ca[s,2i]=ca[s,2i+1]=cos, sb[s,2i]=−sin, sb[s,2i+1]=+sin and P the
# adjacent-pair-swap permutation. On TPU the reshape-into-[..,D/2,2] form
# forces tiny trailing dims and T(2,128) relayouts (profiled at ~10 ms per
# 1.3B block in pure data formatting); the ca/sb form is plain elementwise
# on [.., D] lanes plus one 128×128 MXU matmul — no layout churn.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def rope_tables_interleaved(
    grid: Tuple[int, int, int], head_dim: int, max_len: int = 1024
) -> Tuple[np.ndarray, np.ndarray]:
    """(ca, sb) tables [seq_len, head_dim] for the x·ca + (x@P)·sb form."""
    cos, sin = rope_tables(grid, head_dim, max_len)
    ca = np.repeat(cos, 2, axis=1)
    sb = np.repeat(sin, 2, axis=1)
    sb[:, 0::2] = -sb[:, 0::2]
    return ca, sb


@functools.lru_cache(maxsize=4)
def pairswap_matrix(d: int) -> np.ndarray:
    """Permutation matrix swapping adjacent feature pairs (2i <-> 2i+1)."""
    p = np.zeros((d, d), np.float32)
    idx = np.arange(d)
    p[idx, idx ^ 1] = 1.0
    return p


def _pairswap(x: jax.Array) -> jax.Array:
    """Swap adjacent features (2i <-> 2i+1) along the last axis.

    bf16 fast path: bitcast each feature pair into one uint32 lane and
    rotate it 16 bits — a pure VPU lane op, no matmul, no relayout.
    Other dtypes fall back to the permutation matmul."""
    d = x.shape[-1]
    # NOTE: a u32-bitcast+rotate formulation was tried and is EXACT but
    # lowers ~400 ms/step slower on v5e (the bitcast breaks elementwise
    # fusion and the u32 shifts serialize) — the permutation matmul stays.
    p = jnp.asarray(pairswap_matrix(d), x.dtype)
    return jnp.einsum("...d,de->...e", x, p,
                      preferred_element_type=x.dtype)


def rope_apply_interleaved(
    x: jax.Array, ca: jax.Array, sb: jax.Array, valid_len: int,
    scale: float = 1.0,
) -> jax.Array:
    """Layout-friendly rope on [B, S, N, D]; matches rope_apply_padded to
    f32 rounding. Tables from rope_tables_interleaved (f32); compute is
    f32 regardless of x dtype, output in x dtype.

    ``scale`` multiplies the rotated output (folds the attention softmax
    scale into the q-side tables — one fewer full-tensor pass). Applied to
    the identity padding tail too; padded rows carry no signal."""
    b, s, n, d = x.shape
    if valid_len < s:
        pad = s - valid_len
        ca = jnp.concatenate([ca[:valid_len], jnp.ones((pad, d), ca.dtype)])
        sb = jnp.concatenate([sb[:valid_len], jnp.zeros((pad, d), sb.dtype)])
    if scale != 1.0:
        ca = ca * scale
        sb = sb * scale
    swapped = _pairswap(x).astype(jnp.float32)
    xf = x.astype(jnp.float32)
    out = xf * ca[None, :, None, :] + swapped * sb[None, :, None, :]
    return out.astype(x.dtype)
