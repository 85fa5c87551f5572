"""Fused RMSNorm → 3D-RoPE → head-split Pallas kernel for the q/k path.

Profile-driven (tools/profile_step.py): after the int8 q/k projections the
XLA path runs rms_norm, a [B,S,ND]→[B,S,N,D] reshape, the rope fusion, and
the head-major transpose for the splash kernel as SEPARATE passes with an
f32 intermediate pinned across the reshape — ~3.8 ms/block/tensor of pure
HBM traffic at 1.3B shapes (two 44.5 ms reshapes + 2×53 ms rope fusions +
copies per step). This kernel does the whole chain in ONE pass: read the
projection output tile once, normalize over the model dim (the reference's
WanRMSNorm over dim, model.py:73-89), apply the layout-friendly rope form
x·ca + (x@P)·sb per head (models/rope.py), and write bf16 head-major
[B, N, S, D] — the exact layout the splash kernel consumes.

Tables (ca, sb) must be pre-padded to the padded seq_len (identity beyond
valid_len) and pre-scaled (softmax scale folds into q's tables) — the same
caller contract as rope_apply_interleaved.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from wanq_tpu.models.rope import pairswap_matrix


def _kernel(x_ref, w_ref, ca_ref, sb_ref, p_ref, o_ref, *, num_heads: int,
            head_dim: int, eps: float, mid_dtype):
    xf = x_ref[0].astype(jnp.float32)  # [TS, N*D]
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(ms + eps) * w_ref[0].astype(jnp.float32)[None, :]
    # round at the norm boundary exactly like the unfused chain
    # (rms_norm returns x.dtype; rope recomputes f32) — bit-parity
    xn = xn.astype(mid_dtype).astype(jnp.float32)
    ca = ca_ref[:].astype(jnp.float32)  # [TS, D]
    sb = sb_ref[:].astype(jnp.float32)
    p = p_ref[:].astype(jnp.float32)  # [D, D] pair-swap permutation
    for h in range(num_heads):
        xh = xn[:, h * head_dim:(h + 1) * head_dim]
        y = xh * ca + jnp.dot(xh, p, preferred_element_type=jnp.float32) * sb
        o_ref[0, h] = y.astype(o_ref.dtype)


def _seq_tile(s: int, nd: int = 0, x_itemsize: int = 2) -> int:
    """Largest seq tile dividing s whose VMEM footprint fits the 16 MB
    scoped budget: the kernels hold the x tile (x_itemsize B/elem), an
    f32 normalized copy, and the bf16 head-major output, plus ~35% Mosaic
    stack slack. At 1.3B dims (nd=1536, bf16) this picks 512; at 14B dims
    (nd=5120) 128 — measured 17.95 MB at ts=256/f32 (over budget)."""
    budget_bytes = 10_000_000
    per_elem = x_itemsize + 6
    for ts in (512, 256, 128, 64, 32, 16, 8):
        if s % ts == 0 and (nd == 0 or ts * nd * per_elem <= budget_bytes):
            return ts
    return s


def rms_rope_heads(
    x: jax.Array,
    w: jax.Array,
    ca: jax.Array,
    sb: jax.Array,
    num_heads: int,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """x [B, S, N*D], w [N*D], ca/sb [S, D] → [B, N, S, D] (out_dtype).

    Semantics == rms_norm(x, w) → reshape [B,S,N,D] →
    rope_apply_interleaved (tables pre-padded/pre-scaled) → swapaxes(1,2),
    in one HBM pass."""
    b, s, nd = x.shape
    d = nd // num_heads
    assert ca.shape == (s, d) and sb.shape == (s, d), (ca.shape, s, d)
    ts = _seq_tile(s, nd, x.dtype.itemsize)
    p = jnp.asarray(pairswap_matrix(d))

    grid = (b, s // ts)
    kernel = functools.partial(
        _kernel, num_heads=num_heads, head_dim=d, eps=eps, mid_dtype=x.dtype
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ts, nd), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, nd), lambda bi, si: (0, 0)),
            pl.BlockSpec((ts, d), lambda bi, si: (si, 0)),
            pl.BlockSpec((ts, d), lambda bi, si: (si, 0)),
            pl.BlockSpec((d, d), lambda bi, si: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_heads, ts, d), lambda bi, si: (bi, 0, si, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), out_dtype),
        interpret=interpret,
    )(x, w.reshape(1, nd), ca, sb, p)


def _split_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int):
    x = x_ref[0]
    for h in range(num_heads):
        o_ref[0, h] = x[:, h * head_dim:(h + 1) * head_dim].astype(o_ref.dtype)


def split_heads(
    x: jax.Array,
    num_heads: int,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """x [B, S, N*D] → [B, N, S, D] in one pass (the v-side head-split;
    XLA lowers the equivalent reshape+transpose as a reshape + relayout
    copy — two passes, ~43 ms/step at 1.3B shapes)."""
    b, s, nd = x.shape
    d = nd // num_heads
    ts = _seq_tile(s, nd, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_split_kernel, num_heads=num_heads, head_dim=d),
        grid=(b, s // ts),
        in_specs=[pl.BlockSpec((1, ts, nd), lambda bi, si: (bi, si, 0))],
        out_specs=pl.BlockSpec(
            (1, num_heads, ts, d), lambda bi, si: (bi, 0, si, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), out_dtype),
        interpret=interpret,
    )(x)


def _rms_split_kernel(x_ref, w_ref, o_ref, *, num_heads: int,
                      head_dim: int, eps: float):
    xf = x_ref[0].astype(jnp.float32)
    ms = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xn = xf * jax.lax.rsqrt(ms + eps) * w_ref[0].astype(jnp.float32)[None, :]
    for h in range(num_heads):
        o_ref[0, h] = xn[:, h * head_dim:(h + 1) * head_dim].astype(o_ref.dtype)


def rms_split_heads(
    x: jax.Array,
    w: jax.Array,
    num_heads: int,
    eps: float = 1e-6,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """x [B, S, N*D], w [N*D] → rms_norm over the model dim, then
    head-split to [B, N, S, D], in one HBM pass (the cross-attention q
    path: norm + head-split as separate XLA passes cost ~63 ms/step at
    1.3B shapes — an f32 normalize write plus a relayout)."""
    b, s, nd = x.shape
    d = nd // num_heads
    ts = _seq_tile(s, nd, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(
            _rms_split_kernel, num_heads=num_heads, head_dim=d, eps=eps),
        grid=(b, s // ts),
        in_specs=[
            pl.BlockSpec((1, ts, nd), lambda bi, si: (bi, si, 0)),
            pl.BlockSpec((1, nd), lambda bi, si: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, num_heads, ts, d), lambda bi, si: (bi, 0, si, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, num_heads, s, d), out_dtype),
        interpret=interpret,
    )(x, w.reshape(1, nd))


def _merge_kernel(x_ref, o_ref, *, num_heads: int, head_dim: int):
    for h in range(num_heads):
        o_ref[0, :, h * head_dim:(h + 1) * head_dim] = (
            x_ref[0, h].astype(o_ref.dtype))


def merge_heads(
    x: jax.Array,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """x [B, N, S, D] → [B, S, N*D] in one pass (the attention-output
    head-merge; the swapaxes+reshape form costs a full relayout copy,
    ~18 ms/step per site at 1.3B shapes)."""
    b, n, s, d = x.shape
    ts = _seq_tile(s, n * d, x.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_merge_kernel, num_heads=n, head_dim=d),
        grid=(b, s // ts),
        in_specs=[
            pl.BlockSpec((1, n, ts, d), lambda bi, si: (bi, 0, si, 0))
        ],
        out_specs=pl.BlockSpec((1, ts, n * d), lambda bi, si: (bi, si, 0)),
        out_shape=jax.ShapeDtypeStruct((b, s, n * d), out_dtype),
        interpret=interpret,
    )(x)


def rms_rope_heads_reference(
    x: jax.Array, w: jax.Array, ca: jax.Array, sb: jax.Array,
    num_heads: int, eps: float = 1e-6, out_dtype=jnp.bfloat16,
) -> jax.Array:
    """The unfused chain (for parity tests and non-TPU backends)."""
    from wanq_tpu.models.dit import rms_norm
    from wanq_tpu.models.rope import rope_apply_interleaved

    b, s, nd = x.shape
    d = nd // num_heads
    xn = rms_norm(x, w, eps)
    xh = xn.reshape(b, s, num_heads, d)
    # tables already padded/scaled: valid_len == s
    y = rope_apply_interleaved(xh, ca, sb, s)
    return jnp.swapaxes(y, 1, 2).astype(out_dtype)
