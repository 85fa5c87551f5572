"""Int8 GEMM with fused per-token × per-channel dequant epilogue.

TPU-native equivalent of the reference CUDA kernels
(kernels/csrc/qgemm/w8a8/w8a8_gemm_cuda.cu: GemmInt8SharedRegPipelineV2 with
its dequant epilogue, host wrappers w8a8_of16_bias_weight_asym/:624-705 and
_sym/:707). Epilogue ground truth (kernels/bench/bench_gemm.py:26-32):

    out = (A_int8 @ W_int8) · s_a[:,None] · s_w[None,:]
        + sum_a[:,None] · zp_w[None,:] · s_w[None,:]          (asym only)
        + bias

where sum_a = s_a · Σ_k A_int8[m, k] (the per-token scaled int sum produced
by the upstream quant kernels).

Two implementations:
  * ``w8a8_linear_xla`` — jnp int8 dot (MXU int8 path on v5e+) + epilogue;
    XLA fuses the elementwise epilogue into the GEMM consumer.
  * ``w8a8_linear_pallas`` — hand-tiled Pallas kernel with the epilogue in
    VMEM (no int32 round-trip through HBM).
``w8a8_linear`` dispatches; unlike the reference kernel (M%128==0, N%128,
K%64 hard asserts, w8a8_gemm_cuda.cu:680-682, worked around by host-side
token padding in quant_wanx_cuda.py:313-328) raggedness is handled here,
inside the wrapper.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _epilogue(acc_i32, s_a, s_w, sum_a, zp_w, bias, out_dtype=jnp.float32):
    # broadcast form serves both [M,N] and batched [..., M, N] accumulators
    # (s_a/sum_a carry the leading dims, s_w/zp_w/bias are per-column)
    out = acc_i32.astype(jnp.float32) * (s_a[..., None] * s_w)
    if zp_w is not None:
        out = out + sum_a[..., None] * (zp_w * s_w)
    if bias is not None:
        out = out + bias
    return out.astype(out_dtype)


def w8a8_linear_xla(
    a_int8: jax.Array,
    w_int8: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """a_int8 [..., K] @ w_int8 [K,N] with fused dequant. Returns [..., N].

    Leading activation dims pass through UNFLATTENED — under GSPMD a
    [B, S, K] → [B·S, K] reshape merging an unsharded batch dim with the
    token-sharded S dim cannot keep its sharding (minor-dim tiling) and
    forces a full-seq all-gather per GEMM (measured 334 GB/step on the 14B
    FFN intermediate alone, tools/comm_model.py)."""
    acc = jax.lax.dot_general(
        a_int8,
        w_int8,
        dimension_numbers=(((a_int8.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return _epilogue(acc, s_a.astype(jnp.float32), s_w.astype(jnp.float32),
                     None if sum_a is None else sum_a.astype(jnp.float32),
                     None if zp_w is None else zp_w.astype(jnp.float32),
                     bias, out_dtype)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _w8a8_kernel(a_ref, w_ref, sa_ref, sw_ref, suma_ref, zpw_ref, bias_ref,
                 out_ref, acc_ref, *, k_steps: int, asym: bool, has_bias: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == k_steps - 1)
    def _finish():
        s_a = sa_ref[0, :]  # [BM]
        s_w = sw_ref[0, :]  # [BN]
        out = acc_ref[:].astype(jnp.float32) * (s_a[:, None] * s_w[None, :])
        if asym:
            sum_a = suma_ref[0, :]
            zp_w = zpw_ref[0, :]
            out = out + sum_a[:, None] * (zp_w * s_w)[None, :]
        if has_bias:
            out = out + bias_ref[0, :][None, :]
        out_ref[:] = out


def _pick_block(dim: int, prefer: int) -> int:
    """Largest power-of-two-ish block ≤ prefer dividing dim (min 128)."""
    b = prefer
    while b > 128 and dim % b:
        b //= 2
    while dim % b:
        b //= 2
    return max(b, 128) if dim % 128 == 0 else b


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def w8a8_linear_pallas(
    a_int8: jax.Array,
    w_int8: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Tiled int8 MXU GEMM with the dequant epilogue fused in VMEM.

    Accepts any M (pads to the tile internally); K and N must be multiples
    of 128 (true for all Wan dims). Per-token/channel vectors ride as
    [1, M]/[1, N] rows so they lay out along lanes.
    """
    m, k = a_int8.shape
    k2, n = w_int8.shape
    assert k == k2
    asym = zp_w is not None
    has_bias = bias is not None

    bm = min(block_m, _round_up(m, 128))
    bn = _pick_block(n, block_n)
    bk = _pick_block(k, block_k)
    assert bk >= 128 and bn >= 128, f"K={k}/N={n} not tileable"
    m_pad = _round_up(m, bm)

    if m_pad != m:
        a_int8 = jnp.pad(a_int8, ((0, m_pad - m), (0, 0)))
        s_a = jnp.pad(s_a, (0, m_pad - m))
        if sum_a is not None:
            sum_a = jnp.pad(sum_a, (0, m_pad - m))

    s_a2 = s_a.astype(jnp.float32)[None, :]
    s_w2 = s_w.astype(jnp.float32)[None, :]
    sum_a2 = (sum_a.astype(jnp.float32)[None, :] if asym
              else jnp.zeros((1, m_pad), jnp.float32))
    zp_w2 = (zp_w.astype(jnp.float32)[None, :] if asym
             else jnp.zeros((1, n), jnp.float32))
    bias2 = (bias.astype(jnp.float32)[None, :] if has_bias
             else jnp.zeros((1, n), jnp.float32))

    grid = (m_pad // bm, n // bn, k // bk)

    out = pl.pallas_call(
        functools.partial(
            _w8a8_kernel, k_steps=grid[2], asym=asym, has_bias=has_bias
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k * n + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_int8, w_int8, s_a2, s_w2, sum_a2, zp_w2, bias2)
    return out[:m] if m_pad != m else out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# W4A8: 4-bit packed weights (two int4 per int8 byte along K), QServe-style
# (ref csrc/qgemm/w4a8/w4a8_per_channel_gemm_cuda_qserve.cu, decl
# gemm_cuda.h:24-30). The packed weight lives in HBM at 0.5x the int8 bytes;
# the unpack to int8 happens on-chip (in-VMEM in the Pallas kernel, fused
# into the consumer by XLA otherwise) before the int8 MXU dot.
# ---------------------------------------------------------------------------


def _unpack_int4_rows(packed):
    """[Kh, N] int8 → [2*Kh, N] int8 in [-8, 7]; row 2i = low nibble.

    Shift-free: Mosaic does not legalize int8 vector shifts (arith.shli),
    so the nibble split runs as exact f32 multiply/floor arithmetic
    (values are in ±128 — exactly representable)."""
    kh, n = packed.shape
    pf = packed.astype(jnp.float32)
    hi_f = jnp.floor(pf * 0.0625)          # arithmetic >> 4
    lo_u = pf - hi_f * 16.0                # low nibble in [0, 15]
    lo_f = jnp.where(lo_u >= 8.0, lo_u - 16.0, lo_u)
    lo = lo_f.astype(jnp.int8)
    hi = hi_f.astype(jnp.int8)
    return jnp.stack([lo, hi], axis=1).reshape(2 * kh, n)


def w4a8_linear_xla(
    a_int8: jax.Array,
    w_packed: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """a_int8 [M,K] @ unpack(w_packed [K//2,N]) with the same dequant
    epilogue as w8a8 (int4 values share the int8 MXU path)."""
    return w8a8_linear_xla(
        a_int8, _unpack_int4_rows(w_packed), s_a, s_w, sum_a, zp_w, bias,
        out_dtype,
    )


def _w4a8_kernel(a_ref, w_ref, sa_ref, sw_ref, suma_ref, zpw_ref, bias_ref,
                 out_ref, acc_ref, *, k_steps: int, asym: bool, has_bias: bool):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_int4_rows(w_ref[:])  # in-VMEM unpack prologue
    acc_ref[:] += jax.lax.dot_general(
        a_ref[:],
        w,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )

    @pl.when(k == k_steps - 1)
    def _finish():
        s_a = sa_ref[0, :]
        s_w = sw_ref[0, :]
        out = acc_ref[:].astype(jnp.float32) * (s_a[:, None] * s_w[None, :])
        if asym:
            out = out + suma_ref[0, :][:, None] * (zpw_ref[0, :] * s_w)[None, :]
        if has_bias:
            out = out + bias_ref[0, :][None, :]
        out_ref[:] = out


@functools.partial(
    jax.jit, static_argnames=("block_m", "block_n", "block_k", "interpret")
)
def w4a8_linear_pallas(
    a_int8: jax.Array,
    w_packed: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    block_m: int = 512,
    block_n: int = 1024,
    block_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Tiled W4A8 GEMM: packed int4 weight blocks ride HBM→VMEM at half the
    int8 bytes and unpack in VMEM right before the MXU dot."""
    m, k = a_int8.shape
    kh, n = w_packed.shape
    assert k == 2 * kh, (k, kh)
    asym = zp_w is not None
    has_bias = bias is not None

    bm = min(block_m, _round_up(m, 128))
    bn = _pick_block(n, block_n)
    bk = _pick_block(k, block_k)
    assert bk % 256 == 0, f"K tile {bk} must cover whole packed byte rows"
    m_pad = _round_up(m, bm)

    if m_pad != m:
        a_int8 = jnp.pad(a_int8, ((0, m_pad - m), (0, 0)))
        s_a = jnp.pad(s_a, (0, m_pad - m))
        if sum_a is not None:
            sum_a = jnp.pad(sum_a, (0, m_pad - m))

    s_a2 = s_a.astype(jnp.float32)[None, :]
    s_w2 = s_w.astype(jnp.float32)[None, :]
    sum_a2 = (sum_a.astype(jnp.float32)[None, :] if asym
              else jnp.zeros((1, m_pad), jnp.float32))
    zp_w2 = (zp_w.astype(jnp.float32)[None, :] if asym
             else jnp.zeros((1, n), jnp.float32))
    bias2 = (bias.astype(jnp.float32)[None, :] if has_bias
             else jnp.zeros((1, n), jnp.float32))

    grid = (m_pad // bm, n // bn, k // bk)

    out = pl.pallas_call(
        functools.partial(
            _w4a8_kernel, k_steps=grid[2], asym=asym, has_bias=has_bias
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j, kk: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k * n // 2 + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_int8, w_packed, s_a2, s_w2, sum_a2, zp_w2, bias2)
    return out[:m] if m_pad != m else out


def _pallas_flag_engaged(k: int, n: int, k_mult: int) -> bool:
    """True when WANQ_PALLAS_QGEMM=1 should route this GEMM to the hand
    kernel: TPU backend, tileable dims, and a SINGLE visible device — on a
    mesh the flatten-to-2D below would merge token-sharded leading dims
    and force a full-seq all-gather per GEMM (w8a8_linear_xla docstring),
    so the flag is deliberately inert there."""
    import os

    return (
        os.environ.get("WANQ_PALLAS_QGEMM") == "1"
        and jax.default_backend() == "tpu"
        and jax.device_count() == 1
        and k % k_mult == 0
        and n % 128 == 0
    )


def _flatten_for_pallas(kernel, a, w, s_a, s_w, sum_a, zp_w, bias,
                        out_dtype, **kernel_kw):
    """Run a 2D Pallas GEMM kernel on ND activations: flatten leading dims
    (per-token s_a/sum_a follow), reshape the output back."""
    k = a.shape[-1]
    lead = a.shape[:-1]
    out = kernel(
        a.reshape(-1, k), w, s_a.reshape(-1), s_w,
        None if sum_a is None else sum_a.reshape(-1),
        zp_w, bias, **kernel_kw,
    ).astype(out_dtype)
    return out.reshape(*lead, out.shape[-1])


def w4a8_linear(
    a_int8: jax.Array,
    w_packed: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Dispatch for packed-int4-weight GEMM (mirrors w8a8_linear, incl.
    the ND flatten-for-Pallas single-chip tuning route)."""
    if _pallas_flag_engaged(a_int8.shape[-1], w_packed.shape[1], k_mult=256):
        return _flatten_for_pallas(
            w4a8_linear_pallas, a_int8, w_packed, s_a, s_w, sum_a, zp_w,
            bias, out_dtype,
        )
    return w4a8_linear_xla(a_int8, w_packed, s_a, s_w, sum_a, zp_w, bias,
                           out_dtype)


# ---------------------------------------------------------------------------
# W4A4 (Atom-style, ref csrc/qgemm/w4a4/atom.cu): int4 weight AND int4
# activation, group-quantized along K (GROUP_SIZE 128) with one scale per
# (row, group) / (group, col). Per-group scales cannot fold into a single
# epilogue, so accumulation interleaves: for each K-group,
#   acc += (A_g @ W_g) * s_a[:, g] ⊗ s_w[g, :]
# The Pallas kernel unpacks the packed int4 weight in VMEM and applies the
# group scaling in the f32 accumulator; int4 values ride the int8 MXU.
# ---------------------------------------------------------------------------


def w4a4_linear_xla(
    a_int4: jax.Array,
    w_packed: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    bias: Optional[jax.Array] = None,
    group: int = 128,
    out_dtype=jnp.float32,
) -> jax.Array:
    """a_int4 [M,K] (int8 containers) @ unpack(w_packed [K//2,N]) with
    per-group dequant. s_a: [M, K//group]; s_w: [K//group, N]."""
    m, k = a_int4.shape
    n = w_packed.shape[1]
    g = k // group
    w = _unpack_int4_rows(w_packed)
    a3 = a_int4.reshape(m, g, group)
    w3 = w.reshape(g, group, n)
    # per-group int32 partial products, scaled and summed in f32
    acc = jnp.zeros((m, n), jnp.float32)
    for i in range(g):
        p = jax.lax.dot_general(
            a3[:, i], w3[i],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc = acc + p.astype(jnp.float32) * (
            s_a[:, i][:, None] * s_w[i][None, :]
        )
    if bias is not None:
        acc = acc + bias[None, :]
    return acc.astype(out_dtype)


def _w4a4_kernel(a_ref, w_ref, sa_ref, sw_ref, bias_ref, out_ref, acc_ref,
                 *, k_steps: int, groups_per_block: int, group: int,
                 has_bias: bool):
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _zero():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w = _unpack_int4_rows(w_ref[:])  # [bk, bn] int8
    a = a_ref[:]                     # [bm, bk] int8
    for gi in range(groups_per_block):
        p = jax.lax.dot_general(
            a[:, gi * group:(gi + 1) * group],
            w[gi * group:(gi + 1) * group, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        # scales live as full [G, M]/[G, N] arrays in VMEM (G is small);
        # row indexed by the global group id
        gid = kk * groups_per_block + gi
        acc_ref[:] += p.astype(jnp.float32) * (
            sa_ref[gid, :][:, None] * sw_ref[gid, :][None, :]
        )

    @pl.when(kk == k_steps - 1)
    def _finish():
        out = acc_ref[:]
        if has_bias:
            out = out + bias_ref[0, :][None, :]
        out_ref[:] = out


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_k", "interpret"),
)
def w4a4_linear_pallas(
    a_int4: jax.Array,
    w_packed: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    bias: Optional[jax.Array] = None,
    group: int = 128,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Tiled Atom-style W4A4 GEMM. K tiles cover whole groups; the per-
    (row, group) × (group, col) scaling happens in the f32 accumulator."""
    m, k = a_int4.shape
    kh, n = w_packed.shape
    assert k == 2 * kh, (k, kh)
    assert k % group == 0
    has_bias = bias is not None

    bm = min(block_m, _round_up(m, 128))
    bn = _pick_block(n, block_n)
    bk = _pick_block(k, block_k)
    assert bk % (2 * group) == 0 or bk == k, (bk, group)
    gpb = bk // group
    m_pad = _round_up(m, bm)
    g = k // group

    if m_pad != m:
        a_int4 = jnp.pad(a_int4, ((0, m_pad - m), (0, 0)))
        s_a = jnp.pad(s_a, ((0, m_pad - m), (0, 0)))

    # scales ride group-major so one K-tile sees contiguous [gpb] rows
    s_a_t = s_a.astype(jnp.float32).T  # [G, M]
    s_w_f = s_w.astype(jnp.float32)    # [G, N]
    bias2 = (bias.astype(jnp.float32)[None, :] if has_bias
             else jnp.zeros((1, n), jnp.float32))

    grid = (m_pad // bm, n // bn, k // bk)

    out = pl.pallas_call(
        functools.partial(
            _w4a4_kernel, k_steps=grid[2], groups_per_block=gpb,
            group=group, has_bias=has_bias,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // 2, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
            # all G group-scale rows stay resident (G ≤ ~70; block covers
            # the full group dim so the (8,128) tiling rule is satisfied)
            pl.BlockSpec((g, bm), lambda i, j, kk: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, bn), lambda i, j, kk: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n * k,
            bytes_accessed=m_pad * k + k * n // 2 + m_pad * n * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a_int4, w_packed, s_a_t, s_w_f, bias2)
    return out[:m] if m_pad != m else out


def w4a4_linear(
    a: jax.Array,
    w_packed: jax.Array,
    s_w: jax.Array,
    bias: Optional[jax.Array] = None,
    group: int = 128,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Full W4A4 linear from an FP activation: dynamic per-(token, group)
    int4 act quant + Atom GEMM. a: [M, K] float."""
    from wanq_tpu.quant.quantizers import act_group_int4_quant

    q, s_a = act_group_int4_quant(a, group)
    if _pallas_flag_engaged(q.shape[1], w_packed.shape[1], k_mult=256):
        return w4a4_linear_pallas(q, w_packed, s_a, s_w, bias,
                                  group=group).astype(out_dtype)
    return w4a4_linear_xla(q, w_packed, s_a, s_w, bias, group=group,
                           out_dtype=out_dtype)


def w8a8_linear(
    a_int8: jax.Array,
    w_int8: jax.Array,
    s_a: jax.Array,
    s_w: jax.Array,
    sum_a: Optional[jax.Array] = None,
    zp_w: Optional[jax.Array] = None,
    bias: Optional[jax.Array] = None,
    out_dtype=jnp.float32,
) -> jax.Array:
    """Dispatch. Default is the XLA int8-dot path: on v5e it hits the MXU
    int8 units and XLA fuses the dequant epilogue, measured on-par with the
    hand kernel while compiling ~30x faster (remote Mosaic compiles run
    ~80s/shape on relayed backends). WANQ_PALLAS_QGEMM=1 forces the Pallas
    kernel (kept for tuning headroom). ND activations are flattened to 2D
    for the kernel and reshaped back — a single-chip tuning knob: the
    flatten merges leading dims, which under GSPMD would break token
    shardings (see w8a8_linear_xla docstring), so the flag is ignored
    when more than one device is visible."""
    if _pallas_flag_engaged(a_int8.shape[-1], w_int8.shape[1], k_mult=128):
        return _flatten_for_pallas(
            w8a8_linear_pallas, a_int8, w_int8, s_a, s_w, sum_a, zp_w,
            bias, out_dtype,
        )
    return w8a8_linear_xla(a_int8, w_int8, s_a, s_w, sum_a, zp_w, bias,
                           out_dtype)
