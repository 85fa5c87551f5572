"""Fused elementwise kernels (TPU-native equivalents of kernels/csrc/fused/
fused.cu:31-961 — QuantKernel, GeluQuantFuse, LayernormT2iQuantFuse,
GateResidualQuantFuse — and their host wrappers quant_sum :524,
gelu_quant_sum :647, layernorm_nobias_t2i_quant_sum_fuse :485-916,
gate_residual_fuse :917).

Each op produces the int8 activation plus the per-token (scale, sum_input)
pair the int8 GEMM epilogue consumes, in one VMEM pass — no fp16
intermediate round-trips through HBM. A jnp reference implementation of
each op backs the Pallas kernel in tests and on CPU.

gate_residual (gate·y + x) is left to XLA fusion — it is pure elementwise
on the residual stream and XLA fuses it into neighbors; the reference
needed a kernel only because its epilogue wrote fp16 + quant in one pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-6


# ---------------------------------------------------------------------------
# jnp references
# ---------------------------------------------------------------------------


def _quant_rows(y: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Per-row symmetric int8 quant + scaled int sum (fused.cu QuantKernel:
    scale = absmax/127, sum_input = scale * Σ q)."""
    absmax = jnp.max(jnp.abs(y), axis=-1)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    q = jnp.clip(jnp.round(y / scale[..., None]), -128, 127).astype(jnp.int8)
    ssum = scale * jnp.sum(q.astype(jnp.float32), axis=-1)
    return q, scale, ssum


def quant_sum_xla(x: jax.Array, channel_scale=None):
    """ref host wrapper quant_sum (fused.cu:524). x: [M, C] → (q, s, sum).
    ``channel_scale`` optionally folds a SmoothQuant per-channel mask in."""
    y = x.astype(jnp.float32)
    if channel_scale is not None:
        y = y * channel_scale[None, :]
    return _quant_rows(y)


def gelu_quant_sum_xla(x: jax.Array, channel_scale=None):
    """tanh-GELU then quant (ref GeluQuantFuse, fused.cu:135 / host :647)."""
    y = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
    if channel_scale is not None:
        y = y * channel_scale[None, :]
    return _quant_rows(y)


def ln_modulate_quant_xla(x, shift, scale_mod, eps: float = 1e-6,
                          channel_scale=None):
    """LayerNorm (no affine) + DiT adaLN modulate + per-token quant + sum
    (ref LayernormT2iQuantFuse, fused.cu:235-300).

    x: [B, N, C]; shift/scale_mod: [B, C]. Returns (q [B,N,C] int8,
    scale [B,N], sum [B,N])."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = ln * (1.0 + scale_mod[:, None, :]) + shift[:, None, :]
    if channel_scale is not None:
        y = y * channel_scale[None, None, :]
    return _quant_rows(y)


def ln_modulate_quant_static(x, shift, scale_mod, delta_a, eps: float = 1e-6):
    """LN + modulate + STATIC-scale per-tensor quant (the producer-side
    analog of the reference's quant_sum_static, fused.cu:586): no absmax
    pass — the quant is elementwise with a calibration-frozen scale, so
    XLA folds it into the modulate fusion. Returns the same (q, scale,
    sum) triple as ln_modulate_quant with scale broadcast per token."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    ln = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = ln * (1.0 + scale_mod[:, None, :]) + shift[:, None, :]
    s = delta_a.astype(jnp.float32).reshape(())
    q = jnp.clip(jnp.round(y / s), -128, 127).astype(jnp.int8)
    b, n = q.shape[:2]
    scale = jnp.full((b, n), s, jnp.float32)
    ssum = scale * jnp.sum(q.astype(jnp.float32), axis=-1)
    return q, scale, ssum


def gate_residual(x: jax.Array, y: jax.Array, gate: jax.Array) -> jax.Array:
    """x + y * gate in f32 (ref GateResidualQuantFuse, fused.cu:383-483;
    on TPU a pure-XLA fusion)."""
    return x.astype(jnp.float32) + y.astype(jnp.float32) * gate.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _quant_sum_kernel(x_ref, q_ref, s_ref, sum_ref, *, gelu: bool):
    x = x_ref[:].astype(jnp.float32)
    if gelu:
        x = jax.nn.gelu(x, approximate=True)
    absmax = jnp.max(jnp.abs(x), axis=-1)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    q = jnp.clip(jnp.round(x / scale[:, None]), -128, 127)
    q_ref[:] = q.astype(jnp.int8)
    s_ref[0, :] = scale
    sum_ref[0, :] = scale * jnp.sum(q, axis=-1)


def _round_up(x, m):
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("gelu", "block_m", "interpret"))
def quant_sum_pallas(
    x: jax.Array, gelu: bool = False, block_m: int = 256, interpret: bool = False
):
    """Per-token int8 quant (+ optional fused tanh-GELU) as one Pallas pass.
    x: [M, C] → (q int8 [M,C], scale f32 [M], sum f32 [M])."""
    m, c = x.shape
    bm = min(block_m, _round_up(m, 8))
    m_pad = _round_up(m, bm)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm,)
    q, s, ssum = pl.pallas_call(
        functools.partial(_quant_sum_kernel, gelu=gelu),
        grid=grid,
        in_specs=[pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((bm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad, c), jnp.int8),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, m_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return q[:m], s[0, :m], ssum[0, :m]


def _ln_mod_quant_kernel(x_ref, shift_ref, scale_ref, q_ref, s_ref, sum_ref, *, eps):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)  # [bn, C]
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    ln = (x - mu) * jax.lax.rsqrt(var + eps)
    y = ln * (1.0 + scale_ref[b, :][None, :]) + shift_ref[b, :][None, :]
    absmax = jnp.max(jnp.abs(y), axis=-1)
    scale = jnp.maximum(absmax / 127.0, _EPS)
    q = jnp.clip(jnp.round(y / scale[:, None]), -128, 127)
    q_ref[0] = q.astype(jnp.int8)
    s_ref[0, 0, :] = scale
    sum_ref[0, 0, :] = scale * jnp.sum(q, axis=-1)


@functools.partial(jax.jit, static_argnames=("eps", "block_n", "interpret"))
def ln_modulate_quant_pallas(
    x: jax.Array,
    shift: jax.Array,
    scale_mod: jax.Array,
    eps: float = 1e-6,
    block_n: int = 256,
    interpret: bool = False,
):
    """Fused LN + adaLN modulate + per-token int8 quant + sum.
    x: [B, N, C]; shift/scale_mod: [B, C]. The analog of the reference's
    LayerNormGeneral module (nn/layernorm.py:31-55) feeding QuantParams."""
    b, n, c = x.shape
    bn = min(block_n, _round_up(n, 8))
    n_pad = _round_up(n, bn)
    if n_pad != n:
        x = jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))
    grid = (b, n_pad // bn)
    q, s, ssum = pl.pallas_call(
        functools.partial(_ln_mod_quant_kernel, eps=eps),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            # full [B, C] resident in VMEM; row-indexed by program_id inside
            # (a (1, C) block would violate the (8, 128) tiling rule)
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, bn, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bn), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad, c), jnp.int8),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x, shift, scale_mod)
    return q[:, :n], s[:, 0, :n], ssum[:, 0, :n]


def quant_sum(x: jax.Array, gelu: bool = False, channel_scale=None):
    """Dispatch. XLA fuses absmax+round+sum into one pass well; the Pallas
    variants exist for explicit control (interpret-tested)."""
    return (gelu_quant_sum_xla(x, channel_scale) if gelu
            else quant_sum_xla(x, channel_scale))


def ln_modulate_quant(x, shift, scale_mod, eps: float = 1e-6,
                      channel_scale=None):
    import os

    # the single-pass Pallas producer beats XLA's split amax+quant passes
    # in-graph (3.187 -> 3.164 s/step at the bench config); SmoothQuant's
    # channel mask and non-TPU backends keep the XLA form
    if (
        channel_scale is None
        and jax.default_backend() == "tpu"
        and os.environ.get("WANQ_PALLAS_PRODUCERS", "1") != "0"
    ):
        return ln_modulate_quant_pallas(x, shift, scale_mod, eps=eps)
    return ln_modulate_quant_xla(x, shift, scale_mod, eps=eps,
                                 channel_scale=channel_scale)
