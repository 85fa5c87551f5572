"""Int8 flash attention — the hardware execution of ViDiT-Q attention
quantization on the TPU MXU.

The reference can only *simulate* attention quant (fake-quant + explicit
BMM, flash unsupported: quant_opensora.py:446 raises under flash_attn).
On TPU both attention matmuls can genuinely run on the int8 MXU path
(2x the bf16 rate on v5e+):

  QK^T   int8 q · int8 k with per-(head,token) scales folded into the
         f32 online-softmax (exact w.r.t. the quantized q/k — scales
         factor out of the matmul)
  PV     the unnormalized probs p = exp(s - m) ∈ (0, 1] are quantized to
         127 levels (the attn-map A8 quant, 'row' semantics with the row
         scale folded into the softmax denominator) and accumulated as
         int8 · int8; the per-(head,channel) v scales factor out and
         apply once at the end

Online-softmax bookkeeping (m, l, rescale) follows the standard flash
algorithm in f32. The denominator l uses the *unquantized* p, so the
attn-map quant error lands in the numerator only — matching the
reference's post-softmax fake-quant semantics up to normalization. The
probs quantize against the running block max rather than the global row
max (SageAttention-style), which shifts the quant grid by ≤ a few steps
vs the global-reference XLA implementation.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1e30
_EPS = 1e-6
P_LEVELS = 127.0  # attn-map quant levels (A8 sym)


# ---------------------------------------------------------------------------
# pre-quantization of q/k/v (ref QuantizedAttention q/k per token-head row,
# v per head-channel; quant_opensora.py:433-443)
# ---------------------------------------------------------------------------


def quantize_qkv_int8(
    q: jax.Array, k: jax.Array, v: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """q,k,v: [B, H, S, D] f32/bf16 → int8 values + scales
    (s_q, s_k: [B,H,S]; s_v: [B,H,D])."""

    def per_row(x):
        absmax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
        scale = jnp.maximum(absmax / 127.0, _EPS)
        xi = jnp.clip(
            jnp.round(x.astype(jnp.float32) / scale[..., None]), -127, 127
        ).astype(jnp.int8)
        return xi, scale

    qi, s_q = per_row(q)
    ki, s_k = per_row(k)
    absmax_v = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=2)  # [B,H,D]
    s_v = jnp.maximum(absmax_v / 127.0, _EPS)
    vi = jnp.clip(
        jnp.round(v.astype(jnp.float32) / s_v[:, :, None, :]), -127, 127
    ).astype(jnp.int8)
    return qi, ki, vi, s_q, s_k, s_v


# ---------------------------------------------------------------------------
# jnp reference
# ---------------------------------------------------------------------------


def attention_int8_xla(
    qi, ki, vi, s_q, s_k, s_v, sm_scale: float,
    k_valid_len: Optional[int] = None,
) -> jax.Array:
    """Reference implementation of the kernel semantics (f32, full scores)."""
    s = jnp.einsum("bhqd,bhkd->bhqk", qi.astype(jnp.int32), ki.astype(jnp.int32),
                   preferred_element_type=jnp.int32).astype(jnp.float32)
    s = s * s_q[:, :, :, None] * s_k[:, :, None, :] * sm_scale
    if k_valid_len is not None and k_valid_len < ki.shape[2]:
        mask = jnp.arange(ki.shape[2]) < k_valid_len
        s = jnp.where(mask[None, None, None, :], s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p_int = jnp.round(p * P_LEVELS)  # attn-map quant to 127 levels
    acc = jnp.einsum("bhqk,bhkd->bhqd", p_int.astype(jnp.int32),
                     vi.astype(jnp.int32),
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    out = acc / (P_LEVELS * l) * s_v[:, :, None, :]
    return out


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _flash_int8_kernel(
    qi_ref, ki_ref, vi_ref, sq_ref, sk_ref, sv_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
    *, k_steps: int, blk_k: int, sm_scale: float, kv_len: int,
):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = qi_ref[0, 0]  # [blk_q, D] int8
    k = ki_ref[0, 0]  # [blk_k, D] int8
    s_int = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [blk_q, blk_k]
    s = (
        s_int.astype(jnp.float32)
        * sq_ref[0, 0][:, None]
        * sk_ref[0, 0][None, :]
        * sm_scale
    )
    # KV-tail mask (model padding)
    base = ik * blk_k
    if kv_len < k_steps * blk_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]  # [blk_q, 1]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    # attn-map quant: 127 levels of the unnormalized probs
    p_int = jnp.round(p * P_LEVELS).astype(jnp.int8)
    pv = jax.lax.dot_general(
        p_int, vi_ref[0, 0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == k_steps - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, :1], _EPS)
        out_ref[0, 0] = (
            acc_ref[:] / (P_LEVELS * l) * sv_ref[0, 0][None, :]
        ).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "k_valid_len", "blk_q", "blk_k", "interpret"),
)
def attention_int8_pallas(
    qi, ki, vi, s_q, s_k, s_v,
    sm_scale: float,
    k_valid_len: Optional[int] = None,
    blk_q: int = 512,
    blk_k: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Int8 flash attention. qi/ki/vi: int8 [B,H,S,D]; scales as in
    quantize_qkv_int8. S is padded to the block size internally."""
    b, h, sq, d = qi.shape
    sk = ki.shape[2]
    kv_len = min(k_valid_len, sk) if k_valid_len is not None else sk

    def rup(x, m):
        return (x + m - 1) // m * m

    blk_q = min(blk_q, rup(sq, 128))
    blk_k = min(blk_k, rup(sk, 128))
    sq_p, sk_p = rup(sq, blk_q), rup(sk, blk_k)
    if sq_p != sq:
        qi = jnp.pad(qi, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
        s_q = jnp.pad(s_q, ((0, 0), (0, 0), (0, sq_p - sq)), constant_values=_EPS)
    if sk_p != sk:
        ki = jnp.pad(ki, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        vi = jnp.pad(vi, ((0, 0), (0, 0), (0, sk_p - sk), (0, 0)))
        s_k = jnp.pad(s_k, ((0, 0), (0, 0), (0, sk_p - sk)), constant_values=_EPS)

    k_steps = sk_p // blk_k
    grid = (b, h, sq_p // blk_q, k_steps)

    out = pl.pallas_call(
        functools.partial(
            _flash_int8_kernel, k_steps=k_steps, blk_k=blk_k,
            sm_scale=sm_scale, kv_len=kv_len,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, d), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_q), lambda b, h, i, j: (b, h, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k), lambda b, h, i, j: (b, h, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda b, h, i, j: (b, h, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, d), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, sq_p, d), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq_p * sk_p * d,
            bytes_accessed=b * h * (sq_p * d * 2 + sk_p * d * 2 + sq_p * d * 4),
            transcendentals=b * h * sq_p * sk_p,
        ),
        interpret=interpret,
    )(qi, ki, vi, s_q.astype(jnp.float32), s_k.astype(jnp.float32),
      s_v.astype(jnp.float32))
    return out[:, :, :sq]


def attention_int8(
    q: jax.Array, k: jax.Array, v: jax.Array,
    sm_scale: Optional[float] = None,
    k_valid_len: Optional[int] = None,
) -> jax.Array:
    """End-to-end int8 attention: quantize q/k/v then run the kernel.
    q,k,v: [B, S, H, D] (model layout) → [B, S, H, D] f32."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    qh = jnp.swapaxes(q, 1, 2)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    qi, ki, vi, s_q, s_k, s_v = quantize_qkv_int8(qh, kh, vh)
    if jax.default_backend() == "tpu":
        out = attention_int8_pallas(qi, ki, vi, s_q, s_k, s_v, sm_scale,
                                    k_valid_len)
    else:
        out = attention_int8_xla(qi, ki, vi, s_q, s_k, s_v, sm_scale,
                                 k_valid_len)
    return jnp.swapaxes(out, 1, 2)
