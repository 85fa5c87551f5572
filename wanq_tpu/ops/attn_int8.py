"""Int8 flash attention — the hardware execution of ViDiT-Q attention
quantization on the TPU MXU.

The reference can only *simulate* attention quant (fake-quant + explicit
BMM, flash unsupported: quant_opensora.py:446 raises under flash_attn).
On TPU both attention matmuls genuinely run on the int8 MXU path
(2x the bf16 rate on v5e+):

  QK^T   int8 q · int8 k with per-(batch, head, seq-block) scales applied
         as SMEM scalars inside the f32 online-softmax (exact w.r.t. the
         quantized q/k — scales factor out of the matmul)
  PV     the unnormalized probs p = exp(s - m) ∈ (0, 1] quantize to 127
         levels (the attn-map A8 quant; the row scale folds into the
         softmax denominator) and accumulate as int8 · int8; per-(head,
         channel) v scales factor out and apply once at the end

Quantization granularity: q/k use one scale per (b, h, 512-token block) —
finer than per-tensor, coarse enough to ride SMEM (Mosaic requires VMEM
blocks tiled (8,128); per-token scale vectors would need 128x lane
broadcasts). v is per-(b, h, channel), matching the reference
(quant_opensora.py:441-443). The probs quantize against the running block
max (SageAttention-style), shifting the grid ≤ a few steps vs a
global-max reference.
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
SUBLANES = 8


def _rup(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ---------------------------------------------------------------------------
# pre-quantization
# ---------------------------------------------------------------------------


def quantize_qkv_int8(
    q: jax.Array, k: jax.Array, v: jax.Array, blk: int = 512
) -> Tuple[jax.Array, ...]:
    """q,k,v: [B, H, S, D] → (qi, ki, vi int8 [B,H,S_pad,D],
    s_q [B,H,S_pad/blk], s_k [B,H,S_pad/blk], s_v [B,H,D]).

    q/k: one scale per (b, h, blk-token block); v per (b, h, channel)
    (ref quant_opensora.py:441-443). S pads to blk with zeros (zero rows
    don't inflate block absmax)."""
    b, h, s, d = q.shape
    s_pad = _rup(s, blk)
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)

    def per_block(x):
        xb = x.astype(jnp.float32).reshape(b, h, s_pad // blk, blk, d)
        absmax = jnp.max(jnp.abs(xb), axis=(3, 4))
        scale = jnp.maximum(absmax / 127.0, _EPS)  # [B,H,nb]
        xi = jnp.clip(
            jnp.round(xb / scale[:, :, :, None, None]), -127, 127
        ).astype(jnp.int8)
        return xi.reshape(b, h, s_pad, d), scale

    qi, s_q = per_block(q)
    ki, s_k = per_block(k)
    absmax_v = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=2)  # [B,H,D]
    s_v = jnp.maximum(absmax_v / 127.0, _EPS)
    vi = jnp.clip(
        jnp.round(v.astype(jnp.float32) / s_v[:, :, None, :]), -127, 127
    ).astype(jnp.int8)
    return qi, ki, vi, s_q, s_k, s_v


# ---------------------------------------------------------------------------
# jnp reference (same math, full scores)
# ---------------------------------------------------------------------------


def attention_int8_xla(
    qi, ki, vi, s_q, s_k, s_v, sm_scale: float,
    k_valid_len: Optional[int] = None,
) -> jax.Array:
    b, h, s, d = qi.shape
    nqb, nkb = s_q.shape[2], s_k.shape[2]
    blk_q, blk_k = s // nqb, s // nkb
    sc = jnp.einsum("bhqd,bhkd->bhqk", qi.astype(jnp.int32), ki.astype(jnp.int32),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
    sq_full = jnp.repeat(s_q, blk_q, axis=2)
    sk_full = jnp.repeat(s_k, blk_k, axis=2)
    sc = sc * sq_full[:, :, :, None] * sk_full[:, :, None, :] * sm_scale
    kv_len = min(k_valid_len, s) if k_valid_len is not None else s
    if kv_len < s:
        mask = jnp.arange(s) < kv_len
        sc = jnp.where(mask[None, None, None, :], sc, _NEG_INF)
    m = jnp.max(sc, axis=-1, keepdims=True)
    p = jnp.exp(sc - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p_int = jnp.round(p * P_LEVELS)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p_int.astype(jnp.int32),
                     vi.astype(jnp.int32),
                     preferred_element_type=jnp.int32).astype(jnp.float32)
    return acc / (P_LEVELS * l) * s_v[:, :, None, :]


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _flash_int8_kernel(
    sq_ref, sk_ref,  # scalar-prefetch args (full [B,H,nb] arrays in SMEM)
    qi_ref, ki_ref, vi_ref, sv_ref,
    out_ref,
    m_ref, l_ref, acc_ref,
    *, k_steps: int, blk_k: int, sm_scale: float, kv_len: int,
):
    ib, ih = pl.program_id(0), pl.program_id(1)
    iq, ik = pl.program_id(2), pl.program_id(3)

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
    scale = sq_ref[ib, ih, iq] * sk_ref[ib, ih, ik] * sm_scale
    s = s_int.astype(jnp.float32) * scale

    base = ik * blk_k
    if kv_len < k_steps * blk_k:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
        s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

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
            acc_ref[:] / (P_LEVELS * l) * sv_ref[0, 0, 0][None, :]
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
    """Int8 flash attention. qi/ki/vi int8 [B,H,S,D] (S divisible by the
    block size — quantize_qkv_int8 pads); s_q/s_k [B,H,S/blk]; s_v [B,H,D]."""
    b, h, sq, d = qi.shape
    sk = ki.shape[2]
    assert sq % blk_q == 0 and sk % blk_k == 0, (sq, sk, blk_q, blk_k)
    assert s_q.shape[2] == sq // blk_q, "s_q blocking must match blk_q"
    assert s_k.shape[2] == sk // blk_k, "s_k blocking must match blk_k"
    kv_len = min(k_valid_len, sk) if k_valid_len is not None else sk

    k_steps = sk // blk_k
    grid = (b, h, sq // blk_q, k_steps)
    # v scales broadcast over 8 sublanes for a legal (8, 128k) VMEM tile
    sv8 = jnp.broadcast_to(
        s_v.astype(jnp.float32)[:, :, None, :], (b, h, SUBLANES, d)
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # s_q, s_k ride SMEM whole, indexed by ids
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, d), lambda b, h, i, j, *_: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j, *_: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j, *_: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, SUBLANES, d), lambda b, h, i, j, *_: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, d), lambda b, h, i, j, *_: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flash_int8_kernel, k_steps=k_steps, blk_k=blk_k,
            sm_scale=sm_scale, kv_len=kv_len,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d,
            bytes_accessed=b * h * (sq * d * 2 + sk * d * 2 + sq * d * 4),
            transcendentals=b * h * sq * sk,
        ),
        interpret=interpret,
    )(s_q.astype(jnp.float32), s_k.astype(jnp.float32),
      qi, ki, vi, sv8)
    return out


def attention_int8(
    q: jax.Array, k: jax.Array, v: jax.Array,
    sm_scale: Optional[float] = None,
    k_valid_len: Optional[int] = None,
    blk: int = 512,
) -> jax.Array:
    """End-to-end int8 attention: quantize q/k/v then run the kernel.
    q,k,v: [B, S, H, D] (model layout) → [B, S, H, D] f32."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    s_orig = q.shape[1]
    qh = jnp.swapaxes(q, 1, 2)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)
    qi, ki, vi, s_q, s_k, s_v = quantize_qkv_int8(qh, kh, vh, blk=blk)
    kv_len = k_valid_len if k_valid_len is not None else s_orig
    if jax.default_backend() == "tpu":
        out = attention_int8_pallas(qi, ki, vi, s_q, s_k, s_v, sm_scale,
                                    k_valid_len=kv_len, blk_q=blk, blk_k=blk)
    else:
        out = attention_int8_xla(qi, ki, vi, s_q, s_k, s_v, sm_scale,
                                 k_valid_len=kv_len)
    return jnp.swapaxes(out[:, :, :s_orig], 1, 2)
