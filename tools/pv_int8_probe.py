"""Probe: hybrid flash attention — bf16 QK^T + int8 PV — vs splash.

Motivation (BENCH_NOTES): attention is 66-75% of the W8A8 step and gains
nothing from int8 QK^T at D=128 (shallow contraction). But the PV matmul
contracts over the KV axis (2048-4096 deep per tile) where the int8 MXU
rate genuinely pays 2x. The attn-map probs quantize to 127 levels (the
reference's A8 attention-map quant, quant_opensora.py:441-443) and V
quantizes per-(b,h,channel); QK^T + online softmax stay bf16/f32 exact.
If the hybrid beats splash at the bench shape, it becomes a QuantCtx
attention mode and lifts the e2e ratio.

Usage: python tools/pv_int8_probe.py  (env: WANQ_SWEEP_B/H/SPAD/CHAIN)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B = int(os.environ.get("WANQ_SWEEP_B", 2))
H = int(os.environ.get("WANQ_SWEEP_H", 12))
D = 128
S = int(os.environ.get("WANQ_SWEEP_SPAD", 32768))
CHAIN = int(os.environ.get("WANQ_SWEEP_CHAIN", 8))

P_LEVELS = 127.0
_EPS = 1e-6


# ---------------------------------------------------------------------------
# hybrid kernel: bf16 QK^T, int8 PV
# ---------------------------------------------------------------------------


def _hybrid_kernel(
    q_ref, k_ref, vi_ref, sv_ref, out_ref,
    m_ref, l_ref, acc_ref,
    *, k_steps: int, pv_int8: bool,
):
    ik = pl.program_id(3)

    @pl.when(ik == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -1e30)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0]  # [blk_q, D] bf16 (sm_scale pre-folded)
    k = k_ref[0, 0]  # [blk_k, D] bf16
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [blk_q, blk_k] f32

    m_prev = m_ref[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)

    if pv_int8:
        p_q = jnp.round(p * P_LEVELS).astype(jnp.int8)
        pv = jax.lax.dot_general(
            p_q, vi_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
    else:
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), vi_ref[0, 0],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc_ref[:] = acc_ref[:] * alpha + pv
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(ik == k_steps - 1)
    def _finish():
        l = jnp.maximum(l_ref[:, :1], _EPS)
        if pv_int8:
            out_ref[0, 0] = (
                acc_ref[:] / (P_LEVELS * l) * sv_ref[0, 0, 0][None, :]
            ).astype(out_ref.dtype)
        else:
            out_ref[0, 0] = (acc_ref[:] / l).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("blk_q", "blk_k", "pv_int8")
)
def flash_pv(q, k, v_or_vi, sv, blk_q=512, blk_k=2048, pv_int8=True):
    """q,k: [B,H,S,D] bf16 (scale folded into q). v_or_vi: int8 [B,H,S,D]
    when pv_int8 else bf16. sv: [B,H,8,D] f32 per-channel v scales."""
    b, h, s, d = q.shape
    k_steps = s // blk_k
    grid = (b, h, s // blk_q, k_steps)
    return pl.pallas_call(
        functools.partial(_hybrid_kernel, k_steps=k_steps, pv_int8=pv_int8),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, d), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, blk_k, d), lambda b, h, i, j: (b, h, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, d), lambda b, h, i, j: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, blk_q, d), lambda b, h, i, j: (b, h, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, s, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, 128), jnp.float32),
            pltpu.VMEM((blk_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * s * s * d,
            bytes_accessed=b * h * s * d * (2 + 2 + 1 + 2),
            transcendentals=b * h * s * s,
        ),
    )(q, k, v_or_vi, sv)


def quant_v(v):
    """v: [B,H,S,D] -> int8 + per-(b,h,channel) scale broadcast to 8 sublanes."""
    absmax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=2)  # [B,H,D]
    sv = jnp.maximum(absmax / 127.0, _EPS)
    vi = jnp.clip(
        jnp.round(v.astype(jnp.float32) / sv[:, :, None, :]), -127, 127
    ).astype(jnp.int8)
    sv8 = jnp.broadcast_to(sv[:, :, None, :], (*sv.shape[:2], 8, sv.shape[-1]))
    return vi, sv8


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def chain_time(fn, q, k, *extra, iters=3):
    def chained(q, k, *extra):
        out = fn(q, k, *extra)
        for _ in range(CHAIN - 1):
            q2 = (q + 0.001 * out.astype(q.dtype)).astype(jnp.bfloat16)
            out = fn(q2, k, *extra)
        return out

    jf = jax.jit(chained)
    out = jf(q, k, *extra)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(q, k, *extra)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / CHAIN * 1000


def splash_call(q, k, v):
    from wanq_tpu.models.attention import attention_heads_major
    return attention_heads_major(q, k, v)


def main():
    rng = np.random.default_rng(0)
    shape = (B, H, S, D)
    scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16) * scale
    k = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
    vi, sv = quant_v(v)

    # correctness on a small slice first
    s0 = 4096
    qs, ks, vs = q[:1, :2, :s0], k[:1, :2, :s0], v[:1, :2, :s0]
    vis, svs = quant_v(vs)
    ref = jax.nn.softmax(
        jnp.einsum("bhsd,bhtd->bhst", qs.astype(jnp.float32),
                   ks.astype(jnp.float32)), axis=-1
    ) @ vs.astype(jnp.float32)
    out_h = flash_pv(qs, ks, vis, svs, blk_q=512, blk_k=1024, pv_int8=True)
    out_b = flash_pv(qs, ks, vs, svs, blk_q=512, blk_k=1024, pv_int8=False)
    for name, o in [("hybrid", out_h), ("bf16ctl", out_b)]:
        of = np.asarray(o, np.float32).ravel()
        rf = np.asarray(ref, np.float32).ravel()
        cos = float(of @ rf / (np.linalg.norm(of) * np.linalg.norm(rf) + 1e-9))
        print(f"{name}: cosine vs sdpa = {cos:.6f}", flush=True)

    print(f"shape B={B} H={H} S={S} D={D}, chain={CHAIN}", flush=True)
    t = chain_time(splash_call, q, k, v)
    flops = 4 * B * H * S * S * D
    print(f"splash(current): {t:8.2f} ms  {flops/t/1e9:6.1f} TF/s", flush=True)
    for blk_q in (512, 1024):
        for blk_k in (1024, 2048):
            if S % blk_k or S % blk_q:
                continue
            for pv_int8, tag in ((False, "bf16ctl"), (True, "hybrid ")):
                vv = vi if pv_int8 else v
                try:
                    t = chain_time(
                        lambda q_, k_, vv_, sv_: flash_pv(
                            q_, k_, vv_, sv_, blk_q=blk_q, blk_k=blk_k,
                            pv_int8=pv_int8),
                        q, k, vv, sv)
                    print(f"{tag} q{blk_q}/kv{blk_k}: {t:8.2f} ms "
                          f"{flops/t/1e9:6.1f} TF/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"{tag} q{blk_q}/kv{blk_k}: FAIL {type(e).__name__}: "
                          f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
