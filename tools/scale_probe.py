"""int8-vs-bf16 linear-subgraph ratio at 1.3B vs 14B block shapes.

Measures the FULL quantized chain (dynamic per-token act quant -> int8
GEMM -> dequant epilogue) against the bf16 chain at both model scales on
the attached chip — the evidence that the W8A8 payoff grows with model
scale (contraction depth): deeper K amortizes the act-quant producer and
drives the int8 MXU at its 2x issue rate. The TPU analog of the
reference's kernels/bench/bench_gemm.py sweep.

Usage: python -u tools/scale_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.ops.fused import quant_sum_xla
from wanq_tpu.ops.qgemm import w4a8_linear_xla, w8a8_linear_xla
from wanq_tpu.quant.quantizers import pack_int4

M = 16384
CHAIN = 6


def bench(fn, x, *rest):
    def chained(x, *rest):
        out = fn(x, *rest)
        for _ in range(CHAIN - 1):
            out = fn((x + 1e-4 * out[..., : x.shape[-1]]).astype(x.dtype), *rest)
        return out

    jf = jax.jit(chained)
    out = jf(x, *rest)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    out = jf(x, *rest)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / CHAIN * 1000


def fp_ffn(x, w1, w2):
    h = jax.nn.gelu(
        jnp.dot(x, w1, preferred_element_type=jnp.float32), approximate=True)
    return jnp.dot(h.astype(jnp.bfloat16), w2, preferred_element_type=jnp.float32)


def q_ffn(x, w1q, s1, w2q, s2):
    q, s, _ = quant_sum_xla(x.astype(jnp.float32))
    h = jax.nn.gelu(
        w8a8_linear_xla(q, w1q, s, s1, out_dtype=jnp.float32), approximate=True)
    q2, sr, _ = quant_sum_xla(h)
    return w8a8_linear_xla(q2, w2q, sr, s2, out_dtype=jnp.float32)


def q4_ffn(x, w1p, s1, w2p, s2):
    q, s, _ = quant_sum_xla(x.astype(jnp.float32))
    h = jax.nn.gelu(
        w4a8_linear_xla(q, w1p, s, s1, out_dtype=jnp.float32), approximate=True)
    q2, sr, _ = quant_sum_xla(h)
    return w4a8_linear_xla(q2, w2p, sr, s2, out_dtype=jnp.float32)


def fp_sq(x, w):
    return jnp.dot(x, w, preferred_element_type=jnp.float32)


def q_sq(x, wq, sw):
    q, s, _ = quant_sum_xla(x.astype(jnp.float32))
    return w8a8_linear_xla(q, wq, s, sw, out_dtype=jnp.float32)


def quantize(w, n):
    wq = jnp.clip(jnp.round(w.astype(jnp.float32) * 20), -127, 127).astype(jnp.int8)
    return wq, jnp.full((n,), 1 / 20, jnp.float32)


def main():
    key = jax.random.PRNGKey(0)
    for name, c, f in (("1.3B ffn", 1536, 8960), ("14B ffn", 5120, 13824)):
        x = jax.random.normal(key, (M, c), jnp.bfloat16)
        w1 = jax.random.normal(key, (c, f), jnp.bfloat16)
        w2 = jax.random.normal(key, (f, c), jnp.bfloat16)
        t_fp = bench(fp_ffn, x, w1, w2)
        w1q, s1 = quantize(w1, f)
        w2q, s2 = quantize(w2, c)
        t_q = bench(q_ffn, x, w1q, s1, w2q, s2)
        fl = 4 * M * c * f
        print(f"{name}: fp {t_fp:7.2f} ms ({fl/t_fp/1e9:6.1f} TF/s)  "
              f"int8+dyn-act {t_q:7.2f} ms ({fl/t_q/1e9:6.1f} TF/s)  "
              f"ratio {t_fp/t_q:.3f}x", flush=True)
        w1p = pack_int4(jnp.clip(w1q, -8, 7))
        w2p = pack_int4(jnp.clip(w2q, -8, 7))
        t_q4 = bench(q4_ffn, x, w1p, s1, w2p, s2)
        print(f"{name}: packed-W4A8 {t_q4:7.2f} ms ({fl/t_q4/1e9:6.1f} TF/s)  "
              f"ratio-vs-fp {t_fp/t_q4:.3f}x  (weights 4x smaller than bf16)",
              flush=True)
    for name, c in (("1.3B qkv", 1536), ("14B qkv", 5120)):
        x = jax.random.normal(key, (M, c), jnp.bfloat16)
        w = jax.random.normal(key, (c, c), jnp.bfloat16)
        t_fp = bench(fp_sq, x, w)
        wq, sw = quantize(w, c)
        t_q = bench(q_sq, x, wq, sw)
        fl = 2 * M * c * c
        print(f"{name} {c}^2: fp {t_fp:7.2f} ms ({fl/t_fp/1e9:6.1f} TF/s)  "
              f"int8+dyn-act {t_q:7.2f} ms ({fl/t_q/1e9:6.1f} TF/s)  "
              f"ratio {t_fp/t_q:.3f}x", flush=True)


if __name__ == "__main__":
    main()
