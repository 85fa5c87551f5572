"""Sweep splash/flash attention block sizes at Wan self-attn shapes.

Defaults to the 1.3B 480p shape; env vars select others, e.g. the 14B
720p shape (attention-dominated): WANQ_SWEEP_B=1 WANQ_SWEEP_H=40
WANQ_SWEEP_SPAD=75776.

Timing: the kernel is applied CHAIN_ITERS times inside one jit (output of
iteration i perturbs the input of i+1) so the ~2.5 ms per-dispatch overhead
of the relayed backend amortizes away.
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

B = int(os.environ.get("WANQ_SWEEP_B", 2))
H = int(os.environ.get("WANQ_SWEEP_H", 12))
D = 128
S_PAD = int(os.environ.get("WANQ_SWEEP_SPAD", 32768))
CHAIN = int(os.environ.get("WANQ_SWEEP_CHAIN", 8))


def chain_time(make_fn, q, k, v, iters=3):
    """make_fn() -> callable(q,k,v)->out [B,H,S,D]; chained CHAIN times."""
    fn = make_fn()

    def chained(q, k, v):
        out = fn(q, k, v)
        for _ in range(CHAIN - 1):
            q2 = (q + 0.001 * out).astype(jnp.bfloat16)
            out = fn(q2, k, v)
        return out

    jf = jax.jit(chained)
    out = jf(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters / CHAIN * 1000


def splash_fn(bq, bkv, bkvc, use_base=False):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    def make():
        def fn(q, k, v):
            mask = sm.MultiHeadMask([sm.FullMask((S_PAD, S_PAD)) for _ in range(H)])
            sizes = sk.BlockSizes(block_q=bq, block_kv=bkv, block_kv_compute=bkvc)
            kernel = sk.make_splash_mha(
                mask=mask, head_shards=1, q_seq_shards=1, block_sizes=sizes
            )
            return jax.vmap(kernel)(q, k, v)

        return fn

    return make


def flash_fn(bq, bk):
    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    def make():
        def fn(q, k, v):
            sizes = fa.BlockSizes(
                block_q=bq, block_k_major=bk, block_k=bk, block_b=1
            )
            return fa.flash_attention(
                q, k, v, causal=False, sm_scale=D**-0.5, block_sizes=sizes
            )

        return fn

    return make


def main():
    key = jax.random.PRNGKey(0)
    qs = jax.random.normal(key, (B, H, S_PAD, D), jnp.bfloat16)
    ks = jax.random.normal(jax.random.PRNGKey(1), (B, H, S_PAD, D), jnp.bfloat16)
    vs = jax.random.normal(jax.random.PRNGKey(2), (B, H, S_PAD, D), jnp.bfloat16)

    flops = 4 * B * H * S_PAD * S_PAD * D

    configs = []
    if len(sys.argv) > 1 and sys.argv[1] == "flash":
        for bq in (1024, 2048):
            for bk in (1024, 2048):
                configs.append((f"flash q{bq} k{bk}", flash_fn(bq, bk)))
    else:
        for bq in (512, 1024, 2048):
            for bkv in (1024, 2048, 4096, 8192):
                for bkvc in (512, 1024, 2048):
                    if bkvc > bkv or S_PAD % bkv or S_PAD % bq:
                        continue
                    configs.append(
                        (f"splash q{bq} kv{bkv} c{bkvc}", splash_fn(bq, bkv, bkvc))
                    )

    for name, mk in configs:
        try:
            ms = chain_time(mk, qs, ks, vs)
            print(f"{name:30s} {ms:8.2f} ms  {flops/ms*1e3/1e12:6.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
