"""Decompose the in-graph int8-vs-bf16 linear gap at real Wan 1.3B shapes.

Round-1 finding (BENCH_NOTES.md): standalone int8 GEMMs win 1.5-1.6x on ffn
shapes, yet the block-linear subgraph measures fp 1027 ms vs int8 1086 ms.
This probe times each stage of the quantized block pipeline separately on
the real chip so the regression can be localized (the TPU-side analog of
the reference's kernels/bench/ harness).

Usage: python -u tools/perf_probe.py [stage ...]
Stages: producers qkv ffn block  (default: all)
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

from wanq_tpu.ops.fused import ln_modulate_quant, quant_sum
from wanq_tpu.ops.qgemm import w8a8_linear_pallas, w8a8_linear_xla

B, S, C, FFN = 2, 32760, 1536, 8960
M = B * S


def sync(x):
    return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))


def timeit(name, fn, *args, iters=10, warmup=2):
    jfn = jax.jit(fn)
    for _ in range(warmup):
        out = jfn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jfn(*args)
    sync(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:55s} {dt:9.2f} ms", flush=True)
    return dt


def main():
    stages = set(sys.argv[1:]) or {"producers", "qkv", "ffn", "block"}
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 12)
    x = jax.random.normal(ks[0], (B, S, C), jnp.float32)
    shift = jax.random.normal(ks[1], (B, C), jnp.float32)
    scale = jax.random.normal(ks[2], (B, C), jnp.float32) * 0.1

    w_bf = [jax.random.normal(ks[3 + i], (C, C), jnp.bfloat16) * 0.02 for i in range(3)]
    w_i8 = [
        jax.random.randint(ks[3 + i], (C, C), -127, 128, jnp.int8) for i in range(3)
    ]
    s_w = jnp.abs(jax.random.normal(ks[6], (C,), jnp.float32)) * 0.01
    zp_w = jnp.round(jax.random.normal(ks[7], (C,)) * 4).astype(jnp.float32)
    w0_bf = jax.random.normal(ks[8], (C, FFN), jnp.bfloat16) * 0.02
    w0_i8 = jax.random.randint(ks[8], (C, FFN), -127, 128, jnp.int8)
    w2_bf = jax.random.normal(ks[9], (FFN, C), jnp.bfloat16) * 0.02
    w2_i8 = jax.random.randint(ks[9], (FFN, C), -127, 128, jnp.int8)
    s_w0 = jnp.abs(jax.random.normal(ks[10], (FFN,), jnp.float32)) * 0.01
    zp_w0 = jnp.round(jax.random.normal(ks[10], (FFN,)) * 4).astype(jnp.float32)

    if "producers" in stages:
        print("--- producers (B=2, S=32760, C=1536) ---")

        def ln_mod_bf16(x, shift, scale):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
            ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
            return (ln * (1 + scale[:, None, :]) + shift[:, None, :]).astype(
                jnp.bfloat16
            )

        timeit("layer_norm+modulate -> bf16 (fp producer)", ln_mod_bf16, x, shift, scale)
        timeit(
            "ln_modulate_quant (XLA int8 producer)",
            lambda x, sh, sc: ln_modulate_quant(x, sh, sc),
            x,
            shift,
            scale,
        )

    if "qkv" in stages:
        print("--- qkv: 3x (65520 x 1536 x 1536) ---")
        xb = jax.random.normal(ks[11], (M, C), jnp.bfloat16)
        q8 = jax.random.randint(ks[11], (M, C), -127, 128, jnp.int8)
        s_a = jnp.abs(jax.random.normal(ks[0], (M,), jnp.float32)) * 0.01
        sum_a = jax.random.normal(ks[1], (M,), jnp.float32)

        def qkv_bf16(xb, ws):
            return [
                jnp.dot(xb, w, preferred_element_type=jnp.float32) for w in ws
            ]

        def qkv_i8_f32(q8, s_a, sum_a, ws):
            return [
                w8a8_linear_xla(q8, w, s_a, s_w, sum_a, zp_w, out_dtype=jnp.float32)
                for w in ws
            ]

        def qkv_i8_bf16(q8, s_a, sum_a, ws):
            return [
                w8a8_linear_xla(q8, w, s_a, s_w, sum_a, zp_w, out_dtype=jnp.bfloat16)
                for w in ws
            ]

        def qkv_i8_sym_bf16(q8, s_a, ws):
            return [
                w8a8_linear_xla(q8, w, s_a, s_w, out_dtype=jnp.bfloat16) for w in ws
            ]

        timeit("3x bf16 dot (f32 out)", qkv_bf16, xb, w_bf)
        timeit("3x w8a8 XLA asym (f32 out)", qkv_i8_f32, q8, s_a, sum_a, w_i8)
        timeit("3x w8a8 XLA asym (bf16 out)", qkv_i8_bf16, q8, s_a, sum_a, w_i8)
        timeit("3x w8a8 XLA sym  (bf16 out)", qkv_i8_sym_bf16, q8, s_a, w_i8)
        timeit(
            "3x w8a8 Pallas asym",
            lambda q8, s_a, sum_a, ws: [
                w8a8_linear_pallas(q8, w, s_a, s_w, sum_a, zp_w) for w in ws
            ],
            q8,
            s_a,
            sum_a,
            w_i8,
        )

    if "ffn" in stages:
        print("--- ffn: 65520x1536x8960 -> gelu -> 65520x8960x1536 ---")

        def ffn_bf16(x, shift, scale, w0, w2):
            xf = x.astype(jnp.float32)
            mu = jnp.mean(xf, -1, keepdims=True)
            var = jnp.mean(jnp.square(xf - mu), -1, keepdims=True)
            ln = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
            y = (ln * (1 + scale[:, None, :]) + shift[:, None, :]).astype(jnp.bfloat16)
            h = jnp.dot(y.reshape(M, C), w0, preferred_element_type=jnp.float32)
            h = jax.nn.gelu(h, approximate=True).astype(jnp.bfloat16)
            return jnp.dot(h, w2, preferred_element_type=jnp.float32)

        def ffn_i8(x, shift, scale, w0, w2, out_dtype, mid_dtype):
            q8, s_a, ssum = ln_modulate_quant(x, shift, scale)
            h = w8a8_linear_xla(
                q8.reshape(M, C), w0, s_a.reshape(-1), s_w0,
                ssum.reshape(-1), zp_w0, out_dtype=mid_dtype,
            )
            h8, s2, sm2 = quant_sum(h, gelu=True)
            return w8a8_linear_xla(h8, w2, s2, s_w, sm2, zp_w, out_dtype=out_dtype)

        timeit("ffn bf16 (LN+dot+gelu+dot, f32 out)", ffn_bf16, x, shift, scale, w0_bf, w2_bf)
        timeit(
            "ffn int8 fused pipeline (f32 out, bf16 mid)",
            lambda *a: ffn_i8(*a, out_dtype=jnp.float32, mid_dtype=jnp.bfloat16),
            x, shift, scale, w0_i8, w2_i8,
        )
        timeit(
            "ffn int8 fused pipeline (bf16 out, bf16 mid)",
            lambda *a: ffn_i8(*a, out_dtype=jnp.bfloat16, mid_dtype=jnp.bfloat16),
            x, shift, scale, w0_i8, w2_i8,
        )
        timeit(
            "ffn int8 fused pipeline (f32 mid)",
            lambda *a: ffn_i8(*a, out_dtype=jnp.float32, mid_dtype=jnp.float32),
            x, shift, scale, w0_i8, w2_i8,
        )

    if "block" in stages:
        print("--- full block-linear subgraph (attention stubbed) ---")
        from wanq_tpu.configs import WAN_CONFIGS
        from wanq_tpu.models import dit as mdit
        from wanq_tpu.models.dit import block_forward, init_params_on_device
        from wanq_tpu.quant import QuantConfig
        from wanq_tpu.quant.ptq import prepare_quant_state
        from wanq_tpu.quant.qlinear import QuantCtx

        cfg = WAN_CONFIGS["t2v-1.3B"]
        params = init_params_on_device(cfg, seed=0)
        bp = params["blocks"][0]
        names = [
            f"blocks.0.{m}.{l}" for m in ("self_attn", "cross_attn")
            for l in ("q", "k", "v", "o")
        ] + ["blocks.0.ffn.0", "blocks.0.ffn.2"]
        qcfg = QuantConfig.from_dict(
            {
                "remain_fp_regex": r"self_attn\.o|cross_attn",
                "weight": {"n_bits": 8, "sym": False},
                "act": {"n_bits": 8, "sym": True},
            }
        )
        policies, state, rotations = prepare_quant_state(
            {"blocks": [bp]}, names, qcfg, targets="int8"
        )
        ctx = QuantCtx(mode="int8", policies=policies, state=state,
                       rotations=rotations)

        # stub attention: identity on v (keeps layout/reshape costs, removes
        # the 111ms kernel)
        import importlib

        matt = importlib.import_module("wanq_tpu.models.attention")
        orig_attn = mdit.attention
        mdit.attention = lambda q, k, v, **kw: q.astype(v.dtype)
        orig2 = matt.attention

        e = jax.random.normal(ks[2], (B, 6, C), jnp.float32) * 0.1
        ctxt = jax.random.normal(ks[3], (B, 512, C), jnp.bfloat16)
        # identity rotation in the interleaved (S, head_dim) table form
        cos = jnp.ones((S, 128), jnp.float32)
        sin = jnp.zeros((S, 128), jnp.float32)

        def blk_fp(bp, x, e, ctxt):
            return block_forward(bp, "blocks.0", None, x, e, ctxt, cfg, cos, sin, S)

        def blk_i8(bp, qctx, x, e, ctxt):
            return block_forward(bp, "blocks.0", qctx, x, e, ctxt, cfg, cos, sin, S)

        try:
            t_fp = timeit("block fp (attn stubbed)", blk_fp, bp, x, e, ctxt, iters=6)
            t_i8 = timeit("block int8 (attn stubbed)", blk_i8, bp, ctx, x, e, ctxt, iters=6)
            print(f"block ratio fp/int8: {t_fp / t_i8:.3f}x  (30 blocks -> "
                  f"{30*(t_fp-t_i8):.0f} ms/step)")
        finally:
            mdit.attention = orig_attn
            matt.attention = orig2


def scan_stage():
    """Full dit_forward via lax.scan over 30 stacked blocks, attention
    stubbed — reproduces the bench composition exactly."""
    import importlib

    from wanq_tpu.configs import WAN_CONFIGS
    from wanq_tpu.models import dit as mdit
    from wanq_tpu.models.dit import (
        dit_forward,
        init_params_on_device,
        linear_layer_names,
        make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    matt = importlib.import_module("wanq_tpu.models.attention")
    cfg = WAN_CONFIGS["t2v-1.3B"]
    target_shape = compute_target_shape(cfg, (832, 480), 81)
    seq_len = compute_seq_len(cfg, target_shape)
    list_params = init_params_on_device(cfg, seed=0)
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    qcfg = QuantConfig.from_dict(
        {
            "remain_fp_regex": (
                r"text_embedding|time_embedding|time_projection|head\.head|"
                r"blocks\.\d+\.self_attn\.o|cross_attn"
            ),
            "weight": {"n_bits": 8, "sym": False},
            "act": {"n_bits": 8, "sym": True},
        }
    )
    policies, state, rotations = prepare_quant_state(
        list_params, linear_layer_names(cfg), qcfg, targets="int8"
    )
    del list_params
    ctx = QuantCtx(mode="int8", policies=policies, state=state, rotations=rotations)
    ctx = make_scan_ctx(ctx, cfg.num_layers)

    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (2, *target_shape), jnp.float32)
    t = jnp.asarray([999.0, 999.0])
    context = jax.random.normal(key, (2, cfg.text_len, cfg.text_dim), jnp.float32)

    def fwd(params, qctx, latents, t, context):
        return dit_forward(params, cfg, latents, t, context, seq_len, ctx=qctx)

    orig = mdit.attention
    mdit.attention = lambda q, k, v, **kw: q.astype(v.dtype)
    try:
        t_fp = timeit("dit scan fp (attn stubbed)", fwd, params, None,
                      latents, t, context, iters=5)
        t_i8 = timeit("dit scan int8 (attn stubbed)", fwd, params, ctx,
                      latents, t, context, iters=5)
        print(f"scan ratio fp/int8: {t_fp / t_i8:.3f}x")
    finally:
        mdit.attention = orig


if __name__ == "__main__":
    if "scan" in sys.argv[1:]:
        scan_stage()
        sys.argv = [a for a in sys.argv if a != "scan"]
        if len(sys.argv) > 1:
            main()
    else:
        main()
