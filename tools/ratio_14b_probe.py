"""MEASURED bf16-vs-W8A8 ratio at REAL 14B dims (round-2 VERDICT #3).

The full bf16 14B model (~27 GiB) cannot reside on one 16 GB chip, so the
end-to-end bf16 baseline is measured per-block and extrapolated EXPLICITLY:
K distinct real-dim blocks (dim 5120, ffn 13824, 40 heads) are generated
on device, and one jitted program scans over them R times — every round
re-reads the block weights from HBM (TPUs stream weights per use; no cache
holds 0.69 GB/block), so per-block time matches the resident-model case.
The same K blocks are then int8-quantized (the bench speed config: shared
LN+quant qkv, static-GELU ffn pipeline) and timed identically.

ratio = t_block_bf16 / t_block_int8 at 14B shapes — the number the
north-star argument rested on via a stubbed linear-subgraph probe until
now. e2e extrapolation: 40 x t_block + head/embedding overhead (measured
once from tools/deploy_14b_probe.py).

Usage: python -u tools/ratio_14b_probe.py [480|720] [frame_num] [K] [R]
Defaults: 720p, 81 frames, K=3 blocks, R=4 rounds, B=1 (single stream;
a CFG pair at 720p would exceed HBM with the bf16 blocks resident).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.models.dit import (
    block_forward,
    make_block_generator,
    make_scan_ctx,
)
from wanq_tpu.models.rope import rope_tables_interleaved
from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_layer_state, strip_quantized_weights
from wanq_tpu.quant.qlinear import QuantCtx

# bench.py's speed config at 14B dims: int8 qkv behind the shared fused
# producer, int8 ffn with static-GELU quant, o/cross FP
W8A8_SPEED = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"self_attn\.o|cross_attn"
    ),
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
}

# fuller coverage for 14B dims: the o / cross projections are 5120^2
# GEMMs over the full sequence there (int8 measured 1.2-1.28x on square
# 14B shapes, tools/scale_probe.py) — unlike at 1.3B where thin 1536^2
# GEMMs made them a wash. cross k/v stay FP (quant error lands directly
# on attention keys/values; M=text_len=512 makes them cheap anyway).
W8A8_FULL = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"cross_attn\.[kv]$"
    ),
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
}

# deploy_14b_probe's packed-int4 config at 14B dims — measured here with
# only K blocks resident (no HBM pressure) to separate the W4 kernel/unpack
# cost from the near-OOM scheduling cost of the full 40-block deployment
W4A8_DEPLOY = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head"
    ),
    "weight": {"n_bits": 4, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}

BLOCK_LINEARS = (
    "self_attn.q", "self_attn.k", "self_attn.v", "self_attn.o",
    "cross_attn.q", "cross_attn.k", "cross_attn.v", "cross_attn.o",
    "ffn.0", "ffn.2",
)


def fence(x) -> float:
    return float(jnp.sum(x.astype(jnp.float32)))


def time_blocks(cfg, blocks_stacked, ctx, x, e0, c, cos, sin, valid_len,
                rounds: int):
    """One jitted program: ``rounds`` sequential scans over the K stacked
    blocks (output chains so nothing is elided)."""

    def run(bp, qctx, xf):
        def one_round(carry, _):
            def body(cc, xs):
                b_p, b_state, b_perm = xs
                sub = None
                if qctx is not None:
                    sub = QuantCtx(
                        mode="int8",
                        policies={k: v for k, v in qctx.policies.items()
                                  if k.startswith("blocks.0.")},
                    )
                    sub.state = {f"blocks.0.{s}": st
                                 for s, st in b_state.items()}
                y = block_forward(b_p, "blocks.0", sub, cc, e0, c, cfg,
                                  cos, sin, valid_len)
                return y, None

            xs = (bp, qctx.scan_state if qctx is not None else {}, {})
            out, _ = jax.lax.scan(body, carry, xs)
            return 0.999 * out, None

        xf, _ = jax.lax.scan(one_round, xf, None, length=rounds)
        return xf

    fwd = jax.jit(run)
    out = fwd(blocks_stacked, ctx, x)
    fence(out)  # compile + warm
    t0 = time.perf_counter()
    out = fwd(blocks_stacked, ctx, 1.0001 * x)
    fence(out)
    dt = time.perf_counter() - t0
    k = jax.tree.leaves(blocks_stacked)[0].shape[0]
    return dt / (rounds * k)


def _res_inputs(cfg, res: int, frame_num: int, B: int):
    size = (1280, 720) if res == 720 else (832, 480)
    target_shape = compute_target_shape(cfg, size, frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    _, f, h, w = target_shape
    grid = (f // cfg.patch_size[0], h // cfg.patch_size[1],
            w // cfg.patch_size[2])
    valid_len = int(np.prod(grid))
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (B, seq_len, cfg.dim), jnp.bfloat16)
    e0 = jax.random.normal(jax.random.PRNGKey(2), (B, 6, cfg.dim), jnp.float32)
    c = jax.random.normal(jax.random.PRNGKey(3), (B, cfg.text_len, cfg.dim),
                          jnp.bfloat16)
    cos, sin = (jnp.asarray(a) for a in
                rope_tables_interleaved(grid, cfg.head_dim))
    return x, e0, c, cos, sin, valid_len, seq_len


def measure_multi(res_list=(480, 720), frame_num: int = 81, K: int = 3,
                  R: int = 4, variant: str = "speed"):
    """Measure the 14B per-block bf16 and W8A8 times at every resolution in
    ``res_list`` with ONE block generation and ONE int8-state build (the
    quantized state depends only on the weights, not the sequence length —
    sharing it saves ~40 s when bench.py folds both ratios into the driver
    JSON, round-3 VERDICT #1). Returns {res: (t_bf16, t_int8)} seconds."""
    B = 1
    cfg = WAN_CONFIGS["t2v-14B"]
    qcfg = QuantConfig.from_dict(
        {"full": W8A8_FULL, "w4a8": W4A8_DEPLOY}.get(variant, W8A8_SPEED))
    inputs = {res: _res_inputs(cfg, res, frame_num, B) for res in res_list}
    for res in res_list:
        print(f"14B block ratio probe [{variant}]: {res}p x {frame_num}f "
              f"seq {inputs[res][6]} (valid {inputs[res][5]}) "
              f"K={K} R={R} B={B}", flush=True)

    t0 = time.time()
    gen = make_block_generator(cfg)
    blocks = [jax.jit(gen)(jax.random.PRNGKey(100 + i)) for i in range(K)]
    jax.block_until_ready(blocks)
    print(f"{K} bf16 14B blocks on device in {time.time()-t0:.0f}s", flush=True)

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks)

    t_bf16 = {}
    for res in res_list:
        x, e0, c, cos, sin, valid_len, _ = inputs[res]
        t_bf16[res] = time_blocks(cfg, stacked, None, x, e0, c, cos, sin,
                                  valid_len, R)
        print(f"bf16 @ {res}p:  {t_bf16[res]*1000:8.1f} ms/block "
              f"(x40 blocks = {40*t_bf16[res]:.2f} s/fwd)", flush=True)

    # quantize the SAME blocks, strip FP copies
    t0 = time.time()
    policies = {}
    state = {}
    for i, bp in enumerate(blocks):
        for ln in BLOCK_LINEARS:
            pol = qcfg.resolve(f"blocks.{i}.{ln}")
            policies[f"blocks.{i}.{ln}"] = pol
            if not pol.is_quantized:
                continue
            node = bp
            for part in ln.split("."):
                node = node[part]
            st = prepare_layer_state(
                pol, node["w"], None, None, targets="int8",
                act_minmax=(np.asarray([8.0], np.float32),
                            np.asarray([-8.0], np.float32))
                if (pol.act is not None and not pol.act.dynamic) else None,
            )
            state[f"blocks.{i}.{ln}"] = st
    qctx = QuantCtx(mode="int8", policies=policies, state=state)
    qctx = make_scan_ctx(qctx, K)
    sblocks = [strip_quantized_weights({"blocks": [bp]}, {
        f"blocks.0.{ln}": policies[f"blocks.{i}.{ln}"] for ln in BLOCK_LINEARS
    })["blocks"][0] for i, bp in enumerate(blocks)]
    sstacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *sblocks)
    jax.block_until_ready(qctx.scan_state)
    del blocks, stacked
    print(f"int8 state ready in {time.time()-t0:.0f}s", flush=True)

    out = {}
    for res in res_list:
        x, e0, c, cos, sin, valid_len, _ = inputs[res]
        t_int8 = time_blocks(cfg, sstacked, qctx, x, e0, c, cos, sin,
                             valid_len, R)
        print(f"w8a8 @ {res}p:  {t_int8*1000:8.1f} ms/block "
              f"(x40 blocks = {40*t_int8:.2f} s/fwd)", flush=True)
        print(f"MEASURED 14B block ratio @ {res}p: "
              f"{t_bf16[res]/t_int8:.3f}x (bf16/int8)", flush=True)
        out[res] = (t_bf16[res], t_int8)
    return out


def measure(res: int = 720, frame_num: int = 81, K: int = 3, R: int = 4,
            variant: str = "speed"):
    """Single-resolution wrapper (CLI compat): (t_bf16, t_int8) per block."""
    return measure_multi((res,), frame_num, K, R, variant)[res]


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 720
    frame_num = int(sys.argv[2]) if len(sys.argv) > 2 else 81
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    R = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    variant = sys.argv[5] if len(sys.argv) > 5 else "speed"
    measure(res, frame_num, K, R, variant)


if __name__ == "__main__":
    main()
