"""Per-HLO profile of the bench denoise step on the attached TPU.

Runs the W8A8 (or bf16) CFG step under jax.profiler, parses the XSpace
trace, and prints the top ops plus a bucket summary (attention / int8
GEMM / fp GEMM / producers / other) — the TPU-native replacement for the
reference's per-op cuda-sync timing prints (wan/modules/model.py:311-362),
measured from the real hardware trace instead of host timers.

Usage: python -u tools/profile_step.py [fp|w8a8] [top_k]
"""

from __future__ import annotations

import glob
import os
import re
import sys
import tempfile
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BUCKETS = [
    ("attention (splash/flash)", re.compile(r"splash|flash|attn", re.I)),
    ("int8 GEMM", re.compile(r"dot.*s8|convert.*s8|s8.*dot|quantized", re.I)),
    ("GEMM/conv (fp)", re.compile(r"dot|conv", re.I)),
    ("producers (LN/quant/gelu)", re.compile(r"reduce|norm|tanh|clamp|round", re.I)),
    ("copies/layout", re.compile(r"copy|transpose|reshape|slice|pad|concat", re.I)),
]


def parse_xspace(trace_dir: str):
    """Per-HLO self-times via xprof's hlo_stats converter.

    Returns {(category, hlo_name): total_self_ms}."""
    import json

    from xprof.convert import raw_to_tool_data

    paths = glob.glob(os.path.join(trace_dir, "**", "*.xplane.pb"),
                      recursive=True)
    assert paths, f"no xplane.pb under {trace_dir}"
    data, _ = raw_to_tool_data.xspace_to_tool_data(paths, "hlo_stats", {})
    table = json.loads(data if isinstance(data, str) else data.decode())
    cols = [c["id"] for c in table["cols"]]
    i_cat = cols.index("category")
    i_name = cols.index("hlo_op_name")
    i_self = cols.index("total_self_time")
    i_expr = cols.index("hlo_op_expression")
    totals = defaultdict(float)
    exprs = {}
    for row in table["rows"]:
        c = [cell["v"] if isinstance(cell, dict) else cell for cell in row["c"]]
        key = (str(c[i_cat]), str(c[i_name]))
        totals[key] += float(c[i_self]) / 1e3
        exprs.setdefault(key, str(c[i_expr]))
    return totals, exprs  # (category, name) -> ms; -> hlo text


def bucketize(totals):
    buckets = defaultdict(float)
    for (cat, name), ms in totals.items():
        key = f"{cat} {name}"
        for label, pat in BUCKETS:
            if pat.search(key):
                buckets[label] += ms
                break
        else:
            buckets[f"[{cat}]"] += ms
    return buckets


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "w8a8"
    top_k = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    import bench

    cfg_mod = bench
    from wanq_tpu.configs import WAN_CONFIGS
    from wanq_tpu.models.dit import (
        init_params_on_device,
        linear_layer_names,
        make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.pipelines.text2video import (
        compute_seq_len,
        compute_target_shape,
    )
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg = WAN_CONFIGS["t2v-1.3B"]
    target_shape = compute_target_shape(cfg, (832, 480), 81)
    seq_len = compute_seq_len(cfg, target_shape)
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, *target_shape), jnp.float32)
    t = jnp.asarray([999.0])
    c = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.float32)
    cn = jax.random.normal(jax.random.PRNGKey(2), c.shape, jnp.float32)
    gs = jnp.float32(5.0)
    step_fn = cfg_mod.make_step(cfg, seq_len)

    ctx = None
    if mode == "w8a8":
        qdict = dict(cfg_mod.FULL_W8A8)
        names = linear_layer_names(cfg)
        calib = {}
        for n in names:
            if n.endswith("ffn.2"):
                calib[f"{n}.act_max"] = np.full((1, cfg.ffn_dim), 6.0, np.float32)
                calib[f"{n}.act_min"] = np.full((1, cfg.ffn_dim), -6.0, np.float32)
        lp = init_params_on_device(cfg, seed=0)
        policies, state, rotations = prepare_quant_state(
            lp, names, QuantConfig.from_dict(qdict), targets="int8", calib=calib
        )
        del lp
        ctx = make_scan_ctx(
            QuantCtx(mode="int8", policies=policies, state=state,
                     rotations=rotations),
            cfg.num_layers,
        )
        jax.block_until_ready(ctx.scan_state)

    # warm up (compile outside the trace)
    x = latents
    for _ in range(2):
        x = 0.99 * step_fn(params, ctx, x, t, c, cn, gs)
    float(jnp.sum(x))

    trace_dir = tempfile.mkdtemp(prefix="wanq_trace_")
    with jax.profiler.trace(trace_dir):
        for _ in range(2):
            x = 0.99 * step_fn(params, ctx, x, t, c, cn, gs)
        float(jnp.sum(x))

    totals, exprs = parse_xspace(trace_dir)
    n_steps = 2
    grand = sum(totals.values()) / n_steps
    print(f"\n== {mode} step: {grand:.0f} ms of TPU leaf ops/step "
          f"({len(totals)} distinct HLOs) ==")
    print("\n-- buckets --")
    for label, ms in sorted(bucketize(totals).items(), key=lambda kv: -kv[1]):
        ms /= n_steps
        print(f"{label:35s} {ms:8.1f} ms  {100*ms/grand:5.1f}%")
    print(f"\n-- top {top_k} HLOs --")
    for (cat, name), ms in sorted(totals.items(), key=lambda kv: -kv[1])[:top_k]:
        print(f"{ms/n_steps:9.2f} ms  [{cat}] {name[:90]}")
        print(f"              {exprs[(cat, name)][:180]}")


if __name__ == "__main__":
    main()
