"""Follow-up to tools/northstar_14b.py: sweep OUTPUT-space adaptive
tolerances at the 14B 720p north-star config to find skip-admitting
operating points and their fidelity gates.

The northstar run measured the 14B trajectory's realized per-step output
change at o ≈ 0.37–0.52 (an order of magnitude above the 1.3B
trajectory's — the measured reason the 1.3B raw threshold 0.10 declines
skips at 14B). A tol below o admits nothing; this sweep runs the
14B-fitted poly at tolerances bracketing the measured o range and
records action mix + final-latent PSNR vs the same-steps dense
trajectory, composed with the window.

Usage: python -u tools/northstar_tol_sweep.py [--steps 12]
       [--tols 0.5,0.9,1.4] [--window 1] [--poly c4,c3,c2,c1,c0]
Default poly = the northstar 20-step fit (log of 2026-08-20 run).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from e2e_14b_probe import W4A8_720P
from northstar_14b import BF16_BLOCK_MS_720P, extrapolate_50, log, timed_traj
from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.pipelines.text2video import AdaptiveCachePolicy, WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.utils.metrics import latent_psnr

NORTHSTAR_POLY = (1093.65, -815.4389, 203.7633, -19.7345, 1.0494)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--tols", default="0.5,0.9,1.4")
    ap.add_argument("--window", type=int, default=1)
    ap.add_argument("--poly", default="")
    args = ap.parse_args()
    tols = [float(t) for t in args.tols.split(",")]
    poly = (tuple(float(c) for c in args.poly.split(","))
            if args.poly else NORTHSTAR_POLY)

    cfg = WAN_CONFIGS["t2v-14B"]
    size = (1280, 720)
    bf16_step_s = 2 * cfg.num_layers * BF16_BLOCK_MS_720P / 1e3
    log(f"northstar_tol_sweep: 14B 720p f81 steps={args.steps} "
        f"tols={tols} window={args.window} on {jax.devices()[0]}")

    from wanq_tpu.quant.stream import build_streamed_quant_base

    params, qctx, _ = build_streamed_quant_base(
        cfg, QuantConfig.from_dict(W4A8_720P), log=lambda m: None)
    log("streamed W4A8 base ready")
    rng = np.random.default_rng(0)
    c = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    cn = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))

    # dense same-steps reference (all-evaluate adaptive: also the dense
    # step timing)
    dense_pipe = WanT2V(cfg, params, quant_ctx=qctx)
    all_eval = AdaptiveCachePolicy(threshold=1e-12, warmup=1, tail=0)
    ref, dense_times, _, _ = timed_traj(
        dense_pipe, (c, cn), args.steps, all_eval, size, 81, "dense")
    dense_step = float(np.median(dense_times))
    del dense_pipe

    wctx = qctx.replace(attn_window=args.window, collect=qctx.collect)
    pipe = WanT2V(cfg, params, quant_ctx=wctx)
    rows = []
    for tol in tols:
        pol = AdaptiveCachePolicy(threshold=tol, warmup=2, tail=2,
                                  poly=poly)
        lat, times, tr, stats = timed_traj(
            pipe, (c, cn), args.steps, pol, size, 81,
            f"win{args.window}+tol{tol}")
        acts = (["full"] * pol.warmup + [e["act"] for e in (tr or [])])
        acts = (acts + ["full"] * pol.tail)[:args.steps]
        s_eq, cost, frac = extrapolate_50(pol, stats, times, acts)
        psnr = float(latent_psnr(ref, lat))
        rows.append({
            "tol": tol, "psnr_db": round(psnr, 1),
            "s_per_step_eq_50": round(s_eq, 2),
            "vs_dense_x": round(dense_step / s_eq, 3),
            "vs_bf16_block_extrap_x": round(bf16_step_s / s_eq, 3),
            "mix": {k: round(v, 2) for k, v in frac.items()},
        })
        log(f"   tol={tol}: s/step-eq(50) {s_eq:.2f}s = "
            f"{dense_step/s_eq:.2f}x dense / "
            f"{bf16_step_s/s_eq:.2f}x bf16-extrap, PSNR {psnr:.1f} dB, "
            f"mix {rows[-1]['mix']}")

    log("\nTOL SWEEP SUMMARY " + json.dumps({
        "dense_step_s": round(dense_step, 1),
        "poly": list(poly), "window": args.window, "rows": rows}))


if __name__ == "__main__":
    main()
