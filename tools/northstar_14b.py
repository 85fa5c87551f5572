"""North-star measurement: Wan2.1-14B quantized 720p x 81f on ONE chip,
with the round-4 perf mechanisms COMPOSED at this scale for the first
time — sliding temporal-window attention x input-adaptive step cache x
sequential CFG x int4/int8-at-rest weights (BASELINE.md north-star;
round-4 VERDICT next-step #2).

Everything is measured in ONE session so every row shares compiles and
the same dense reference trajectory:

  A. umT5-XXL encode at full dims (freed after use)
  B. streamed W4A8 14B build (int-at-rest, no FP model ever exists)
  C. per-head window calibration FROM THE QUANTIZED MODEL
     (WanT2V.capture_attn_maps -> select_temporal_windows) — the 14B
     close of the calib->select->deploy chain (VERDICT #4): no FP copy
     exists at this scale, so maps come from the deployed model itself
  D. dense all-evaluate pass (adaptive threshold ~0): dense step times,
     the PSNR reference trajectory, AND the TeaCache drift->output trace
     in one run; fit_drift_poly-style polynomial fitted from the trace,
     giving the 14B-TUNED adaptive policy (VERDICT #6 — the 1.3B raw
     threshold 0.10 demonstrably declines skips at 14B)
  E. composed runs at the same steps: adaptive-only, window(1)+adaptive,
     calibrated-per-head-window+adaptive — each with action mix, s/step-eq
     (50-step extrapolation), final-latent PSNR vs D, and the effective
     ratio vs the bf16 BLOCK-EXTRAPOLATED step (the 14B bf16 model cannot
     exist on one 16 GB chip: the bf16 anchor is the measured 720p block
     time 1113 ms/block x 40 blocks x 2 CFG forwards = 89.0 s/step,
     BENCH_NOTES '14B ratio probe').

Random-init weights (no checkpoint ships in either repo) — PSNR gates are
mechanism-level fidelity vs the dense trajectory of the SAME weights; the
window-mass caveat from BENCH_NOTES applies (random-init attention is
near-uniform, the worst case for banding — calibrated radii here are
selector-emitted, not hand-written, which is the point of phase C).

Usage: python -u tools/northstar_14b.py [--steps 20] [--res 720]
       [--mass 0.9] [--pool 512] [--tol 0.10] [--skip_t5] [--skip_vae]
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
from e2e_probe import drain_device, phase_t5
from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.pipelines.text2video import AdaptiveCachePolicy, WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.utils.metrics import latent_psnr

# measured bf16 anchor at 14B 720p (BENCH_NOTES '14B ratio probe',
# tools/ratio_14b_probe.py): per-block bf16 time; a CFG step is
# 2 forwards x 40 blocks. The bf16 14B model cannot run end-to-end on
# one 16 GB chip, so the bf16 step is a block-level extrapolation.
BF16_BLOCK_MS_720P = 1113.0
BF16_BLOCK_MS_480P = 557.0  # same probe at 832*480


def log(m):
    print(m, flush=True)


def timed_traj(pipe, ctxs, steps, pol, size, frame_num, label):
    """One cached sequential-CFG trajectory; returns (latents, per-step
    times, trace, stats). Warm-compiles with a 2-step pass first."""
    c, cn = ctxs
    kw = dict(size=size, frame_num=frame_num, cfg_mode="sequential",
              cache_policy=pol, seed=42)
    t0 = time.time()
    # warmup steps must cover warmup+tail+1 UNPROTECTED step so the
    # per-call drift-metric jit also compiles before timing (the round-5
    # bench warmup lesson: a protected-only warm leaves dist_fn cold)
    n_warm = min(pol.warmup + pol.tail + 1, 5)
    warm = pipe.generate(c, cn, sampling_steps=n_warm, **kw)
    float(jnp.sum(warm))
    log(f"   [{label}] compile pass ({n_warm} steps): {time.time()-t0:.1f}s")
    del warm

    step_times = []
    tick = [time.time()]

    def on_step(i, t, lat):
        float(jnp.sum(lat))
        now = time.time()
        step_times.append(now - tick[0])
        tick[0] = now

    t0 = time.time()
    lat = pipe.generate(c, cn, sampling_steps=steps, on_step=on_step, **kw)
    lat = np.asarray(lat, np.float32)
    wall = time.time() - t0
    log(f"   [{label}] {steps} steps in {wall:.1f}s, per-step "
        f"min/med/max {min(step_times):.1f}/"
        f"{float(np.median(step_times)):.1f}/{max(step_times):.1f}s, "
        f"actions {pipe.last_cache_stats}")
    return lat, step_times, pipe.last_adaptive_trace, dict(
        pipe.last_cache_stats or {})


def extrapolate_50(pol, acts_stats, step_times, acts_seq):
    """50-step s/step-eq from the measured per-action costs + the
    measured unprotected action-mix (e2e_14b_probe's method)."""
    by_act = {}
    for a, dt in zip(acts_seq, step_times):
        by_act.setdefault(a, []).append(dt)
    cost = {a: float(np.median(v)) for a, v in by_act.items()}
    full = cost.get("full", max(step_times))
    cost.setdefault("cond", full / 2)
    cost.setdefault("reuse", 0.05)
    prot = pol.warmup + pol.tail
    mid = acts_seq[pol.warmup:len(acts_seq) - pol.tail]
    frac = {a: mid.count(a) / max(len(mid), 1)
            for a in ("full", "cond", "reuse")}
    denoise50 = prot * cost["full"] + (50 - prot) * sum(
        frac[a] * cost[a] for a in frac)
    return denoise50 / 50, cost, frac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--res", type=int, default=720, choices=[480, 720])
    ap.add_argument("--mass", type=float, default=0.9,
                    help="retained-mass threshold for per-head radii")
    ap.add_argument("--pool", type=int, default=128)
    ap.add_argument("--tol", type=float, default=0.10,
                    help="output-space adaptive threshold (with the "
                         "fitted poly the accumulator estimates output "
                         "change)")
    ap.add_argument("--window", type=int, default=1,
                    help="scalar radius for the composed row")
    ap.add_argument("--skip_t5", action="store_true")
    ap.add_argument("--skip_vae", action="store_true")
    ap.add_argument("--skip_perhead", action="store_true")
    args = ap.parse_args()

    cfg = WAN_CONFIGS["t2v-14B"]
    size = (1280, 720) if args.res == 720 else (832, 480)
    frame_num = 81
    bf16_step_s = 2 * cfg.num_layers * (
        BF16_BLOCK_MS_720P if args.res == 720 else BF16_BLOCK_MS_480P
    ) / 1e3
    log(f"northstar_14b: {size[0]}*{size[1]} f{frame_num} steps={args.steps} "
        f"on {jax.devices()[0]}; bf16 block-extrapolated CFG step "
        f"{bf16_step_s:.1f}s")

    # A. encoder at full dims (freed) — real e2e anchor
    t_encode = 0.0
    if not args.skip_t5:
        context, context_null, t_a = phase_t5(cfg, t5_cpu=False)
        t_encode = t_a["t5_encode_2x_warm_s"]
        drain_device("after T5")
        c = jnp.asarray(context)
        cn = jnp.asarray(context_null)
    else:
        rng = np.random.default_rng(0)
        c = jnp.asarray(rng.normal(
            size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
        cn = jnp.asarray(rng.normal(
            size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))

    # B. streamed quantized build
    from wanq_tpu.quant.stream import build_streamed_quant_base

    t0 = time.time()
    params, qctx, total_qbytes = build_streamed_quant_base(
        cfg, QuantConfig.from_dict(W4A8_720P),
        log=lambda m: log("   " + m))
    log(f"B. streamed W4A8 build: {time.time()-t0:.1f}s, "
        f"{total_qbytes/2**30:.2f} GiB int-at-rest")

    # C. per-head window calibration from the QUANTIZED model
    radii_ph = None
    if not args.skip_perhead:
        from wanq_tpu.quant.attn import (
            per_head_window_radii,
            select_temporal_windows,
        )
        from wanq_tpu.pipelines.text2video import (
            compute_seq_len,
            compute_target_shape,
        )

        # capture at 480p: radii are in LATENT FRAMES (identical 21-frame
        # grid at both resolutions), and the 720p pooled-map capture does
        # not fit next to the 6.6 GiB weight state on a 16 GB chip
        # (S=75776 f32 score chunks + 40-block stacked maps)
        cap_size = (832, 480)
        cap_pipe = WanT2V(cfg, params, quant_ctx=qctx)
        t0 = time.time()
        maps = cap_pipe.capture_attn_maps(
            c, size=cap_size, frame_num=frame_num, pool=args.pool, t=500.0)
        ts = compute_target_shape(cfg, cap_size, frame_num)
        tpf = (ts[2] // cfg.patch_size[1]) * (ts[3] // cfg.patch_size[2])
        n_frames = ts[1] // cfg.patch_size[0]
        radii = select_temporal_windows(
            maps, tpf, args.pool, threshold=args.mass,
            valid_len=n_frames * tpf)
        ph = per_head_window_radii(radii)
        radii_ph = tuple(int(r) for r in ph)
        del maps, cap_pipe
        from wanq_tpu.models.attention import TemporalWindow

        win = TemporalWindow(tpf, max(radii_ph), head_radii=radii_ph)
        log(f"C. calibrated per-head radii (mass>={args.mass}, "
            f"{time.time()-t0:.1f}s): {list(radii_ph)} "
            f"(density {win.density(n_frames):.3f}, {n_frames} frames)")
        # CLI round-trip (the emitted comma list is the deploy format)
        from types import SimpleNamespace

        from wanq_tpu.cli.common import parse_attn_window

        cli = ",".join(str(r) for r in radii_ph)
        assert parse_attn_window(
            SimpleNamespace(attn_window=cli)) == radii_ph
        drain_device("after capture")

    # D. dense all-evaluate pass: dense timing + PSNR reference + trace
    dense_pipe = WanT2V(cfg, params, quant_ctx=qctx)
    all_eval = AdaptiveCachePolicy(threshold=1e-12, warmup=1, tail=0)
    log("D. dense all-evaluate pass (timing + reference + drift trace)")
    ref_lat, dense_times, trace, _ = timed_traj(
        dense_pipe, (c, cn), args.steps, all_eval, size, frame_num, "dense")
    dense_step = float(np.median(dense_times))
    log(f"   dense sequential-CFG step: {dense_step:.1f}s = "
        f"{bf16_step_s/dense_step:.3f}x the bf16 block-extrapolated step")
    pts = [(e["d"], e["o"]) for e in (trace or []) if "o" in e]
    deg = min(4, len(pts) - 1)
    poly = tuple(float(x) for x in np.polyfit(
        [p[0] for p in pts], [p[1] for p in pts], deg))
    log(f"   fitted drift->output poly (deg {deg}, {len(pts)} pts): "
        f"{[round(p, 4) for p in poly]}")
    log(f"   raw drift d range: {min(p[0] for p in pts):.4f}.."
        f"{max(p[0] for p in pts):.4f}; output o range: "
        f"{min(p[1] for p in pts):.4f}..{max(p[1] for p in pts):.4f}")

    tuned = AdaptiveCachePolicy(threshold=args.tol, warmup=2, tail=2,
                                poly=poly)

    # E. composed rows
    rows = []

    def run_row(label, window):
        ctx = qctx if window is None else qctx.replace(
            attn_window=window, collect=qctx.collect)
        pipe = WanT2V(cfg, params, quant_ctx=ctx)
        lat, times, tr, stats = timed_traj(
            pipe, (c, cn), args.steps, tuned, size, frame_num, label)
        acts = (["full"] * tuned.warmup
                + [e["act"] for e in (tr or [])])
        acts = (acts + ["full"] * tuned.tail)[:args.steps]
        s_eq, cost, frac = extrapolate_50(tuned, stats, times, acts)
        psnr = latent_psnr(ref_lat, lat)
        rows.append({
            "label": label, "psnr_db": round(float(psnr), 1),
            "s_per_step_eq_50": round(s_eq, 2),
            "vs_dense_x": round(dense_step / s_eq, 3),
            "vs_bf16_block_extrap_x": round(bf16_step_s / s_eq, 3),
            "mix": {k: round(v, 2) for k, v in frac.items()},
            "full_cost_s": round(cost.get("full", 0.0), 1),
        })
        log(f"   [{label}] s/step-eq(50) {s_eq:.2f}s = "
            f"{dense_step/s_eq:.2f}x dense quant / "
            f"{bf16_step_s/s_eq:.2f}x bf16-extrap, PSNR {psnr:.1f} dB")
        del pipe
        return lat

    run_row("ada-tuned", None)
    run_row(f"win{args.window}+ada", args.window)
    if radii_ph is not None:
        run_row("winPH+ada", radii_ph)

    # VAE decode anchor for minutes/video — free the ENTIRE DiT weight
    # state first (the 720p decode needs ~8 GB next to nothing else; the
    # first run of this tool OOMed here holding the 6.6 GiB base alive)
    t_vae = 0.0
    if not args.skip_vae:
        del dense_pipe, params, qctx, c, cn
        drain_device("before vae")
        from wanq_tpu.models.vae import WanVAE

        vae = WanVAE(compute_dtype=jnp.bfloat16)
        t0 = time.time()
        video = vae.decode(jnp.asarray(ref_lat))
        float(jnp.sum(video))
        t_vae = time.time() - t0
        log(f"VAE decode (cold): {t_vae:.1f}s -> {tuple(video.shape)}")
        del video, vae

    best = max(rows, key=lambda r: r["vs_bf16_block_extrap_x"])
    e2e_min = (t_encode + 50 * best["s_per_step_eq_50"] + t_vae) / 60
    summary = {
        "config": f"14B {args.res}p x {frame_num}f, {args.steps} steps "
                  "measured, W4A8 streamed, sequential CFG",
        "bf16_block_extrap_step_s": round(bf16_step_s, 1),
        "dense_quant_step_s": round(dense_step, 1),
        "dense_vs_bf16_x": round(bf16_step_s / dense_step, 3),
        "adaptive_poly": [round(p, 5) for p in poly],
        "adaptive_tol": args.tol,
        "calibrated_per_head_radii": list(radii_ph) if radii_ph else None,
        "rows": rows,
        "t_encode_s": round(t_encode, 1),
        "t_vae_s": round(t_vae, 1),
        "e2e_50step_min_best": round(e2e_min, 1),
    }
    log("\nNORTHSTAR SUMMARY " + json.dumps(summary))


if __name__ == "__main__":
    main()
