"""Full 14-billion-parameter 720p pipeline END-TO-END on ONE 16 GB chip.

The reference cannot run its 14B T2V model at 720p on fewer than
multiple 80 GB GPUs (28 GB bf16 weights + FSDP/xDiT sharding,
examples/Wan2.1/README.md). This probe executes the whole production
pipeline — umT5-XXL encode (10.58 GiB, freed after use), streamed W4A8
DiT build (6.58 GiB int-at-rest, the FP model never exists), REAL unipc
denoise with the sequential-CFG schedule (pipelines/text2video.py
cfg_mode='sequential' — the batched [2B] pair OOMs at seq 75776 next to
the weight state), and the bf16 VAE decode to [1,3,81,720,1280] (the
f32 decode OOMs; models/vae.py compute_dtype) — in one process on one
v5e, and reports the measured per-stage wall-clock plus the
50-step-video extrapolation.

Usage: python -u tools/e2e_14b_probe.py [--steps 3] [--res 720]
Random-init weights (no checkpoint ships in either repo); phases are
sequenced the way the reference's offload_model=True serving mode does
(text2video.py:200-210): encoder freed before the DiT, DiT state freed
before the decode.
"""

from __future__ import annotations

import argparse
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

from e2e_probe import drain_device, phase_t5
from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.pipelines.text2video import WanT2V
from wanq_tpu.quant import QuantConfig

# the measured-fastest 720p single-chip plan (BENCH_NOTES '14B deploy'):
# all-W4 weights + static-A8 on ffn.2 so the seq x ffn_dim (2.1 GB/block)
# GELU output never lands in HBM
W4A8_720P = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head"
    ),
    "weight": {"n_bits": 4, "sym": False},
    "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5,
                    help="real denoise steps to execute (extrapolated to 50)")
    ap.add_argument("--res", type=int, default=720, choices=[480, 720])
    ap.add_argument("--cached", nargs="?", const="static", default="",
                    choices=["", "static", "ada"],
                    help="denoise under a cache policy: 'static' = "
                         "StepCachePolicy(cfg2+reuse2) (fidelity gate "
                         "measured at 1.3B, tools/cache_probe.py 47.5 dB); "
                         "'ada' = AdaptiveCachePolicy(0.10) (55.9 dB at "
                         "1.3B). Static extrapolates 50 steps from the "
                         "policy's real plan; adaptive from the measured "
                         "unprotected action-mix fractions")
    args = ap.parse_args()
    cfg = WAN_CONFIGS["t2v-14B"]
    size = (1280, 720) if args.res == 720 else (832, 480)
    frame_num = 81
    print(f"e2e_14b_probe: t2v-14B {size[0]}*{size[1]} f{frame_num}, "
          f"{args.steps} real steps, on {jax.devices()[0]}", flush=True)

    # A. umT5-XXL encode at full dims, then free (shared with e2e_probe)
    context, context_null, t_a = phase_t5(cfg, t5_cpu=False)
    drain_device("after T5")

    # B. streamed W4A8 14B build + real sequential-CFG unipc denoise
    from wanq_tpu.quant.stream import build_streamed_quant_base

    t0 = time.time()
    params, qctx, total_qbytes = build_streamed_quant_base(
        cfg, QuantConfig.from_dict(W4A8_720P),
        log=lambda m: print("   " + m, flush=True))
    t_build = time.time() - t0
    print(f"B. streamed W4A8 build: {t_build:.1f}s, "
          f"{total_qbytes/2**30:.2f} GiB int-at-rest "
          f"(bf16 would be ~27 GiB)", flush=True)

    from wanq_tpu.pipelines.text2video import (
        AdaptiveCachePolicy,
        StepCachePolicy,
    )

    if args.cached == "ada":
        pol = AdaptiveCachePolicy(threshold=0.10, warmup=2, tail=2)
    elif args.cached:
        pol = StepCachePolicy(cfg_interval=2, reuse_interval=2,
                              warmup=2, tail=2)
    else:
        pol = None
    pipe = WanT2V(cfg, params, quant_ctx=qctx)
    c_j = jnp.asarray(context)
    cn_j = jnp.asarray(context_null)
    gen_kw = dict(size=size, frame_num=frame_num, cfg_mode="sequential",
                  cache_policy=pol)
    t0 = time.time()
    # 2 steps compile everything even under the cache policy: in
    # sequential mode the single compiled cond fn serves every action
    lat_c = pipe.generate(c_j, cn_j, sampling_steps=2, seed=0, **gen_kw)
    float(jnp.sum(lat_c))  # fence: don't let queued work bleed into timing
    t_compile = time.time() - t0
    del lat_c
    print(f"   denoise compile pass (fenced): {t_compile:.1f}s", flush=True)

    # per-step wall-clock via the on_step hook (each callback fences, so
    # steps are timed individually — the tunneled chip shows real
    # run-to-run variance and a single aggregate hides it)
    step_times = []
    tick = [time.time()]

    def on_step(i, t, lat):
        float(jnp.sum(lat))
        now = time.time()
        step_times.append(now - tick[0])
        tick[0] = now
        print(f"     step {i} (t={t:.0f}): {step_times[-1]:.1f}s", flush=True)

    t0 = time.time()
    latents = pipe.generate(c_j, cn_j, sampling_steps=args.steps, seed=42,
                            on_step=on_step, **gen_kw)
    latents = np.asarray(latents, np.float32)
    t_denoise = time.time() - t0
    if pol is not None:
        # cost model per action from the measured per-step times, then
        # price the 50-step run: the REAL plan for the static policy;
        # for the adaptive one, the measured unprotected mix fractions
        # scaled to 50 steps (warmup/tail stay full)
        adaptive = isinstance(pol, AdaptiveCachePolicy)
        if adaptive:
            acts = ["full"] * pol.warmup + [
                e["act"] for e in pipe.last_adaptive_trace] + \
                ["full"] * pol.tail
            acts = acts[:args.steps]
        else:
            acts = pol.plan(args.steps)
        by_act = {}
        for a, dt in zip(acts, step_times):
            by_act.setdefault(a, []).append(dt)
        cost = {a: float(np.median(v)) for a, v in by_act.items()}
        print("   measured per-action cost: " + ", ".join(
            f"{a}={cost[a]:.1f}s x{len(by_act[a])}" for a in cost),
            flush=True)
        # actions unseen in the short run: cond ~ half a full pair,
        # reuse ~ solver-only (use the smallest observed time floor)
        full = cost.get("full", max(step_times))
        cost.setdefault("cond", full / 2)
        cost.setdefault("reuse", min(step_times + [0.5]) * 0.01)
        if adaptive:
            prot = pol.warmup + pol.tail
            mid = [a for a in acts[pol.warmup:args.steps - pol.tail]]
            frac = {a: mid.count(a) / max(len(mid), 1)
                    for a in ("full", "cond", "reuse")}
            denoise50 = prot * cost["full"] + (50 - prot) * sum(
                frac[a] * cost[a] for a in frac)
            print(f"   adaptive mix over {len(mid)} unprotected steps: "
                  + ", ".join(f"{a}={frac[a]:.2f}" for a in frac
                              if frac[a]), flush=True)
        else:
            plan50 = pol.plan(50)
            denoise50 = sum(cost[a] for a in plan50)
        s_per_step = denoise50 / 50
    else:
        s_per_step = float(np.median(step_times))
        denoise50 = 50 * s_per_step
    print(f"   {args.steps}-step sequential-CFG denoise"
          f"{' (cached ' + args.cached + ')' if pol else ''}: {t_denoise:.1f}s "
          f"(per-step min {min(step_times):.1f} / median "
          f"{float(np.median(step_times)):.1f} / max {max(step_times):.1f}) "
          f"-> latents {latents.shape}", flush=True)
    assert np.isfinite(latents).all()
    del pipe, params, qctx, c_j, cn_j
    drain_device("after denoise")

    # C. bf16 VAE decode (f32 OOMs at 720p; models/vae.py compute_dtype)
    from wanq_tpu.models.vae import WanVAE

    vae = WanVAE(compute_dtype=jnp.bfloat16)
    t0 = time.time()
    video = vae.decode(jnp.asarray(latents))
    float(jnp.sum(video))  # scalar fence (relay under-reports otherwise)
    t_vae_cold = time.time() - t0
    t0 = time.time()
    video = vae.decode(jnp.asarray(latents))
    float(jnp.sum(video))
    t_vae = time.time() - t0
    print(f"C. bf16 VAE decode -> {tuple(video.shape)}: {t_vae:.1f}s steady "
          f"(cold {t_vae_cold:.1f}s)", flush=True)
    assert np.isfinite(np.asarray(video[:, :, :1], np.float32)).all()

    encode = t_a["t5_encode_2x_warm_s"]
    measured = encode + t_denoise + t_vae
    full50 = encode + denoise50 + t_vae
    print(f"\n14B {args.res}p x {frame_num}f ON ONE CHIP "
          f"(warm, {args.steps} steps measured"
          f"{', cached ' + args.cached if pol else ''}): {measured:.1f}s "
          f"= encode {encode:.1f} + denoise {t_denoise:.1f} "
          f"+ vae {t_vae:.1f}")
    print(f"50-step 5s video extrapolation: {full50/60:.1f} min "
          f"({encode:.1f} + {denoise50:.0f} [{s_per_step:.1f}/step-eq] "
          f"+ {t_vae:.1f} s)")
    print("one-time: " + ", ".join(
        f"{k}={v:.1f}s" for k, v in {
            "t5_init": t_a["t5_init_s"], "dit_build": t_build,
            "denoise_compile": t_compile, "vae_cold": t_vae_cold}.items()))
    print("14B E2E SINGLE-CHIP OK", flush=True)


if __name__ == "__main__":
    main()
