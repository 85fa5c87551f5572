"""Benchmark: Wan2.1 T2V-1.3B W8A8 denoise-step throughput vs FP16 (bf16).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
value = W8A8 denoise steps/sec/chip and vs_baseline = speedup over the
bf16 full-precision step measured in the same run (the reference's own
kernel bench pattern: correctness harness elsewhere, FP16-vs-int8 timing
here, kernels/bench/bench_gemm.py:34-95).

Quant config (FULL_W8A8 below): W8A8 on self-attn q/k/v (one shared
LN+quant producer), cross-attn q (fused norm3+quant producer) and both
ffn linears (LN-quant→GEMM→GELU-static-quant→GEMM). o and cross k/v/o
stay FP: the round-3 sweep (tools/config_sweep.py) measured the fully
quantized config at the same speed (3132 vs 3138 ms, within noise) but
−4.7 dB PSNR — cross k/v quant hits attention keys/values broadly; the
reference's shipped Wan config keeps o/cross FP for the same reason
(quant_configs/config.yaml:4-8). The int8 heads-major o path exists and
is parity-tested for full-coverage deployments.
Shapes: 480*832, frame_num auto-reduced to fit the chip's HBM.

Timing methodology: latents are chained through the step function
(out_i feeds step_{i+1}) with one block_until_ready at the end — robust
against async-dispatch artifacts of remote/relayed TPU backends.
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: remote compiles on relayed TPU backends are slow
jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.configs import WAN_CONFIGS
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

# Round-3 site selection (measured, tools/config_sweep.py): + cross-attn
# q via the fused norm3+quant producer (−15 ms, −0.5 dB); o int8 and
# cross k/v int8 are speed-neutral but cost 0.5 / 4.2 dB → kept FP.
# Static-A8 on the qkv/cross-q producers measured NO win (the Pallas
# dynamic producer is already single-pass; the static XLA form re-splits
# the LN into two passes — 3142.6 vs 3132.1 ms at equal PSNR).
#
# Activation scheme: dynamic per-token everywhere EXCEPT the ffn.2 input
# (the GELU output), which uses a calibration-frozen per-tensor scale —
# the reference's quant_sum_static kernel (fused.cu:586). Static there
# makes GELU+quant elementwise, so XLA fuses it into the first FFN GEMM's
# epilogue and the 1.17 GB bf16 intermediate never round-trips HBM
# (−75 ms/step measured; tools/static_ffn_probe.py). The scale is
# calibrated in-run by one calib-mode step (collect_minmax) before PTQ.
FULL_W8A8 = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"cross_attn\.(k|v|o)|blocks\.\d+\.self_attn\.o"
    ),
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def make_step(cfg, seq_len):
    # the quant ctx rides as a pytree ARGUMENT — closing over it would embed
    # the int8 weights as HLO literals (multi-GB programs)
    def step(params, qctx, latents, t, context, context_null, guide_scale):
        b = latents.shape[0]
        x2 = jnp.concatenate([latents, latents], axis=0)
        c2 = jnp.concatenate([context, context_null], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)
        out = dit_forward(params, cfg, x2, t2, c2, seq_len, ctx=qctx)
        cond, uncond = out[:b], out[b:]
        return uncond + guide_scale * (cond - uncond)

    return jax.jit(step)


def _sync(x) -> float:
    """Force a real on-device value fetch (block_until_ready is not a
    reliable fence on the experimental relayed backend)."""
    return float(jnp.sum(x))


def time_step(step_fn, params, qctx, latents, t, c, cn, gs, iters=6, warmup=2,
              reps=2):
    """Chained timing: each step consumes the previous output; a scalar
    fetch at the end fences the whole chain. Takes the MIN over ``reps``
    independent chains — a transient relay stall inside one chain
    otherwise poisons the whole measurement (observed: a bf16 chain
    reading 19.2 s/step while the int8 chain in the same run measured
    its usual 3.14 s)."""
    x = latents
    for _ in range(warmup):
        x = 0.99 * step_fn(params, qctx, x, t, c, cn, gs)
    _sync(x)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            x = 0.99 * step_fn(params, qctx, x, t, c, cn, gs)
        _sync(x)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(frame_num: int):
    cfg = WAN_CONFIGS["t2v-1.3B"]
    size = (832, 480)
    target_shape = compute_target_shape(cfg, size, frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    log(f"bench: 1.3B {size} f{frame_num} seq_len={seq_len} on {jax.devices()[0]}")

    t0 = time.time()
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    # the reference zero-inits head.head; randomize it so the fidelity
    # check below carries signal
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    jax.block_until_ready(params)
    log(f"on-device init: {time.time()-t0:.1f}s")

    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, *target_shape), dtype=jnp.float32)
    t = jnp.asarray([999.0])
    context = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), dtype=jnp.float32)
    context_null = jax.random.normal(
        jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim), dtype=jnp.float32
    )
    gs = jnp.float32(5.0)

    log("compiling + timing FP16 (bf16) step...")
    t0 = time.time()
    step_fn = make_step(cfg, seq_len)
    fp_time = time_step(step_fn, params, None, latents, t, context, context_null, gs)
    log(f"fp16 step: {fp_time*1000:.1f} ms (total {time.time()-t0:.1f}s)")

    log("calibrating static-A8 scales (one calib-mode step)...")
    t0 = time.time()

    def calib_step(p, x, tt, c):
        b = x.shape[0]
        cctx = QuantCtx(mode="calib", collect_minmax=True)
        out = dit_forward(
            p, cfg, jnp.concatenate([x, x], 0), jnp.concatenate([tt, tt], 0),
            jnp.concatenate([c, c], 0), seq_len, ctx=cctx,
        )
        return out[:b], cctx.collect

    _, stats = jax.jit(calib_step)(params, latents, t, context)
    calib = {
        k: np.asarray(v)[None] for k, v in stats.items()
        if k.endswith((".act_max", ".act_min"))
    }
    jax.block_until_ready(params)
    log(f"calibration: {len(calib)} minmax entries in {time.time()-t0:.1f}s")

    log("preparing W8A8 state (on-device)...")
    t0 = time.time()
    qcfg = QuantConfig.from_dict(FULL_W8A8)
    # PTQ consumes list-form params; regenerate cheaply on device
    list_params = init_params_on_device(cfg, seed=0)
    policies, state, rotations = prepare_quant_state(
        list_params, linear_layer_names(cfg), qcfg, targets="int8", calib=calib
    )
    del list_params
    ctx = QuantCtx(mode="int8", policies=policies, state=state, rotations=rotations)
    ctx = make_scan_ctx(ctx, cfg.num_layers)
    jax.block_until_ready(ctx.scan_state)
    log(f"PTQ done: {time.time()-t0:.1f}s")

    log("compiling + timing W8A8 step...")
    t0 = time.time()
    q_time = time_step(step_fn, params, ctx, latents, t, context, context_null, gs)
    log(f"w8a8 step: {q_time*1000:.1f} ms (total {time.time()-t0:.1f}s)")

    # quant fidelity on a seeded set of steps: PSNR/rel-err/cosine on the
    # RAW latent noise-preds (all 16 channels — same basis as round 1),
    # plus FPFVD-style FVD on the video adaptation
    # (ref eval/video/readme.md:9-16; random-feature FVD — see utils/fvd.py)
    from wanq_tpu.utils.fvd import fvd, latents_as_videos
    from wanq_tpu.utils.metrics import quant_fidelity_report

    fp_outs, q_outs = [], []
    for s in range(4):
        lat_s = jax.random.normal(jax.random.PRNGKey(10 + s), latents.shape,
                                  jnp.float32)
        fp_outs.append(np.asarray(
            step_fn(params, None, lat_s, t, context, context_null, gs)))
        q_outs.append(np.asarray(
            step_fn(params, ctx, lat_s, t, context, context_null, gs)))
    fp_set = np.concatenate(fp_outs, axis=0)
    q_set = np.concatenate(q_outs, axis=0)
    rep = quant_fidelity_report(fp_set, q_set)
    rep["fvd_random_feat"] = fvd(latents_as_videos(fp_set),
                                 latents_as_videos(q_set))
    log(f"W8A8 vs FP noise-pred fidelity (4 seeds): PSNR {rep['psnr_db']:.1f} dB, "
        f"rel_err {rep['rel_err']:.4f}, cosine {rep['cosine']:.5f}, "
        f"FVD(rand-feat) {rep['fvd_random_feat']:.2e}")

    return {
        "fp_time": fp_time,
        "q_time": q_time,
        "rep": rep,
        "cfg": cfg,
        "seq_len": seq_len,
        "params": params,
        "ctx": ctx,
        "context": context,
        "context_null": context_null,
        "frame_num": frame_num,
    }


def model_flops_per_step(cfg, seq_len: int, batch: int = 2) -> float:
    """Analytic FLOPs of one CFG denoise forward (blocks only; head/embed
    ~2% excluded). MACs x2; attention counted over the padded seq."""
    d, f, tl = cfg.dim, cfg.ffn_dim, cfg.text_len
    # per-token MACs per block: qkv+o (4 d^2), cross q+o (2 d^2), ffn (2 d f)
    lin = 4 * d * d + 2 * d * d + 2 * d * f
    attn = 2 * seq_len * d + 2 * tl * d  # self QK^T+PV, cross QK^T+PV
    per_tok = lin + attn
    cross_kv = 2 * tl * d * d  # k,v projections over text tokens
    macs = cfg.num_layers * (seq_len * per_tok + cross_kv) * batch
    return 2.0 * macs


V5E_BF16_PEAK = 197e12


def measure_stepcache(r, steps: int = 12):
    """Measured step-cache speedup + fidelity gate at the bench config:
    static reuse2 and the input-adaptive ada.10 policy (the measured
    frontier winner at 30 steps, tools/cache_probe.py). Returns
    {name: (speedup, psnr)}."""
    from wanq_tpu.pipelines.text2video import (
        AdaptiveCachePolicy,
        StepCachePolicy,
        WanT2V,
    )
    from wanq_tpu.utils.metrics import latent_psnr

    pipe = WanT2V(r["cfg"], r["params"], quant_ctx=r["ctx"])
    kw = dict(size=(832, 480), frame_num=r["frame_num"],
              sampling_steps=steps, seed=42)
    pols = {"reuse2": StepCachePolicy(reuse_interval=2, warmup=2, tail=2),
            "adaptive.10": AdaptiveCachePolicy(threshold=0.10, warmup=2,
                                               tail=2)}
    # window x cache composition (measured 4.31x over the uncached W8A8
    # loop at 54 dB over 30 steps, BENCH_NOTES round-5 "Fenced re-run"):
    # the windowed pipe shares the uncached baseline's fidelity gate
    win_pipe = None
    if os.environ.get("WANQ_BENCH_WINDOW", "1") != "0":
        win_pipe = WanT2V(r["cfg"], r["params"],
                          quant_ctx=r["ctx"].replace(
                              attn_window=1, collect=r["ctx"].collect))
    # compile pass for all paths (the policies share the cond/split fns).
    # EVERY warmup is FENCED: generate() returns with device work still
    # queued (the denoise loop dispatches asynchronously), and unfenced
    # warm work bleeds into the next timed run — measured +9.3 s on the
    # first timed step of the round-5 composition row (the leftover 5-step
    # warm trajectory), which is what made win1+ada read 2.25x instead of
    # its true ~4x. The adaptive warmup also exercises the per-call
    # drift-metric jit (dist_fn) before timing.
    def warm(p, pol=None, steps=2):
        out = p.generate(r["context"], r["context_null"], cache_policy=pol,
                         **{**kw, "sampling_steps": steps})
        float(jnp.sum(out))  # scalar fence: drain the queue before timing

    warm(pipe)
    warm(pipe, pols["reuse2"], 5)
    warm(pipe, AdaptiveCachePolicy(threshold=0.10, warmup=2, tail=2), 5)
    t0 = time.perf_counter()
    base = np.asarray(pipe.generate(r["context"], r["context_null"], **kw))
    t_base = time.perf_counter() - t0
    runs = [(name, pipe, pol) for name, pol in pols.items()]
    if win_pipe is not None:
        runs.append(("win1+adaptive.10", win_pipe,
                     AdaptiveCachePolicy(threshold=0.10, warmup=2, tail=2)))
    out = {}
    for name, p, pol in runs:
        if p is not pipe:
            # compile pass for the windowed pipe's CACHED step fns: the
            # caching loop runs separate split/cond jits (_build_split_step_fn
            # /_build_cond_step_fn), so a plain warmup generate does NOT
            # compile them — the round-4 driver bench timed win1+ada at
            # 2.097x (vs the true ~4x) because the composed run paid
            # split/cond compilation AND inherited the unfenced warm
            # queue. Same-policy-type warm + scalar fence, as above.
            warm(p, AdaptiveCachePolicy(threshold=0.10, warmup=2, tail=2), 5)
        t0 = time.perf_counter()
        cached = np.asarray(p.generate(r["context"], r["context_null"],
                                       cache_policy=pol, **kw))
        t_cached = time.perf_counter() - t0
        psnr = latent_psnr(base, cached)
        log(f"step-cache {name} over {steps} steps: {t_base:.1f}s -> "
            f"{t_cached:.1f}s ({t_base/t_cached:.3f}x), final-latent PSNR "
            f"{psnr:.1f} dB vs uncached {p.last_cache_stats}")
        out[name] = (t_base / t_cached, psnr)
    return out


def quant_weight_residency(r):
    """Measured quantized-weight bytes vs the bf16 bytes they replace."""
    qbytes = sum(x.nbytes for x in jax.tree.leaves(r["ctx"].scan_state))
    qbytes += sum(x.nbytes for x in jax.tree.leaves(r["ctx"].state or {}))
    fp = 0
    for name, pol in r["ctx"].policies.items():
        if getattr(pol, "is_quantized", False) and name.startswith("blocks.0."):
            node = r["params"]["blocks"]  # stacked [L, ...] leaves
            for part in name.split(".")[2:]:
                node = node[part]
            # stacked [L, ...] bf16 weights across all blocks
            fp += int(np.prod(node["w"].shape)) * 2
    return fp / max(qbytes, 1)


def main():
    # soft wall-clock budget: the optional metric sections (step-cache, 14B
    # ratios) are skipped once the budget is spent so the driver ALWAYS gets
    # the final JSON line even under cold-compile conditions (round-2's fp16
    # compile alone took 462 s cold)
    t_start = time.time()
    budget_s = float(os.environ.get("WANQ_BENCH_BUDGET_S", "1100"))

    def over_budget(section: str) -> bool:
        el = time.time() - t_start
        if el > budget_s:
            log(f"skipping {section}: {el:.0f}s elapsed > {budget_s:.0f}s "
                "budget (WANQ_BENCH_BUDGET_S)")
            return True
        return False

    last_err = None
    for frame_num in (81, 41, 21, 9):
        try:
            r = run(frame_num)
            break
        except Exception as e:  # noqa: BLE001 — OOM fallback ladder
            last_err = e
            log(f"frame_num={frame_num} failed ({type(e).__name__}: {e}); retrying smaller")
    else:
        raise SystemExit(f"all bench configs failed: {last_err}")

    fp_time, q_time = r["fp_time"], r["q_time"]
    flops = model_flops_per_step(r["cfg"], r["seq_len"])
    metrics = [
        {"name": "w8a8_vs_bf16_step_ratio_1.3b_480p",
         "value": round(fp_time / q_time, 4), "unit": "x (same-run pair)"},
        {"name": "w8a8_noise_pred_psnr_random_init",
         "value": round(r["rep"]["psnr_db"], 2),
         "unit": "dB (4 seeds; draw-dependent, see BENCH_NOTES)"},
        {"name": "mfu_bf16_step",
         "value": round(flops / fp_time / V5E_BF16_PEAK, 4),
         "unit": "of 197 TF/s v5e bf16 peak (blocks-only FLOPs)"},
        {"name": "mfu_w8a8_step",
         "value": round(flops / q_time / V5E_BF16_PEAK, 4),
         "unit": "of bf16 peak (same FLOPs, int8 step time)"},
        {"name": "quant_weight_residency",
         "value": round(quant_weight_residency(r), 3),
         "unit": "x bf16 bytes of the replaced weights / measured state bytes"},
    ]

    # measured step-cache (beyond-reference step-level redundancy; fidelity
    # gate = final-latent PSNR vs the uncached trajectory)
    try:
        if over_budget("step-cache metric"):
            raise TimeoutError("bench budget")
        cache_res = measure_stepcache(r)
        for name, (speedup, psnr) in cache_res.items():
            metrics.append({"name": f"stepcache_{name}_speedup",
                            "value": round(speedup, 3),
                            "unit": f"x vs uncached W8A8 loop @ {psnr:.1f} "
                                    "dB final-latent PSNR "
                                    "(tools/cache_probe.py)"})
        best = max(s for s, _ in cache_res.values())
        effective = (fp_time / q_time) * best
        metrics.append({"name": "w8a8_stepcache_vs_bf16_effective",
                        "value": round(effective, 3),
                        "unit": "x vs bf16 uncached (ratio x best of "
                                "stepcache/window rows; fidelity gates in "
                                "the row metrics)"})
    except Exception as e:  # noqa: BLE001 — keep the headline alive
        log(f"step-cache metric failed: {type(e).__name__}: {e}")

    # measured sliding temporal-window attention (beyond-reference; the
    # only lever past the attention-bound v5e ceiling — fully out-of-band
    # KV blocks never touch the MXU). Same-run pair against the dense
    # bf16/W8A8 steps above; fidelity caveat recorded in the unit string
    # (BENCH_NOTES "Sliding temporal-window").
    if os.environ.get("WANQ_BENCH_WINDOW", "1") != "0" and not over_budget(
            "window metric"):
        try:
            step_fn = make_step(r["cfg"], r["seq_len"])
            wctx = r["ctx"].replace(attn_window=1, collect=r["ctx"].collect)
            tshape = compute_target_shape(r["cfg"], (832, 480),
                                          r["frame_num"])
            latents = jax.random.normal(jax.random.PRNGKey(1), (1, *tshape),
                                        jnp.float32)
            tt = jnp.asarray([999.0])
            w_time = time_step(step_fn, r["params"], wctx, latents, tt,
                               r["context"], r["context_null"],
                               jnp.float32(5.0))
            log(f"w8a8+window(r=1) step: {w_time*1000:.1f} ms")
            metrics.append({
                "name": "w8a8_window_r1_vs_bf16_step_ratio",
                "value": round(fp_time / w_time, 4),
                "unit": f"x vs dense bf16 ({fp_time/q_time:.3f}x dense-w8a8 "
                        "x banded attention; calib-driven radius, "
                        "composes with stepcache — BENCH_NOTES)"})
        except Exception as e:  # noqa: BLE001
            log(f"window metric failed: {type(e).__name__}: {e}")

    # measured 14B block ratios (the scale the reference targets; fold of
    # tools/ratio_14b_probe.py, round-3 VERDICT #1). Frees the 1.3B state
    # first — 14B blocks + 1.3B stacks don't co-reside comfortably.
    if os.environ.get("WANQ_BENCH_14B", "1") != "0" and not over_budget(
            "14B ratio metrics"):
        del r
        try:
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            from ratio_14b_probe import measure_multi as measure_14b

            # one block-gen + one int8-state build serves both resolutions
            for res, (tb, ti) in measure_14b(
                    res_list=(480, 720), frame_num=81, K=3, R=2,
                    variant="full").items():
                metrics.append({
                    "name": f"w8a8_vs_bf16_14b_block_ratio_{res}p",
                    "value": round(tb / ti, 3),
                    "unit": f"x per-block at real 14B dims "
                            f"(bf16 {tb*1000:.0f} -> int8 {ti*1000:.0f} "
                            "ms/block, K=3 R=2)"})
        except Exception as e:  # noqa: BLE001
            log(f"14B ratio metric failed: {type(e).__name__}: {e}")

    steps_per_sec = 1.0 / q_time
    print(
        json.dumps(
            {
                "metric": "w8a8_denoise_steps_per_sec_1.3b_480p",
                "value": round(steps_per_sec, 4),
                "unit": f"steps/s/chip (f{frame_num}, fp16={1.0/fp_time:.4f})",
                "vs_baseline": round(fp_time / q_time, 4),
                "metrics": metrics,
            }
        )
    )


if __name__ == "__main__":
    main()
