"""Step-cache speed/fidelity table at production shape (round-4 VERDICT #7).

Measures the full 1.3B 480p denoise trajectory (W8A8 hardware config, the
bench.py site selection) under StepCachePolicy schedules vs the uncached
baseline: wall-clock, effective steps/s, and final-latent PSNR/cosine —
the fidelity GATE that makes step-level redundancy elimination an honest
speedup rather than a quality regression. The reference has no analog
(always 2 full forwards/step, text2video.py:255-261).

Usage: python -u tools/cache_probe.py [steps] [frame_num]
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

from bench import FULL_W8A8
from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.models.dit import (
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.pipelines.text2video import (
    AdaptiveCachePolicy,
    StepCachePolicy,
    WanT2V,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx
from wanq_tpu.utils.metrics import cosine_similarity, latent_psnr


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    steps = int(pos[0]) if pos else 30
    frame_num = int(pos[1]) if len(pos) > 1 else 81
    cfg = WAN_CONFIGS["t2v-1.3B"]
    print(f"cache_probe: 1.3B 832*480 f{frame_num} steps={steps} "
          f"on {jax.devices()[0]}", flush=True)

    t0 = time.time()
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    # one calib-mode forward feeds the static-A8 ffn.2 scale (bench.py
    # pattern: collect_minmax over a single CFG step)
    from wanq_tpu.models.dit import dit_forward
    from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape

    target_shape = compute_target_shape(cfg, (832, 480), frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    lat0 = jax.random.normal(jax.random.PRNGKey(1), (1, *target_shape),
                             dtype=jnp.float32)
    ctx0 = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)

    def calib_step(p, x, tt, c):
        cctx = QuantCtx(mode="calib", collect_minmax=True)
        dit_forward(p, cfg, jnp.concatenate([x, x], 0),
                    jnp.concatenate([tt, tt], 0),
                    jnp.concatenate([c, c], 0), seq_len, ctx=cctx)
        return cctx.collect

    stats = jax.jit(calib_step)(params, lat0, jnp.asarray([999.0]), ctx0)
    calib = {k: np.asarray(v)[None] for k, v in stats.items()
             if k.endswith((".act_max", ".act_min"))}

    list_params = init_params_on_device(cfg, seed=0)
    qcfg = QuantConfig.from_dict(FULL_W8A8)
    policies, state, rotations = prepare_quant_state(
        list_params, linear_layer_names(cfg), qcfg, targets="int8",
        calib=calib)
    del list_params
    ctx = QuantCtx(mode="int8", policies=policies, state=state,
                   rotations=rotations)
    ctx = make_scan_ctx(ctx, cfg.num_layers)
    jax.block_until_ready(ctx.scan_state)
    print(f"init+PTQ: {time.time()-t0:.1f}s", flush=True)

    rng = np.random.default_rng(5)
    context = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    context_null = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    pipe = WanT2V(cfg, params, quant_ctx=ctx)
    gen_kw = dict(size=(832, 480), frame_num=frame_num,
                  sampling_steps=steps, seed=42)

    # warm every step-fn variant (combined, split, cond) so timing below
    # is compile-free; 2-step trajectories touch all of them
    t0 = time.time()
    # every warm is FENCED (float(jnp.sum)): generate() returns with
    # device work still queued, and unfenced warm work bleeds into the
    # next timed row (measured +9.3 s on a 12-step run, bench.py round 5)
    float(jnp.sum(pipe.generate(context, context_null,
                                **{**gen_kw, "sampling_steps": 2})))
    # cfg_interval=2/warmup=1/tail=0 over 3 steps yields [full, full, cond]
    # — compiles BOTH the split and the cond step fns ('reuse' steps run
    # no forward, nothing to compile)
    float(jnp.sum(pipe.generate(
        context, context_null,
        cache_policy=StepCachePolicy(cfg_interval=2, warmup=1, tail=0),
        **{**gen_kw, "sampling_steps": 3})))
    # adaptive warm: compiles the per-call drift-metric jit too
    float(jnp.sum(pipe.generate(
        context, context_null,
        cache_policy=AdaptiveCachePolicy(threshold=0.10, warmup=1, tail=1),
        **{**gen_kw, "sampling_steps": 3})))
    print(f"warmup/compile: {time.time()-t0:.1f}s", flush=True)

    configs = [
        ("baseline", None),
        ("cfg2", StepCachePolicy(cfg_interval=2)),
        ("cfg3", StepCachePolicy(cfg_interval=3)),
        ("reuse2", StepCachePolicy(reuse_interval=2)),
        ("cfg2+reuse2", StepCachePolicy(cfg_interval=2, reuse_interval=2)),
        # input-adaptive (TeaCache-style): same fidelity gate, skip
        # pattern chosen by the measured latent drift
        ("ada.05", AdaptiveCachePolicy(threshold=0.05)),
        ("ada.10", AdaptiveCachePolicy(threshold=0.10)),
        ("ada.20", AdaptiveCachePolicy(threshold=0.20)),
        ("ada.10+cfg2", AdaptiveCachePolicy(threshold=0.10, cfg_interval=2)),
    ]
    if "--forecast" in sys.argv:
        # order-1/2 Lagrange forecast on skipped steps (TaylorSeer-style):
        # same eval schedule knobs, extrapolated instead of verbatim reuse
        configs += [
            ("reuse2.o1", StepCachePolicy(reuse_interval=2, order=1)),
            ("ada.10.o1", AdaptiveCachePolicy(threshold=0.10, order=1)),
            ("ada.20.o1", AdaptiveCachePolicy(threshold=0.20, order=1)),
            ("ada.30.o1", AdaptiveCachePolicy(threshold=0.30, order=1)),
            ("ada.20.o2", AdaptiveCachePolicy(threshold=0.20, order=2)),
            ("ada.30.o2", AdaptiveCachePolicy(threshold=0.30, order=2)),
            # horizon-capped order-1 (extrapolate at most cN node-spacings,
            # then hold): bounds the linear-overshoot amplification that
            # makes uncapped o1 lose on long skip runs
            ("ada.10.o1c1", AdaptiveCachePolicy(threshold=0.10, order=1,
                                                max_horizon=1.0)),
            ("ada.10.o1c2", AdaptiveCachePolicy(threshold=0.10, order=1,
                                                max_horizon=2.0)),
            ("ada.20.o1c1", AdaptiveCachePolicy(threshold=0.20, order=1,
                                                max_horizon=1.0)),
            ("ada.20.o1c2", AdaptiveCachePolicy(threshold=0.20, order=1,
                                                max_horizon=2.0)),
        ]
    # --window=R[,R2]: compose the sliding temporal-window block-sparse
    # attention (QuantCtx.attn_window, BENCH_NOTES "Sliding temporal-
    # window") with step caching. Orthogonal mechanisms — fewer tokens
    # per eval x fewer evals — so speedups should multiply; fidelity gate
    # stays the DENSE uncached trajectory (row 0).
    win_arg = [a.split("=", 1)[1] for a in sys.argv
               if a.startswith("--window=")]
    if win_arg:
        for r in (int(x) for x in win_arg[0].split(",")):
            configs += [
                (f"win{r}", None, r),
                (f"win{r}+reuse2", StepCachePolicy(reuse_interval=2), r),
                (f"win{r}+ada.10", AdaptiveCachePolicy(threshold=0.10), r),
            ]
    only = [a.split("=", 1)[1] for a in sys.argv if a.startswith("--only=")]
    if only:
        configs = [configs[0]] + [
            row for row in configs[1:]
            if any(row[0].startswith(pre) for pre in only[0].split(","))
        ]
    if "--fit" in sys.argv:
        # fit the TeaCache rescaling polynomial on one all-evaluate
        # trajectory, then sweep OUTPUT-space tolerances with it
        from wanq_tpu.pipelines.text2video import fit_drift_poly

        t0 = time.time()
        poly = fit_drift_poly(pipe, context, context_null, degree=3,
                              **gen_kw)
        print(f"fitted drift poly ({time.time()-t0:.1f}s): "
              + ", ".join(f"{c:.4g}" for c in poly), flush=True)
        configs += [
            (f"fit.{tol}", AdaptiveCachePolicy(threshold=tol, poly=poly))
            for tol in (0.05, 0.10, 0.20)
        ]
    base = None
    base_dt = None
    win_pipes = {}
    print(f"{'config':>12} {'wall s':>8} {'s/step-eq':>9} {'speedup':>8} "
          f"{'PSNR dB':>8} {'cosine':>8}  actions")
    for row in configs:
        name, pol = row[0], row[1]
        win = row[2] if len(row) > 2 else None
        p = pipe
        if win is not None:
            if win not in win_pipes:
                win_pipes[win] = WanT2V(
                    cfg, params,
                    quant_ctx=ctx.replace(attn_window=win,
                                          collect=ctx.collect))
                t0 = time.time()
                float(jnp.sum(win_pipes[win].generate(
                    context, context_null,
                    **{**gen_kw, "sampling_steps": 2})))
                float(jnp.sum(win_pipes[win].generate(
                    context, context_null,
                    cache_policy=StepCachePolicy(cfg_interval=2, warmup=1,
                                                 tail=0),
                    **{**gen_kw, "sampling_steps": 3})))
                float(jnp.sum(win_pipes[win].generate(
                    context, context_null,
                    cache_policy=AdaptiveCachePolicy(threshold=0.10,
                                                     warmup=1, tail=1),
                    **{**gen_kw, "sampling_steps": 3})))
                print(f"win{win} warmup/compile: {time.time()-t0:.1f}s",
                      flush=True)
            p = win_pipes[win]
        t0 = time.time()
        lat = p.generate(context, context_null, cache_policy=pol, **gen_kw)
        lat = np.asarray(lat)  # fetch fences the trajectory
        dt = time.time() - t0
        stats = p.last_cache_stats if pol is not None else {"full": steps}
        if base is None:
            base, base_dt = lat, dt
            print(f"{name:>12} {dt:8.1f} {dt/steps:9.3f} {'1.000':>8} "
                  f"{'--':>8} {'--':>8}  {stats}")
        else:
            print(f"{name:>12} {dt:8.1f} {dt/steps:9.3f} {base_dt/dt:8.3f} "
                  f"{latent_psnr(base, lat):8.2f} "
                  f"{cosine_similarity(base, lat):8.5f}  {stats}", flush=True)
            if getattr(p, "last_adaptive_trace", None):
                acts = "".join(
                    {"reuse": "R", "cond": "c"}.get(e["act"], "F")
                    for e in p.last_adaptive_trace)
                ds = " ".join(f"{e['d']:.3f}"
                              for e in p.last_adaptive_trace)
                print(f"{'':>12} decisions={acts}  d={ds}", flush=True)


if __name__ == "__main__":
    main()
