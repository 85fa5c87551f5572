"""End-to-end "seconds per video" on ONE chip (round-3 VERDICT #3/#6).

The reference's user-facing anchor is whole-generation latency (~4 min for
a 5-second 832*480 video on an RTX 4090, examples/Wan2.1/README.md:17).
This probe measures the same three stages at full production dims with
random-init weights (no checkpoint ships in either repo):

  A. umT5-XXL text encode at REAL dims (4096 dim / 10240 ffn / 24 layers /
     256384 vocab ≈ 11.4 GiB bf16) ON the chip — the memory story that was
     previously only asserted — plus the --t5_cpu host route, then frees
     the encoder (the reference's offload_model=True does the same move,
     text2video.py:200-210).
  B. 1.3B 480p x 81f W8A8 denoise, 30 unipc steps (+ optionally the
     StepCachePolicy production schedule).
  C. full-size VAE decode to [1, 3, 81, 480, 832].

Usage: python -u tools/e2e_probe.py [--steps 30] [--no_t5_cpu] [--cached]
"""

from __future__ import annotations

import argparse
import gc
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
    dit_forward,
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.models.t5 import (
    UMT5_XXL,
    encoder_forward,
    init_t5_params_on_device,
)
from wanq_tpu.pipelines.text2video import (
    AdaptiveCachePolicy,
    StepCachePolicy,
    WanT2V,
    compute_seq_len,
    compute_target_shape,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx


def drain_device(tag: str):
    """Free everything unreferenced and report device HBM in use. The
    relay frees asynchronously; the memory_stats fetch doubles as a sync
    point so the next phase starts against settled HBM."""
    gc.collect()
    jax.clear_caches()
    gc.collect()
    stats = jax.devices()[0].memory_stats() or {}
    used = stats.get("bytes_in_use")
    if used is not None:
        print(f"   [{tag}] device HBM in use: {used/2**30:.2f} GiB",
              flush=True)


def phase_t5(cfg, t5_cpu: bool):
    """umT5-XXL encode at full dims. Returns (context, context_null,
    timings dict)."""
    timings = {}
    tcfg = UMT5_XXL
    t0 = time.time()
    params = init_t5_params_on_device(tcfg, seed=0)
    jax.block_until_ready(params)
    nbytes = sum(x.nbytes for x in jax.tree.leaves(params))
    timings["t5_init_s"] = time.time() - t0
    print(f"A. umT5-XXL on-device init: {timings['t5_init_s']:.1f}s, "
          f"{nbytes/2**30:.2f} GiB params", flush=True)

    # a realistic prompt length: ~24 real tokens, rest padding
    ids = np.zeros((1, cfg.text_len), np.int32)
    rng = np.random.default_rng(0)
    ids[0, :24] = rng.integers(3, tcfg.vocab_size, size=24)
    mask = np.zeros((1, cfg.text_len), np.int32)
    mask[0, :24] = 1
    ids_j, mask_j = jnp.asarray(ids), jnp.asarray(mask)

    fwd = jax.jit(lambda p, i, m: encoder_forward(p, tcfg, i, m))
    t0 = time.time()
    ctx = fwd(params, ids_j, mask_j)
    float(jnp.sum(ctx))  # scalar fetch fences the relay's async dispatch
    timings["t5_encode_cold_s"] = time.time() - t0
    t0 = time.time()
    ctx = fwd(params, ids_j, mask_j)
    ctx_null = fwd(params, jnp.asarray(ids[:, ::-1].copy()), mask_j)
    float(jnp.sum(ctx) + jnp.sum(ctx_null))
    timings["t5_encode_2x_warm_s"] = time.time() - t0
    print(f"   encode cold {timings['t5_encode_cold_s']:.1f}s, "
          f"warm pair {timings['t5_encode_2x_warm_s']:.2f}s "
          f"-> context {ctx.shape} {ctx.dtype}", flush=True)

    ctx_np = np.asarray(ctx, np.float32) * mask[:, :, None]
    ctx_null_np = np.asarray(ctx_null, np.float32) * mask[:, :, None]

    if t5_cpu:
        # --t5_cpu route: params + compute pinned to host (frees the chip's
        # HBM for the DiT; ref fp_generate.py --t5_cpu)
        cpu = jax.devices("cpu")[0]
        t0 = time.time()
        params_cpu = jax.device_put(params, cpu)
        jax.block_until_ready(params_cpu)
        timings["t5_to_cpu_s"] = time.time() - t0
        fwd_cpu = jax.jit(lambda p, i, m: encoder_forward(p, tcfg, i, m),
                          device=cpu)
        t0 = time.time()
        out = fwd_cpu(params_cpu, jax.device_put(ids_j, cpu),
                      jax.device_put(mask_j, cpu))
        jax.block_until_ready(out)
        timings["t5_cpu_encode_s"] = time.time() - t0
        print(f"   --t5_cpu route: pull-to-host {timings['t5_to_cpu_s']:.1f}s, "
              f"host encode {timings['t5_cpu_encode_s']:.1f}s", flush=True)
        del params_cpu, out

    del params, ctx, ctx_null
    return ctx_np, ctx_null_np, timings


def phase_denoise(cfg, context, context_null, steps, cached, order=0,
                  threshold=0.10, window=None):
    frame_num = 81
    timings = {}
    t0 = time.time()
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)

    target_shape = compute_target_shape(cfg, (832, 480), frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    lat0 = jax.random.normal(jax.random.PRNGKey(1), (1, *target_shape),
                             dtype=jnp.float32)

    def calib_step(p, x, tt, c):
        cctx = QuantCtx(mode="calib", collect_minmax=True)
        dit_forward(p, cfg, jnp.concatenate([x, x], 0),
                    jnp.concatenate([tt, tt], 0),
                    jnp.concatenate([c, c], 0), seq_len, ctx=cctx)
        return cctx.collect

    stats = jax.jit(calib_step)(
        params, lat0, jnp.asarray([999.0]),
        jnp.asarray(context, jnp.float32))
    calib = {k: np.asarray(v)[None] for k, v in stats.items()
             if k.endswith((".act_max", ".act_min"))}
    qcfg = QuantConfig.from_dict(FULL_W8A8)
    list_params = init_params_on_device(cfg, seed=0)
    policies, state, rotations = prepare_quant_state(
        list_params, linear_layer_names(cfg), qcfg, targets="int8",
        calib=calib)
    del list_params
    ctx = QuantCtx(mode="int8", policies=policies, state=state,
                   rotations=rotations)
    ctx = make_scan_ctx(ctx, cfg.num_layers)
    if window is not None:
        # sliding temporal window composes with the cache on the eval
        # schedule (BENCH_NOTES round-5 fenced composition table)
        ctx = ctx.replace(attn_window=int(window), collect=ctx.collect)
    jax.block_until_ready(ctx.scan_state)
    timings["dit_init_ptq_s"] = time.time() - t0
    print(f"B. DiT init + calib + W8A8 PTQ: {timings['dit_init_ptq_s']:.1f}s",
          flush=True)

    pipe = WanT2V(cfg, params, quant_ctx=ctx)
    if cached == "ada":
        pol = AdaptiveCachePolicy(threshold=threshold, warmup=2, tail=2,
                                  order=order)
    elif cached:
        pol = StepCachePolicy(cfg_interval=2, reuse_interval=2, order=order)
    else:
        pol = None
    c_j = jnp.asarray(context)
    cn_j = jnp.asarray(context_null)
    # compile pass (2/4 steps touches every step-fn variant). FENCED:
    # the loop dispatches asynchronously, and without the scalar fetch
    # its device work bleeds into the timed run below (measured up to
    # 4.5x inflation on the 14B probe before the fence was added)
    t0 = time.time()
    lat_c = pipe.generate(c_j, cn_j, size=(832, 480), frame_num=frame_num,
                          sampling_steps=5 if cached else 2, seed=0,
                          cache_policy=pol)
    float(jnp.sum(lat_c))
    del lat_c
    timings["denoise_compile_s"] = time.time() - t0
    t0 = time.time()
    latents = pipe.generate(c_j, cn_j, size=(832, 480), frame_num=frame_num,
                            sampling_steps=steps, seed=42, cache_policy=pol)
    latents = np.asarray(latents)
    timings["denoise_s"] = time.time() - t0
    tag = {"static": " (cached cfg2+reuse2)",
           "ada": f" (cached ada.{int(threshold*100):02d}"
                  f"{f'.o{order}' if order else ''})"}.get(cached, "")
    if window is not None:
        tag = f" (win{window})" + tag
    print(f"   {steps}-step denoise{tag}: "
          f"{timings['denoise_s']:.1f}s "
          f"({timings['denoise_s']/steps:.2f} s/step-equivalent; "
          f"compile pass {timings['denoise_compile_s']:.1f}s)", flush=True)
    return latents, timings


def phase_vae(latents, vae_dtype="float32"):
    from wanq_tpu.models.vae import WanVAE

    timings = {}
    t0 = time.time()
    # random init at the production architecture; bfloat16 is the
    # reference's WanVAE(dtype=...) amp knob (ref vae.py:619-661)
    vae = WanVAE(compute_dtype=jnp.dtype(vae_dtype).type)
    video = vae.decode(jnp.asarray(latents))
    float(jnp.sum(video))  # scalar fence (device stream is in-order)
    timings["vae_cold_s"] = time.time() - t0
    t0 = time.time()
    video = vae.decode(jnp.asarray(latents))
    float(jnp.sum(video))
    timings["vae_decode_s"] = time.time() - t0
    print(f"C. VAE decode -> {tuple(video.shape)}: "
          f"{timings['vae_decode_s']:.1f}s steady "
          f"(cold incl. compile {timings['vae_cold_s']:.1f}s)", flush=True)
    assert np.isfinite(np.asarray(video[:, :, :1])).all()
    return timings


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--no_t5_cpu", action="store_true")
    ap.add_argument("--cached", nargs="?", const="static", default="",
                    choices=["", "static", "ada"],
                    help="denoise under a cache policy: 'static' = "
                         "StepCachePolicy cfg2+reuse2, 'ada' = "
                         "AdaptiveCachePolicy(0.10)")
    ap.add_argument("--vae_dtype", type=str, default="float32",
                    choices=["float32", "bfloat16"],
                    help="VAE compute dtype (cli/common.py --vae_dtype)")
    ap.add_argument("--cache_order", type=int, default=0, choices=[0, 1, 2],
                    help="forecast order on skipped steps (--cached only)")
    ap.add_argument("--window", type=int, default=None,
                    help="sliding temporal-window radius (composes with "
                         "--cached)")
    ap.add_argument("--cache_threshold", type=float, default=0.10,
                    help="adaptive drift tolerance (--cached ada only)")
    args = ap.parse_args()
    cfg = WAN_CONFIGS["t2v-1.3B"]
    print(f"e2e_probe: t2v-1.3B 832*480 f81, {args.steps} steps, "
          f"on {jax.devices()[0]}", flush=True)

    context, context_null, t_a = phase_t5(cfg, t5_cpu=not args.no_t5_cpu)
    drain_device("after T5")
    latents, t_b = phase_denoise(cfg, context, context_null, args.steps,
                                 args.cached, order=args.cache_order, window=args.window,
                                 threshold=args.cache_threshold)
    drain_device("after denoise")
    t_c = phase_vae(latents, args.vae_dtype)

    encode = t_a["t5_encode_2x_warm_s"]
    total = encode + t_b["denoise_s"] + t_c["vae_decode_s"]
    print(f"\nSECONDS PER VIDEO (warm pipeline, 5s 832*480 video, "
          f"{args.steps} steps): {total:.1f}s "
          f"= encode {encode:.1f} + denoise {t_b['denoise_s']:.1f} "
          f"+ vae {t_c['vae_decode_s']:.1f}")
    print("one-time costs: " + ", ".join(
        f"{k}={v:.1f}s" for k, v in {**t_a, **t_b, **t_c}.items()
        if "init" in k or "cold" in k or "compile" in k))


if __name__ == "__main__":
    main()
