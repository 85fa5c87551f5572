"""Batched serving throughput: videos/hour vs batch size on ONE chip.

The reference serves one prompt per process (fp_generate.py loops
prompts sequentially); the TPU pipeline takes [B, ...] contexts
natively, so a serving deployment can denoise B videos in one CFG-pair
forward (2B token batches through the DiT). This probe measures the
marginal cost of that batching at the bench config (1.3B 480p x 81f
W8A8): if a B=2 step costs < 2x the B=1 step, batched serving beats
sequential generation on throughput at identical per-video math.

Also reports the ada.10 cached loop at each B — the adaptive drift
signal is a batch-mean, so batched videos share one skip schedule
(documented serving trade: per-request adaptivity needs B=1).

Usage: python -u tools/serving_probe.py [steps] [batches...]
       (defaults: 12 steps, B in 1 2 4)
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
    dit_forward,
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.pipelines.text2video import (
    AdaptiveCachePolicy,
    WanT2V,
    compute_seq_len,
    compute_target_shape,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx


def main():
    args = [int(a) for a in sys.argv[1:] if not a.startswith("-")]
    steps = args[0] if args else 12
    batches = args[1:] or [1, 2, 4]
    cfg = WAN_CONFIGS["t2v-1.3B"]
    frame_num = 81
    print(f"serving_probe: 1.3B 832*480 f{frame_num} steps={steps} "
          f"B={batches} on {jax.devices()[0]}", flush=True)

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

    pipe = WanT2V(cfg, params, quant_ctx=ctx)
    rng = np.random.default_rng(5)
    rows = []
    base_rate = None
    print(f"{'B':>3} {'policy':>8} {'wall s':>8} {'s/step':>8} "
          f"{'s/step/video':>12} {'videos/h':>9} {'scaling':>8}")
    for b in batches:
        c = jnp.asarray(rng.normal(
            size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32))
        cn = jnp.asarray(rng.normal(
            size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32))
        kw = dict(size=(832, 480), frame_num=frame_num,
                  sampling_steps=steps, seed=42)
        for name, pol in (("plain", None),
                          ("ada.10", AdaptiveCachePolicy(threshold=0.10,
                                                         warmup=2, tail=2))):
            try:
                # compile pass, fenced
                warm = pipe.generate(c, cn, cache_policy=pol,
                                     **{**kw, "sampling_steps": 2})
                float(jnp.sum(warm))
                del warm
                t0 = time.time()
                lat = pipe.generate(c, cn, cache_policy=pol, **kw)
                lat = np.asarray(lat)
                dt = time.time() - t0
            except Exception as e:  # OOM at large B is a finding, not a crash
                print(f"{b:>3} {name:>8} {type(e).__name__}: "
                      f"{str(e)[:90]}", flush=True)
                continue
            denoise_per_video = dt / b
            # 30-step production trajectory + measured encode/decode
            # anchors (e2e_probe: encode 0.4 s, VAE f32 decode ~10.2 s,
            # both per video) -> videos/hour at this step rate
            vid_s = (dt / steps * 30) / b + 0.4 + 10.2
            vph = 3600.0 / vid_s
            if name == "plain" and base_rate is None:
                base_rate = dt / b
            scaling = (base_rate / denoise_per_video
                       if name == "plain" else float("nan"))
            extra = (f"{scaling:8.3f}" if name == "plain" else f"{'':>8}")
            print(f"{b:>3} {name:>8} {dt:8.1f} {dt/steps:8.2f} "
                  f"{dt/steps/b:12.3f} {vph:9.1f} {extra}"
                  + (f"  {pipe.last_cache_stats}" if pol else ""),
                  flush=True)
            rows.append((b, name, dt))


if __name__ == "__main__":
    main()
