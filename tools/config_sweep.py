"""Quant-config sweep at the bench shape (1.3B 480p x 81f CFG step).

Measures the step time of candidate W8A8 site selections on the attached
chip — the data behind bench.py's FULL_W8A8 choice and the BENCH_NOTES
speed-vs-full table (round-2 VERDICT #4/#6 'Done' criteria).

Usage: python -u tools/config_sweep.py [frame_num]
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
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx

import bench  # noqa: E402  (make_step / time_step)

FP_BASE = r"text_embedding|time_embedding|time_projection|head\.head"

CONFIGS = {
    # round-2 shipped speed config: qkv + ffn int8, o/cross FP
    "speed_r2": {
        "remain_fp_regex": FP_BASE + r"|blocks\.\d+\.self_attn\.o|cross_attn",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    },
    # + cross-attn q through the fused norm3+quant producer
    "+cross_q": {
        "remain_fp_regex": FP_BASE
        + r"|blocks\.\d+\.self_attn\.o|cross_attn\.(k|v|o)",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    },
    # + self o via the heads-major int8 o-projection
    "+self_o": {
        "remain_fp_regex": FP_BASE + r"|cross_attn\.(k|v|o)",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    },
    # full: every block linear int8 (cross k/v are thin 512-token GEMMs)
    "full": {
        "remain_fp_regex": FP_BASE,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    },
    # static-A8 sweep beyond ffn.2 (round-2 VERDICT #6): frozen scales on
    # the LN-modulate outputs feeding qkv and on the norm3 output feeding
    # cross q — the producers drop their absmax pass
    "full_stat": {
        "remain_fp_regex": FP_BASE,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True,
                "static_regex":
                    r"ffn\.2|self_attn\.(q|k|v)|cross_attn\.q"},
    },
}


def main():
    frame_num = int(sys.argv[1]) if len(sys.argv) > 1 else 81
    cfg = WAN_CONFIGS["t2v-1.3B"]
    size = (832, 480)
    target_shape = compute_target_shape(cfg, size, frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    print(f"config sweep: 1.3B {size} f{frame_num} seq {seq_len}", flush=True)

    params = stack_block_params(init_params_on_device(cfg, seed=0))
    # head.head is zero-init (DiT convention) — randomize so the fidelity
    # guard below carries signal (zero outputs make every PSNR infinite)
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    jax.block_until_ready(params)

    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, *target_shape), jnp.float32)
    t = jnp.asarray([999.0])
    c = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.float32)
    cn = jax.random.normal(jax.random.PRNGKey(2),
                           (1, cfg.text_len, cfg.text_dim), jnp.float32)
    gs = jnp.float32(5.0)
    step_fn = bench.make_step(cfg, seq_len)

    t0 = time.time()
    fp_time = bench.time_step(step_fn, params, None, latents, t, c, cn, gs)
    print(f"{'bf16':>10}: {fp_time*1000:7.1f} ms  (compile+time "
          f"{time.time()-t0:.0f}s)", flush=True)

    # static-A8 scales for ffn.2 from one calib step
    def calib_step(p, x, tt, cc):
        cctx = QuantCtx(mode="calib", collect_minmax=True)
        out = bench.dit_forward(
            p, cfg, jnp.concatenate([x, x], 0), jnp.concatenate([tt, tt], 0),
            jnp.concatenate([cc, cc], 0), seq_len, ctx=cctx)
        return out, cctx.collect

    _, stats = jax.jit(calib_step)(params, latents, t, c)
    calib = {k: np.asarray(v)[None] for k, v in stats.items()
             if k.endswith((".act_max", ".act_min"))}

    names = linear_layer_names(cfg)
    fp_ref = None
    for tag, qdict in CONFIGS.items():
        t0 = time.time()
        qcfg = QuantConfig.from_dict(qdict)
        lp = init_params_on_device(cfg, seed=0)
        policies, state, rotations = prepare_quant_state(
            lp, names, qcfg, targets="int8", calib=calib)
        del lp
        ctx = make_scan_ctx(
            QuantCtx(mode="int8", policies=policies, state=state,
                     rotations=rotations),
            cfg.num_layers)
        jax.block_until_ready(ctx.scan_state)
        q_time = bench.time_step(step_fn, params, ctx, latents, t, c, cn, gs)
        # fidelity guard: one seeded step vs FP
        lat_s = jax.random.normal(jax.random.PRNGKey(10), latents.shape,
                                  jnp.float32)
        if fp_ref is None:
            fp_ref = np.asarray(step_fn(params, None, lat_s, t, c, cn, gs))
        qo = np.asarray(step_fn(params, ctx, lat_s, t, c, cn, gs))
        mse = float(np.mean((qo - fp_ref) ** 2))
        peak = float(np.max(np.abs(fp_ref)))
        psnr = 10 * np.log10(peak * peak / mse) if mse else float("inf")
        print(f"{tag:>10}: {q_time*1000:7.1f} ms  ratio {fp_time/q_time:.3f}x"
              f"  PSNR {psnr:.1f} dB  ({time.time()-t0:.0f}s)", flush=True)
        del ctx, state


if __name__ == "__main__":
    main()
