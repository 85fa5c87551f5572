"""Deployment step-time cost of the SVDQuant low-rank branch at 1.3B.

Lowrank sites cannot take the fused int8 producers (the branch needs the
FP activation — qlinear._maybe_lowrank; int8_fusable guards it), so an
SVDQuant deployment pays the per-site qlinear route plus two rank-32
GEMMs per quantized linear. This probe measures that cost at the
production shape: W4A8 plain (fused producers) vs W4A8 + lowrank-32
(per-site route) vs W8A8 bench config, chained 480p x 81f denoise steps.

Usage: python -u tools/svdquant_step_probe.py [steps]   (default 6)
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
    WanT2V,
    compute_seq_len,
    compute_target_shape,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx


def main():
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    cfg = WAN_CONFIGS["t2v-1.3B"]
    frame_num = 81
    print(f"svdquant_step_probe: 1.3B 832*480 f{frame_num} steps={steps} "
          f"on {jax.devices()[0]}", flush=True)

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
    calib = {k: np.asarray(v)[None] for k, v in stats.items()}
    print(f"init+calib: {time.time()-t0:.1f}s", flush=True)

    # W4A8 on the bench sites; dynamic-A8 everywhere (the static ffn.2
    # producer is irrelevant to this comparison and lowrank excludes it)
    w4a8 = {
        "remain_fp_regex": FULL_W8A8["remain_fp_regex"],
        "weight": {"n_bits": 4, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    }
    svdq = {**w4a8, "weight": dict(w4a8["weight"], lowrank_rank=32)}
    configs = [("w8a8 (bench)", FULL_W8A8), ("w4a8", w4a8),
               ("w4a8+lr32", svdq)]

    rng = np.random.default_rng(5)
    context = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    context_null = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    gen_kw = dict(size=(832, 480), frame_num=frame_num, seed=42)

    for tag, qd in configs:
        t0 = time.time()
        list_params = init_params_on_device(cfg, seed=0)
        pol, st, rot = prepare_quant_state(
            list_params, linear_layer_names(cfg), QuantConfig.from_dict(qd),
            targets="int8", calib=calib)
        del list_params
        ctx = make_scan_ctx(
            QuantCtx(mode="int8", policies=pol, state=st, rotations=rot),
            cfg.num_layers)
        jax.block_until_ready(ctx.scan_state)
        t_ptq = time.time() - t0
        pipe = WanT2V(cfg, params, quant_ctx=ctx)
        warm = pipe.generate(context, context_null,
                             **{**gen_kw, "sampling_steps": 2})
        float(jnp.sum(warm))
        t0 = time.time()
        lat = pipe.generate(context, context_null,
                            **{**gen_kw, "sampling_steps": steps})
        float(jnp.sum(lat))
        dt = time.time() - t0
        print(f"{tag:>14}: {dt/steps:6.3f} s/step  (ptq {t_ptq:5.1f}s)",
              flush=True)
        del ctx, pipe, st


if __name__ == "__main__":
    main()
