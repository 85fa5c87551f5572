"""Probe: does static-scale GELU+quant (ref quant_sum_static, fused.cu:586)
on the ffn.2 site beat the dynamic per-token producer at bench shapes?

Hypothesis: the dynamic producer must materialize the first FFN GEMM's
bf16 output (2x32768x8960 = 1.17 GB/block) and re-read it for the row
absmax; a static scale makes GELU+quant elementwise, which XLA fuses into
the GEMM epilogue — the bf16 intermediate never round-trips HBM
(~2.3 GB/block traffic saved at ~580 GB/s ≈ 4 ms/block).

Timing only — delta_a values are synthetic (speed is scale-independent);
fidelity of static-A8 is covered by tests/test_static_act_and_reorder.py.

Usage: python -u tools/static_ffn_probe.py
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

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402  (reuse make_step/time_step/FULL_W8A8)


def build_ctx(cfg, qdict, static_ffn2: bool):
    qcfg = QuantConfig.from_dict(qdict)
    list_params = init_params_on_device(cfg, seed=0)
    names = linear_layer_names(cfg)
    calib = None
    if static_ffn2:
        # synthetic per-tensor calibration range for timing (see docstring)
        calib = {}
        for n in names:
            if n.endswith("ffn.2"):
                calib[f"{n}.act_max"] = np.full((1, cfg.ffn_dim), 6.0, np.float32)
                calib[f"{n}.act_min"] = np.full((1, cfg.ffn_dim), -6.0, np.float32)
    policies, state, rotations = prepare_quant_state(
        list_params, names, qcfg, targets="int8", calib=calib,
    )
    del list_params
    ctx = QuantCtx(mode="int8", policies=policies, state=state,
                   rotations=rotations)
    ctx = make_scan_ctx(ctx, cfg.num_layers)
    jax.block_until_ready(ctx.scan_state)
    return ctx


def main():
    frame_num = 81
    cfg = WAN_CONFIGS["t2v-1.3B"]
    size = (832, 480)
    target_shape = compute_target_shape(cfg, size, frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    print(f"probe: seq_len={seq_len} on {jax.devices()[0]}", flush=True)

    params = stack_block_params(init_params_on_device(cfg, seed=0))
    jax.block_until_ready(params)
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, *target_shape), dtype=jnp.float32)
    t = jnp.asarray([999.0])
    c = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.float32)
    cn = jax.random.normal(jax.random.PRNGKey(2), c.shape, jnp.float32)
    gs = jnp.float32(5.0)
    step_fn = bench.make_step(cfg, seq_len)

    dyn_ctx = build_ctx(cfg, bench.FULL_W8A8, static_ffn2=False)
    t0 = time.time()
    dyn = bench.time_step(step_fn, params, dyn_ctx, latents, t, c, cn, gs)
    print(f"dynamic W8A8 step: {dyn*1000:.1f} ms (total {time.time()-t0:.1f}s)",
          flush=True)
    del dyn_ctx

    static_dict = dict(bench.FULL_W8A8)
    static_dict["act"] = dict(static_dict["act"], static_regex=r"ffn\.2")
    st_ctx = build_ctx(cfg, static_dict, static_ffn2=True)
    t0 = time.time()
    st = bench.time_step(step_fn, params, st_ctx, latents, t, c, cn, gs)
    print(f"static-ffn2 W8A8 step: {st*1000:.1f} ms (total {time.time()-t0:.1f}s)",
          flush=True)
    print(f"delta: {(dyn-st)*1000:+.1f} ms ({dyn/st:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
