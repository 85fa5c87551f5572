"""Fidelity ladder of capacity-planned mixed W4/W8 configs (1.3B, on-chip).

Measures noise-pred PSNR/rel-err vs FP for all-W4, planner-mixed at
intermediate weight budgets, and all-W8 — the fidelity curve a
single-chip deployment walks as the planner (quant/planner.py) converts
leftover HBM into W8 upgrades. Runs at the bench shape so numbers are
comparable with BENCH_NOTES (random-init weights: absolute dB is
draw-dependent, the LADDER ordering is the result).

Usage: python -u tools/mixed_fidelity_probe.py [frame_num]
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
from wanq_tpu.quant.planner import class_weight_bytes, plan_capacity_bits
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx
from wanq_tpu.utils.metrics import quant_fidelity_report

import bench  # noqa: E402  (make_step)


def main():
    frame_num = int(sys.argv[1]) if len(sys.argv) > 1 else 81
    cfg = WAN_CONFIGS["t2v-1.3B"]
    target_shape = compute_target_shape(cfg, (832, 480), frame_num)
    seq_len = compute_seq_len(cfg, target_shape)

    b4 = sum(class_weight_bytes(cfg, 4).values())
    b8 = sum(class_weight_bytes(cfg, 8).values())
    ladder = [
        ("all-W4", int(b4)),
        ("mixed-25%", int(b4 + 0.25 * (b8 - b4))),
        ("mixed-50%", int(b4 + 0.50 * (b8 - b4))),
        ("all-W8", int(b8)),
    ]

    params = stack_block_params(init_params_on_device(cfg, seed=0))
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    jax.block_until_ready(params)

    key = jax.random.PRNGKey(1)
    t = jnp.asarray([999.0])
    context = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim),
                                jnp.float32)
    cnull = jax.random.normal(jax.random.PRNGKey(2),
                              (1, cfg.text_len, cfg.text_dim), jnp.float32)
    gs = jnp.float32(5.0)
    step_fn = bench.make_step(cfg, seq_len)
    lat = [jax.random.normal(jax.random.PRNGKey(10 + s),
                             (1, *target_shape), jnp.float32)
           for s in range(2)]
    fp_set = np.concatenate(
        [np.asarray(step_fn(params, None, x, t, context, cnull, gs))
         for x in lat], axis=0)

    print(f"mixed-precision fidelity ladder @1.3B 480p x {frame_num}f "
          f"(all-W4 {b4/2**30:.2f} GiB .. all-W8 {b8/2**30:.2f} GiB)",
          flush=True)
    for name, budget in ladder:
        t0 = time.time()
        plan = plan_capacity_bits(cfg, budget)
        qcfg = QuantConfig.from_dict(plan.config)
        list_params = init_params_on_device(cfg, seed=0)
        policies, state, rotations = prepare_quant_state(
            list_params, linear_layer_names(cfg), qcfg, targets="int8")
        del list_params
        ctx = make_scan_ctx(
            QuantCtx(mode="int8", policies=policies, state=state,
                     rotations=rotations),
            cfg.num_layers)
        jax.block_until_ready(ctx.scan_state)
        q_set = np.concatenate(
            [np.asarray(step_fn(params, ctx, x, t, context, cnull, gs))
             for x in lat], axis=0)
        rep = quant_fidelity_report(fp_set, q_set)
        print(f"  {name:10s} W8 on {len(plan.upgraded):2d}/10 classes "
              f"({plan.total_bytes/2**30:.2f} GiB): "
              f"PSNR {rep['psnr_db']:5.1f} dB  rel_err {rep['rel_err']:.4f} "
              f"cosine {rep['cosine']:.5f}  ({time.time()-t0:.0f}s)",
              flush=True)
        del ctx, state


if __name__ == "__main__":
    main()
