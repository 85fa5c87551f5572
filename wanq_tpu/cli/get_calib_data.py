"""Calibration CLI (TPU-native rebuild of get_calib_data_wanx.py).

Runs an FP denoise sweep and saves per-layer activation absmax stacks
{layer: [T, C]} — the input to PTQ.

    python -m wanq_tpu.cli.get_calib_data --task t2v-1.3B --random_init \
        --sample_steps 30 --quant_config quant_configs/config.yaml
"""

from __future__ import annotations

import argparse
import logging
import time

import jax.numpy as jnp
import numpy as np

from wanq_tpu.cli.common import (
    seq_parallel_size,
    add_common_args,
    build_mesh_and_plan,
    load_contexts,
    load_params,
    setup_logging,
    validate_args,
)
from wanq_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
from wanq_tpu.pipelines.text2video import WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.qlinear import QuantCtx


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq get_calib_data")
    add_common_args(p, default_steps=30)
    p.add_argument("--quant_config", type=str, default=None,
                   help="quant YAML; its calib_data.save_path is the output")
    p.add_argument("--calib_save_path", type=str, default="calib_data.npz")
    p.add_argument("--collect_minmax", action="store_true",
                   help="also collect per-channel act min/max (static A8)")
    p.add_argument("--attn_map_pool", type=int, default=0,
                   help="pool factor for post-softmax attn-map capture "
                        "(feeds generate_reorder_tables; 0 = off)")
    p.add_argument("--attn_map_reduce", type=str, default="max",
                   choices=["max", "mean"],
                   help="pooling reduction for captured attn maps: 'max' "
                        "feeds reorder tables (ref 2D max-pool, "
                        "get_calib_data_wanx.py:227-238); 'mean' is "
                        "mass-preserving — required for sliding-window "
                        "selection (ptq --suggest_window)")
    p.add_argument("--collect_hessian", type=str, default=None, metavar="REGEX",
                   help="also accumulate the input Hessian X^T X for layers "
                        "matching REGEX (GPTQ weight rounding; match on "
                        "suffixes like 'ffn|self_attn' — ffn.2 Hessians are "
                        "[ffn_dim, ffn_dim], budget memory accordingly)")
    p.add_argument("--calib_rounds", type=int, default=1,
                   help="independent calibration sweeps (seed+i) merged into "
                        "one artifact: Hessians sum, absmax/minmax stacks "
                        "concatenate. GPTQ needs the input subspace covered "
                        "across draws — one trajectory underestimates it")
    return p.parse_args(argv)


def generate(args):
    setup_logging()
    validate_args(args)
    cfg = WAN_CONFIGS[args.task]
    size = SIZE_CONFIGS[args.size]

    save_path = args.calib_save_path
    if args.quant_config:
        qc = QuantConfig.from_yaml(args.quant_config)
        if qc.calib_save_path:
            save_path = qc.calib_save_path
    if save_path.endswith(".pth"):  # reference default name; we write npz
        save_path = save_path[:-4] + ".npz"

    params = load_params(args, cfg)
    if not getattr(args, "unroll_blocks", False):
        from wanq_tpu.models.dit import stack_block_params

        params = stack_block_params(params)
    context, context_null = load_contexts(args, cfg)
    mesh, plan = build_mesh_and_plan(args)
    if mesh is not None:
        from wanq_tpu.parallel import shard_params

        params = shard_params(params, mesh, getattr(args, 'full_shard', False))

    pipe = WanT2V(
        cfg, params,
        quant_ctx=QuantCtx(
            mode="calib",
            collect_minmax=args.collect_minmax,
            attn_map_pool=args.attn_map_pool,
            attn_map_reduce=args.attn_map_reduce,
            hessian_regex=args.collect_hessian,
        ),
        sp_size=seq_parallel_size(args), mesh=mesh, shardings=plan,
    )
    t0 = time.time()
    stats = None
    for rnd in range(max(1, args.calib_rounds)):
        one = pipe.collect_calibration(
            jnp.asarray(context),
            jnp.asarray(context_null),
            size=size,
            frame_num=args.frame_num,
            shift=args.sample_shift,
            sample_solver=args.sample_solver,
            sampling_steps=args.sample_steps,
            guide_scale=args.sample_guide_scale,
            seed=args.base_seed + rnd,
        )
        if stats is None:
            stats = dict(one)
        else:
            # merge rounds: Hessians sum; [T, ...] stacks concatenate so
            # reduce_calib's max/min runs over every round's steps
            for k, v in one.items():
                if k.endswith(".hess"):
                    stats[k] = stats[k] + v
                else:
                    stats[k] = np.concatenate([stats[k], v], axis=0)
    logging.info(
        "calibration sweep done in %.2fs: %d layers x %d steps x %d rounds",
        time.time() - t0, len(stats), args.sample_steps,
        max(1, args.calib_rounds),
    )
    if args.attn_map_pool:
        # record the pool factor so downstream selection (ptq
        # --suggest_window) can map pooled cells back to token indices
        stats["attn_map_pool"] = np.asarray(args.attn_map_pool)
    np.savez(save_path, **stats)
    logging.info("saved %s", save_path)
    return save_path


if __name__ == "__main__":
    generate(parse_args())
