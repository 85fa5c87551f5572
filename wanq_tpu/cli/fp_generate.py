"""FP inference CLI (TPU-native rebuild of examples/Wan2.1/fp_generate.py).

    python -m wanq_tpu.cli.fp_generate --task t2v-1.3B --size 832*480 \
        --random_init --sample_steps 1 --base_seed 42 --save_file out.npz
"""

from __future__ import annotations

import argparse
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.cli.common import (
    seq_parallel_size,
    add_common_args,
    cache_policy_from_args,
    build_mesh_and_plan,
    load_contexts,
    load_params,
    parse_attn_window,
    setup_logging,
    validate_args,
)
from wanq_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
from wanq_tpu.pipelines.text2video import WanT2V


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq fp_generate")
    add_common_args(p)
    return p.parse_args(argv)


def generate(args):
    setup_logging()
    validate_args(args)
    cfg = WAN_CONFIGS[args.task]
    size = SIZE_CONFIGS[args.size]

    logging.info("loading params (%s)", "random" if args.random_init else args.ckpt_dir)
    params = load_params(args, cfg)
    if not getattr(args, "unroll_blocks", False):
        from wanq_tpu.models.dit import stack_block_params

        params = stack_block_params(params)
    context, context_null = load_contexts(args, cfg)

    mesh, plan = build_mesh_and_plan(args)
    if mesh is not None:
        from wanq_tpu.parallel import shard_params

        params = shard_params(params, mesh, getattr(args, 'full_shard', False))
        logging.info("mesh: %s", dict(mesh.shape))

    qctx = None
    win = parse_attn_window(args)
    if win is not None:
        from wanq_tpu.quant.qlinear import QuantCtx

        # fp-mode ctx carries only the sliding temporal-window spec
        # (qlinear treats mode="fp" like ctx=None)
        qctx = QuantCtx(mode="fp", attn_window=win)
    pipe = WanT2V(cfg, params, quant_ctx=qctx,
                  sp_size=seq_parallel_size(args), mesh=mesh, shardings=plan)
    t0 = time.time()
    latents = pipe.generate(
        jnp.asarray(context),
        jnp.asarray(context_null),
        size=size,
        frame_num=args.frame_num,
        shift=args.sample_shift,
        sample_solver=args.sample_solver,
        sampling_steps=args.sample_steps,
        guide_scale=args.sample_guide_scale,
        seed=args.base_seed,
        cache_policy=cache_policy_from_args(args),
        cfg_mode=args.cfg_mode,
    )
    latents.block_until_ready()
    logging.info("denoise done in %.2fs, latents %s", time.time() - t0, latents.shape)

    save_file = args.save_file or f"fp_{args.task}_{args.size.replace('*','x')}_seed{args.base_seed}.npz"
    out = {"latents": np.asarray(latents)}
    if args.ckpt_dir:
        try:
            from wanq_tpu.models.vae import decode_latents

            video = decode_latents(args.ckpt_dir, cfg, latents)
            out["video"] = np.asarray(video)
        except (ImportError, FileNotFoundError) as e:
            logging.warning("VAE decode skipped: %s", e)
    if not save_file.endswith(".npz"):
        save_file += ".npz"  # np.savez appends it anyway; log the real path
    np.savez(save_file, **out)
    logging.info("saved %s", save_file)
    return save_file


if __name__ == "__main__":
    generate(parse_args())
