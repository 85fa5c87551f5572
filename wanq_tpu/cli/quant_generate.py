"""Quantized inference CLI (TPU-native rebuild of quant_generate.py):
simulated quantization (fake-quant under jit) or the real int8 Pallas
kernel path.

    python -m wanq_tpu.cli.quant_generate --task t2v-1.3B --random_init \
        --quant_config quant_configs/config.yaml \
        --quant_params quant_params.npz --hardware
"""

from __future__ import annotations

import argparse
import logging
import os
import time

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
from wanq_tpu.models.dit import linear_layer_names
from wanq_tpu.pipelines.text2video import WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import load_quant_state, prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq quant_generate")
    add_common_args(p)
    p.add_argument("--quant_config", type=str, default=None)
    p.add_argument("--auto_bits_gib", type=float, default=None,
                   help="capacity-aware mixed W4/W8: plan bitwidths under "
                        "this weight-state HBM budget (quant/planner.py) "
                        "instead of --quant_config's weight section; "
                        "measured fits on one v5e: 8.0 at 14B/720p, "
                        "9.5 at 14B/480p")
    p.add_argument("--quant_params", type=str, default=None,
                   help="quant_params.npz from the ptq stage; recomputed "
                        "on the fly if omitted (needs --calib_data for "
                        "smooth_quant/viditq)")
    p.add_argument("--calib_data", type=str, default=None)
    p.add_argument("--hardware", action="store_true",
                   help="int8 Pallas kernel path (ref if_hardware, "
                        "quant_generate.py:372); default is simulated quant")
    p.add_argument("--lora", type=str, default=None,
                   help="QLoRA adapters (training/lora.py save_lora npz or "
                        "a lora-checkpoint-N dir) merged into the quant "
                        "state at inference — fused fast paths "
                        "automatically yield to the qlinear adapter route "
                        "on adapted sites")
    p.add_argument("--strip_fp", action="store_true",
                   help="free the FP copies of quantized weights (the "
                        "reference hardware refactor's deletion, "
                        "quant_wanx.py:137-185); incompatible with "
                        "timestep schedules that fall back to FP layers")
    return p.parse_args(argv)


def generate(args):
    setup_logging()
    validate_args(args)
    cfg = WAN_CONFIGS[args.task]
    size = SIZE_CONFIGS[args.size]
    if args.auto_bits_gib is not None:
        from wanq_tpu.quant.planner import plan_capacity_bits

        base = (QuantConfig.from_yaml(args.quant_config).raw
                if args.quant_config else {})
        plan = plan_capacity_bits(
            cfg, int(args.auto_bits_gib * 2**30),
            act=base.get("act") or {"n_bits": 8, "sym": True,
                                    "static_regex": r"ffn\.2"})
        logging.info("%s", plan.report())
        qcfg = QuantConfig.from_dict(plan.config)
    elif args.quant_config:
        qcfg = QuantConfig.from_yaml(args.quant_config)
    else:
        raise SystemExit("need --quant_config or --auto_bits_gib")
    mode = "int8" if args.hardware else "sim"

    params = load_params(args, cfg)
    names = linear_layer_names(cfg)
    policies = {n: qcfg.resolve(n) for n in names}

    if args.quant_params and args.quant_params.endswith(".pth"):
        # a REFERENCE quant_params.pth artifact: import the scale dicts
        # and rebuild the deployed weights from them (rotated methods
        # raise — their matrices are not recoverable from the artifact)
        from wanq_tpu.quant.ptq import (
            load_reference_quant_params,
            state_from_reference_params,
        )

        imported = load_reference_quant_params(args.quant_params)
        state = state_from_reference_params(
            params, policies, imported, targets=mode
        )
        rotations = {}
        logging.info(
            "deployed from reference artifact %s: %d layers",
            args.quant_params, len(state),
        )
    elif args.quant_params:
        from wanq_tpu.quant.ptq import rebuild_rotations

        state, seed = load_quant_state(args.quant_params)
        rotations = rebuild_rotations(state, policies, seed)
        logging.info("loaded quant state: %d layers (seed %d)", len(state), seed)
    else:
        calib = dict(np.load(args.calib_data)) if args.calib_data else None
        policies, state, rotations = prepare_quant_state(
            params, names, qcfg, calib=calib, targets=mode
        )
        logging.info("computed quant state on the fly: %d layers", len(state))

    context, context_null = load_contexts(args, cfg)
    if getattr(args, "strip_fp", False):
        # the reference's hardware refactor deletes the FP weight copies
        # after int8 export (quant_wanx.py:137-185); sim/int8 qlinear reads
        # the quant state, never params['w']
        from wanq_tpu.quant.ptq import strip_quantized_weights

        params = strip_quantized_weights(params, policies)
        logging.info("stripped FP copies of quantized weights")
    if getattr(args, "lora", None):
        # QLoRA adapters ride the quant state (qlinear applies them on the
        # raw input); int8 fused fast paths refuse adapted sites, so the
        # fine-tuned deployment is exact by construction
        from wanq_tpu.training.lora import load_lora, merge_lora_into_quant_state

        lp = args.lora
        if os.path.isdir(lp):
            lp = os.path.join(lp, "lora_weights.npz")
        state = merge_lora_into_quant_state(state, load_lora(lp))
        logging.info("merged QLoRA adapters from %s", args.lora)

    ctx = QuantCtx(mode=mode, policies=policies, state=state, rotations=rotations,
                   attn=qcfg.attn_cfg, cross_attn=qcfg.cross_attn_cfg,
                   attn_window=parse_attn_window(args))

    # scan-over-blocks: one compiled block body instead of 30/40 unrolled
    # (compile-time essential at 14B); falls back to the unrolled loop for
    # non-uniform per-block policies (e.g. per-block mixed precision)
    stacked = False
    if not getattr(args, "unroll_blocks", False):
        from wanq_tpu.models.dit import make_scan_ctx, stack_block_params

        try:
            ctx = make_scan_ctx(ctx, cfg.num_layers)
            params = stack_block_params(params)
            stacked = True
        except (AssertionError, KeyError) as e:
            logging.info("scan-over-blocks unavailable (%s); unrolled loop", e)

    mesh, plan = build_mesh_and_plan(args)
    if mesh is not None:
        from wanq_tpu.parallel import shard_params
        from wanq_tpu.quant.ptq import shard_quant_state, shard_scan_ctx

        fs = getattr(args, 'full_shard', False)
        params = shard_params(params, mesh, fs)
        # int8/sim weight state lives FSDP-sharded on the mesh like the FP
        # weights it replaces (14B int8 ≈ 14 GB cannot replicate)
        if stacked:
            ctx = shard_scan_ctx(ctx, mesh, fs)
        else:
            ctx.state = shard_quant_state(ctx.state, mesh, fs)
    pipe = WanT2V(cfg, params, quant_ctx=ctx,
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
        cache_policy=cache_policy_from_args(args, qcfg=qcfg),
    )
    latents.block_until_ready()
    logging.info("quant (%s) denoise done in %.2fs", mode, time.time() - t0)

    save_file = args.save_file or (
        f"quant_{mode}_{args.task}_{args.size.replace('*','x')}_seed{args.base_seed}.npz"
    )
    np.savez(save_file, latents=np.asarray(latents))
    logging.info("saved %s", save_file)
    return save_file


if __name__ == "__main__":
    generate(parse_args())
