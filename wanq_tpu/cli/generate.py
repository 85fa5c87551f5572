"""Unified generation CLI covering every task (TPU-native rebuild of the
stock Wan generate.py the reference smoke-tests drive, tests/test.sh):
t2v / t2i (single-frame t2v) / i2v, FP or quantized.

    python -m wanq_tpu.cli.generate --task i2v-14B --size 1280*720 \
        --ckpt_dir <Wan2.1-I2V-14B> --image input.jpg --prompt "..."
"""

from __future__ import annotations

import argparse
import logging

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
from wanq_tpu.configs import MAX_AREA_CONFIGS, SIZE_CONFIGS, WAN_CONFIGS
from wanq_tpu.pipelines.image2video import WanI2V
from wanq_tpu.pipelines.text2video import WanT2V


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq generate")
    add_common_args(p)
    p.add_argument("--image", type=str, default=None, help="input image (i2v)")
    p.add_argument("--quant_config", type=str, default=None)
    p.add_argument("--quant_params", type=str, default=None)
    p.add_argument("--hardware", action="store_true")
    p.add_argument("--prompt_file", type=str, default=None,
                   help="serving loop: one prompt per line, all videos from "
                        "ONE process — params/PTQ load and step-fn compiles "
                        "amortize across prompts (the reference re-pays them "
                        "per torchrun invocation). t2v/t2i only. Prompts "
                        "T5-encode up front in one encoder session (freed "
                        "before the denoise phase); without --ckpt_dir each "
                        "line gets seeded random contexts (smoke)")
    return p.parse_args(argv)


def _load_image(path: str) -> jnp.ndarray:
    import imageio

    img = np.asarray(imageio.imread(path), dtype=np.float32) / 127.5 - 1.0
    if img.ndim == 2:
        img = np.stack([img] * 3, axis=-1)
    return jnp.asarray(img[..., :3].transpose(2, 0, 1))  # [3, H, W]


def _maybe_quant_ctx(args, cfg):
    win = parse_attn_window(args)
    if not args.quant_config:
        if win is not None:
            from wanq_tpu.quant.qlinear import QuantCtx

            # windowed-but-unquantized deployment: an fp-mode ctx only
            # carries the window spec (qlinear treats fp like ctx=None)
            return QuantCtx(mode="fp", attn_window=win)
        return None
    from wanq_tpu.models.dit import linear_layer_names
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import load_quant_state, rebuild_rotations
    from wanq_tpu.quant.qlinear import QuantCtx

    qcfg = QuantConfig.from_yaml(args.quant_config)
    names = linear_layer_names(cfg)
    policies = {n: qcfg.resolve(n) for n in names}
    assert args.quant_params, "--quant_config needs --quant_params (run ptq)"
    state, seed = load_quant_state(args.quant_params)
    rotations = rebuild_rotations(state, policies, seed)
    return QuantCtx(
        mode="int8" if args.hardware else "sim",
        policies=policies, state=state, rotations=rotations,
        attn=qcfg.attn_cfg, cross_attn=qcfg.cross_attn_cfg,
        attn_window=win,
    )



def _cache_policy(args):
    """cache_policy_from_args with the quant config's cache: section as
    the fallback (scale-tuned defaults, e.g. wan_w8a8_14b.yaml)."""
    qcfg = None
    if args.quant_config:
        from wanq_tpu.quant import QuantConfig

        qcfg = QuantConfig.from_yaml(args.quant_config)
    return cache_policy_from_args(args, qcfg=qcfg)


def _serving_loop(args, cfg, pipe, common):
    """Multi-prompt serving from one process (beyond-reference: the
    reference's CLIs run one prompt per torchrun invocation, re-paying
    model load + per-op warmup each time; here params/PTQ state and the
    jitted step functions persist across prompts — WanT2V caches them by
    (seq_len, mode), so every video after the first runs compile-free).
    Measured context: one 32k-token video saturates a v5e chip, so
    sequential per-prompt serving IS the throughput-optimal single-chip
    schedule (BENCH_NOTES 'Batched serving throughput')."""
    import time

    with open(args.prompt_file) as f:
        prompts = [ln.strip() for ln in f if ln.strip()]
    assert prompts, f"no prompts in {args.prompt_file}"
    n = len(prompts)
    if args.context_file:
        data = np.load(args.context_file)
        ctx_all, ctxn_all = data["context"], data["context_null"]
        assert ctx_all.shape[0] >= n, (
            f"--context_file has {ctx_all.shape[0]} rows < {n} prompts")
    elif args.ckpt_dir:
        # ONE encoder session for every prompt, freed before denoise
        # (the reference's offload_model move, text2video.py:200-210)
        from wanq_tpu.models.t5 import encode_prompts

        ctx_all, ctxn_all = encode_prompts(
            args.ckpt_dir, cfg, prompts, [args.neg_prompt] * n,
            on_cpu=getattr(args, "t5_cpu", False))
    else:
        rng = np.random.default_rng(args.base_seed)
        shape = (n, cfg.text_len, cfg.text_dim)
        ctx_all = rng.normal(size=shape).astype(np.float32)
        ctxn_all = rng.normal(size=shape).astype(np.float32)

    vae = None
    if args.ckpt_dir:
        import os

        from wanq_tpu.models.vae import WanVAE

        vae = WanVAE(vae_pth=os.path.join(args.ckpt_dir, cfg.vae_checkpoint),
                     compute_dtype=jnp.dtype(args.vae_dtype).type)
    base = args.save_file or f"gen_{args.task}_{args.size.replace('*', 'x')}.npz"
    saved = []
    for i, prompt in enumerate(prompts):
        t0 = time.time()
        latents = pipe.generate(
            jnp.asarray(ctx_all[i:i + 1]), jnp.asarray(ctxn_all[i:i + 1]),
            size=SIZE_CONFIGS[args.size],
            cache_policy=_cache_policy(args), **common,
        )
        out = {"latents": np.asarray(latents), "prompt": np.asarray(prompt)}
        if vae is not None:
            from wanq_tpu.utils.video import cache_video

            video = np.asarray(vae.decode(latents))
            out["video"] = video
            cache_video(video, base.replace(".npz", f"_p{i}.mp4"),
                        fps=cfg.sample_fps)
        save_file = base.replace(".npz", f"_p{i}.npz")
        np.savez(save_file, **out)
        saved.append(save_file)
        logging.info("prompt %d/%d in %.1fs%s -> %s", i + 1, n,
                     time.time() - t0,
                     " (incl. compile)" if i == 0 else " (warm)", save_file)
    return saved


def generate(args):
    setup_logging()
    validate_args(args)
    cfg = WAN_CONFIGS[args.task]
    is_i2v = cfg.model_type == "i2v"
    if args.task.startswith("t2i"):
        args.frame_num = 1

    if args.prompt_file and is_i2v:
        raise SystemExit("--prompt_file serves t2v/t2i (i2v needs a per-"
                         "prompt --image; run one process per pair)")
    params = load_params(args, cfg)
    context = context_null = None
    if not args.prompt_file:  # the serving loop encodes its own batch
        context, context_null = load_contexts(args, cfg)
    qctx = _maybe_quant_ctx(args, cfg)
    stacked = False
    if not getattr(args, "unroll_blocks", False):
        from wanq_tpu.models.dit import make_scan_ctx, stack_block_params

        try:
            if qctx is not None:
                qctx = make_scan_ctx(qctx, cfg.num_layers)
            params = stack_block_params(params)
            stacked = True
        except (AssertionError, KeyError) as e:
            import logging

            logging.info("scan-over-blocks unavailable (%s); unrolled loop", e)
    mesh, plan = build_mesh_and_plan(args)
    if mesh is not None:
        from wanq_tpu.parallel import shard_params
        from wanq_tpu.quant.ptq import shard_quant_state, shard_scan_ctx

        fs = getattr(args, 'full_shard', False)
        params = shard_params(params, mesh, fs)
        if qctx is not None:
            if stacked:
                qctx = shard_scan_ctx(qctx, mesh, fs)
            else:
                qctx.state = shard_quant_state(qctx.state, mesh, fs)

    common = dict(
        frame_num=args.frame_num,
        shift=args.sample_shift,
        sample_solver=args.sample_solver,
        sampling_steps=args.sample_steps,
        guide_scale=args.sample_guide_scale,
        seed=args.base_seed,
        cfg_mode=args.cfg_mode,
    )
    vae = None
    if is_i2v:
        assert args.image, "--task i2v needs --image"
        img = _load_image(args.image)
        clip = None
        if args.ckpt_dir:
            import os

            from wanq_tpu.models.clip import CLIPModel
            from wanq_tpu.models.vae import WanVAE

            vae = WanVAE(vae_pth=os.path.join(args.ckpt_dir, cfg.vae_checkpoint),
                         compute_dtype=jnp.dtype(args.vae_dtype).type)
            clip = CLIPModel(
                checkpoint_path=os.path.join(args.ckpt_dir, cfg.clip_checkpoint)
            )
        pipe = WanI2V(cfg, params, quant_ctx=qctx, sp_size=seq_parallel_size(args),
                      mesh=mesh, shardings=plan, vae=vae, clip=clip)
        kw = {}
        if vae is None:
            # checkpoint-free smoke: random conditioning
            lat_h = lat_w = None
            from wanq_tpu.pipelines.image2video import i2v_latent_size

            lat_h, lat_w = i2v_latent_size(cfg, img.shape[1:], MAX_AREA_CONFIGS[args.size])
            lat_f = (args.frame_num - 1) // cfg.vae_stride[0] + 1
            rng = np.random.default_rng(args.base_seed)
            kw["clip_fea"] = jnp.asarray(
                rng.normal(size=(1, 257, cfg.clip_dim)).astype(np.float32))
            kw["y"] = jnp.asarray(rng.normal(
                size=(cfg.in_dim - cfg.z_dim, lat_f, lat_h, lat_w)).astype(np.float32))
        latents = pipe.generate(
            img, jnp.asarray(context), jnp.asarray(context_null),
            max_area=MAX_AREA_CONFIGS[args.size],
            cache_policy=_cache_policy(args), **common, **kw,
        )
    else:
        pipe = WanT2V(cfg, params, quant_ctx=qctx, sp_size=seq_parallel_size(args),
                      mesh=mesh, shardings=plan)
        if args.prompt_file:
            return _serving_loop(args, cfg, pipe, common)
        latents = pipe.generate(
            jnp.asarray(context), jnp.asarray(context_null),
            size=SIZE_CONFIGS[args.size],
            cache_policy=_cache_policy(args), **common,
        )

    save_file = args.save_file or f"gen_{args.task}_{args.size.replace('*','x')}.npz"
    out = {"latents": np.asarray(latents)}
    if args.ckpt_dir:
        try:
            import os

            from wanq_tpu.models.vae import WanVAE
            from wanq_tpu.utils.video import cache_video

            if vae is None:  # t2v branch; i2v already loaded it
                vae = WanVAE(
                    vae_pth=os.path.join(args.ckpt_dir, cfg.vae_checkpoint),
                    compute_dtype=jnp.dtype(args.vae_dtype).type)
            video = vae.decode(latents)
            out["video"] = np.asarray(video)
            mp4 = save_file.replace(".npz", ".mp4")
            cache_video(np.asarray(video), mp4, fps=cfg.sample_fps)
            logging.info("wrote %s", mp4)
        except FileNotFoundError as e:
            logging.warning("VAE decode skipped: %s", e)
    np.savez(save_file, **out)
    logging.info("saved %s", save_file)
    return save_file


if __name__ == "__main__":
    generate(parse_args())
