"""Shared CLI plumbing (TPU-native rebuild of the reference entry scripts'
argparse + validation boilerplate, fp_generate.py:44-199).

The reference's hard-coded developer paths (fp_generate.py:315,:490) are
replaced with explicit flags. torchrun/NCCL init collapses to mesh flags:
--ulysses_size → 'sp' axis, --ring_size → 'ring' axis (hybrid Ulysses×ring
context parallelism, ref fp_generate.py:248-259), --dit_fsdp → 'fsdp' axis.
"""

from __future__ import annotations

import argparse
import logging
import sys
from typing import Tuple

import numpy as np

from wanq_tpu.configs import (
    SAMPLE_NEG_PROMPT,
    SIZE_CONFIGS,
    SUPPORTED_SIZES,
    WAN_CONFIGS,
)

EXAMPLE_PROMPT = (
    "Two anthropomorphic cats in comfy boxing gear and bright gloves fight "
    "intensely on a spotlighted stage."
)


def add_common_args(p: argparse.ArgumentParser, default_steps: int = 50):
    p.add_argument("--task", type=str, default="t2v-1.3B", choices=list(WAN_CONFIGS))
    p.add_argument("--size", type=str, default="832*480", choices=list(SIZE_CONFIGS))
    p.add_argument("--frame_num", type=int, default=81, help="4n+1 frames")
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="Wan2.1 checkpoint dir (diffusers safetensors); "
                        "omit with --random_init for smoke/bench runs")
    p.add_argument("--random_init", action="store_true",
                   help="random weights instead of a checkpoint")
    p.add_argument("--prompt", type=str, default=EXAMPLE_PROMPT)
    p.add_argument("--neg_prompt", type=str, default=SAMPLE_NEG_PROMPT)
    p.add_argument("--context_file", type=str, default=None,
                   help="npz with precomputed 'context'/'context_null' "
                        "text-encoder states (skips T5)")
    p.add_argument("--base_seed", type=int, default=42)
    p.add_argument("--sample_solver", type=str, default="unipc",
                   choices=["unipc", "dpm++"])
    p.add_argument("--sample_steps", type=int, default=default_steps)
    p.add_argument("--sample_shift", type=float, default=5.0)
    p.add_argument("--sample_guide_scale", type=float, default=5.0)
    p.add_argument("--save_file", type=str, default=None)
    # parallelism (ref fp_generate.py:248-259 xfuser init)
    p.add_argument("--ulysses_size", type=int, default=1)
    p.add_argument("--ring_size", type=int, default=1)
    p.add_argument("--dp_size", type=int, default=1)
    p.add_argument("--dit_fsdp", action="store_true")
    p.add_argument("--t5_fsdp", action="store_true")
    p.add_argument("--fsdp_size", type=int, default=1)
    p.add_argument("--full_shard", action="store_true",
                   help="store weights sharded over EVERY non-dp mesh axis "
                        "(the reference's --dit_fsdp-on-all-ranks memory "
                        "layout when combined with --ulysses_size/--ring_size)")
    p.add_argument("--unroll_blocks", action="store_true",
                   help="disable scan-over-blocks (one compiled block body) "
                        "and unroll the block loop — needed only for "
                        "non-uniform per-block quant policies")
    p.add_argument("--offload_model", type=str, default=None,
                   help="accepted for reference-CLI parity; HBM residency "
                        "is managed by XLA on TPU")
    p.add_argument("--t5_cpu", action="store_true",
                   help="run the T5 encoder on host CPU (frees HBM for the "
                        "DiT, ref fp_generate.py --t5_cpu)")
    p.add_argument("--cfg_mode", type=str, default="batched",
                   choices=["batched", "sequential"],
                   help="classifier-free-guidance schedule: 'batched' runs "
                        "cond+uncond as one [2B] forward (best MXU "
                        "utilization); 'sequential' runs two [B] forwards "
                        "through the same compiled fn (the reference's own "
                        "schedule, text2video.py:255-261) — identical math, "
                        "half the peak activation memory; REQUIRED for "
                        "14B at 720p x 81f on one 16 GB chip")
    p.add_argument("--vae_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="VAE compute dtype (ref WanVAE(dtype=...), "
                        "vae.py:619-626). On TPU this is a MEMORY knob, not "
                        "a speed knob: XLA already runs f32 convs as "
                        "single-pass bf16 MXU ops; bfloat16 halves at-rest "
                        "activation/weight bytes at ~equal speed and is "
                        "REQUIRED for 720p x 81f decode on a 16 GB chip "
                        "(f32 OOMs; BENCH_NOTES 'bf16 VAE decode')")
    p.add_argument("--attn_window", type=str, default="-1",
                   help="sliding temporal-window block-sparse self-"
                        "attention: band to +-N latent frames (splash "
                        "in-kernel mask skips out-of-band KV blocks on "
                        "the MXU — the hardware execution of the "
                        "reference's 0-bit attention-map blocks, "
                        "quant_attn.py bitwidth-0). -1 = dense; a comma "
                        "list gives PER-HEAD radii (one splash call per "
                        "unique radius over grouped head subsets; get "
                        "them from ptq --suggest_window). Measured "
                        "r=1: 1.71x over the dense W8A8 step at 1.3B "
                        "480p (BENCH_NOTES 'Sliding temporal-window'); "
                        "pick the radius with "
                        "quant.attn.select_temporal_windows from calib "
                        "attention maps. Uniform radii compose with "
                        "Ulysses AND ring (per-KV-shard band masks); "
                        "per-head lists are single-chip; not composable "
                        "with attn-map quant sections")
    # prompt extension (ref fp_generate.py:119-138 + prompt_extend usage)
    p.add_argument("--use_prompt_extend", action="store_true")
    p.add_argument("--prompt_extend_method", type=str, default="local_qwen",
                   choices=["dashscope", "local_qwen"])
    p.add_argument("--prompt_extend_model", type=str, default=None)
    p.add_argument("--prompt_extend_target_lang", type=str, default="en",
                   choices=["en", "zh"])
    # step-level caching (beyond-reference; pipelines/text2video.py
    # StepCachePolicy — fidelity measured in tools/cache_probe.py)
    p.add_argument("--cfg_cache_interval", type=int, default=1,
                   help="refresh the uncond CFG branch every K-th step; "
                        "between refreshes only the cond branch runs "
                        "(half the tokens per step). 1 = off")
    p.add_argument("--reuse_interval", type=int, default=1,
                   help="run the model every R-th step, reuse the previous "
                        "noise prediction on skipped steps. 1 = off")
    p.add_argument("--cache_warmup", type=int, default=4,
                   help="always-full steps at the start of the trajectory")
    p.add_argument("--cache_tail", type=int, default=4,
                   help="always-full steps at the end of the trajectory")
    p.add_argument("--cache_threshold", type=float, default=0.0,
                   help="input-adaptive step reuse (TeaCache-style, "
                        "AdaptiveCachePolicy): skip the model while the "
                        "per-step relative-L1 input drift, accumulated "
                        "since the last executed forward, stays below "
                        "this. Overrides --reuse_interval; composes with "
                        "--cfg_cache_interval. 0 = off")
    p.add_argument("--cache_poly", type=str, default="",
                   help="comma-separated np.polyval coefficients rescaling "
                        "the adaptive drift signal (fit with "
                        "wanq_tpu.pipelines.text2video.fit_drift_poly; "
                        "with a fitted poly --cache_threshold is an "
                        "output-space tolerance). Empty = identity")
    p.add_argument("--cache_order", type=int, default=0, choices=[0, 1, 2],
                   help="forecast order on skipped steps (TaylorSeer-style"
                        "): 0 reuses the last noise prediction verbatim; "
                        "1/2 extrapolate it to the current timestep "
                        "through the last order+1 executed predictions")
    return p


def parse_attn_window(args):
    """``--attn_window`` → None (dense) | int radius | per-head tuple.
    Accepts "R" or a comma list "r0,r1,..." (len = num_heads, from
    ptq --suggest_window's per-head table); negative scalar = dense."""
    val = getattr(args, "attn_window", None)
    if val is None:
        return None
    s = str(val).strip()
    if not s:
        return None
    if "," in s:
        # tolerate a trailing comma / stray whitespace; negative per-head
        # entries are legal and mean dense for that head (the per-head
        # analog of the scalar negative=dense convention — dit_forward
        # maps them to a radius covering every frame pair)
        parts = [p.strip() for p in s.split(",") if p.strip()]
        if not parts:
            return None
        return tuple(int(x) for x in parts)
    r = int(s)
    return r if r >= 0 else None


def cache_policy_from_config(qcfg):
    """AdaptiveCachePolicy/StepCachePolicy from a quant config's
    ``cache:`` section (model-scale-tuned defaults shipped next to the
    quant scheme — e.g. quant_configs/wan_w8a8_14b.yaml carries the
    14B-fitted drift->output poly + output-space tolerance, because the
    1.3B raw-drift threshold demonstrably declines skips at 14B).
    Returns None when the config has no cache section."""
    sec = getattr(qcfg, "cache", None)
    if not sec:
        return None
    from wanq_tpu.pipelines.text2video import (
        AdaptiveCachePolicy,
        StepCachePolicy,
    )

    common = dict(
        warmup=int(sec.get("warmup", 4)),
        tail=int(sec.get("tail", 4)),
        cfg_interval=int(sec.get("cfg_interval", 1)),
        order=int(sec.get("order", 0)),
    )
    if sec.get("threshold"):
        poly = tuple(float(c) for c in sec.get("poly", (1.0, 0.0)))
        return AdaptiveCachePolicy(
            threshold=float(sec["threshold"]), poly=poly, **common)
    pol = StepCachePolicy(
        reuse_interval=int(sec.get("reuse_interval", 1)), **common)
    return pol if pol.active else None


def cache_policy_from_args(args, qcfg=None):
    """Step-cache policy from the CLI cache flags; None when inactive.
    --cache_threshold selects the adaptive policy, otherwise the static
    StepCachePolicy schedule. With no CLI cache flags set, falls back to
    the quant config's ``cache:`` section when one is provided (explicit
    flags always win)."""
    from wanq_tpu.pipelines.text2video import (
        AdaptiveCachePolicy,
        StepCachePolicy,
    )

    thresh = getattr(args, "cache_threshold", 0.0)
    if (not thresh and getattr(args, "reuse_interval", 1) <= 1
            and getattr(args, "cfg_cache_interval", 1) <= 1
            and qcfg is not None):
        return cache_policy_from_config(qcfg)
    if thresh and thresh > 0.0:
        poly_s = getattr(args, "cache_poly", "") or ""
        poly = (tuple(float(c) for c in poly_s.split(","))
                if poly_s.strip() else (1.0, 0.0))
        return AdaptiveCachePolicy(
            threshold=thresh,
            cfg_interval=getattr(args, "cfg_cache_interval", 1),
            warmup=getattr(args, "cache_warmup", 4),
            tail=getattr(args, "cache_tail", 4),
            poly=poly,
            order=getattr(args, "cache_order", 0),
        )
    pol = StepCachePolicy(
        cfg_interval=getattr(args, "cfg_cache_interval", 1),
        reuse_interval=getattr(args, "reuse_interval", 1),
        warmup=getattr(args, "cache_warmup", 4),
        tail=getattr(args, "cache_tail", 4),
        order=getattr(args, "cache_order", 0),
    )
    return pol if pol.active else None


def maybe_extend_prompt(args, logger=None):
    """Apply the configured prompt expander to args.prompt in place
    (ref fp_generate.py:262-292)."""
    if not getattr(args, "use_prompt_extend", False):
        return args.prompt
    from wanq_tpu.utils import prompt_extend as pe

    if args.prompt_extend_method == "dashscope":
        expander = pe.DashScopePromptExpander(
            model_name=args.prompt_extend_model or "qwen-plus")
    else:
        expander = pe.LocalPromptExpander(
            model_name=args.prompt_extend_model or "Qwen/Qwen2.5-3B-Instruct")
    out = expander(args.prompt, tar_lang=args.prompt_extend_target_lang,
                   seed=args.base_seed)
    if out.status and out.prompt:
        if logger is not None:
            logger.info("extended prompt: %s", out.prompt)
        args.prompt = out.prompt
    elif logger is not None:
        logger.warning("prompt extension failed: %s; using the original",
                       out.message)
    return args.prompt


def validate_args(args):
    """ref _validate_args (fp_generate.py:44-72)."""
    assert args.frame_num % 4 == 1, "frame_num must be 4n+1"
    assert args.size in SUPPORTED_SIZES[args.task], (
        f"size {args.size} unsupported for {args.task}: "
        f"{SUPPORTED_SIZES[args.task]}"
    )
    assert args.ring_size >= 1, "--ring_size must be >= 1"
    if args.ckpt_dir is None and not args.random_init and args.context_file is None:
        raise SystemExit(
            "need --ckpt_dir, or --random_init (+ optional --context_file) "
            "for checkpoint-free runs"
        )


def setup_logging(verbose: bool = True):
    """rank-0 style logging (ref fp_generate.py:202-215)."""
    logging.basicConfig(
        level=logging.INFO if verbose else logging.ERROR,
        format="[%(asctime)s] %(levelname)s: %(message)s",
        handlers=[logging.StreamHandler(stream=sys.stdout)],
        force=True,
    )


def build_mesh_and_plan(args, n_params_hint: int = 0):
    from wanq_tpu.parallel import ShardingPlan, make_mesh

    import jax

    sp = args.ulysses_size
    ring = args.ring_size
    fsdp = args.fsdp_size if args.fsdp_size > 1 else (
        1 if not args.dit_fsdp
        else max(1, len(jax.devices()) // (sp * ring * args.dp_size))
    )
    total = args.dp_size * fsdp * sp * ring
    if total == 1:
        return None, None
    mesh = make_mesh(args.dp_size, fsdp, sp, ring)
    return mesh, ShardingPlan(mesh)


def seq_parallel_size(args) -> int:
    """Degree seq_len must round up to: ulysses × ring
    (ref text2video.py:170-172 rounds to sp_size = world // ring … × …)."""
    return args.ulysses_size * args.ring_size


def load_contexts(args, cfg) -> Tuple[np.ndarray, np.ndarray]:
    """Text-encoder states: from --context_file, from T5 (when ckpt given),
    or random (smoke runs)."""
    if args.context_file:
        data = np.load(args.context_file)
        return data["context"], data["context_null"]
    maybe_extend_prompt(args, logging.getLogger())
    if args.ckpt_dir:
        from wanq_tpu.models.t5 import encode_prompts

        return encode_prompts(
            args.ckpt_dir, cfg, [args.prompt], [args.neg_prompt],
            on_cpu=getattr(args, "t5_cpu", False))
    rng = np.random.default_rng(args.base_seed)
    shape = (1, cfg.text_len, cfg.text_dim)
    return (
        rng.normal(size=shape).astype(np.float32),
        rng.normal(size=shape).astype(np.float32),
    )


def load_params(args, cfg):
    import jax

    if args.ckpt_dir and not args.random_init:
        from wanq_tpu.models.params import load_wan_checkpoint

        return load_wan_checkpoint(args.ckpt_dir, dtype=cfg.dtype)
    from wanq_tpu.models.dit import init_params

    params = init_params(cfg, jax.random.PRNGKey(args.base_seed))
    # init_params zero-inits head.head (reference from-scratch semantics,
    # model.py:616) — under --random_init that makes the DiT output
    # identically zero, so fp-vs-quant smoke comparisons are vacuous.
    # Randomize it (same treatment as bench.py) so smoke runs exercise a
    # non-degenerate output path.
    import jax.numpy as jnp

    hw = params["head"]["head"]["w"]
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(args.base_seed + 1), hw.shape)
    ).astype(hw.dtype)
    return params
