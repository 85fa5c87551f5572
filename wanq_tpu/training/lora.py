"""LoRA adapters for the Wan DiT.

TPU-native rebuild of the LoRA capability referenced by the distillation
trainer's checkpoint helpers (wan/checkpoint.py save_lora_checkpoint /
load-lora paths). Adapters live in their own pytree; the forward consumes
``apply_lora(params, lora)`` — XLA fuses the rank-r update into the weight
load, and only the adapter tree takes gradients/optimizer state."""

from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.quant.ptq import params_get

DEFAULT_TARGETS = r"self_attn\.(q|k|v|o)|ffn\.(0|2)"


def _lora_scale(lora):
    """alpha/r as a non-trainable constant (a hyperparameter, not a leaf)."""
    scale = lora.get("__scale__", 1.0)
    if isinstance(scale, jnp.ndarray):
        scale = jax.lax.stop_gradient(scale)
    return scale


def lora_layer_names(layer_names, targets: str = DEFAULT_TARGETS):
    pat = re.compile(targets)
    return [n for n in layer_names if pat.search(n)]


def init_lora(
    params: Any,
    layer_names,
    rank: int = 16,
    targets: str = DEFAULT_TARGETS,
    seed: int = 0,
    alpha: Optional[float] = None,
) -> Dict[str, Dict[str, jax.Array]]:
    """{layer_path: {a: [C_in, r], b: [r, C_out]}}; a ~ N(0, 1/r), b = 0
    (standard LoRA init: the adapted model starts at the base model)."""
    rng = np.random.default_rng(seed)
    scale = (alpha or rank) / rank
    lora: Dict[str, Dict[str, jax.Array]] = {"__scale__": jnp.float32(scale)}
    for name in lora_layer_names(layer_names, targets):
        w = params_get(params, name)["w"]
        c_in, c_out = w.shape
        lora[name] = {
            "a": jnp.asarray(
                (rng.standard_normal((c_in, rank)) / np.sqrt(rank)).astype(np.float32)
            ),
            "b": jnp.zeros((rank, c_out), jnp.float32),
        }
    return lora


def apply_lora(params: Any, lora: Dict[str, Dict[str, jax.Array]]) -> Any:
    """Merged params: w' = w + scale · a @ b per adapted layer (pure —
    returns a new tree; jit fuses the update into consumers)."""
    scale = _lora_scale(lora)

    def merge_path(tree, path, delta):
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            node = node[int(p)] if isinstance(node, list) else node[p]
        leaf = node[parts[-1]]
        node[parts[-1]] = dict(leaf) | {
            "w": leaf["w"] + delta.astype(leaf["w"].dtype)
        }

    import copy

    out = copy.copy(params)
    out["blocks"] = [copy.copy(b) for b in params["blocks"]] if isinstance(
        params["blocks"], list) else params["blocks"]
    # shallow-copy nested dicts along adapted paths only
    def deepcopy_path(tree, path):
        parts = path.split(".")
        node = tree
        for p in parts[:-1]:
            if isinstance(node, list):
                i = int(p)
                node[i] = copy.copy(node[i])
                node = node[i]
            else:
                node[p] = copy.copy(node[p])
                node = node[p]

    for name, ab in lora.items():
        if name == "__scale__":
            continue
        deepcopy_path(out, name)
        delta = scale * jnp.dot(ab["a"], ab["b"], preferred_element_type=jnp.float32)
        merge_path(out, name, delta)
    return out


def save_lora(path: str, lora) -> str:
    flat = {}
    for name, v in lora.items():
        if name == "__scale__":
            flat["__scale__"] = np.asarray(v)
        else:
            flat[f"{name}|a"] = np.asarray(v["a"])
            flat[f"{name}|b"] = np.asarray(v["b"])
    np.savez(path, **flat)
    return path


def load_lora(path: str):
    data = np.load(path)
    lora: Dict[str, Any] = {}
    for key in data.files:
        if key == "__scale__":
            lora["__scale__"] = jnp.asarray(data[key])
            continue
        name, leaf = key.split("|")
        lora.setdefault(name, {})[leaf] = jnp.asarray(data[key])
    return lora


def save_lora_checkpoint(
    output_dir: str,
    step: int,
    lora,
    opt_state: Any = None,
    rank: Optional[int] = None,
    alpha: Optional[float] = None,
    targets: str = DEFAULT_TARGETS,
) -> str:
    """Training checkpoint: adapters + optimizer state + config metadata
    under ``lora-checkpoint-{step}/`` (ref wan/checkpoint.py
    save_lora_checkpoint :248-287 — lora weights via peft, lora_optimizer.pt,
    lora_config.json; the FSDP rank-0 gather is unnecessary in a
    single-controller program)."""
    import json
    import os

    save_dir = os.path.join(output_dir, f"lora-checkpoint-{step}")
    os.makedirs(save_dir, exist_ok=True)
    save_lora(os.path.join(save_dir, "lora_weights.npz"), lora)
    if opt_state is not None:
        from wanq_tpu.utils.checkpoint import save_checkpoint

        save_checkpoint(os.path.join(save_dir, "lora_optimizer"), opt_state)
    any_ab = next(v for k, v in lora.items() if k != "__scale__")
    r = rank if rank is not None else int(any_ab["a"].shape[1])
    cfg = {
        "step": step,
        "lora_params": {
            "lora_rank": r,
            "lora_alpha": float(alpha) if alpha is not None
            else float(lora.get("__scale__", 1.0)) * r,
            "target_modules": targets,
        },
    }
    with open(os.path.join(save_dir, "lora_config.json"), "w") as f:
        json.dump(cfg, f, indent=4)
    return save_dir


def resume_lora_checkpoint(checkpoint_dir: str, opt_state_target: Any = None):
    """→ (lora, opt_state | None, step, config) (ref resume_lora_optimizer
    :290-302). ``opt_state_target`` is the freshly-initialized optimizer
    state whose structure the restore targets (orbax needs the pytree
    skeleton)."""
    import json
    import os

    with open(os.path.join(checkpoint_dir, "lora_config.json")) as f:
        cfg = json.load(f)
    lora = load_lora(os.path.join(checkpoint_dir, "lora_weights.npz"))
    opt_state = None
    opt_path = os.path.join(checkpoint_dir, "lora_optimizer")
    if os.path.exists(opt_path):
        from wanq_tpu.utils.checkpoint import load_checkpoint

        opt_state = load_checkpoint(opt_path, target=opt_state_target)
    return lora, opt_state, int(cfg["step"]), cfg


def merge_lora_into_quant_state(state, lora):
    """QLoRA: attach the adapters to the quant-state pytree so they reach
    every qlinear site through the same machinery as the frozen quantized
    base (scan stacking, mesh sharding, pytree-arg passing). qlinear
    applies ``y += (x @ a) @ b`` on the raw layer input (_maybe_lora);
    the alpha/r scale folds into ``b`` here. Pure — returns a new dict.

    Every adapted layer must be a quantized layer present in ``state``;
    FP layers take the weight-merging :func:`apply_lora` path instead.
    """
    scale = _lora_scale(lora)
    out = dict(state)
    for name, ab in lora.items():
        if name == "__scale__":
            continue
        if name not in out:
            raise KeyError(
                f"QLoRA target {name} has no quant-state entry — adapt FP "
                "layers via apply_lora, or extend the quant config"
            )
        st = dict(out[name])
        st["lora_a"] = ab["a"]
        st["lora_b"] = ab["b"] * scale
        out[name] = st
    return out


def stack_lora(lora, num_layers: int, prefix: str = "blocks."):
    """Stack per-block adapters to scan xs: {suffix: {lora_a: [L, C_in, r],
    lora_b: [L, r, C_out]}} — the shape models.dit._scan_blocks consumes
    inside ``scan_state``. Every scanned suffix must be adapted in ALL
    ``num_layers`` blocks (lax.scan needs uniform xs); non-block entries
    pass through under their full name for the unscanned sites."""
    scale = _lora_scale(lora)
    per_suffix: Dict[str, Dict[int, Any]] = {}
    other: Dict[str, Dict[str, jax.Array]] = {}
    for name, ab in lora.items():
        if name == "__scale__":
            continue
        if name.startswith(prefix):
            idx_str, suffix = name[len(prefix):].split(".", 1)
            per_suffix.setdefault(suffix, {})[int(idx_str)] = ab
        else:
            other[name] = {"lora_a": ab["a"], "lora_b": ab["b"] * scale}
    stacked: Dict[str, Dict[str, jax.Array]] = {}
    for suffix, by_idx in per_suffix.items():
        if len(by_idx) != num_layers:
            raise ValueError(
                f"QLoRA under scan needs the {suffix} adapter in all "
                f"{num_layers} blocks (got {len(by_idx)}): lax.scan xs "
                "must be uniform"
            )
        stacked[suffix] = {
            "lora_a": jnp.stack([by_idx[i]["a"] for i in range(num_layers)]),
            "lora_b": jnp.stack(
                [by_idx[i]["b"] * scale for i in range(num_layers)]
            ),
        }
    return stacked, other


def merge_lora_into_scan_ctx(sctx, lora, num_layers: int):
    """QLoRA under scan-over-blocks: returns a copy of a make_scan_ctx
    context with the stacked adapters merged into ``scan_state`` (per
    suffix) and non-block adapters into ``state`` — the 14B-scale path
    (one compiled block body; adapters ride as scan xs)."""
    stacked, other = stack_lora(lora, num_layers)
    scan_state = dict(sctx.scan_state or {})
    for suffix, leaves in stacked.items():
        scan_state[suffix] = {**scan_state.get(suffix, {}), **leaves}
    state = sctx.state
    if other:  # non-block adapters (scale already folded by stack_lora)
        state = dict(state)
        for name, leaves in other.items():
            if name not in state:
                raise KeyError(
                    f"QLoRA target {name} has no quant-state entry"
                )
            state[name] = {**state[name], **leaves}
    return sctx.replace(state=state, scan_state=scan_state)


def init_lora_from_cfg(
    cfg,
    rank: int = 16,
    targets: str = DEFAULT_TARGETS,
    seed: int = 0,
    alpha: Optional[float] = None,
):
    """Shape-driven adapter init for stripped/streamed bases — the 14B
    single-chip QLoRA path quantizes each block as it is generated and
    never materializes FP weights, so adapter shapes come from the model
    config (planner.block_linear_dims) instead of a params tree."""
    from wanq_tpu.quant.planner import block_linear_dims

    rng = np.random.default_rng(seed)
    scale = (alpha or rank) / rank
    pat = re.compile(targets)
    lora: Dict[str, Any] = {"__scale__": jnp.float32(scale)}
    for sfx, (c_in, c_out) in block_linear_dims(cfg).items():
        for i in range(cfg.num_layers):
            name = f"blocks.{i}.{sfx}"
            if not pat.search(name):
                continue
            lora[name] = {
                "a": jnp.asarray(
                    (rng.standard_normal((c_in, rank)) / np.sqrt(rank))
                    .astype(np.float32)
                ),
                "b": jnp.zeros((rank, c_out), jnp.float32),
            }
    return lora
