"""Checkpoint conversion: reference torch/safetensors → wanq_tpu pytree.

The reference loads diffusers-format safetensors via WanModel.from_pretrained
(text2video.py:86). We stream tensors one by one (no torch runtime needed for
safetensors; numpy framework) and transpose linear kernels from torch's
[C_out, C_in] to our MXU [C_in, C_out] layout. Conv3d patch embedding folds
to the dense per-patch kernel (see dit.init_params docstring).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _set(tree: Dict[str, Any], path: str, leaf):
    parts = path.split(".")
    node = tree
    i = 0
    while i < len(parts) - 1:
        p = parts[i]
        if p == "blocks":
            idx = int(parts[i + 1])
            lst = node.setdefault("blocks", [])
            while len(lst) <= idx:
                lst.append({})
            node = lst[idx]
            i += 2
        else:
            node = node.setdefault(p, {})
            i += 1
    node[parts[-1]] = leaf


def _np(t) -> np.ndarray:
    if hasattr(t, "numpy"):
        t = t.float().numpy() if hasattr(t, "float") else t.numpy()
    return np.asarray(t)


def convert_tensor(key: str, v: np.ndarray, dtype):
    """One torch-layout tensor → (pytree path, converted np array, dtype),
    or None for tensors that are recomputed (rope freqs)."""
    if key == "patch_embedding.weight":
        # [dim, in_dim, pt, ph, pw] → [in_dim*pt*ph*pw, dim]
        c_out = v.shape[0]
        return "patch_embedding.w", v.reshape(c_out, -1).T, dtype
    if key == "patch_embedding.bias":
        return "patch_embedding.b", v, jnp.float32
    if re.search(r"\bmodulation$", key):
        return key, v, jnp.float32
    if re.search(r"norm_q\.weight$|norm_k\.weight$|norm_k_img\.weight$", key):
        return key.rsplit(".", 1)[0], v, jnp.float32
    if re.search(r"norm3\.(weight|bias)$", key):
        leaf = "w" if key.endswith("weight") else "b"
        return key.rsplit(".", 1)[0] + "." + leaf, v, jnp.float32
    if key.endswith(".weight") and v.ndim == 2:
        return key[: -len(".weight")] + ".w", v.T, dtype
    if key.endswith(".weight") and v.ndim == 1:  # layer norms in img_emb
        return key[: -len(".weight")] + ".w", v, jnp.float32
    if key.endswith(".bias"):
        return key[: -len(".bias")] + ".b", v, jnp.float32
    if key == "freqs":
        return None  # rope tables are recomputed (models/rope.py)
    # unknown auxiliary tensor — keep visible for debugging
    return key, v, jnp.float32


def _place(arr: np.ndarray, dtype, path: str, mesh, full_shard=False) -> Any:
    """Host→device placement of one converted tensor; sharded over the mesh
    when given (never materializing more than one tensor on host)."""
    import jax

    arr = np.asarray(arr, dtype=jnp.dtype(dtype))
    if mesh is None:
        return jnp.asarray(arr)
    from wanq_tpu.parallel.sharding import leaf_sharding

    leaf_name = path.rsplit(".", 1)[-1]
    return jax.device_put(
        arr, leaf_sharding(mesh, leaf_name, arr.ndim, arr.shape, full_shard)
    )


def convert_state_dict(
    sd: Dict[str, Any], dtype=jnp.bfloat16, mesh=None, full_shard=False
) -> Dict[str, Any]:
    """torch-layout state dict {name: array} → wanq_tpu params pytree."""
    params: Dict[str, Any] = {}
    for key, val in sd.items():
        conv = convert_tensor(key, _np(val), dtype)
        if conv is None:
            continue
        path, arr, leaf_dtype = conv
        _set(params, path, _place(arr, leaf_dtype, path, mesh, full_shard))
    return params


def load_wan_checkpoint(
    ckpt_dir: str, dtype=jnp.bfloat16, mesh=None, full_shard=False
) -> Dict[str, Any]:
    """Load a Wan2.1 diffusers checkpoint dir (sharded safetensors +
    index json, the format WanModel.from_pretrained consumes).

    Streaming: tensors are read, converted, and placed on device (sharded
    over ``mesh`` when given) ONE AT A TIME — host peak memory is a single
    tensor, so the 14B checkpoint (~28 GB bf16) loads without ever holding
    the model on host (SURVEY.md §7 'hard parts': 14B conversion without
    OOM; ref loads through torch FSDP instead, ptq_wanx.py:364-368)."""
    from safetensors import safe_open

    files = sorted(
        f for f in os.listdir(ckpt_dir) if f.endswith(".safetensors")
    )
    index_path = os.path.join(
        ckpt_dir, "diffusion_pytorch_model.safetensors.index.json"
    )
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        files = sorted(set(index["weight_map"].values()))
    params: Dict[str, Any] = {}
    for fname in files:
        with safe_open(os.path.join(ckpt_dir, fname), framework="np") as f:
            for key in f.keys():
                conv = convert_tensor(key, f.get_tensor(key), dtype)
                if conv is None:
                    continue
                path, arr, leaf_dtype = conv
                _set(params, path, _place(arr, leaf_dtype, path, mesh, full_shard))
    return params
