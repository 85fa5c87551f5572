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


def convert_state_dict(sd: Dict[str, Any], dtype=jnp.bfloat16) -> Dict[str, Any]:
    """torch-layout state dict {name: array} → wanq_tpu params pytree."""
    params: Dict[str, Any] = {}
    for key, val in sd.items():
        v = _np(val)
        if key == "patch_embedding.weight":
            # [dim, in_dim, pt, ph, pw] → [in_dim*pt*ph*pw, dim]
            c_out = v.shape[0]
            _set(params, "patch_embedding.w", jnp.asarray(v.reshape(c_out, -1).T, dtype=dtype))
        elif key == "patch_embedding.bias":
            _set(params, "patch_embedding.b", jnp.asarray(v, dtype=jnp.float32))
        elif re.search(r"\bmodulation$", key):
            _set(params, key, jnp.asarray(v, dtype=jnp.float32))
        elif re.search(r"norm_q\.weight$|norm_k\.weight$|norm_k_img\.weight$", key):
            _set(params, key.rsplit(".", 1)[0], jnp.asarray(v, dtype=jnp.float32))
        elif re.search(r"norm3\.(weight|bias)$", key):
            leaf = "w" if key.endswith("weight") else "b"
            _set(params, key.rsplit(".", 1)[0] + "." + leaf, jnp.asarray(v, dtype=jnp.float32))
        elif key.endswith(".weight") and v.ndim == 2:
            _set(params, key[: -len(".weight")] + ".w", jnp.asarray(v.T, dtype=dtype))
        elif key.endswith(".weight") and v.ndim == 1:  # layer norms in img_emb
            _set(params, key[: -len(".weight")] + ".w", jnp.asarray(v, dtype=jnp.float32))
        elif key.endswith(".bias"):
            _set(params, key[: -len(".bias")] + ".b", jnp.asarray(v, dtype=jnp.float32))
        elif key == "freqs":
            continue  # rope tables are recomputed (models/rope.py)
        else:
            # unknown auxiliary tensor — keep visible for debugging
            _set(params, key, jnp.asarray(v, dtype=jnp.float32))
    return params


def load_wan_checkpoint(ckpt_dir: str, dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Load a Wan2.1 diffusers checkpoint dir (sharded safetensors +
    index json, the format WanModel.from_pretrained consumes)."""
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
    sd: Dict[str, np.ndarray] = {}
    for fname in files:
        with safe_open(os.path.join(ckpt_dir, fname), framework="np") as f:
            for key in f.keys():
                sd[key] = f.get_tensor(key)
    return convert_state_dict(sd, dtype=dtype)
