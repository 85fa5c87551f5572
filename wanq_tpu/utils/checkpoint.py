"""Checkpoint save/load for sharded pytrees.

TPU-native rebuild of the reference's checkpoint layer (wan/checkpoint.py:
18-302 — FSDP FULL_STATE_DICT / dist_cp sharded save+load, LoRA helpers):
on TPU a params pytree (sharded or not) round-trips through orbax, which
handles per-shard IO natively; the FULL_STATE_DICT rank-0 gather and
'_fsdp_wrapped_module.' prefix stripping (quant_generate.py:383-389) have
no analog and disappear."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any):
    """Save a (possibly sharded) params/quant-state pytree."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    return path


def load_checkpoint(path: str, target: Optional[Any] = None, sharding=None) -> Any:
    """Load a pytree; ``target`` (abstract or concrete) restores structure/
    shardings (pass shard_params-placed abstract arrays for sharded load)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, "sharding", None)),
            target,
        )
        return ckptr.restore(path, abstract)
    return ckptr.restore(path)
