"""Multi-host launch (TPU-native replacement of the reference's torchrun +
dist.init_process_group("nccl") boilerplate, fp_generate.py:233-239).

One process per host; JAX's single-controller model makes every array
logically global afterwards — no rank-conditional code, no object
broadcasts (seeds are deterministic host code)."""

from __future__ import annotations

import logging
import os
from typing import Optional


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX when launched across hosts (env-driven:
    honors the standard JAX coordinator variables / TPU metadata when args
    are omitted). Returns the global device count. Safe to call on a single
    host — it no-ops."""
    import jax

    if num_processes is None:
        num_processes = int(os.environ.get("WANQ_NUM_PROCESSES", "1"))
    if num_processes > 1 or coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logging.info(
            "jax.distributed initialized: process %d/%d, %d devices",
            jax.process_index(), jax.process_count(), jax.device_count(),
        )
    return jax.device_count()
