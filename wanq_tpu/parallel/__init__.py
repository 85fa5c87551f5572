"""Mesh / GSPMD sharding (TPU-native rebuild of wan/distributed)."""

from wanq_tpu.parallel.ring import ring_attention
from wanq_tpu.parallel.sharding import (
    AXES,
    ShardingPlan,
    make_mesh,
    param_shardings,
    shard_params,
    shard_t5_params,
)
