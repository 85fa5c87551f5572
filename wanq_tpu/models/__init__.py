"""Wan2.1 model stack in JAX (TPU-native rebuild of wan/modules/*)."""

from wanq_tpu.models.attention import attention
from wanq_tpu.models.dit import (
    dit_forward,
    init_params,
    linear_layer_names,
    patchify,
    unpatchify,
)
from wanq_tpu.models.rope import rope_apply, rope_apply_padded, rope_tables
