"""Quantization framework (TPU-native rebuild of quant_utils/qdiff)."""

from wanq_tpu.quant.quantizers import (
    QuantizerCfg,
    compute_quant_params,
    dequantize,
    dynamic_fake_quant,
    fake_quant,
    n_levels_for,
    quantize,
    weight_fake_quant,
    weight_int_quant,
    weight_quant_params,
    act_dynamic_int_quant,
    act_group_int4_quant,
    weight_group_int4_quant,
    pack_int4,
    unpack_int4,
)
from wanq_tpu.quant.config import FP_POLICY, LayerPolicy, QuantConfig
from wanq_tpu.quant.hadamard import (
    get_hadK,
    matmul_hadU,
    matmul_hadU_np,
    paley_hadamard,
    random_hadamard_matrix,
    rotation_for_dim,
)
from wanq_tpu.quant.smooth import channel_mask, clamp_act_absmax
from wanq_tpu.quant.attn import (
    AttnQuantCfg,
    generate_reorder_tables,
    pooled_attn_map,
    quantize_attn_map_block,
    quantize_attn_map_row,
    quantized_attention,
)
from wanq_tpu.quant.ptq import (
    load_quant_state,
    prepare_quant_state,
    save_quant_state,
    shard_quant_state,
)
from wanq_tpu.quant.qlinear import QuantCtx, qlinear
from wanq_tpu.quant.gptq import gptq_quantize, transform_hessian
from wanq_tpu.quant.stream import build_streamed_quant_base
from wanq_tpu.quant.planner import (
    CapacityPlan,
    class_weight_bytes,
    measure_class_errors,
    plan_capacity_bits,
)
