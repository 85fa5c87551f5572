"""Training layer (TPU-native rebuild of the reference's distillation
trainer, distill_with_cfg_sch_5s_exp0.py)."""

from wanq_tpu.training.distill import (
    DistillConfig,
    TrainState,
    distill_step,
    ema_update,
    init_train_state,
    make_distill_step,
    make_lora_distill_step,
    make_qlora_distill_step,
)
from wanq_tpu.training.lora import (
    merge_lora_into_quant_state,
    merge_lora_into_scan_ctx,
    stack_lora,
)
