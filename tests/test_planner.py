"""Capacity-aware bitwidth planner (quant/planner.py).

The plan's config dict must drive the existing QuantConfig mixed-precision
resolution (the reference's n_bits-list + regex-list schema,
qdiff/base/quant_model.py:76-105) so prepared state matches the plan.
"""

import numpy as np
import pytest

from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.planner import (
    class_weight_bytes,
    measure_class_errors,
    plan_capacity_bits,
)


def test_byte_model_and_budget_monotonicity():
    cfg = WAN_CONFIGS["t2v-14B"]
    b4 = class_weight_bytes(cfg, 4)
    b8 = class_weight_bytes(cfg, 8)
    # packed int4 halves the container bytes (scales ride along both ways)
    scales = 8 * cfg.ffn_dim * cfg.num_layers  # f32 scale+zp per out-channel
    assert b8["ffn.0"] - scales == pytest.approx(2 * (b4["ffn.0"] - scales))
    all_w4 = sum(b4.values())
    all_w8 = sum(b8.values())
    # 14B W4 weight state measured 6.58 GiB on-chip (deploy_14b_probe);
    # the byte model must land there
    assert 6.3 < all_w4 / 2**30 < 6.9

    prev = -1
    for budget in (all_w4, (all_w4 + all_w8) // 2, all_w8):
        plan = plan_capacity_bits(cfg, budget)
        assert plan.total_bytes <= budget
        assert len(plan.upgraded) >= prev
        prev = len(plan.upgraded)
    # full budget upgrades everything
    assert not plan_capacity_bits(cfg, all_w8).base


def test_plan_resolves_through_quant_config():
    cfg = WAN_CONFIGS["t2v-1.3B"]
    b4 = sum(class_weight_bytes(cfg, 4).values())
    plan = plan_capacity_bits(cfg, int(1.25 * b4))
    assert plan.upgraded and plan.base  # a genuinely mixed plan
    qc = QuantConfig.from_dict(plan.config)
    for c in plan.upgraded:
        pol = qc.resolve(f"blocks.3.{c}")
        assert pol.is_quantized and pol.weight.active_bits == 8
    for c in plan.base:
        pol = qc.resolve(f"blocks.3.{c}")
        assert pol.is_quantized and pol.weight.active_bits == 4
    assert not qc.resolve("head.head").is_quantized
    # bitwidths uniform across blocks (scan-over-blocks stacking invariant)
    first = plan.upgraded[0]
    assert all(
        qc.resolve(f"blocks.{i}.{first}").weight.active_bits == 8
        for i in range(cfg.num_layers)
    )


def test_error_driven_priority():
    cfg = WAN_CONFIGS["t2v-1.3B"]
    b4 = class_weight_bytes(cfg, 4)
    b8 = class_weight_bytes(cfg, 8)
    # budget for exactly one square-layer upgrade: the measured-error
    # winner must beat the heuristic default (ffn.2 costs more, skipped)
    budget = sum(b4.values()) + (b8["self_attn.k"] - b4["self_attn.k"])
    errors = {c: (0.01, 0.001) for c in b4}
    errors["self_attn.k"] = (0.5, 0.001)  # k is the measured worst here
    plan = plan_capacity_bits(cfg, budget, errors=errors)
    assert plan.upgraded == ("self_attn.k",)


def test_measure_class_errors_orders_bitwidths():
    rng = np.random.default_rng(0)
    w = {"ffn.2": rng.normal(size=(64, 32)).astype(np.float32),
         "self_attn.q": rng.normal(size=(32, 32)).astype(np.float32)}
    errs = measure_class_errors(w)
    for e4, e8 in errs.values():
        assert e4 > e8 > 0  # 4-bit strictly worse than 8-bit
