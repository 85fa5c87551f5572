"""EXECUTED int8 quantized steps on the virtual 8-device mesh.

Round-2 VERDICT missing #1: the int8 hardware path (fused producers, w8a8
GEMMs, FSDP-sharded int8 scan state, ring attention) had only ever been
AOT-compiled under GSPMD, never run. These tests execute it on the 8-CPU
virtual mesh and assert parity with the single-device int8 run — the class
of seam where a sharding-spec mismatch or an accidental all-gather of int8
state shows up only at execution.

Reference capability being validated: quant_generate.py:409 hardware
refactor under ``--dit_fsdp --ulysses_size 8`` (README.md:63-70).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import (
    dit_forward,
    init_params,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.parallel import ShardingPlan, make_mesh, shard_params
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import (
    prepare_quant_state,
    shard_scan_ctx,
    strip_quantized_weights,
)
from wanq_tpu.quant.qlinear import QuantCtx

pytestmark = [pytest.mark.mesh, pytest.mark.slow]

QCFG_W8A8 = {
    "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import randomize_head

    cfg = tiny_config(num_heads=8, dim=96)
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(2, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0, 500.0])
    txt = jnp.asarray(
        rng.normal(size=(2, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    return cfg, params, (x, t, txt)


def _int8_ctx(cfg, params, qdict=QCFG_W8A8, **prep_kw):
    names = linear_layer_names(cfg)
    qcfg = QuantConfig.from_dict(qdict)
    policies, state, rotations = prepare_quant_state(
        params, names, qcfg, targets="int8", **prep_kw
    )
    return QuantCtx(mode="int8", policies=policies, state=state,
                    rotations=rotations)


def _mesh_run(cfg, stacked, sctx, inputs, dims, full_shard=False,
              strip=False, policies=None):
    x, t, txt = inputs
    seq_len = 32
    mesh = make_mesh(*dims)
    plan = ShardingPlan(mesh)
    sparams = stacked
    if strip:
        sparams = strip_quantized_weights(stacked, policies)
    sparams = shard_params(sparams, mesh, full_shard)
    mctx = shard_scan_ctx(sctx, mesh, full_shard)
    fwd = jax.jit(
        lambda p, q, x, t, c: dit_forward(p, cfg, x, t, c, seq_len,
                                          ctx=q, plan=plan)
    )
    out = fwd(sparams, mctx, x, t, txt)
    return np.asarray(out)


@pytest.mark.parametrize(
    "dims", [(1, 2, 2, 2), (1, 1, 2, 2), (2, 1, 2, 2), (1, 8, 1, 1)],
    ids=["fsdp2sp2ring2", "sp2ring2", "dp2sp2ring2", "fsdp8"],
)
def test_int8_scan_on_mesh_matches_single_device(setup, dims):
    """W8A8 with int8 weights + dynamic per-token act quant, scan-over-
    blocks, EXECUTED on the mesh vs single-device."""
    cfg, params, inputs = setup
    x, t, txt = inputs
    ctx = _int8_ctx(cfg, params)
    stacked = stack_block_params(params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    ref = np.asarray(
        dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=sctx)
    )
    got = _mesh_run(cfg, stacked, sctx, inputs, dims)
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_int8_full_shard_strip_fp_executes(setup):
    """The production 14B memory layout — full_shard int8 state + FP weight
    copies stripped — executes on the mesh and matches single-device (the
    reference's quantize_and_save_weight + hardware_forward_refactor path,
    quant_wanx.py:137-228)."""
    cfg, params, inputs = setup
    x, t, txt = inputs
    ctx = _int8_ctx(cfg, params)
    stacked = stack_block_params(params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    ref = np.asarray(
        dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=sctx)
    )
    got = _mesh_run(cfg, stacked, sctx, inputs, (1, 2, 2, 2),
                    full_shard=True, strip=True, policies=ctx.policies)
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_w4a8_packed_on_mesh_matches_single_device(setup):
    """Packed-int4 weights (two per byte along K) sharded over the mesh."""
    cfg, params, inputs = setup
    x, t, txt = inputs
    qdict = dict(QCFG_W8A8, weight={"n_bits": 4, "sym": False})
    ctx = _int8_ctx(cfg, params, qdict)
    # packed state present?
    assert any("w_int4" in st for st in ctx.state.values())
    stacked = stack_block_params(params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    ref = np.asarray(
        dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=sctx)
    )
    got = _mesh_run(cfg, stacked, sctx, inputs, (1, 2, 2, 2))
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_capacity_planned_mixed_on_mesh_matches_single_device(setup):
    """A planner-mixed config (W4 and W8 classes simultaneously, packed
    int4 next to int8 in the same scan state) executes under GSPMD and
    matches single-device — the seam the --auto_bits_gib CLI path ships."""
    from wanq_tpu.quant.planner import class_weight_bytes, plan_capacity_bits

    cfg, params, inputs = setup
    x, t, txt = inputs
    b4 = sum(class_weight_bytes(cfg, 4).values())
    b8 = sum(class_weight_bytes(cfg, 8).values())
    plan = plan_capacity_bits(cfg, int(b4 + 0.5 * (b8 - b4)))
    assert plan.upgraded and plan.base  # genuinely mixed
    ctx = _int8_ctx(cfg, params, plan.config)
    assert any("w_int4" in st for st in ctx.state.values())
    assert any("w_int8" in st for st in ctx.state.values())
    stacked = stack_block_params(params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    ref = np.asarray(
        dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=sctx)
    )
    got = _mesh_run(cfg, stacked, sctx, inputs, (1, 2, 2, 2))
    np.testing.assert_allclose(got, ref, atol=3e-3)


def test_int8_state_actually_sharded(setup):
    """The int8 weight state must live sharded (not replicated): an
    8-device fsdp mesh stores 1/8 of each [L, C_in, C_out] int8 leaf."""
    cfg, params, _ = setup
    ctx = _int8_ctx(cfg, params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    mesh = make_mesh(1, 8, 1, 1)
    mctx = shard_scan_ctx(sctx, mesh)
    w = mctx.scan_state["self_attn.q"]["w_int8"]
    L = cfg.num_layers
    assert {s.data.shape for s in w.addressable_shards} == {
        (L, cfg.dim, cfg.dim // 8)
    }
    sw = mctx.scan_state["self_attn.q"]["scale_w"]
    assert {s.data.shape for s in sw.addressable_shards} == {(L, cfg.dim // 8)}


def test_int8_full_shard_state_over_all_non_dp_axes(setup):
    cfg, params, _ = setup
    ctx = _int8_ctx(cfg, params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    mesh = make_mesh(1, 2, 2, 2)
    mctx = shard_scan_ctx(sctx, mesh, full_shard=True)
    w = mctx.scan_state["self_attn.q"]["w_int8"]
    assert {s.data.shape for s in w.addressable_shards} == {
        (cfg.num_layers, cfg.dim, cfg.dim // 8)
    }


def test_lowrank_branch_on_mesh_matches_single_device(setup):
    """SVDQuant low-rank branch (quant/svd.py) under GSPMD: the bf16
    factors ride the scan state replicated, the per-site qlinear route
    (fused producers excluded) executes on the mesh and matches the
    single-device run."""
    cfg, params, inputs = setup
    x, t, txt = inputs
    qdict = dict(QCFG_W8A8,
                 weight={"n_bits": 4, "sym": False, "lowrank_rank": 8})
    ctx = _int8_ctx(cfg, params, qdict)
    assert any("lowrank_a" in st for st in ctx.state.values())
    stacked = stack_block_params(params)
    sctx = make_scan_ctx(ctx, cfg.num_layers)
    assert sctx.scan_state["self_attn.q"]["lowrank_a"].dtype == jnp.bfloat16
    ref = np.asarray(
        dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=sctx)
    )
    got = _mesh_run(cfg, stacked, sctx, inputs, (1, 2, 2, 2))
    np.testing.assert_allclose(got, ref, atol=3e-3)
