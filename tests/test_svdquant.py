"""SVDQuant-style low-rank outlier branch (quant/svd.py; beyond-reference).

SVDQuant (arXiv:2411.05007): split the (transformed) weight into a 16-bit
rank-r branch L1@L2 plus a quantized residual; the dominant singular
directions absorb the weight outliers that break aggressive low-bit
quant. The reference's lowest-precision route is plain-RTN Atom W4A4
(csrc/qgemm/w4a4/atom.cu) with no outlier handling — this upgrades it and
composes with SmoothQuant migration (the paper's full recipe).

These tests pin: the randomized truncated SVD against the exact one, the
exact split identity, the end-to-end SQNR win at W4 and W4A4 on
outlier-heavy weights, sim↔int8-deploy parity with the branch active,
the smooth∘lowrank composition, fused-path exclusion, and YAML routing.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import (
    QuantCtx,
    int8_fusable,
    int8_static_fusable,
    qlinear,
)
from wanq_tpu.quant.svd import lowrank_split, svd_lowrank
from wanq_tpu.quant.synthetic import (
    correlated_outlier_acts,
    outlier_channel_scales,
    sqnr_db,
)

C, O, M = 256, 256, 1024

W4 = {"weight": {"n_bits": 4, "sym": False}, "act": {"n_bits": 8, "sym": True}}
W4A4 = {"weight": {"n_bits": 4, "sym": True},
        "act": {"n_bits": 4, "sym": True, "group": 32}}


def lr(d, rank):
    return {**d, "weight": dict(d["weight"], lowrank_rank=rank)}


@pytest.fixture(scope="module")
def layer_setup():
    """Outlier-heavy regime on BOTH sides: per-input-channel lognormal
    weight spread (what the low-rank branch absorbs) + hot activation
    channels (what smoothing migrates into the weight)."""
    rng = np.random.default_rng(0)
    x_cal = correlated_outlier_acts(M, C, n_hot=4, seed=0, draw_seed=1)
    x_test = correlated_outlier_acts(M, C, n_hot=4, seed=0, draw_seed=2)
    scale = outlier_channel_scales(C, n_hot=4, spread_sigma=1.0, seed=5)
    w = (rng.normal(size=(C, O)).astype(np.float32) * scale[:, None])
    params = {"lin": {"w": jnp.asarray(w)}}
    calib = {"lin": np.abs(x_cal).max(0)[None, :]}
    y_fp = x_test.astype(np.float64) @ w.astype(np.float64)
    return params, calib, x_test[None], y_fp[None]


def _run(layer_setup, qdict, mode="sim", targets=None):
    params, calib, x_test, _ = layer_setup
    qcfg = QuantConfig.from_dict(qdict)
    pol, st, rot = prepare_quant_state(
        params, ["lin"], qcfg, calib=calib,
        targets=targets or ("int8" if mode == "int8" else "sim"),
    )
    ctx = QuantCtx(mode=mode, policies=pol, state=st, rotations=rot)
    return qlinear(ctx, "lin", params["lin"], jnp.asarray(x_test),
                   compute_dtype=jnp.float32), st


def test_randomized_svd_matches_exact():
    rng = np.random.default_rng(2)
    w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32)
                    * np.exp(rng.normal(0, 1.0, size=(128, 1))))
    rank = 8
    l1, l2 = svd_lowrank(w, rank, seed=0)
    resid = np.asarray(w - l1 @ l2)
    u, s, vt = np.linalg.svd(np.asarray(w), full_matrices=False)
    optimal = np.linalg.norm(s[rank:])  # Eckart–Young
    got = np.linalg.norm(resid)
    assert got <= optimal * 1.02, (got, optimal)
    # factor shapes/content
    assert l1.shape == (128, rank) and l2.shape == (rank, 96)


def test_lowrank_split_identity():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.normal(size=(64, 80)).astype(np.float32))
    l1, l2, resid = lowrank_split(w, 4)
    np.testing.assert_allclose(
        np.asarray(l1 @ l2 + resid), np.asarray(w), atol=2e-5)


def test_w4_lowrank_recovers_outlier_weights(layer_setup):
    """The core SVDQuant claim at W4: the rank-r branch absorbs the
    per-channel weight outliers and the residual quantizes much better."""
    _, _, _, y_fp = layer_setup
    plain, _ = _run(layer_setup, W4)
    boosted, st = _run(layer_setup, lr(W4, 32))
    assert "lowrank_a" in st["lin"] and st["lin"]["lowrank_a"].dtype == jnp.bfloat16
    db_plain = sqnr_db(plain, y_fp)
    db_lr = sqnr_db(boosted, y_fp)
    assert db_lr > db_plain + 3.0, (db_plain, db_lr)


def test_w4a4_lowrank_beats_plain(layer_setup):
    """W4A4 (the reference's unhandled worst case): the branch should buy
    several dB on outlier-heavy weights."""
    _, _, _, y_fp = layer_setup
    plain, _ = _run(layer_setup, W4A4)
    boosted, _ = _run(layer_setup, lr(W4A4, 32))
    db_plain = sqnr_db(plain, y_fp)
    db_lr = sqnr_db(boosted, y_fp)
    assert db_lr > db_plain + 2.0, (db_plain, db_lr)


def test_smooth_compose_is_full_svdquant_recipe(layer_setup):
    """smooth_quant ∘ lowrank = the paper's migration-then-absorb recipe;
    must run and beat plain W4 clearly."""
    _, _, _, y_fp = layer_setup
    qd = lr({**W4, "smooth_quant": {"alpha": 0.5665, "layer_name_regex": ""}},
            32)
    out, st = _run(layer_setup, qd)
    assert "channel_mask" in st["lin"] and "lowrank_a" in st["lin"]
    plain, _ = _run(layer_setup, W4)
    assert sqnr_db(out, y_fp) > sqnr_db(plain, y_fp) + 3.0


def test_int8_deploy_parity_with_lowrank(layer_setup):
    """The int8 (W4A8 packed) deployment path with the branch active must
    match the sim path closely (same math, integer GEMM + bf16 branch)."""
    sim, _ = _run(layer_setup, lr(W4, 32), mode="sim", targets="both")
    hw, _ = _run(layer_setup, lr(W4, 32), mode="int8", targets="both")
    s, h = np.asarray(sim), np.asarray(hw)
    rel = np.abs(h - s).max() / (np.abs(s).max() + 1e-9)
    assert rel < 5e-2, rel


def test_fused_paths_exclude_lowrank(layer_setup):
    params, calib, _, _ = layer_setup
    qcfg = QuantConfig.from_dict(
        lr({"weight": {"n_bits": 8, "sym": False},
            "act": {"n_bits": 8, "sym": True}}, 16))
    pol, st, rot = prepare_quant_state(
        params, ["lin"], qcfg, calib=calib, targets="int8")
    ctx = QuantCtx(mode="int8", policies=pol, state=st, rotations=rot)
    assert not int8_fusable(ctx, ["lin"])
    assert not int8_static_fusable(ctx, "lin")
    # without the branch the same config IS fusable
    qcfg0 = QuantConfig.from_dict(
        {"weight": {"n_bits": 8, "sym": False},
         "act": {"n_bits": 8, "sym": True}})
    pol0, st0, rot0 = prepare_quant_state(
        params, ["lin"], qcfg0, calib=calib, targets="int8")
    ctx0 = QuantCtx(mode="int8", policies=pol0, state=st0, rotations=rot0)
    assert int8_fusable(ctx0, ["lin"])


def test_yaml_and_policy_routing(tmp_path):
    y = tmp_path / "q.yaml"
    y.write_text(
        "weight: {n_bits: 4, sym: true, lowrank_rank: 32}\n"
        "act: {n_bits: 4, sym: true, group: 128}\n"
    )
    qcfg = QuantConfig.from_yaml(str(y))
    pol = qcfg.resolve("blocks.0.ffn.0")
    assert pol.lowrank == 32 and pol.is_w4a4
    assert QuantConfig.from_dict(W4).resolve("blocks.0.ffn.0").lowrank == 0


def test_npz_roundtrip_preserves_bf16_lowrank(layer_setup, tmp_path):
    """save_quant_state/load_quant_state must roundtrip the bf16 branch
    factors (npz has no bfloat16 descr — raw void |V2 without the tag)."""
    from wanq_tpu.quant.ptq import load_quant_state, save_quant_state

    params, calib, x_test, _ = layer_setup
    qcfg = QuantConfig.from_dict(lr(W4, 16))
    pol, st, rot = prepare_quant_state(
        params, ["lin"], qcfg, calib=calib, targets="both")
    p = str(tmp_path / "state.npz")
    save_quant_state(p, st, seed=3)
    st2, seed = load_quant_state(p)
    assert seed == 3
    assert st2["lin"]["lowrank_a"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(st["lin"]["lowrank_a"], np.float32),
        np.asarray(st2["lin"]["lowrank_a"], np.float32))
    # deployment from the loaded state matches the fresh one exactly
    ctx_a = QuantCtx(mode="int8", policies=pol, state=st, rotations=rot)
    ctx_b = QuantCtx(mode="int8", policies=pol, state=st2, rotations=rot)
    ya = qlinear(ctx_a, "lin", params["lin"], jnp.asarray(x_test))
    yb = qlinear(ctx_b, "lin", params["lin"], jnp.asarray(x_test))
    np.testing.assert_array_equal(np.asarray(ya), np.asarray(yb))


def test_stacked_ptq_carries_lowrank():
    """prepare_quant_state_stacked (the scan/14B route) must stack the
    branch factors as [L, ...] leaves and the scan forward must run."""
    from tests.conftest import randomize_head
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import (
        dit_forward,
        init_params,
        stack_block_params,
    )
    from wanq_tpu.quant.ptq import prepare_quant_state_stacked

    cfg = tiny_config()
    params = stack_block_params(
        randomize_head(init_params(cfg, jax.random.PRNGKey(0))))
    qcfg = QuantConfig.from_dict(
        lr({"remain_fp_regex":
            r"text_embedding|time_embedding|time_projection|head\.head",
            "weight": {"n_bits": 4, "sym": False},
            "act": {"n_bits": 8, "sym": True}}, 8))
    pol, scan_state, rot = prepare_quant_state_stacked(
        params["blocks"], cfg.num_layers, qcfg, targets="sim")
    a = scan_state["self_attn.q"]["lowrank_a"]
    assert a.shape[0] == cfg.num_layers and a.shape[2] == 8
    ctx = QuantCtx(mode="sim", policies=pol, state={}, rotations=rot)
    ctx.scan_state = scan_state
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 2, 8, 8))
    c = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    out = dit_forward(params, cfg, x, jnp.asarray([500.0]), c, 128, ctx=ctx)
    assert np.isfinite(np.asarray(out)).all()


def test_gptq_composes_with_lowrank(layer_setup):
    """GPTQ rounds the residual on the same Hessian (the input space is
    unchanged by the split) — must run and not regress plain lowrank."""
    params, calib, x_test, y_fp = layer_setup
    x_cal = correlated_outlier_acts(M, C, n_hot=4, seed=0, draw_seed=1)
    calib_h = dict(calib)
    calib_h["lin.hess"] = (x_cal.T @ x_cal).astype(np.float32)[None]
    qd = lr({**W4, "weight": dict(W4["weight"], gptq=True)}, 32)
    qcfg = QuantConfig.from_dict(qd)
    pol, st, rot = prepare_quant_state(
        params, ["lin"], qcfg, calib=calib_h, targets="sim")
    assert "lowrank_a" in st["lin"]
    ctx = QuantCtx(mode="sim", policies=pol, state=st, rotations=rot)
    y = qlinear(ctx, "lin", params["lin"], jnp.asarray(x_test),
                compute_dtype=jnp.float32)
    db = sqnr_db(np.asarray(y), y_fp)
    plain, _ = _run(layer_setup, lr(W4, 32))
    assert db >= sqnr_db(np.asarray(plain), y_fp) - 0.5, db
