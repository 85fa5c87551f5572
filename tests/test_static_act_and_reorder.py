"""Static activation quantization (config-selectable A8, VERDICT missing
#7a) and calibration-driven attn-map reorder tables (#7b) end to end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import dit_forward, init_params, linear_layer_names
from wanq_tpu.pipelines.text2video import WanT2V
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.attn import (
    AttnQuantCfg,
    generate_reorder_tables,
    pooled_attn_map,
    quantize_attn_map_block,
)
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx

FP_REGEX = r"text_embedding|time_embedding|time_projection|head\.head"

STATIC_A8 = {
    "remain_fp_regex": FP_REGEX,
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True, "dynamic": False},
}


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(3)
    ctx_txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctx_null = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return cfg, params, (ctx_txt, ctx_null)


def _calibrate(cfg, params, contexts, size=(32, 32), **ctx_kw):
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib", **ctx_kw))
    return pipe.collect_calibration(
        *contexts, size=size, frame_num=5, sampling_steps=2, seed=7
    )


def test_static_a8_end_to_end(setup):
    """calib --collect_minmax → PTQ static params → sim + int8 forwards."""
    cfg, params, contexts = setup
    stats = _calibrate(cfg, params, contexts, collect_minmax=True)
    name = "blocks.0.self_attn.q"
    assert f"{name}.act_max" in stats and f"{name}.act_min" in stats

    qcfg = QuantConfig.from_dict(STATIC_A8)
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(
        params, names, qcfg, calib=stats
    )
    st = state[name]
    assert "delta_a" in st and st["delta_a"].shape == (1,)
    assert float(st["delta_a"][0]) > 0
    assert float(st["zp_a"][0]) == 0.0  # symmetric

    x = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.in_dim, 2, 8, 8))
    t = jnp.asarray([500.0])
    txt = contexts[0]
    fp = dit_forward(params, cfg, x, t, txt, 32)
    for mode in ("sim", "int8"):
        ctx = QuantCtx(mode=mode, policies=policies, state=state,
                       rotations=rotations)
        out = dit_forward(params, cfg, x, t, txt, 32, ctx=ctx)
        assert np.isfinite(np.asarray(out)).all()
        # static scales come from a different trajectory's calibration, so
        # the tolerance is loose — but the output must track FP closely
        rel = np.abs(np.asarray(out) - np.asarray(fp)).max() / (
            np.abs(np.asarray(fp)).max() + 1e-9)
        assert rel < 0.35, (mode, rel)


def test_static_vs_dynamic_a8_differ(setup):
    cfg, params, contexts = setup
    stats = _calibrate(cfg, params, contexts, collect_minmax=True)
    names = linear_layer_names(cfg)
    pol_s, st_s, _ = prepare_quant_state(
        params, names, QuantConfig.from_dict(STATIC_A8), calib=stats)
    dyn = dict(STATIC_A8, act={"n_bits": 8, "sym": True, "dynamic": True})
    pol_d, st_d, _ = prepare_quant_state(
        params, names, QuantConfig.from_dict(dyn), calib=stats)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.in_dim, 2, 8, 8))
    t = jnp.asarray([500.0])
    out_s = dit_forward(params, cfg, x, t, contexts[0], 32,
                        ctx=QuantCtx(mode="sim", policies=pol_s, state=st_s))
    out_d = dit_forward(params, cfg, x, t, contexts[0], 32,
                        ctx=QuantCtx(mode="sim", policies=pol_d, state=st_d))
    assert not np.allclose(np.asarray(out_s), np.asarray(out_d))


def test_pooled_attn_map_matches_naive(setup):
    rng = np.random.default_rng(0)
    b, s, n, d = 2, 32, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    pool = 4
    got = np.asarray(pooled_attn_map(q, k, pool, chunk=16))
    scale = 1.0 / np.sqrt(d)
    qs = np.swapaxes(np.asarray(q), 1, 2) * scale
    ks = np.swapaxes(np.asarray(k), 1, 2)
    scores = qs @ np.swapaxes(ks, 2, 3)
    p = np.exp(scores - scores.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    want = p.reshape(b, n, s // pool, pool, s // pool, pool).max((0, 3, 5))
    # capture computes scores from bf16 operands with f32 accumulation
    # (round 5 — full-MXU-rate capture at 14B shapes); ~2e-3 abs drift vs
    # the f32 oracle, far below what mass-threshold selection resolves
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)


def test_generated_reorder_tightens_block_quant(setup):
    """A structured map (two interleaved token populations) quantizes with
    lower error after the generated reorder groups like tokens together."""
    rng = np.random.default_rng(1)
    h, s, bs = 2, 64, 16
    # interleaved populations: even tokens attend to evens, odds to odds
    base = np.full((s, s), 1e-4)
    idx = np.arange(s)
    even = idx[idx % 2 == 0]
    odd = idx[idx % 2 == 1]
    base[np.ix_(even, even)] = 0.03
    base[np.ix_(odd, odd)] = 0.001
    maps = np.stack([base + rng.random((s, s)) * 1e-5 for _ in range(h)])
    maps = maps / maps.sum(-1, keepdims=True)

    tables = generate_reorder_tables({"blocks.0.self_attn": maps}, pool=1)
    perm = tables["blocks.0.self_attn"]
    assert perm.shape == (h, s)
    for i in range(h):
        assert sorted(perm[i].tolist()) == list(range(s))  # valid permutation

    cfg8 = AttnQuantCfg.from_dict(
        {"attn_map": {"n_bits": 8, "group": "block", "block_size": bs}}
    ).attn_map
    attn = jnp.asarray(np.broadcast_to(maps[None], (1, h, s, s)).copy(),
                       jnp.float32)
    q_id = np.asarray(quantize_attn_map_block(attn, cfg8, bs))
    q_perm = np.asarray(
        quantize_attn_map_block(attn, cfg8, bs, perm=jnp.asarray(perm)))
    err_id = np.abs(q_id - np.asarray(attn)).mean()
    err_perm = np.abs(q_perm - np.asarray(attn)).mean()
    assert err_perm < err_id * 0.9, (err_perm, err_id)


def test_reorder_perm_through_dit_forward(setup):
    """A generated perm riding QuantCtx.attn_perms is exercised by the sim
    attention path."""
    cfg, params, contexts = setup
    # reorder tables are geometry-specific: calibrate at the same latent
    # size as the quantized run (64x64 -> 2*4*4 = 32 tokens, matching the
    # (2, 8, 8) latent below)
    stats = _calibrate(cfg, params, contexts, size=(64, 64), attn_map_pool=2)
    key = "blocks.0.self_attn.attn_map"
    assert key in stats
    # stats: [T, H, Sp, Sp] — reduce over the sweep
    pooled = {
        "blocks.0.self_attn": np.asarray(stats[key]).max(axis=0)
    }
    tables = generate_reorder_tables(pooled, pool=2)

    names = linear_layer_names(cfg)
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": FP_REGEX,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "attn": {"qk": {"n_bits": 8}, "v": {"n_bits": 8},
                 "attn_map": {"n_bits": 8, "group": "block",
                              "block_size": 8}},
    })
    policies, state, rotations = prepare_quant_state(params, names, qcfg)
    ctx = QuantCtx(mode="sim", policies=policies, state=state,
                   rotations=rotations, attn=qcfg.attn_cfg)
    ctx.attn_perms = {k: jnp.asarray(v) for k, v in tables.items()}
    x = jax.random.normal(jax.random.PRNGKey(9), (1, cfg.in_dim, 2, 8, 8))
    out = dit_forward(params, cfg, x, jnp.asarray([500.0]), contexts[0], 32,
                      ctx=ctx)
    assert np.isfinite(np.asarray(out)).all()
    # and the perm changes the quantized output vs identity ordering
    ctx2 = QuantCtx(mode="sim", policies=policies, state=state,
                    rotations=rotations, attn=qcfg.attn_cfg)
    out2 = dit_forward(params, cfg, x, jnp.asarray([500.0]), contexts[0], 32,
                       ctx=ctx2)
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_static_regex_selects_per_layer():
    """act.static_regex: matching layers get frozen-scale A8, others stay
    dynamic per-token (the reference's StaticQuantizer / quant_sum_static
    split is config-driven the same way)."""
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": FP_REGEX,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    })
    assert qcfg.resolve("blocks.0.ffn.2").act.dynamic is False
    assert qcfg.resolve("blocks.0.ffn.0").act.dynamic is True
    assert qcfg.resolve("blocks.0.self_attn.q").act.dynamic is True


def test_static_ffn2_fused_path_matches_sim(setup):
    """The static-scale fused GELU+quant FFN path (ref quant_sum_static,
    fused.cu:586): int8 forward with dynamic qkv/ffn.0 + static ffn.2
    tracks the sim forward of the same config."""
    from wanq_tpu.quant.qlinear import int8_static_fusable

    cfg, params, contexts = setup
    stats = _calibrate(cfg, params, contexts, collect_minmax=True)
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": FP_REGEX,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    })
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(
        params, names, qcfg, calib=stats
    )
    assert "delta_a" in state["blocks.0.ffn.2"]
    int8_ctx = QuantCtx(mode="int8", policies=policies, state=state,
                        rotations=rotations)
    assert int8_static_fusable(int8_ctx, "blocks.0.ffn.2")
    assert not int8_static_fusable(int8_ctx, "blocks.0.ffn.0")

    x = jax.random.normal(jax.random.PRNGKey(5), (1, cfg.in_dim, 2, 8, 8))
    t = jnp.asarray([500.0])
    txt = contexts[0]
    sim = dit_forward(params, cfg, x, t, txt, 32,
                      ctx=QuantCtx(mode="sim", policies=policies, state=state,
                                   rotations=rotations))
    hw = dit_forward(params, cfg, x, t, txt, 32, ctx=int8_ctx)
    assert np.isfinite(np.asarray(hw)).all()
    np.testing.assert_allclose(
        np.asarray(hw), np.asarray(sim), atol=5e-3, rtol=1e-2
    )


def test_static_fused_producer_matches_sim(setup):
    """The fused STATIC-scale qkv/cross-q producers (ln_modulate_quant_
    static; ref quant_sum_static at the LN site, fused.cu:586) must track
    the sim-mode static fake-quant path — same frozen scales, same math
    through the GEMM."""
    cfg, params, contexts = setup
    stats = _calibrate(cfg, params, contexts, collect_minmax=True)
    names = linear_layer_names(cfg)
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": FP_REGEX,
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True,
                "static_regex": r"self_attn\.(q|k|v)|cross_attn\.q"},
    })
    policies, state, rotations = prepare_quant_state(
        params, names, qcfg, calib=stats)
    # the static sites carry frozen scales; the producer path must engage
    from wanq_tpu.quant.qlinear import int8_static_fusable

    ctx8 = QuantCtx(mode="int8", policies=policies, state=state,
                    rotations=rotations)
    assert int8_static_fusable(ctx8, "blocks.0.self_attn.q")
    assert int8_static_fusable(ctx8, "blocks.0.cross_attn.q")

    x = jax.random.normal(jax.random.PRNGKey(8), (1, cfg.in_dim, 2, 8, 8))
    t = jnp.asarray([500.0])
    sim = dit_forward(params, cfg, x, t, contexts[0], 32,
                      ctx=QuantCtx(mode="sim", policies=policies,
                                   state=state, rotations=rotations))
    hw = dit_forward(params, cfg, x, t, contexts[0], 32, ctx=ctx8)
    np.testing.assert_allclose(np.asarray(hw), np.asarray(sim), atol=5e-3)
