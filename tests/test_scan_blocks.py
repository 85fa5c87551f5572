"""Scan-over-blocks (stacked params) parity tests: the compile-time layout
must produce identical results to the unrolled block loop in every quant
mode, including calibration stat collection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import (
    dit_forward,
    init_params,
    init_params_on_device,
    linear_layer_names,
    stack_block_params,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx

QCFG = {
    "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True},
    "viditq": {"alpha": 0.5665, "layer_name_regex": ""},
}


@pytest.fixture(scope="module")
def setup():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    stacked = stack_block_params(params)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return cfg, params, stacked, (x, t, txt)


def test_scan_fp_matches_loop(setup):
    cfg, params, stacked, (x, t, txt) = setup
    ref = dit_forward(params, cfg, x, t, txt, seq_len=32)
    got = dit_forward(stacked, cfg, x, t, txt, seq_len=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_scan_sim_quant_matches_loop(setup):
    cfg, params, stacked, (x, t, txt) = setup
    qcfg = QuantConfig.from_dict(QCFG)
    names = linear_layer_names(cfg)
    # viditq needs calib data — synthesize per-layer absmax
    rng = np.random.default_rng(0)
    calib = {n: np.abs(rng.normal(size=(2, 96 if "ffn.2" not in n else cfg.ffn_dim))).astype(np.float32) + 0.1 for n in names}
    policies, state, rotations = prepare_quant_state(params, names, qcfg, calib=calib)
    ctx = QuantCtx(mode="sim", policies=policies, state=state, rotations=rotations)
    ref = dit_forward(params, cfg, x, t, txt, seq_len=32, ctx=ctx)
    got = dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx)
    # XLA reassociates f32 reductions differently under scan; values near a
    # rounding boundary can flip one int8 level — tolerance is one quant step
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3)


def test_scan_int8_matches_loop(setup):
    cfg, params, stacked, (x, t, txt) = setup
    qcfg = QuantConfig.from_dict({k: v for k, v in QCFG.items() if k != "viditq"})
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(params, names, qcfg)
    ctx = QuantCtx(mode="int8", policies=policies, state=state, rotations=rotations)
    ref = dit_forward(params, cfg, x, t, txt, seq_len=32, ctx=ctx)
    got = dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3)


def test_scan_calib_collects_per_block_stats(setup):
    cfg, params, stacked, (x, t, txt) = setup
    ctx_loop = QuantCtx(mode="calib")
    dit_forward(params, cfg, x, t, txt, seq_len=32, ctx=ctx_loop)
    ctx_scan = QuantCtx(mode="calib")
    dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx_scan)
    assert set(ctx_scan.collect) == set(ctx_loop.collect)
    for k in ctx_loop.collect:
        np.testing.assert_allclose(
            np.asarray(ctx_scan.collect[k]), np.asarray(ctx_loop.collect[k]),
            atol=1e-5, rtol=1e-4, err_msg=k,
        )


def test_init_params_on_device_structure(setup):
    cfg, params, _, _ = setup
    dev = init_params_on_device(cfg, seed=0)
    ref_tree = jax.tree.structure(params)
    dev_tree = jax.tree.structure(dev)
    assert ref_tree == dev_tree
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(dev)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_scan_ctx_carries_attention_quant():
    """Attention-quant config must survive the scan-over-blocks ctx
    rebuild (a dropped ctx.attn silently ran FP attention)."""
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import (
        dit_forward,
        init_params,
        linear_layer_names,
        make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    from tests.conftest import randomize_head

    cfg = tiny_config()
    lp = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    sp = stack_block_params(randomize_head(init_params(cfg, jax.random.PRNGKey(0))))
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "attn": {"qk": {"n_bits": 4}, "v": {"n_bits": 4}},
    })
    pol, st, rot = prepare_quant_state(lp, linear_layer_names(cfg), qcfg)
    base = QuantCtx(mode="sim", policies=pol, state=st, rotations=rot,
                    attn=qcfg.attn_cfg)
    sctx = make_scan_ctx(base, cfg.num_layers)
    assert sctx.attn is not None

    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_dim, 2, 8, 8))
    t = jnp.asarray([500.0])
    c = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.text_len, cfg.text_dim))
    with_attnq = dit_forward(sp, cfg, x, t, c, 32, ctx=sctx)
    no_attnq = dit_forward(
        sp, cfg, x, t, c, 32,
        ctx=make_scan_ctx(QuantCtx(mode="sim", policies=pol, state=st,
                                   rotations=rot), cfg.num_layers),
    )
    # 4-bit qk/v quantization must actually change the output under scan
    assert not np.allclose(np.asarray(with_attnq), np.asarray(no_attnq))


def test_scan_rejects_nonblock_attn_perms():
    """Perms keyed outside blocks.* cannot ride the scan xs — loud error
    (per-block tables are the only stackable form)."""
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import (
        dit_forward, init_params, linear_layer_names, make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg = tiny_config()
    lp = init_params(cfg, jax.random.PRNGKey(0))
    sp = stack_block_params(init_params(cfg, jax.random.PRNGKey(0)))
    qcfg = QuantConfig.from_dict({
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    pol, st, rot = prepare_quant_state(lp, linear_layer_names(cfg), qcfg)
    ctx = make_scan_ctx(QuantCtx(mode="sim", policies=pol, state=st,
                                 rotations=rot), cfg.num_layers)
    ctx.attn_perms = {"head.self_attn": jnp.zeros((4, 32), jnp.int32)}
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.in_dim, 2, 8, 8))
    with pytest.raises(AssertionError, match="cannot ride scan"):
        dit_forward(sp, cfg, x, jnp.asarray([500.0]),
                    jax.random.normal(jax.random.PRNGKey(2),
                                      (1, cfg.text_len, cfg.text_dim)),
                    32, ctx=ctx)


def test_scan_int8_static_ffn2_matches_loop(setup):
    """Scan layout with the static-scale fused GELU+quant FFN
    (act.static_regex='ffn\\.2'): delta_a must ride the scan state."""
    cfg, params, stacked, (x, t, txt) = setup
    from wanq_tpu.pipelines.text2video import WanT2V

    rng = np.random.default_rng(9)
    ctxn = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib", collect_minmax=True))
    stats = pipe.collect_calibration(txt, ctxn, size=(32, 32), frame_num=5,
                                     sampling_steps=2, seed=7)
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": QCFG["remain_fp_regex"],
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"},
    })
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(params, names, qcfg, calib=stats)
    ctx = QuantCtx(mode="int8", policies=policies, state=state, rotations=rotations)
    ref = dit_forward(params, cfg, x, t, txt, seq_len=32, ctx=ctx)
    got = dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3)


def test_scan_attn_perms_match_loop(setup):
    """Per-block attn-map reorder tables ride the scan as stacked [L, H, S]
    xs (round-2 VERDICT #5) — parity with the unrolled loop, using
    DIFFERENT perms per block to prove each iteration gets its own."""
    cfg, params, stacked, (x, t, txt) = setup
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": QCFG["remain_fp_regex"],
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "attn": {"qk": {"n_bits": 8}, "v": {"n_bits": 8},
                 "attn_map": {"n_bits": 8, "group": "block",
                              "block_size": 8}},
    })
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(params, names, qcfg)
    rng = np.random.default_rng(11)
    s = 32  # seq_len below
    perms = {
        f"blocks.{i}.self_attn": jnp.asarray(
            np.stack([rng.permutation(s) for _ in range(cfg.num_heads)]),
            jnp.int32,
        )
        for i in range(cfg.num_layers)
    }
    ctx = QuantCtx(mode="sim", policies=policies, state=state,
                   rotations=rotations, attn=qcfg.attn_cfg)
    ctx.attn_perms = perms
    ref = dit_forward(params, cfg, x, t, txt, seq_len=32, ctx=ctx)
    got = dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-3)
    # and the perms are live: identity-ordering output differs
    ctx_noperm = QuantCtx(mode="sim", policies=policies, state=state,
                          rotations=rotations, attn=qcfg.attn_cfg)
    other = dit_forward(stacked, cfg, x, t, txt, seq_len=32, ctx=ctx_noperm)
    assert not np.allclose(np.asarray(got), np.asarray(other))
