"""Sliding temporal-window (block-sparse) self-attention.

The TPU-hardware realization of the reference's 0-bit attention-map
blocks (quant_attn.py bitwidth lists with 0 entries prune whole map
blocks — here pruned blocks are skipped on the MXU via the splash
kernel's block-sparse mask). CPU tests pin: the dense-mask oracle, the
lazy splash mask object against that oracle, model-level plumbing
(resolution, scan parity, guards, pytree roundtrip), and the
calibration-driven window selection.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.attention import (
    TemporalWindow,
    _temporal_band_mask,
    attention,
    temporal_band_dense_mask,
)
from wanq_tpu.models.dit import dit_forward, init_params, stack_block_params
from wanq_tpu.quant.attn import (
    collapse_window_radii,
    pooled_attn_map,
    select_temporal_windows,
)
from wanq_tpu.quant.qlinear import QuantCtx


def _manual_mask(sq, sk, tpf, radius, valid):
    m = np.zeros((sq, sk), dtype=bool)
    for i in range(sq):
        for j in range(sk):
            if j >= valid:
                continue
            if i >= valid:
                m[i, j] = True
                continue
            m[i, j] = abs(i // tpf - j // tpf) <= radius
    return m


def test_band_mask_matches_manual():
    win = TemporalWindow(tokens_per_frame=5, radius=1)
    got = np.asarray(temporal_band_dense_mask(23, 23, win, k_valid_len=21))
    np.testing.assert_array_equal(got, _manual_mask(23, 23, 5, 1, 21))


def test_splash_lazy_mask_matches_dense_oracle():
    # the splash _ComputableMask materializes via __getitem__ — the same
    # path the trace-time block-sparsity scan uses; must agree with the
    # dense oracle bit for bit (incl. pad rows and the valid prefix)
    s, tpf, r, valid = 32, 5, 1, 29
    lazy = _temporal_band_mask((s, s), tpf, r, valid)
    got = np.asarray(lazy[0:s, 0:s])
    want = np.asarray(
        temporal_band_dense_mask(s, s, TemporalWindow(tpf, r), valid))
    np.testing.assert_array_equal(got, want)


def test_attention_window_matches_masked_softmax(rng):
    b, s, n, d = 2, 24, 3, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
               for _ in range(3))
    win = TemporalWindow(tokens_per_frame=4, radius=1)
    got = attention(q, k, v, k_valid_len=22, window=win)
    mask = _manual_mask(s, s, 4, 1, 22)
    scores = np.einsum("bsnd,btnd->bnst", np.asarray(q), np.asarray(k))
    scores = scores / np.sqrt(d)
    scores = np.where(mask[None, None], scores, -1e30)
    p = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    want = jnp.einsum("bnst,btnd->bsnd", p, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_density_formula():
    win = TemporalWindow(tokens_per_frame=1, radius=1)
    # 4 frames, r=1: band rows have 2,3,3,2 entries of 16 total
    assert win.density(4) == pytest.approx(10 / 16)
    assert TemporalWindow(1, 99).density(4) == 1.0


@pytest.fixture(scope="module")
def model():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    rng = np.random.default_rng(7)
    # 6 latent frames -> grid (6, 4, 4): tokens_per_frame 16, seq 96
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 6, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return cfg, params, (x, t, txt)


def test_window_changes_output_and_large_radius_is_dense(model):
    cfg, params, (x, t, txt) = model
    dense = dit_forward(params, cfg, x, t, txt, seq_len=96)
    ctx_r9 = QuantCtx(mode="fp", attn_window=9)  # >= F-1=5 -> dense
    same = dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx_r9)
    np.testing.assert_allclose(np.asarray(same), np.asarray(dense),
                               atol=1e-6, rtol=1e-6)
    ctx_r1 = QuantCtx(mode="fp", attn_window=1)
    sparse = dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx_r1)
    assert not np.allclose(np.asarray(sparse), np.asarray(dense), atol=1e-3)


def test_window_scan_matches_unrolled(model):
    cfg, params, (x, t, txt) = model
    ctx = QuantCtx(mode="fp", attn_window=1)
    ref = dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx)
    got = dit_forward(stack_block_params(params), cfg, x, t, txt,
                      seq_len=96, ctx=ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_window_matches_explicit_band_mask_model_level(model):
    # model-level oracle: dit_forward with the resolved TemporalWindow must
    # equal dit_forward where the window is pre-resolved by hand with the
    # true tokens_per_frame (16) — pins dit_forward's grid resolution
    cfg, params, (x, t, txt) = model
    got = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=2))
    win = TemporalWindow(tokens_per_frame=16, radius=2)
    want = dit_forward(params, cfg, x, t, txt, seq_len=96,
                       ctx=QuantCtx(mode="fp", attn_window=win))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)


def test_window_with_pad_tail(model):
    # seq padded 96 -> 112: pad q rows/kv columns must not perturb the
    # valid region (same contract as the dense kv-prefix mask)
    cfg, params, (x, t, txt) = model
    ctx = QuantCtx(mode="fp", attn_window=1)
    unpadded = dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx)
    padded = dit_forward(params, cfg, x, t, txt, seq_len=112, ctx=ctx)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(unpadded),
                               atol=1e-5, rtol=1e-5)


def test_window_guards(model):
    cfg, params, (x, t, txt) = model
    from wanq_tpu.quant.attn import AttnQuantCfg

    with pytest.raises(NotImplementedError, match="inference-only"):
        dit_forward(params, cfg, x, t, txt, seq_len=96,
                    ctx=QuantCtx(mode="fp", attn_window=1), training=True)
    ctx = QuantCtx(mode="sim", attn=AttnQuantCfg(), attn_window=1)
    with pytest.raises(NotImplementedError, match="attention-map"):
        dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx)


def test_calib_ignores_window(model):
    # calibration must run DENSE: window selection needs full-map mass
    cfg, params, (x, t, txt) = model
    ctx = QuantCtx(mode="calib", attn_window=1, attn_map_pool=4,
                   attn_map_reduce="mean")
    dense = QuantCtx(mode="calib", attn_map_pool=4, attn_map_reduce="mean")
    dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx)
    dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=dense)
    key = "blocks.0.self_attn.attn_map"
    np.testing.assert_allclose(np.asarray(ctx.collect[key]),
                               np.asarray(dense.collect[key]),
                               atol=1e-6, rtol=1e-6)


def test_ctx_pytree_roundtrip_preserves_window_fields():
    ctx = QuantCtx(mode="fp", attn_window=TemporalWindow(16, 2),
                   attn_map_reduce="mean")
    leaves, treedef = jax.tree_util.tree_flatten(ctx)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.attn_window == TemporalWindow(16, 2)
    assert back.attn_map_reduce == "mean"
    # replace() must carry them too (the historic silent-drop bug class)
    rep = ctx.replace(mode="int8")
    assert rep.attn_window == TemporalWindow(16, 2)
    assert rep.attn_map_reduce == "mean"


def test_pooled_attn_map_mean_is_mass_preserving(rng):
    b, s, n, d = 2, 16, 2, 8
    q = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
    pool = 4
    m = np.asarray(pooled_attn_map(q, k, pool, reduce="mean"))
    # each pooled row sums to 1/pool of the softmax row mass (=1)
    np.testing.assert_allclose(m.sum(axis=-1), np.full((n, s // pool), 1 / pool),
                               atol=1e-5, rtol=1e-5)


def test_select_temporal_windows_and_collapse():
    # synthetic mean-pooled maps at pool=1, tpf=2, 4 frames (S=8): head 0
    # has all mass within |df|<=1, head 1 needs the full range
    tpf, s = 2, 8
    frames = np.arange(s) // tpf
    d = np.abs(frames[:, None] - frames[None, :])
    m0 = np.where(d <= 1, 1.0, 0.0)
    m0 /= m0.sum(axis=-1, keepdims=True)
    m1 = np.ones((s, s)) / s
    maps = {"blocks.0.self_attn.attn_map": np.stack([m0, m1])}
    radii = select_temporal_windows(maps, tokens_per_frame=tpf, pool=1,
                                    threshold=0.99)
    got = radii["blocks.0.self_attn.attn_map"]
    assert got[0] == 1
    assert got[1] == 3  # uniform mass: needs every frame pair
    # 95% of uniform mass over 4 frames: r=2 band holds 14/16 = 0.875 < .95
    radii95 = select_temporal_windows(maps, tokens_per_frame=tpf, pool=1,
                                      threshold=0.85)
    assert radii95["blocks.0.self_attn.attn_map"][1] == 2
    assert collapse_window_radii(radii) == 3


def test_window_composes_with_int8_gemms(model):
    # the intended deployment: int8 W8A8 GEMMs + windowed plain attention
    cfg, params, (x, t, txt) = model
    from wanq_tpu.models.dit import linear_layer_names
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state

    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    names = linear_layer_names(cfg)
    policies, state, rotations = prepare_quant_state(params, names, qcfg)
    base = dict(policies=policies, state=state, rotations=rotations,
                attn_window=1)
    sim = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="sim", **base))
    hw = dit_forward(params, cfg, x, t, txt, seq_len=96,
                     ctx=QuantCtx(mode="int8", **base))
    np.testing.assert_allclose(np.asarray(hw), np.asarray(sim),
                               atol=2e-2, rtol=2e-2)
    dense = dit_forward(params, cfg, x, t, txt, seq_len=96,
                        ctx=QuantCtx(mode="int8", **{**base, "attn_window": None}))
    assert not np.allclose(np.asarray(hw), np.asarray(dense), atol=1e-3)


# ---------------- per-head grouped window radii ----------------


def test_head_groups_order_and_inverse():
    from wanq_tpu.models.attention import _head_groups

    radii = [4, 1, 2, 1, 4, 1]
    order, groups = _head_groups(radii)
    assert groups == [(1, 3), (2, 1), (4, 2)]
    assert sorted(order) == list(range(6))
    assert [radii[i] for i in order] == [1, 1, 1, 2, 4, 4]
    # stability: equal radii keep their original head order
    assert order == [1, 3, 5, 2, 0, 4]


def test_temporal_window_per_head_validation():
    with pytest.raises(AssertionError, match="collapsed max"):
        TemporalWindow(4, 2, head_radii=(1, 3))
    win = TemporalWindow(4, 3, head_radii=(1, 3))
    assert win.resolved_radii(2) == (1, 3)
    assert TemporalWindow(4, 2).resolved_radii(3) == (2, 2, 2)


def test_per_head_attention_matches_per_head_shared_runs(rng):
    # per-head window == running each head separately with its own shared
    # radius (incl. a dense head and the kv valid prefix)
    b, s, n, d = 2, 24, 4, 8
    q, k, v = (jnp.asarray(rng.normal(size=(b, s, n, d)).astype(np.float32))
               for _ in range(3))
    radii = (0, 1, 2, 9)  # head 3: r=9 >= F-1=5 -> dense
    win = TemporalWindow(tokens_per_frame=4, radius=9, head_radii=radii)
    got = np.asarray(attention(q, k, v, k_valid_len=22, window=win))
    for h, r in enumerate(radii):
        want = attention(q[:, :, h:h + 1], k[:, :, h:h + 1], v[:, :, h:h + 1],
                         k_valid_len=22,
                         window=TemporalWindow(tokens_per_frame=4, radius=r))
        np.testing.assert_allclose(got[:, :, h:h + 1], np.asarray(want),
                                   atol=1e-5, rtol=1e-5)


def test_per_head_window_model_level(model):
    cfg, params, (x, t, txt) = model  # 4 heads, 6 latent frames, tpf 16
    radii = (0, 1, 2, 3)
    got = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=radii))
    # pre-resolved TemporalWindow spelling agrees (pins grid resolution)
    win = TemporalWindow(tokens_per_frame=16, radius=3, head_radii=radii)
    want = dit_forward(params, cfg, x, t, txt, seq_len=96,
                       ctx=QuantCtx(mode="fp", attn_window=win))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-6, rtol=1e-6)
    # all-equal per-head radii collapse to the scalar path
    eq = dit_forward(params, cfg, x, t, txt, seq_len=96,
                     ctx=QuantCtx(mode="fp", attn_window=(1, 1, 1, 1)))
    ref = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=1))
    np.testing.assert_allclose(np.asarray(eq), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    # mixed radii differ from the max-collapsed deployment (the win)
    collapsed = dit_forward(params, cfg, x, t, txt, seq_len=96,
                            ctx=QuantCtx(mode="fp", attn_window=3))
    assert not np.allclose(np.asarray(got), np.asarray(collapsed), atol=1e-3)


def test_per_head_all_dense_resolves_to_dense(model):
    cfg, params, (x, t, txt) = model
    dense = dit_forward(params, cfg, x, t, txt, seq_len=96)
    got = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=(9, 9, 9, 9)))
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                               atol=1e-6, rtol=1e-6)


def test_per_head_window_scan_matches_unrolled(model):
    cfg, params, (x, t, txt) = model
    ctx = QuantCtx(mode="fp", attn_window=(0, 1, 2, 3))
    ref = dit_forward(params, cfg, x, t, txt, seq_len=96, ctx=ctx)
    got = dit_forward(stack_block_params(params), cfg, x, t, txt,
                      seq_len=96, ctx=ctx)
    # 2e-4: XLA fuses the stacked [N,S,T] per-head mask select differently
    # under the scan body (float reassociation only — the per-head
    # semantics are pinned exactly by
    # test_per_head_attention_matches_per_head_shared_runs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_per_head_window_radii_selector():
    from wanq_tpu.quant.attn import per_head_window_radii

    windows = {"a": np.array([1, 3, 0]), "b": np.array([2, 1, 0])}
    np.testing.assert_array_equal(per_head_window_radii(windows), [2, 3, 0])
    assert collapse_window_radii(windows) == 3


def test_parse_attn_window_cli():
    from types import SimpleNamespace

    from wanq_tpu.cli.common import parse_attn_window

    assert parse_attn_window(SimpleNamespace(attn_window="-1")) is None
    assert parse_attn_window(SimpleNamespace(attn_window="2")) == 2
    assert parse_attn_window(SimpleNamespace(attn_window="1,2,3,4")) == (1, 2, 3, 4)
    assert parse_attn_window(SimpleNamespace(attn_window="")) is None


def test_per_head_ctx_pytree_roundtrip():
    win = TemporalWindow(16, 3, head_radii=(1, 2, 3, 3))
    ctx = QuantCtx(mode="fp", attn_window=win)
    leaves, treedef = jax.tree_util.tree_flatten(ctx)
    back = jax.tree_util.tree_unflatten(treedef, leaves)
    assert back.attn_window == win
    assert back.attn_window.head_radii == (1, 2, 3, 3)


def test_parse_attn_window_tolerates_stray_commas():
    # round-5 ADVICE: '1,2,' crashed in int(''); negatives now parse
    # through (dense-for-that-head semantics, resolved by dit_forward)
    from types import SimpleNamespace

    from wanq_tpu.cli.common import parse_attn_window

    assert parse_attn_window(SimpleNamespace(attn_window="1,2,")) == (1, 2)
    assert parse_attn_window(
        SimpleNamespace(attn_window=" 1 , 2 ,3 ")) == (1, 2, 3)
    assert parse_attn_window(SimpleNamespace(attn_window=",")) is None
    assert parse_attn_window(SimpleNamespace(attn_window="2,-1")) == (2, -1)


def test_per_head_negative_radius_means_dense_head(model):
    # a negative per-head entry = dense for that head (scalar convention),
    # instead of tripping TemporalWindow's nonneg assert (round-5 ADVICE)
    cfg, params, (x, t, txt) = model
    neg = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=(-1, 1, 2, 3)))
    # radius 9 >= F-1 = 5 covers every frame pair -> same dense head
    big = dit_forward(params, cfg, x, t, txt, seq_len=96,
                      ctx=QuantCtx(mode="fp", attn_window=(9, 1, 2, 3)))
    np.testing.assert_allclose(np.asarray(neg), np.asarray(big),
                               atol=1e-6, rtol=1e-6)
    # all-negative -> dense model (mirrors the scalar dense fallback)
    dense = dit_forward(params, cfg, x, t, txt, seq_len=96)
    alln = dit_forward(params, cfg, x, t, txt, seq_len=96,
                       ctx=QuantCtx(mode="fp",
                                    attn_window=(-1, -1, -1, -1)))
    np.testing.assert_allclose(np.asarray(alln), np.asarray(dense),
                               atol=1e-6, rtol=1e-6)


def test_density_per_head_mean():
    # density() must average over per-head radii (round-5 ADVICE: the
    # collapsed-max density overstated per-head cost)
    d1 = TemporalWindow(1, 1).density(4)
    d2 = TemporalWindow(1, 2).density(4)
    win = TemporalWindow(1, 2, head_radii=(1, 2))
    assert win.density(4) == pytest.approx((d1 + d2) / 2)
    assert TemporalWindow(1, 2, head_radii=(2, 2)).density(4) == (
        pytest.approx(d2))


def test_per_head_window_guard_under_ulysses(model):
    # grouped splash permutes/slices the head axis -> guarded on a
    # head-sharded (sp>1) mesh; uniform per-head radii collapse to the
    # scalar path and stay allowed
    cfg, params, (x, t, txt) = model
    from wanq_tpu.parallel import ShardingPlan, make_mesh

    plan = ShardingPlan(make_mesh(sp=2))
    with pytest.raises(NotImplementedError, match="per-head window"):
        dit_forward(params, cfg, x, t, txt, seq_len=96,
                    ctx=QuantCtx(mode="fp", attn_window=(0, 1, 2, 3)),
                    plan=plan)


def test_capture_attn_maps_from_quantized_model():
    # per-head window calibration for deployments where no FP model
    # exists (streamed 14B): maps captured from the int8 model itself,
    # through the scan-over-blocks path, via WanT2V.capture_attn_maps
    from wanq_tpu.models.dit import (
        init_params,
        linear_layer_names,
        make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.pipelines.text2video import WanT2V
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.attn import select_temporal_windows

    cfg = tiny_config()
    params = init_params(cfg, jax.random.PRNGKey(0))
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|"
                           r"time_projection|head\.head",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    policies, state, rotations = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, targets="int8")
    sctx = make_scan_ctx(
        QuantCtx(mode="int8", policies=policies, state=state,
                 rotations=rotations), cfg.num_layers)
    pipe = WanT2V(cfg, stack_block_params(params), quant_ctx=sctx)
    rng = np.random.default_rng(3)
    ctxv = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    # size (64,64), frame_num 9 -> latent grid (3, 4, 4): tpf 16, seq 48
    maps = pipe.capture_attn_maps(ctxv, size=(64, 64), frame_num=9, pool=4)
    assert set(maps) == {
        f"blocks.{i}.self_attn" for i in range(cfg.num_layers)}
    m0 = maps["blocks.0.self_attn"]
    assert m0.shape == (cfg.num_heads, 12, 12)
    # mean-pooled rows preserve softmax mass: each row of the unpooled map
    # sums to 1, so a pooled row sums to ~1/pool
    row_mass = m0.sum(axis=-1) * 4
    np.testing.assert_allclose(row_mass, 1.0, atol=1e-3)
    # the maps feed the selector end-to-end
    radii = select_temporal_windows(maps, tokens_per_frame=16, pool=4,
                                    threshold=0.9, valid_len=48)
    assert all(r.shape == (cfg.num_heads,) for r in radii.values())
    assert all(0 <= int(r.min()) and int(r.max()) <= 2 for r in radii.values())

    # fp-mode capture (quant_ctx=None) works through the same surface
    fp_pipe = WanT2V(cfg, stack_block_params(params))
    fp_maps = fp_pipe.capture_attn_maps(ctxv, size=(64, 64), frame_num=9,
                                        pool=4)
    assert fp_maps["blocks.1.self_attn"].shape == (cfg.num_heads, 12, 12)


def test_suggested_radii_cli_roundtrip():
    # the ptq --suggest_window deploy artifact is a comma list; the
    # emitted per-head vector must survive join -> parse_attn_window
    # (round-4 VERDICT #4's regression pin)
    from types import SimpleNamespace

    from wanq_tpu.cli.common import parse_attn_window
    from wanq_tpu.quant.attn import per_head_window_radii

    windows = {"blocks.0.self_attn": np.array([1, 3, 0, 2]),
               "blocks.1.self_attn": np.array([2, 1, 4, 0])}
    ph = per_head_window_radii(windows)
    np.testing.assert_array_equal(ph, [2, 3, 4, 2])
    cli = ",".join(str(int(r)) for r in ph)
    back = parse_attn_window(SimpleNamespace(attn_window=cli))
    assert back == tuple(int(r) for r in ph)
