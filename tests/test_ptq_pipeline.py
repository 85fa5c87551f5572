"""End-to-end calibration → PTQ → quantized-inference tests on the tiny
model (the TPU-era analog of the reference's pipeline smoke scripts,
SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import dit_forward, init_params, linear_layer_names
from wanq_tpu.pipelines.text2video import (
    WanT2V,
    compute_seq_len,
    compute_target_shape,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import (
    load_quant_state,
    prepare_quant_state,
    reduce_calib,
    save_quant_state,
)
from wanq_tpu.quant.qlinear import QuantCtx

WAN_QCFG = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"blocks\.\d+\.self_attn\.(?!q$)(?!k$)(?!v$)[^.]+|blocks\.\d+\.o|"
        r"blocks\.\d+\.ffn.*|cross_attn"
    ),
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True},
    "viditq": {"alpha": 0.5665, "layer_name_regex": ""},
}

BASE_QCFG = {
    "remain_fp_regex": WAN_QCFG["remain_fp_regex"],
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}


@pytest.fixture(scope="module")
def tiny():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


@pytest.fixture(scope="module")
def contexts(tiny):
    cfg, _ = tiny
    rng = np.random.default_rng(1)
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctx_null = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return ctx, ctx_null


def test_calibration_sweep_collects_all_layers(tiny, contexts):
    cfg, params = tiny
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib"))
    stats = pipe.collect_calibration(
        *contexts, size=(32, 32), frame_num=5, sampling_steps=3, seed=7
    )
    names = set(linear_layer_names(cfg))
    # every linear collected (plus the attention qk/v capture keys)
    assert names <= set(stats.keys())
    q_stats = stats["blocks.0.self_attn.q"]
    assert q_stats.shape == (3, cfg.dim)  # [T, C]
    assert np.all(q_stats > 0)
    # ffn.2 input is the ffn hidden dim
    assert stats["blocks.0.ffn.2"].shape == (3, cfg.ffn_dim)


@pytest.fixture(scope="module")
def calib_and_fp(tiny, contexts):
    cfg, params = tiny
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib"))
    stats = pipe.collect_calibration(
        *contexts, size=(32, 32), frame_num=5, sampling_steps=3, seed=7
    )
    fp_pipe = WanT2V(cfg, params)
    fp_latents = fp_pipe.generate(
        *contexts, size=(32, 32), frame_num=5, sampling_steps=3, seed=7
    )
    return stats, fp_latents


@pytest.mark.parametrize("qcfg_dict", [WAN_QCFG, BASE_QCFG], ids=["viditq", "base"])
def test_ptq_and_sim_inference(tiny, contexts, calib_and_fp, qcfg_dict):
    cfg, params = tiny
    stats, fp_latents = calib_and_fp
    qcfg = QuantConfig.from_dict(qcfg_dict)
    policies, state, rotations = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, calib=stats, seed=0
    )
    # quantized layers got state
    assert "blocks.0.self_attn.q" in state
    assert "blocks.0.ffn.0" not in state  # remain_fp
    if qcfg_dict is WAN_QCFG:
        assert "channel_mask" in state["blocks.0.self_attn.q"]
        assert cfg.dim in rotations

    ctx = QuantCtx(mode="sim", policies=policies, state=state, rotations=rotations)
    pipe = WanT2V(cfg, params, quant_ctx=ctx)
    latents = pipe.generate(
        *contexts, size=(32, 32), frame_num=5, sampling_steps=3, seed=7
    )
    assert bool(jnp.all(jnp.isfinite(latents)))
    # W8A8 on q/k/v only: outputs stay close to FP
    err = float(jnp.abs(latents - fp_latents).max())
    ref = float(jnp.abs(fp_latents).max())
    assert err / ref < 0.2, f"rel err {err/ref}"


def test_int8_matches_sim_for_base_method(tiny, contexts):
    """For the base method the int8 kernel path is algebraically identical
    to simulated fake-quant (the epilogue identity) — check end to end."""
    cfg, params = tiny
    qcfg = QuantConfig.from_dict(BASE_QCFG)
    policies, state, rotations = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, calib=None, seed=0
    )
    rngk = jax.random.PRNGKey(3)
    x = jax.random.normal(rngk, (1, cfg.in_dim, 2, 8, 8), dtype=jnp.float32)
    t = jnp.asarray([500.0])
    txt = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    seq_len = 2 * 4 * 4

    sim_ctx = QuantCtx(mode="sim", policies=policies, state=state, rotations=rotations)
    int8_ctx = QuantCtx(mode="int8", policies=policies, state=state, rotations=rotations)
    out_sim = dit_forward(params, cfg, x, t, txt, seq_len, ctx=sim_ctx)
    out_int8 = dit_forward(params, cfg, x, t, txt, seq_len, ctx=int8_ctx)
    np.testing.assert_allclose(
        np.asarray(out_sim), np.asarray(out_int8), atol=5e-3, rtol=1e-2
    )


def test_quant_state_save_load_roundtrip(tiny, tmp_path):
    cfg, params = tiny
    qcfg = QuantConfig.from_dict(BASE_QCFG)
    _, state, _ = prepare_quant_state(params, linear_layer_names(cfg), qcfg)
    p = str(tmp_path / "quant_params.npz")
    save_quant_state(p, state, seed=0)
    loaded, seed = load_quant_state(p)
    assert seed == 0
    assert set(loaded.keys()) == set(state.keys())
    for name in state:
        for k in state[name]:
            np.testing.assert_array_equal(
                np.asarray(state[name][k]), np.asarray(loaded[name][k])
            )


def test_reduce_calib_clamps_and_maxes():
    calib = {"l": np.array([[0.5, 1e-9], [2.0, 1e-9]], dtype=np.float32)}
    out = reduce_calib(calib)
    np.testing.assert_allclose(out["l"], [2.0, 1e-3])


def test_seq_len_rounding(tiny):
    cfg, _ = tiny
    ts = compute_target_shape(cfg, (32, 32), 5)
    assert ts == (16, 2, 4, 4)
    assert compute_seq_len(cfg, ts, sp_size=1) == 2 * 2 * 2
    assert compute_seq_len(cfg, ts, sp_size=8) == 8
    assert compute_seq_len(cfg, ts, sp_size=16) == 16


def test_w4a8_hardware_path(tiny, contexts):
    """W4A8 (QServe-style, csrc/qgemm/w4a8): 4-bit weights in int8
    containers through the int8 MXU path, vs the W4 sim path."""
    cfg, params = tiny
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": BASE_QCFG["remain_fp_regex"],
        "weight": {"n_bits": 4, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    policies, state, rotations = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg
    )
    st = state["blocks.0.self_attn.q"]
    # true 4-bit packing: two int4 per byte along K -> half the int8 bytes
    from wanq_tpu.quant.quantizers import unpack_int4

    packed = st["w_int4"]
    assert packed.shape[0] == cfg.dim // 2
    assert packed.nbytes * 2 == cfg.dim * cfg.dim
    w4 = np.asarray(unpack_int4(packed))
    assert w4.min() >= -8 and w4.max() <= 7  # int4 value range

    rngk = jax.random.PRNGKey(5)
    x = jax.random.normal(rngk, (1, cfg.in_dim, 2, 8, 8), dtype=jnp.float32)
    t = jnp.asarray([500.0])
    txt = jax.random.normal(jax.random.PRNGKey(6), (1, cfg.text_len, cfg.text_dim))
    sim = dit_forward(params, cfg, x, t, txt, 32,
                      ctx=QuantCtx(mode="sim", policies=policies, state=state))
    hw = dit_forward(params, cfg, x, t, txt, 32,
                     ctx=QuantCtx(mode="int8", policies=policies, state=state))
    np.testing.assert_allclose(np.asarray(sim), np.asarray(hw), atol=5e-3, rtol=1e-2)


def test_calibration_captures_attention_stats(tiny, contexts):
    """qk/v attention-calibration capture (ref SaveActivationHook types,
    get_calib_data_wanx.py:227-238): per-(head, dim) absmax."""
    cfg, params = tiny
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib"))
    stats = pipe.collect_calibration(
        *contexts, size=(32, 32), frame_num=5, sampling_steps=2, seed=7
    )
    for tag in ("q", "k", "v"):
        key = f"blocks.0.self_attn.attn_{tag}"
        assert key in stats, key
        assert stats[key].shape == (2, cfg.num_heads, cfg.head_dim)
        assert np.all(stats[key] >= 0)


def test_rebuild_rotations_handles_packed_int4(tiny):
    """Rotation-dim recovery from a loaded quant state must work when the
    state carries only packed w_int4 (K/2 rows)."""
    from wanq_tpu.quant.ptq import rebuild_rotations

    cfg, params = tiny
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
        "weight": {"n_bits": 4, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "quarot": {"layer_name_regex": "ffn"},
    })
    names = linear_layer_names(cfg)
    policies = {n: qcfg.resolve(n) for n in names}
    _, state, want_rot = prepare_quant_state(
        params, names, qcfg, targets="int8"
    )
    st = state["blocks.0.ffn.0"]
    assert "w_int4" in st and "w_q" not in st
    got = rebuild_rotations(state, policies, seed=0)
    assert set(got.keys()) == set(want_rot.keys())
    for d in got:
        np.testing.assert_array_equal(np.asarray(got[d]), np.asarray(want_rot[d]))


def test_strip_quantized_weights_int8_parity(tiny):
    """The hardware-refactor FP-copy deletion (ref quant_wanx.py:137-185):
    int8 and sim forwards are bit-identical with stripped FP weights;
    FP-kept layers and biases survive."""
    from wanq_tpu.quant.ptq import strip_quantized_weights

    cfg, params = tiny
    qcfg = QuantConfig.from_dict(BASE_QCFG)
    policies, state, rotations = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, calib=None, seed=0
    )
    stripped = strip_quantized_weights(params, policies)
    # quantized layers' w (self-attn q/k/v under the shipped Wan regex)
    # became placeholders; FP-kept layers and biases are intact
    assert stripped["blocks"][0]["self_attn"]["q"]["w"].shape == (1, 1)
    assert stripped["blocks"][0]["ffn"]["0"]["w"].shape == params["blocks"][0]["ffn"]["0"]["w"].shape
    assert stripped["head"]["head"]["w"].shape == params["head"]["head"]["w"].shape
    np.testing.assert_array_equal(
        np.asarray(stripped["blocks"][0]["self_attn"]["q"]["b"]),
        np.asarray(params["blocks"][0]["self_attn"]["q"]["b"]))
    # original tree untouched
    assert params["blocks"][0]["self_attn"]["q"]["w"].shape != (1, 1)

    x = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.in_dim, 2, 8, 8), dtype=jnp.float32)
    t = jnp.asarray([500.0])
    txt = jax.random.normal(jax.random.PRNGKey(4), (1, cfg.text_len, cfg.text_dim))
    for mode in ("sim", "int8"):
        ctx = QuantCtx(mode=mode, policies=policies, state=state, rotations=rotations)
        ref = dit_forward(params, cfg, x, t, txt, 32, ctx=ctx)
        got = dit_forward(stripped, cfg, x, t, txt, 32, ctx=ctx)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_prepare_quant_state_stacked_parity(tiny, calib_and_fp):
    """The memory-lean scan-form PTQ (slices stacked params, donated
    incremental writes — one layer + the final stacked state resident
    instead of three weight-sized copies) must produce exactly the
    scan_state that prepare_quant_state + make_scan_ctx build, for every
    method config."""
    from wanq_tpu.models.dit import make_scan_ctx, stack_block_params
    from wanq_tpu.quant.ptq import prepare_quant_state_stacked

    cfg, params = tiny
    stats, _ = calib_and_fp
    stacked_params = stack_block_params(params)

    for qd in (WAN_QCFG, BASE_QCFG):
        qcfg = QuantConfig.from_dict(qd)
        pol_ref, state_ref, rot_ref = prepare_quant_state(
            params, linear_layer_names(cfg), qcfg, calib=stats, seed=0,
            targets="sim", rotate_on_device=True,
        )
        ref_ctx = make_scan_ctx(
            QuantCtx(mode="sim", policies=pol_ref, state=state_ref,
                     rotations=rot_ref),
            cfg.num_layers,
        )
        pol, scan_state, rot = prepare_quant_state_stacked(
            stacked_params["blocks"], cfg.num_layers, qcfg, calib=stats,
            seed=0, targets="sim",
        )
        # same quantized suffixes, identical stacked leaves
        assert set(scan_state) == set(ref_ctx.scan_state)
        for sfx in scan_state:
            jax.tree.map(
                lambda a, b: np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(b)),
                scan_state[sfx], ref_ctx.scan_state[sfx],
            )
        # block policies agree (stacked builder emits blocks.* only)
        for name, p in pol.items():
            assert pol_ref[name] == p
        assert set(rot) == set(rot_ref)

def test_prepare_quant_state_stacked_rejects_nonuniform_policies(tiny):
    """Scan-over-blocks shares one compiled body, so the stacked PTQ must
    REFUSE layer-index-dependent configs (e.g. keep-first-block-FP) loudly
    instead of silently applying blocks.0's policy to every layer — the
    list-form path would have honored the per-layer regex."""
    from wanq_tpu.models.dit import stack_block_params
    from wanq_tpu.quant.ptq import prepare_quant_state_stacked

    cfg, params = tiny
    stacked_params = stack_block_params(params)
    qcfg = QuantConfig.from_dict(
        dict(BASE_QCFG,
             remain_fp_regex=BASE_QCFG["remain_fp_regex"] + r"|blocks\.0\.")
    )
    with pytest.raises(ValueError, match="uniform policy"):
        prepare_quant_state_stacked(
            stacked_params["blocks"], cfg.num_layers, qcfg, targets="sim"
        )
