"""Streamed quantized-base builder (quant/stream.py) — the construction
path that puts 14B on one chip for inference and QLoRA. The CPU test pins
it against the conventional build: same generators + prepare_quant_state
must produce the same forward."""

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import (
    dit_forward,
    linear_layer_names,
    make_block_generator,
    make_nonblock_generator,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx
from wanq_tpu.quant.stream import build_streamed_quant_base

QDICT = {
    "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
    "weight": {"n_bits": 4, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}


def test_streamed_base_matches_conventional_build(rng):
    cfg = tiny_config()
    qcfg = QuantConfig.from_dict(QDICT)
    stacked_s, qctx_s, qbytes = build_streamed_quant_base(cfg, qcfg)
    assert qbytes > 0

    # conventional path from the SAME generator draws
    params = make_nonblock_generator(cfg)(jax.random.PRNGKey(0))
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    gen_block = make_block_generator(cfg)
    params["blocks"] = [
        gen_block(jax.random.PRNGKey(100 + i)) for i in range(cfg.num_layers)
    ]
    names = linear_layer_names(cfg)
    pol, state, rot = prepare_quant_state(params, names, qcfg, targets="int8")
    qctx_c = make_scan_ctx(
        QuantCtx(mode="int8", policies=pol, state=state, rotations=rot),
        cfg.num_layers,
    )

    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    out_s = dit_forward(stacked_s, cfg, x, t, txt, 32, ctx=qctx_s)
    out_c = dit_forward(
        stack_block_params(params), cfg, x, t, txt, 32, ctx=qctx_c
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_c), rtol=1e-5, atol=1e-5
    )
    # the streamed base really is stripped: placeholder FP weights
    assert stacked_s["blocks"]["self_attn"]["q"]["w"].shape[-2:] == (1, 1)


def test_streamed_base_carries_lowrank(rng):
    """SVDQuant branch through the streamed 14B-style builder: the
    per-layer state (incl. the bf16 factors) must be BIT-identical to the
    conventional build's (same generator draws, same SVD seed), and the
    forwards must agree. The forward check is loose: the streamed base
    runs with stripped [1,1] FP placeholders, a different HLO whose
    fusion/rounding can flip individual int8 codes by ±1 (same reason the
    plain test above uses rtol 1e-5, amplified here by the extra bf16
    branch GEMMs)."""
    cfg = tiny_config()
    qd = {**QDICT, "weight": dict(QDICT["weight"], lowrank_rank=8)}
    qcfg = QuantConfig.from_dict(qd)
    stacked_s, qctx_s, _ = build_streamed_quant_base(cfg, qcfg)
    a = qctx_s.scan_state["self_attn.q"]["lowrank_a"]
    assert a.shape[0] == cfg.num_layers and a.shape[2] == 8
    assert a.dtype == jnp.bfloat16

    params = make_nonblock_generator(cfg)(jax.random.PRNGKey(0))
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    gen_block = make_block_generator(cfg)
    params["blocks"] = [
        gen_block(jax.random.PRNGKey(100 + i)) for i in range(cfg.num_layers)
    ]
    pol, state, rot = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, targets="int8")
    qctx_c = make_scan_ctx(
        QuantCtx(mode="int8", policies=pol, state=state, rotations=rot),
        cfg.num_layers,
    )
    # the real invariant: every stacked state leaf matches — integer
    # codes exactly, float leaves to ulp-level jitter (the two builders
    # are different HLO programs; reduction order differs at ~1e-8). The
    # SVD factors are only defined up to sign/rotation in degenerate
    # singular subspaces, so they compare via their PRODUCT L1@L2.
    for sfx, st in qctx_s.scan_state.items():
        for key, leaf in st.items():
            if key == "lowrank_b":
                continue  # covered by the product check below
            a = np.asarray(leaf, np.float32)
            b = np.asarray(qctx_c.scan_state[sfx][key], np.float32)
            if key == "lowrank_a":
                a = np.einsum(
                    "lkr,lrn->lkn", a,
                    np.asarray(st["lowrank_b"], np.float32))
                b = np.einsum(
                    "lkr,lrn->lkn", b,
                    np.asarray(qctx_c.scan_state[sfx]["lowrank_b"],
                               np.float32))
                np.testing.assert_allclose(a, b, atol=5e-2,
                                           err_msg=f"{sfx}|L1@L2")
            elif np.asarray(leaf).dtype.kind in "iu":
                # integer codes: the residual differs at ~1e-8 between the
                # two programs, so values sitting exactly on a rounding
                # boundary may flip by one code — allow a ≤0.1% fraction
                # of ±1 flips (packed int4 bytes unpack first)
                ia = np.asarray(leaf)
                ib = np.asarray(qctx_c.scan_state[sfx][key])
                if key in ("w_int4", "w_int4g"):
                    from wanq_tpu.quant.quantizers import unpack_int4

                    unpack = jax.vmap(unpack_int4)  # over the scan [L]
                    ia = np.asarray(unpack(jnp.asarray(ia)))
                    ib = np.asarray(unpack(jnp.asarray(ib)))
                d = np.abs(ia.astype(np.int32) - ib.astype(np.int32))
                assert d.max() <= 1 and (d > 0).mean() <= 1e-3, (
                    f"{sfx}|{key}: {int((d > 0).sum())} flips, "
                    f"max {int(d.max())}")
            else:
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6,
                                           err_msg=f"{sfx}|{key}")
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    out_s = dit_forward(stacked_s, cfg, x, t, txt, 32, ctx=qctx_s)
    out_c = dit_forward(
        stack_block_params(params), cfg, x, t, txt, 32, ctx=qctx_c)
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_c), rtol=2e-3, atol=2e-3)
