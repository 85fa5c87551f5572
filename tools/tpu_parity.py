"""On-chip parity: fused TPU fast paths vs the plain XLA reference chain.

The repo's Pallas fast paths (rms_rope_heads / rms_split_heads /
split_heads / heads-major attention + o-projection, ln_modulate_quant)
are gated on the TPU backend, so the CPU test suite exercises only their
interpret-mode kernels. This tool runs the FULL DiT forward on the real
chip twice — fast paths on (default) and off (WANQ_FUSED_QK=0,
WANQ_PALLAS_PRODUCERS=0) — and reports agreement, in fp and w8a8 modes.

Usage: python -u tools/tpu_parity.py [frame_num]
Expected: cosine > 0.9999, max rel err < 1% (bf16 rounding differences).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    frame_num = int(sys.argv[1]) if len(sys.argv) > 1 else 21

    import bench as cfg_mod
    from wanq_tpu.configs import WAN_CONFIGS
    from wanq_tpu.models.dit import (
        init_params_on_device,
        linear_layer_names,
        make_scan_ctx,
        stack_block_params,
    )
    from wanq_tpu.pipelines.text2video import (
        compute_seq_len,
        compute_target_shape,
    )
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg = WAN_CONFIGS["t2v-1.3B"]
    target_shape = compute_target_shape(cfg, (832, 480), frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    params = stack_block_params(init_params_on_device(cfg, seed=0))
    # head.head is zero-init (DiT convention) — randomize it so the
    # comparison sees the full network, not an all-zero output
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    key = jax.random.PRNGKey(1)
    latents = jax.random.normal(key, (1, *target_shape), jnp.float32)
    t = jnp.asarray([500.0])
    c = jax.random.normal(key, (1, cfg.text_len, cfg.text_dim), jnp.float32)
    cn = jax.random.normal(jax.random.PRNGKey(2), c.shape, jnp.float32)
    gs = jnp.float32(5.0)

    lp = init_params_on_device(cfg, seed=0)
    qdict = dict(cfg_mod.FULL_W8A8)
    names = linear_layer_names(cfg)
    calib = {}
    for n in names:
        if n.endswith("ffn.2"):
            calib[f"{n}.act_max"] = np.full((1, cfg.ffn_dim), 6.0, np.float32)
            calib[f"{n}.act_min"] = np.full((1, cfg.ffn_dim), -6.0, np.float32)
    policies, state, rotations = prepare_quant_state(
        lp, names, QuantConfig.from_dict(qdict), targets="int8", calib=calib)
    del lp
    ctx = make_scan_ctx(
        QuantCtx(mode="int8", policies=policies, state=state,
                 rotations=rotations),
        cfg.num_layers,
    )

    results = {}
    from wanq_tpu.models.dit import dit_forward

    # compare the raw DiT forward (NOT the CFG-combined step: the
    # guidance combination uncond + g*(cond-uncond) amplifies benign bf16
    # path differences by ~(1+2g)) on a batched cond/uncond pair
    x2 = jnp.concatenate([latents, latents], axis=0)
    c2 = jnp.concatenate([c, cn], axis=0)
    t2 = jnp.concatenate([t, t], axis=0)
    for mode in ("fp", "w8a8"):
        mctx = ctx if mode == "w8a8" else None
        for fused in ("1", "0"):
            os.environ["WANQ_FUSED_QK"] = fused
            os.environ["WANQ_PALLAS_PRODUCERS"] = fused
            fwd = jax.jit(
                lambda p, q, x, t_, c_: dit_forward(p, cfg, x, t_, c_,
                                                    seq_len, ctx=q))
            out = fwd(params, mctx, x2, t2, c2)
            results[(mode, fused)] = np.asarray(out, np.float32)
            print(f"{mode} fused={fused}: done", flush=True)
        a, b = results[(mode, "1")], results[(mode, "0")]
        cos = float(
            (a * b).sum()
            / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
        rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
        print(f"{mode}: cosine {cos:.6f}  rel_err {rel:.5f}", flush=True)
        assert cos > 0.9999 and rel < 0.01, f"{mode} parity FAILED"
    # i2v fused cross-attention branch (k_img/v_img) — a 2-layer
    # i2v-shaped model at 1.3B width exercises the heads-major i2v path
    import dataclasses

    i2v_cfg = dataclasses.replace(
        WAN_CONFIGS["i2v-14B"], name="i2v-parity", dim=1536, ffn_dim=8960,
        num_heads=12, num_layers=2, text_len=512)
    ip = stack_block_params(init_params_on_device(i2v_cfg, seed=0))
    ip["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 ip["head"]["head"]["w"].shape)
    ).astype(ip["head"]["head"]["w"].dtype)
    xi = jax.random.normal(key, (1, 16, *target_shape[1:]), jnp.float32)
    yi = jax.random.normal(key, (1, 20, *target_shape[1:]), jnp.float32)
    clip_fea = jax.random.normal(key, (1, 257, 1280), jnp.float32)
    ci = jax.random.normal(key, (1, i2v_cfg.text_len, i2v_cfg.text_dim),
                           jnp.float32)
    outs = {}
    for fused in ("1", "0"):
        os.environ["WANQ_FUSED_QK"] = fused
        fwd = jax.jit(
            lambda p, x, t_, c_, cf, y_: dit_forward(
                p, i2v_cfg, x, t_, c_, seq_len, clip_fea=cf, y=y_))
        outs[fused] = np.asarray(fwd(ip, xi, t, ci, clip_fea, yi), np.float32)
        print(f"i2v fused={fused}: done", flush=True)
    a, b = outs["1"], outs["0"]
    cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))
    rel = float(np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12))
    print(f"i2v: cosine {cos:.6f}  rel_err {rel:.5f}", flush=True)
    assert cos > 0.9999 and rel < 0.01, "i2v parity FAILED"
    print("PARITY OK", flush=True)


if __name__ == "__main__":
    main()
