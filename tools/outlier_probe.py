"""Method benefit under outlier-heavy distributions at 1.3B dims, on-chip.

The on-chip companion of tests/test_outlier_benefit.py (round-3 VERDICT
weak #2): constructs the regime SmoothQuant / QuaRot / ViDiT-Q / GPTQ were
published for — hot activation channels + cross-channel correlation — and
measures, at real Wan 1.3B shapes:

  A. layer-level SQNR of every method at the three Wan GEMM shapes,
     W8A8 (base / sq / quarot / viditq) and W4A8 (rtn / gptq / gptq+ao
     on held-out draws);
  B. full-model noise-pred PSNR at 1.3B with outliers injected at the
     residual-stream producers (through LayerNorm, real calibration,
     scan-over-blocks sim deployment);
  C. the capacity planner's measured-error class ordering under
     per-input-channel weight spread (does the knapsack-greedy keep a
     sane order when classes differ for real?).

Usage: python -u tools/outlier_probe.py [frame_num]   (default 9)
Results land in BENCH_NOTES.md (round 4).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.models.dit import (
    dit_forward,
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import (
    prepare_quant_state,
    prepare_quant_state_stacked,
)
from wanq_tpu.quant.qlinear import QuantCtx, qlinear
from wanq_tpu.quant.synthetic import (
    correlated_outlier_acts,
    inject_stream_outliers,
    outlier_channel_scales,
    sqnr_db,
)

W8 = {"weight": {"n_bits": 8, "sym": False}, "act": {"n_bits": 8, "sym": True}}
METHODS = [
    ("base", W8),
    ("sq", dict(W8, smooth_quant={"alpha": 0.5665, "layer_name_regex": ""})),
    ("quarot", dict(W8, quarot={"layer_name_regex": ""})),
    ("viditq", dict(W8, viditq={"alpha": 0.5665, "layer_name_regex": ""})),
]
W4 = {"weight": {"n_bits": 4, "sym": False}, "act": {"n_bits": 8, "sym": True}}
W4_METHODS = [
    ("rtn", W4),
    ("gptq", {**W4, "weight": dict(W4["weight"], gptq=True)}),
    ("gptq+ao", {**W4, "weight": dict(W4["weight"], gptq=True,
                                      gptq_act_order=True)}),
]


def layer_level():
    print("== A. layer-level SQNR at Wan 1.3B GEMM shapes "
          "(hot channels + correlation; held-out draw) ==", flush=True)
    m = 4096
    for kk, nn, tag in [(1536, 1536, "qkv/o"), (1536, 8960, "ffn.0"),
                        (8960, 1536, "ffn.2")]:
        rng = np.random.default_rng(kk + nn)
        x_cal = correlated_outlier_acts(m, kk, n_hot=max(4, kk // 256),
                                        seed=kk, draw_seed=1)
        x_test = correlated_outlier_acts(m, kk, n_hot=max(4, kk // 256),
                                         seed=kk, draw_seed=2)
        w = (rng.normal(size=(kk, nn)).astype(np.float32)
             * np.exp(rng.normal(0, 0.3, size=(kk, 1))).astype(np.float32))
        params = {"lin": {"w": jnp.asarray(w)}}
        calib = {
            "lin": np.abs(x_cal).max(0)[None, :],
            "lin.hess": jnp.asarray(x_cal.T @ x_cal)[None],
        }
        y_fp = x_test.astype(np.float64) @ w.astype(np.float64)
        xt = jnp.asarray(x_test[None])
        row8, row4 = [], []
        with jax.default_matmul_precision("highest"):
            for name, qd in METHODS + W4_METHODS:
                qcfg = QuantConfig.from_dict(qd)
                pol, st, rot = prepare_quant_state(
                    params, ["lin"], qcfg, calib=calib, targets="sim",
                    rotate_on_device=True,
                )
                ctx = QuantCtx(mode="sim", policies=pol, state=st,
                               rotations=rot)
                y = qlinear(ctx, "lin", params["lin"], xt,
                            compute_dtype=jnp.float32)
                db = sqnr_db(np.asarray(y)[0], y_fp)
                (row8 if qd["weight"]["n_bits"] == 8 else row4).append(
                    f"{name} {db:6.2f}")
        print(f"  [{kk:5d}x{nn:5d}] ({tag:6s}) W8A8: " + "  ".join(row8),
              flush=True)
        print(f"  {'':22s} W4A8: " + "  ".join(row4), flush=True)


def model_level(frame_num: int, draw: int = 0):
    """``draw`` offsets the latent/context keys — re-running B across
    draws measures whether the method deltas are systematic or inside
    the random-init draw-dependence (BENCH_NOTES outlier section)."""
    print(f"== B. full-model 1.3B noise-pred PSNR, outlier-injected init "
          f"(480p x {frame_num}f, draw {draw}) ==", flush=True)
    cfg = WAN_CONFIGS["t2v-1.3B"]
    target_shape = compute_target_shape(cfg, (832, 480), frame_num)
    seq_len = compute_seq_len(cfg, target_shape)

    t0 = time.time()
    params = stack_block_params(params_list(cfg))
    jax.block_until_ready(params)
    # free the list-form copy: every sim state below is built straight
    # from the STACKED params (prepare_quant_state_stacked) — holding
    # list + stacked + sim w_q state at 1.3B f32 OOMs the 16 GiB chip
    _INJECTED.clear()
    print(f"  init+inject: {time.time()-t0:.1f}s", flush=True)

    lat = jax.random.normal(jax.random.PRNGKey(1 + 100 * draw),
                            (1, *target_shape), jnp.float32)
    t = jnp.asarray([999.0])
    context = jax.random.normal(jax.random.PRNGKey(2 + 100 * draw),
                                (1, cfg.text_len, cfg.text_dim), jnp.float32)

    def fwd(p, qctx, x):
        return dit_forward(p, cfg, x, t, context, seq_len, ctx=qctx)

    fwd_j = jax.jit(fwd)

    # calibration (per-channel absmax through the outlier-heavy stream)
    def calib_step(p, x):
        cctx = QuantCtx(mode="calib")
        out = dit_forward(p, cfg, x, t, context, seq_len, ctx=cctx)
        return out, cctx.collect

    t0 = time.time()
    _, stats = jax.jit(calib_step)(params, lat)
    calib = {k: np.asarray(v)[None] for k, v in stats.items()}
    am = calib["blocks.0.self_attn.q"][0]
    print(f"  calib: {len(calib)} entries in {time.time()-t0:.1f}s; "
          f"qkv-input absmax max/median = "
          f"{float(am.max()/np.median(am)):.1f}", flush=True)

    fp = np.asarray(fwd_j(params, None, lat))

    def psnr(a):
        a = np.asarray(a, np.float64)
        return 20 * np.log10((fp.max() - fp.min())
                             / np.sqrt(((a - fp) ** 2).mean()))

    fp_regex = r"text_embedding|time_embedding|time_projection|head\.head"

    def run_cfg(tag, qd):
        t0 = time.time()
        qcfg = QuantConfig.from_dict(dict(qd, remain_fp_regex=fp_regex))
        # sim states sliced straight from the stacked forward params into
        # pre-allocated scan buffers (one layer + final state resident)
        pol, scan_state, rot = prepare_quant_state_stacked(
            params["blocks"], cfg.num_layers, qcfg, calib=calib,
            targets="sim",
        )
        ctx = QuantCtx(mode="sim", policies=pol, state={}, rotations=rot)
        ctx.scan_state = scan_state
        jax.block_until_ready(ctx.scan_state)
        out = fwd_j(params, ctx, lat)
        print(f"  {tag:10s} PSNR {psnr(out):6.2f} dB   "
              f"({time.time()-t0:.0f}s)", flush=True)

    for tag, qd in METHODS:
        run_cfg(tag, qd)

    if "--w4" in sys.argv:
        # 4-bit lanes ± the SVDQuant low-rank branch (quant/svd.py): the
        # regime the branch exists for — RTN W4A4 collapses under the
        # injected stream outliers, smooth∘lowrank recovers it
        w4a4 = {"weight": {"n_bits": 4, "sym": True},
                "act": {"n_bits": 4, "sym": True, "group": 128}}
        w4a8 = {"weight": {"n_bits": 4, "sym": False},
                "act": {"n_bits": 8, "sym": True}}
        sq = {"smooth_quant": {"alpha": 0.5665, "layer_name_regex": ""}}

        def lr(d):
            return {**d, "weight": dict(d["weight"], lowrank_rank=32)}

        for tag, qd in [("w4a8-rtn", w4a8),
                        ("w4a8-svdq", {**lr(w4a8), **sq}),
                        ("w4a4-rtn", w4a4),
                        ("w4a4-svdq", {**lr(w4a4), **sq})]:
            run_cfg(tag, qd)


_INJECTED = {}


def params_list(cfg):
    """List-form params with the SAME outlier injection as model_level's
    stacked forward params (PTQ consumes list form)."""
    key = cfg.name
    if key not in _INJECTED:
        lp = init_params_on_device(cfg, seed=0)
        lp["head"]["head"]["w"] = (
            0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                     lp["head"]["head"]["w"].shape)
        ).astype(lp["head"]["head"]["w"].dtype)
        sc = outlier_channel_scales(cfg.dim, n_hot=cfg.dim // 32,
                                    hot_scale=100.0, seed=5)
        _INJECTED[key] = inject_stream_outliers(lp, cfg, sc)
    return _INJECTED[key]


def planner_ordering():
    print("== C. planner class ordering under per-input-channel weight "
          "spread (1.3B dims) ==", flush=True)
    from wanq_tpu.quant.planner import (
        block_linear_dims,
        measure_class_errors,
        plan_capacity_bits,
        class_weight_bytes,
    )

    cfg = WAN_CONFIGS["t2v-1.3B"]
    rng = np.random.default_rng(11)
    weights = {}
    for name, (ci, co) in block_linear_dims(cfg).items():
        spread = np.exp(rng.normal(0, 1.0, size=(ci, 1))).astype(np.float32)
        weights[name] = rng.normal(size=(ci, co)).astype(np.float32) * spread
    errs = measure_class_errors(weights)
    order = sorted(errs, key=lambda c: errs[c][1] - errs[c][0])
    print("  measured W4 rel-err per class (spread weights):", flush=True)
    for c in order:
        print(f"    {c:14s} w4 {errs[c][0]:.4f}  w8 {errs[c][1]:.4f}", flush=True)
    b4 = sum(class_weight_bytes(cfg, 4).values())
    b8 = sum(class_weight_bytes(cfg, 8).values())
    plan = plan_capacity_bits(cfg, int(b4 + 0.5 * (b8 - b4)), errors=errs)
    print(f"  50%-budget plan upgrades (error-greedy): {plan.upgraded}",
          flush=True)
    plan_d = plan_capacity_bits(cfg, int(b4 + 0.5 * (b8 - b4)))
    print(f"  50%-budget plan upgrades (default prior): {plan_d.upgraded}",
          flush=True)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    frame_num = int(pos[0]) if pos else 9
    draws = [int(a.split("=", 1)[1]) for a in sys.argv[1:]
             if a.startswith("--draw=")] or [0]
    only_b = "--only_b" in sys.argv
    print(f"outlier probe on {jax.devices()[0]}", flush=True)
    if not only_b:
        layer_level()
    for d in draws:
        model_level(frame_num, draw=d)
    if not only_b:
        planner_ordering()


if __name__ == "__main__":
    main()
