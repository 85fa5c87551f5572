"""SVDQuant low-rank branch at real Wan GEMM dims, on-chip (quant/svd.py).

Outlier-heavy regime on BOTH sides (per-input-channel lognormal weight
spread + hot activation channels — the published setting where 4-bit
RTN collapses): measures layer SQNR for plain RTN vs +lowrank vs the
full SVDQuant recipe (smooth ∘ lowrank) at W4A4 and W4A8, through the
REAL deployment paths (int8-mode qlinear: Atom group kernels / packed
W4A8 + the bf16 rank-32 branch), plus sim↔int8 parity.

Usage: python -u tools/svdquant_probe.py [C_in] [C_out] [rank]
       (defaults: 1536 8960 32 — the 1.3B ffn.0 shape)
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

from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx, qlinear
from wanq_tpu.quant.synthetic import outlier_channel_scales, sqnr_db


def main():
    args = [int(a) for a in sys.argv[1:] if not a.startswith("-")]
    C = args[0] if args else 1536
    O = args[1] if len(args) > 1 else 8960
    rank = args[2] if len(args) > 2 else 32
    M = 4096
    print(f"svdquant_probe: [{C}, {O}] rank={rank} on {jax.devices()[0]}",
          flush=True)

    rng = np.random.default_rng(0)
    wscale = outlier_channel_scales(C, n_hot=8, spread_sigma=1.0, seed=5)
    ascale = outlier_channel_scales(C, n_hot=8, hot_scale=60.0,
                                    spread_sigma=1.2, seed=9)
    w = rng.normal(size=(C, O)).astype(np.float32) * wscale[:, None]
    x_cal = (np.random.default_rng(1).normal(size=(M, C))
             * ascale[None, :]).astype(np.float32)
    x_test = (np.random.default_rng(2).normal(size=(M, C))
              * ascale[None, :]).astype(np.float32)
    params = {"lin": {"w": jnp.asarray(w)}}
    calib = {"lin": np.abs(x_cal).max(0)[None, :]}
    y_fp = x_test.astype(np.float64) @ w.astype(np.float64)

    sq = {"smooth_quant": {"alpha": 0.5665, "layer_name_regex": ""}}
    w4a4 = {"weight": {"n_bits": 4, "sym": True},
            "act": {"n_bits": 4, "sym": True, "group": 128}}
    w4a8 = {"weight": {"n_bits": 4, "sym": False},
            "act": {"n_bits": 8, "sym": True}}

    def lr(d):
        return {**d, "weight": dict(d["weight"], lowrank_rank=rank)}

    cases = [
        ("w4a4-rtn", w4a4, "int8"),
        (f"w4a4+lr{rank}", lr(w4a4), "int8"),
        ("w4a4-svdquant", {**lr(w4a4), **sq}, "int8"),
        ("w4a4-svdq-sim", {**lr(w4a4), **sq}, "sim"),
        ("w4a8-rtn", w4a8, "int8"),
        ("w4a8-svdquant", {**lr(w4a8), **sq}, "int8"),
    ]
    for tag, qd, mode in cases:
        t0 = time.time()
        pol, st, rot = prepare_quant_state(
            params, ["lin"], QuantConfig.from_dict(qd), calib=calib,
            targets="both")
        jax.block_until_ready(st)
        t_ptq = time.time() - t0
        ctx = QuantCtx(mode=mode, policies=pol, state=st, rotations=rot)
        t0 = time.time()
        y = np.asarray(qlinear(ctx, "lin", params["lin"],
                               jnp.asarray(x_test[None]),
                               compute_dtype=jnp.float32))
        print(f"{tag:>14}: SQNR {sqnr_db(y, y_fp[None]):6.2f} dB  "
              f"(ptq {t_ptq:5.1f}s, apply {time.time()-t0:5.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
