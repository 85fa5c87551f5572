"""Run a REAL Wan 14B W4A8 denoise step on ONE v5e chip.

The reference cannot run 14B on a single 16 GB accelerator at all
(28 GB bf16 weights; its 14B path requires multi-GPU FSDP). Packed-int4
weights (~7 GB) change that. The FP 14B model also never fits host or
device at once here, so this probe STREAMS: one transformer block is
generated on-device, each linear is int4-quantized (per-channel, packed
two-per-byte), the FP copy is discarded, and the quant state lands
STRAIGHT in the pre-allocated stacked scan arrays (donated
dynamic-update-slice), repeat x40 — peak extra residency is one block
of FP workspace + one block of state. (The earlier stack-then-free
build held 2x the full weight state transiently, which capped mixed
W4/W8 plans at ~6.6 GiB; the incremental fill removes that cap.)

Usage: python -u tools/deploy_14b_probe.py [frame_num] [batch] [res] [variant] [cfg]
Defaults 41 frames, B=1 (single-stream; CFG pairs double activation
memory), res 480 (pass 720 for the north-star 1280x720 shape).
Pass ``cfg`` as the 5th arg to time a REAL classifier-free-guidance
step: cond + uncond forwards SEQUENTIALLY through the same jitted fn
(the reference's batched-CFG doubles activation memory, which at 720p
seq 75776 does not fit next to the 14B weight state on 16 GB — the
sequential pair is the production schedule at this shape) and the
guide-scale combine, timed as one denoise step.
variant ``static`` adds static-A8 on ffn.2 (the fused GELU+quant GEMM
epilogue): the dynamic producer materializes the ffn.0 output in bf16
(seq x ffn_dim = 2.1 GB/block at 720p) for the row-absmax re-read; the
frozen scale makes it elementwise, so the intermediate never lands in
HBM — at deploy the chip is near-full and that peak-memory cut buys
XLA scheduling freedom (per-block cost without pressure is identical:
tools/ratio_14b_probe.py w4a8 variant, 923 vs 928 ms/block).
Prints weight-state bytes, compile+step time, output norm.
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
from wanq_tpu.models.dit import dit_forward
from wanq_tpu.pipelines.text2video import compute_seq_len, compute_target_shape
from wanq_tpu.quant import QuantConfig

W4A8 = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head"
    ),
    "weight": {"n_bits": 4, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}


def main():
    frame_num = int(sys.argv[1]) if len(sys.argv) > 1 else 41
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    res = int(sys.argv[3]) if len(sys.argv) > 3 else 480
    variant = sys.argv[4] if len(sys.argv) > 4 else "dyn"
    cfg_pair = len(sys.argv) > 5 and sys.argv[5] == "cfg"

    cfg = WAN_CONFIGS["t2v-14B"]
    qdict = dict(W4A8)
    if variant == "static":
        qdict["act"] = {**qdict["act"], "static_regex": r"ffn\.2"}
    elif variant == "mixed":
        # capacity-aware mixed precision: fill the HBM left over by the
        # step's activations/temps with W8 upgrades on the most sensitive
        # classes (quant/planner.py). Measured fits on this v5e (with the
        # incremental stacked build below): 720p 8.0 GiB (W8 ffn.2,
        # 36.74 s/step), 480p 9.5 GiB (W8 ffn.2+o+o+v, 8.35 s/step —
        # faster than all-W4). Override with WANQ_WEIGHT_BUDGET_GIB.
        from wanq_tpu.quant.planner import plan_capacity_bits

        budget = float(os.environ.get(
            "WANQ_WEIGHT_BUDGET_GIB", "9.5" if res != 720 else "8.0"))
        plan = plan_capacity_bits(
            cfg, int(budget * 2**30),
            act={"n_bits": 8, "sym": True, "static_regex": r"ffn\.2"})
        print(plan.report(), flush=True)
        qdict = plan.config
    qcfg = QuantConfig.from_dict(qdict)
    size = (1280, 720) if res == 720 else (832, 480)
    target_shape = compute_target_shape(cfg, size, frame_num)
    seq_len = compute_seq_len(cfg, target_shape)
    print(f"14B W4A8 single-chip probe: {res}p x {frame_num}f, B={batch}, "
          f"seq {seq_len}", flush=True)

    from wanq_tpu.quant.stream import build_streamed_quant_base

    # streamed per-layer quantized init (quant/stream.py): the FP 14B
    # never exists — each block is jit workspace, its int state writes
    # into pre-allocated stacked scan arrays (donated updates, peak extra
    # residency ONE block), FP copies stripped
    params, ctx, total_qbytes = build_streamed_quant_base(
        cfg, qcfg, log=lambda m: print(m, flush=True))
    print(f"quantized weight state: {total_qbytes/2**30:.2f} GiB "
          f"(bf16 blocks would be ~27 GiB)", flush=True)

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (batch, *target_shape), jnp.float32)
    t = jnp.full((batch,), 500.0, jnp.float32)
    c = jax.random.normal(key, (batch, cfg.text_len, cfg.text_dim),
                          jnp.float32)

    fwd = jax.jit(
        lambda p, q, x, t_, c_: dit_forward(p, cfg, x, t_, c_, seq_len,
                                            ctx=q))
    def fence(o):
        # scalar fetch — block_until_ready under-reports on this relayed
        # backend (see .claude/skills/verify)
        return float(jnp.sum(o.astype(jnp.float32)))

    t0 = time.time()
    out = fwd(params, ctx, x, t, c)
    fence(out)
    print(f"first step (incl. compile): {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    out = fwd(params, ctx, 1.001 * x, t, c)
    fence(out)
    dt = time.time() - t0
    n = float(jnp.linalg.norm(out))
    finite = bool(jnp.all(jnp.isfinite(out)))
    print(f"steady step: {dt*1000:.0f} ms  out norm {n:.3f} finite={finite}",
          flush=True)
    assert finite

    if cfg_pair:
        # real CFG denoise step at this shape: cond + uncond sequential
        # (same compiled fn; context is an argument, not a constant) +
        # guide-scale combine (ref text2video.py:249-254 semantics)
        c_null = jax.random.normal(jax.random.PRNGKey(7),
                                   (batch, cfg.text_len, cfg.text_dim),
                                   jnp.float32)
        guide = 5.0
        combine = jax.jit(lambda u, cnd: u + guide * (cnd - u))
        fence(combine(out, out))  # compile the combine outside the timing
        t0 = time.time()
        n_cond = fwd(params, ctx, 1.002 * x, t, c)
        n_unc = fwd(params, ctx, 1.002 * x, t, c_null)
        noise = combine(n_unc, n_cond)
        fence(noise)
        dt_cfg = time.time() - t0
        print(f"REAL CFG pair step (sequential cond+uncond+combine): "
              f"{dt_cfg:.1f} s/step at {res}p x {frame_num}f B={batch}",
              flush=True)
    print("14B W4A8 SINGLE-CHIP OK", flush=True)


if __name__ == "__main__":
    main()
