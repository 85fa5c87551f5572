"""On-chip QLoRA smoke: FULL-DEPTH 1.3B distillation steps against a
frozen packed-int4 base on the real int8/W4A8 kernels.

The FP train smoke (tools/train_smoke.py) caps at 12 of 30 layers —
teacher + student + AdamW moments exhaust one chip's HBM. QLoRA changes
the budget: ONE quantized base (W4 packed, FP copies stripped, ~0.8 GiB
at 1.3B) serves as both the frozen student base and the teacher, while
gradients and optimizer state exist only for the O(rank·dim) adapters.
The forward runs the actual int8 MXU kernels (weights int4 AT REST);
the backward is the STE rule dL/dx = g @ dequant(W)^T (qlinear._int8_ste)
plus exact adapter gradients.

Usage: python -u tools/qlora_smoke.py [steps] [model: 1.3b|14b]
Expected: finite decreasing loss at full depth. The 14b mode streams the
quantized base per layer (the deploy_14b_probe init — the FP 14B never
exists anywhere) and fine-tunes the 14-billion-parameter model on ONE
16 GB chip: ~6.6 GiB int4 base + rank-16 adapters + remat activations.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.models.dit import (
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state, strip_quantized_weights
from wanq_tpu.quant.qlinear import QuantCtx
from wanq_tpu.training import DistillConfig, make_qlora_distill_step
from wanq_tpu.training.lora import init_lora

W4A8 = {
    # quantize EVERY block linear (incl. cross k/v — at 14B their FP
    # copies alone would cost 4.2 GiB bf16; QLoRA's base must be fully
    # int-at-rest, matching the deploy probe's single-chip config)
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head"
    ),
    "weight": {"n_bits": 4, "sym": False},
    "act": {"n_bits": 8, "sym": True},
}
TARGETS = r"self_attn\.(q|k|v|o)|ffn\.(0|2)"


def log(m):
    print(m, flush=True)


def main(steps=4, model="1.3b"):
    if model == "14b":
        return main_14b(steps)
    cfg = WAN_CONFIGS["t2v-1.3B"]  # FULL depth: all 30 layers
    f, h, w = 3, 60, 104  # 832x480, 9 frames of latents
    seq = f * (h // 2) * (w // 2)
    log(f"QLoRA smoke: full {cfg.num_layers}-layer 1.3B, seq={seq} "
        f"on {jax.devices()[0]}")

    t0 = time.time()
    params = init_params_on_device(cfg, seed=0)
    params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(7),
                                 params["head"]["head"]["w"].shape)
    ).astype(params["head"]["head"]["w"].dtype)
    names = linear_layer_names(cfg)
    qcfg = QuantConfig.from_dict(W4A8)
    pol, state, rot = prepare_quant_state(params, names, qcfg, targets="int8")
    lora = init_lora(params, names, rank=16, seed=3, targets=TARGETS)
    params = strip_quantized_weights(params, pol)
    stacked = stack_block_params(params)
    qctx = make_scan_ctx(
        QuantCtx(mode="int8", policies=pol, state=state, rotations=rot),
        cfg.num_layers,
    )
    del params, state
    w_bytes = sum(
        v.nbytes for st in jax.tree.leaves(qctx.scan_state) for v in [st]
    )
    log(f"base built in {time.time()-t0:.1f}s: int4-at-rest quant state "
        f"{w_bytes/2**30:.2f} GiB, adapters rank 16")

    dcfg = DistillConfig(learning_rate=1e-4, seq_len=seq, remat=True)
    tx = optax.adamw(dcfg.learning_rate)
    step = make_qlora_distill_step(cfg, dcfg, tx, scan=True)
    opt_state = tx.init(lora)
    ema = jax.tree.map(lambda x: x, lora)

    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (1, cfg.in_dim, f, h, w), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(12), x0.shape, jnp.float32)
    t = jnp.asarray([500.0])
    txt = jax.random.normal(
        jax.random.PRNGKey(13), (1, cfg.text_len, cfg.text_dim), jnp.float32
    )
    null = jax.random.normal(
        jax.random.PRNGKey(14), (1, cfg.text_len, cfg.text_dim), jnp.float32
    )
    g = jnp.float32(3.0)

    for i in range(steps):
        t0 = time.time()
        lora, ema, opt_state, loss, gnorm = step(
            lora, ema, opt_state, stacked, qctx, x0, noise, t, txt, null, g
        )
        loss = float(loss)
        log(f"step {i}: loss {loss:.4f} gnorm {float(gnorm):.3e} "
            f"({time.time()-t0:.1f}s)")
        assert np.isfinite(loss)


def main_14b(steps=3):
    """14B QLoRA on ONE chip: streamed int4 base + rank-16 adapters."""
    cfg = WAN_CONFIGS["t2v-14B"]
    f, h, w = 3, 60, 104  # 832x480, 9 frames of latents
    seq = f * (h // 2) * (w // 2)
    log(f"QLoRA 14B: full {cfg.num_layers}-layer, seq={seq} "
        f"on {jax.devices()[0]}")
    qcfg = QuantConfig.from_dict(W4A8)
    from wanq_tpu.quant.stream import build_streamed_quant_base

    stacked, qctx, _ = build_streamed_quant_base(cfg, qcfg, log=log)

    from wanq_tpu.training.lora import init_lora_from_cfg

    lora = init_lora_from_cfg(cfg, rank=16, seed=3, targets=TARGETS)
    dcfg = DistillConfig(learning_rate=1e-4, seq_len=seq, remat=True)
    tx = optax.adamw(dcfg.learning_rate)
    step = make_qlora_distill_step(cfg, dcfg, tx, scan=True)
    opt_state = tx.init(lora)
    ema = jax.tree.map(lambda x: x, lora)

    key = jax.random.PRNGKey(11)
    x0 = jax.random.normal(key, (1, cfg.in_dim, f, h, w), jnp.float32)
    noise = jax.random.normal(jax.random.PRNGKey(12), x0.shape, jnp.float32)
    t = jnp.asarray([500.0])
    txt = jax.random.normal(
        jax.random.PRNGKey(13), (1, cfg.text_len, cfg.text_dim), jnp.float32
    )
    null = jax.random.normal(
        jax.random.PRNGKey(14), (1, cfg.text_len, cfg.text_dim), jnp.float32
    )
    g = jnp.float32(3.0)

    for i in range(steps):
        t0 = time.time()
        lora, ema, opt_state, loss, gnorm = step(
            lora, ema, opt_state, stacked, qctx, x0, noise, t, txt, null, g
        )
        loss = float(loss)
        log(f"step {i}: loss {loss:.4f} gnorm {float(gnorm):.3e} "
            f"({time.time()-t0:.1f}s)")
        assert np.isfinite(loss)


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 4,
        sys.argv[2] if len(sys.argv) > 2 else "1.3b",
    )
