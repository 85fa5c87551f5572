"""On-chip training-step smoke: CFG-distillation forward+backward+AdamW
at full 1.3B width on the attached TPU (12 of 30 layers, so
teacher + student + AdamW moments fit one chip's HBM — full-depth 1.3B
training is the FSDP mesh's job; the multichip dryrun covers that).

Exercises the differentiable-path routing: dit_forward(training=True)
swaps the fwd-only splash / Pallas fast paths for the flash kernel with
backward block sizes, and remat=True bounds activation memory to O(1)
blocks under autodiff.

Usage: python -u tools/train_smoke.py
Expected: finite decreasing loss, ~1.1 s/step at 832x480 x 9 frames.
"""

from __future__ import annotations

import dataclasses
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
from wanq_tpu.models.dit import init_params_on_device, stack_block_params
from wanq_tpu.training.distill import (
    DistillConfig,
    distill_step,
    init_train_state,
    make_distill_step,
)


def rand_head(p, seed):
    # head.head is zero-init (DiT convention) — randomize it so the loss
    # sees the full network instead of identically-zero outputs
    p["head"]["head"]["w"] = (
        0.02 * jax.random.normal(jax.random.PRNGKey(seed),
                                 p["head"]["head"]["w"].shape)
    ).astype(p["head"]["head"]["w"].dtype)
    return p


def main():
    cfg = dataclasses.replace(WAN_CONFIGS["t2v-1.3B"], num_layers=12)
    f, h, w = 3, 60, 104  # 832x480, 9 frames of latents
    seq = f * (h // 2) * (w // 2)

    teacher = stack_block_params(
        rand_head(init_params_on_device(cfg, seed=0), 7))
    student = stack_block_params(
        rand_head(init_params_on_device(cfg, seed=1), 8))
    dcfg = DistillConfig(learning_rate=1e-5, seq_len=seq, remat=True)
    state, tx = init_train_state(student, dcfg)
    step_fn = make_distill_step(cfg, dcfg, tx)
    key = jax.random.PRNGKey(0)
    batch = {
        "x0": jax.random.normal(key, (1, cfg.in_dim, f, h, w), jnp.float32),
        "noise": jax.random.normal(key, (1, cfg.in_dim, f, h, w), jnp.float32),
        "t": jnp.asarray([500.0]),
        "context": jax.random.normal(
            key, (1, cfg.text_len, cfg.text_dim), jnp.float32),
        "null_context": jax.random.normal(
            key, (1, cfg.text_len, cfg.text_dim), jnp.float32),
    }
    t0 = time.time()
    state, info = distill_step(state, step_fn, teacher, batch, dcfg)
    loss0 = float(info["loss"])
    print(f"first step (incl. compile): {time.time()-t0:.1f}s "
          f"loss={loss0:.4f} gnorm={float(info['grad_norm']):.3f}",
          flush=True)
    t0 = time.time()
    for _ in range(3):
        state, info = distill_step(state, step_fn, teacher, batch, dcfg)
    jax.block_until_ready(state.params)
    loss = float(info["loss"])
    print(f"steady: {(time.time()-t0)/3*1000:.0f} ms/step loss={loss:.4f}",
          flush=True)
    assert np.isfinite(loss) and loss < loss0, (loss, loss0)
    print("TRAIN SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
