"""Distillation trainer tests: loss decreases toward the frozen teacher's
CFG prediction, EMA tracks, guidance draw is deterministic."""

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import init_params
from wanq_tpu.training.distill import (
    DistillConfig,
    distill_step,
    draw_guidance,
    init_train_state,
    make_distill_step,
)


def test_draw_guidance_deterministic_and_in_range():
    g1 = draw_guidance(0, 5.0)
    assert g1 == draw_guidance(0, 5.0)
    for s in range(20):
        g = draw_guidance(s, 5.0)
        assert 3.0 <= g <= 10.0


def test_distill_step_reduces_loss(rng):
    cfg = tiny_config()
    from tests.conftest import randomize_head

    teacher = randomize_head(init_params(cfg, jax.random.PRNGKey(0)), seed=7)
    student = randomize_head(init_params(cfg, jax.random.PRNGKey(1)), seed=8)

    dcfg = DistillConfig(learning_rate=1e-3, seq_len=8)
    state, tx = init_train_state(student, dcfg)
    step_fn = make_distill_step(cfg, dcfg, tx)

    batch = {
        "x0": jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 4, 4)).astype(np.float32)),
        "noise": jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 4, 4)).astype(np.float32)),
        "t": jnp.asarray([500.0]),
        "context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)),
        "null_context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)),
    }

    losses = []
    for _ in range(8):
        state, info = distill_step(state, step_fn, teacher, batch, dcfg)
        losses.append(info["loss"])
        assert np.isfinite(info["loss"]) and np.isfinite(info["grad_norm"])
    assert losses[-1] < losses[0], losses

    # EMA moved but lags the raw params
    w0 = np.asarray(student["blocks"][0]["self_attn"]["q"]["w"])
    w_now = np.asarray(state.params["blocks"][0]["self_attn"]["q"]["w"])
    w_ema = np.asarray(state.ema_params["blocks"][0]["self_attn"]["q"]["w"])
    assert not np.array_equal(w0, w_now)
    assert np.abs(w_ema - w0).max() < np.abs(w_now - w0).max() + 1e-6
