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

import pytest

pytestmark = pytest.mark.slow


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


def test_lora_distill_step_trains_only_adapters(rng):
    """LoRA-mode distillation: base params frozen (they are the teacher),
    adapters move, loss decreases, __scale__ stays a constant."""
    from wanq_tpu.models.dit import linear_layer_names
    from wanq_tpu.training.distill import make_lora_distill_step
    from wanq_tpu.training.lora import init_lora

    cfg = tiny_config()
    from tests.conftest import randomize_head

    base = randomize_head(init_params(cfg, jax.random.PRNGKey(0)), seed=7)
    lora = init_lora(base, linear_layer_names(cfg), rank=2, seed=1)

    dcfg = DistillConfig(learning_rate=1e-2, seq_len=8)
    state, tx = init_train_state(lora, dcfg)
    step_fn = make_lora_distill_step(cfg, dcfg, tx)

    batch = {
        "x0": jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 4, 4)).astype(np.float32)),
        "noise": jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 4, 4)).astype(np.float32)),
        "t": jnp.asarray([500.0]),
        "context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)),
        "null_context": jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)),
    }

    lora_t, ema_t, opt_t = state.params, state.ema_params, state.opt_state
    losses = []
    for i in range(6):
        g = jnp.float32(draw_guidance(i, dcfg.cfg_mid))
        lora_t, ema_t, opt_t, loss, gnorm = step_fn(
            lora_t, ema_t, opt_t, base,
            batch["x0"], batch["noise"], batch["t"],
            batch["context"], batch["null_context"], g)
        losses.append(float(loss))
        assert np.isfinite(float(loss)) and np.isfinite(float(gnorm))
    assert losses[-1] < losses[0], losses
    # adapters moved; the scale hyperparameter did not
    b0 = np.asarray(lora_t["blocks.0.self_attn.q"]["b"])
    assert not np.allclose(b0, 0)
    np.testing.assert_allclose(
        float(lora_t["__scale__"]), float(lora["__scale__"]))
