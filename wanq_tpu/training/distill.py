"""CFG-schedule step distillation for the Wan DiT.

TPU-native rebuild of the reference's distillation trainer
(distill_with_cfg_sch_5s_exp0.py:560-660 and its distill_one_step):
the student learns to match the teacher's CFG-combined flow prediction in
a single forward, with a randomly drawn guidance scale per step, EMA
tracking, and grad clipping. The reference's FSDP + NCCL broadcast
machinery (rank-0 draws the cfg scale and broadcasts, :571-580) becomes a
seeded host draw in a single-controller program; sharding rides the same
GSPMD plan as inference.

The reference trainer depends on the external `fastvideo` package and is
vestigial in-repo; this module is the runnable TPU-native equivalent of
its documented capability.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wanq_tpu.configs import WanConfig
from wanq_tpu.models.dit import dit_forward


@dataclasses.dataclass(frozen=True)
class DistillConfig:
    learning_rate: float = 1e-5
    weight_decay: float = 1e-4
    max_grad_norm: float = 1.0
    ema_decay: float = 0.95  # ref args.ema_decay
    cfg_mid: float = 5.0  # ref args.cfg; per-step draw in [mid-2, mid+5]
    num_train_timesteps: int = 1000
    seq_len: int = 512
    # rematerialize each DiT block under autodiff (dit_forward remat=True):
    # activation memory O(1) blocks instead of O(layers) — required for
    # full-size training steps on one chip
    remat: bool = False


@dataclasses.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: int = 0


def init_train_state(params, cfg: DistillConfig) -> Tuple[TrainState, Any]:
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(cfg.learning_rate, weight_decay=cfg.weight_decay),
    )
    return TrainState(
        params=params,
        ema_params=jax.tree.map(jnp.copy, params),
        opt_state=tx.init(params),
    ), tx


def ema_update(ema, params, decay: float):
    """ref EMA tracking (distill loop)."""
    return jax.tree.map(lambda e, p: decay * e + (1.0 - decay) * p, ema, params)


def draw_guidance(seed: int, cfg_mid: float) -> float:
    """Per-step random guidance scale (ref :571-580: randint[mid-2, mid+5];
    deterministic seeded draw replaces the NCCL broadcast)."""
    rng = np.random.default_rng(seed)
    return float(rng.integers(int(cfg_mid) - 2, int(cfg_mid) + 6))


def make_distill_step(
    model_cfg: WanConfig,
    dcfg: DistillConfig,
    tx,
    plan=None,
) -> Callable:
    """Build the jitted distillation step.

    Loss: student v(x_t, t, c) ≈ teacher's CFG combination
    v_u(x_t,t,∅) + g·(v_c(x_t,t,c) − v_u(x_t,t,∅)), teacher frozen."""

    def loss_fn(params, teacher_params, x0, noise, t, context, null_context, g):
        sigma = (t / dcfg.num_train_timesteps)[:, None, None, None, None]
        xt = (1.0 - sigma) * x0 + sigma * noise
        v_student = dit_forward(
            params, model_cfg, xt, t, context, dcfg.seq_len, plan=plan,
            remat=dcfg.remat, training=True,
        )
        tcond = dit_forward(
            teacher_params, model_cfg, xt, t, context, dcfg.seq_len,
            plan=plan, training=True,
        )
        tuncond = dit_forward(
            teacher_params, model_cfg, xt, t, null_context, dcfg.seq_len,
            plan=plan, training=True,
        )
        v_teacher = jax.lax.stop_gradient(tuncond + g * (tcond - tuncond))
        return jnp.mean(jnp.square(v_student - v_teacher))

    @jax.jit
    def step(params, ema_params, opt_state, teacher_params, x0, noise, t,
             context, null_context, g):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, teacher_params, x0, noise, t, context, null_context, g
        )
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = ema_update(ema_params, params, dcfg.ema_decay)
        gnorm = optax.global_norm(grads)
        return params, ema_params, opt_state, loss, gnorm

    return step


def make_lora_distill_step(
    model_cfg: WanConfig,
    dcfg: DistillConfig,
    tx,
    plan=None,
) -> Callable:
    """LoRA-mode distillation: gradients flow only through the adapter
    tree; the base weights double as the frozen teacher (the reference's
    PEFT-on-FSDP training, whose checkpoints save_lora_checkpoint
    serializes — wan/checkpoint.py:248-287).

    The step signature mirrors make_distill_step with (lora, ema_lora,
    opt_state, base_params, ...) — base params are never updated."""
    from wanq_tpu.training.lora import apply_lora

    def loss_fn(lora, base_params, x0, noise, t, context, null_context, g):
        sigma = (t / dcfg.num_train_timesteps)[:, None, None, None, None]
        xt = (1.0 - sigma) * x0 + sigma * noise
        v_student = dit_forward(
            apply_lora(base_params, lora), model_cfg, xt, t, context,
            dcfg.seq_len, plan=plan, remat=dcfg.remat, training=True,
        )
        tcond = dit_forward(
            base_params, model_cfg, xt, t, context, dcfg.seq_len,
            plan=plan, training=True,
        )
        tuncond = dit_forward(
            base_params, model_cfg, xt, t, null_context, dcfg.seq_len,
            plan=plan, training=True,
        )
        v_teacher = jax.lax.stop_gradient(tuncond + g * (tcond - tuncond))
        return jnp.mean(jnp.square(v_student - v_teacher))

    @jax.jit
    def step(lora, ema_lora, opt_state, base_params, x0, noise, t,
             context, null_context, g):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, base_params, x0, noise, t, context, null_context, g
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        scale = lora.get("__scale__")
        lora = optax.apply_updates(lora, updates)
        if scale is not None:  # alpha/r stays a constant hyperparameter
            lora = dict(lora) | {"__scale__": scale}
        ema_lora = ema_update(ema_lora, lora, dcfg.ema_decay)
        gnorm = optax.global_norm(grads)
        return lora, ema_lora, opt_state, loss, gnorm

    return step


def make_qlora_distill_step(
    model_cfg: WanConfig,
    dcfg: DistillConfig,
    tx,
    plan=None,
    scan: bool = False,
) -> Callable:
    """QLoRA distillation: a FROZEN QUANTIZED base (sim-mode fake-quant
    matmuls — quantized at rest, dequantized for compute, the QLoRA
    training semantics) plus trainable rank-r adapters that ride the
    quant-state pytree (qlinear applies them on the raw layer input).
    The same quantized base WITHOUT adapters is the frozen teacher.

    This is what lets a 14B model fine-tune on a single 16 GB chip: the
    base lives as packed int4/int8 state (6.6 GiB at 14B W4), FP copies
    stripped, while gradients and optimizer state exist only for the
    O(rank·dim) adapters.

    ``scan``: the quant ctx came from make_scan_ctx (stacked base state);
    the adapters stack to scan xs per step (stack_lora). The step takes
    (lora, ema_lora, opt_state, params, qctx, ...) — ``qctx`` rides as a
    pytree ARGUMENT (closing over int8 state embeds GBs as HLO literals)
    and ``params`` carries the non-quantized leaves (embeddings, norms,
    biases; quantized weights may be stripped)."""
    from wanq_tpu.training.lora import (
        merge_lora_into_quant_state,
        merge_lora_into_scan_ctx,
    )

    def with_lora(qctx, lora):
        if scan:
            return merge_lora_into_scan_ctx(qctx, lora, model_cfg.num_layers)
        return qctx.replace(
            state=merge_lora_into_quant_state(qctx.state, lora)
        )

    def loss_fn(lora, params, qctx, x0, noise, t, context, null_context, g):
        sigma = (t / dcfg.num_train_timesteps)[:, None, None, None, None]
        xt = (1.0 - sigma) * x0 + sigma * noise
        v_student = dit_forward(
            params, model_cfg, xt, t, context, dcfg.seq_len, plan=plan,
            remat=dcfg.remat, training=True, ctx=with_lora(qctx, lora),
        )
        tcond = dit_forward(
            params, model_cfg, xt, t, context, dcfg.seq_len,
            plan=plan, training=True, ctx=qctx,
        )
        tuncond = dit_forward(
            params, model_cfg, xt, t, null_context, dcfg.seq_len,
            plan=plan, training=True, ctx=qctx,
        )
        v_teacher = jax.lax.stop_gradient(tuncond + g * (tcond - tuncond))
        return jnp.mean(jnp.square(v_student - v_teacher))

    @jax.jit
    def step(lora, ema_lora, opt_state, params, qctx, x0, noise, t,
             context, null_context, g):
        loss, grads = jax.value_and_grad(loss_fn)(
            lora, params, qctx, x0, noise, t, context, null_context, g
        )
        updates, opt_state = tx.update(grads, opt_state, lora)
        scale = lora.get("__scale__")
        lora = optax.apply_updates(lora, updates)
        if scale is not None:  # alpha/r stays a constant hyperparameter
            lora = dict(lora) | {"__scale__": scale}
        ema_lora = ema_update(ema_lora, lora, dcfg.ema_decay)
        gnorm = optax.global_norm(grads)
        return lora, ema_lora, opt_state, loss, gnorm

    return step


def distill_step(
    state: TrainState,
    step_fn: Callable,
    teacher_params,
    batch: Dict[str, jax.Array],
    dcfg: DistillConfig,
) -> Tuple[TrainState, Dict[str, float]]:
    """One outer step: draw guidance, run the jitted update, advance EMA."""
    g = draw_guidance(state.step, dcfg.cfg_mid)
    params, ema, opt_state, loss, gnorm = step_fn(
        state.params, state.ema_params, state.opt_state, teacher_params,
        batch["x0"], batch["noise"], batch["t"],
        batch["context"], batch["null_context"], jnp.float32(g),
    )
    new_state = TrainState(params, ema, opt_state, state.step + 1)
    return new_state, {"loss": float(loss), "grad_norm": float(gnorm),
                       "guidance": g}
