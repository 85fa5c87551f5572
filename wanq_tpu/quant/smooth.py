"""SmoothQuant channel scaling (ref: qdiff/smooth_quant/sq_quant_layer.py:27-44
and qdiff/viditq/viditq_quant_layer.py:30-50).

channel_mask = |w_absmax|^alpha / |a_absmax|^(1-alpha)   per input channel.

Forward: activations are *multiplied* by the mask before act-quant; the weight
is *divided* by it (per input channel) before weight-quant, so the FP product
is unchanged while outlier energy migrates from activations into weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def channel_mask(w_in_out: jax.Array, act_absmax: jax.Array, alpha: float) -> jax.Array:
    """Per-input-channel SmoothQuant mask, shape [C_in].

    w_in_out: [C_in, C_out] weight (our layout; the reference's [C_out, C_in]
    row-max over dim 0 becomes a column-max over dim 1 here).
    act_absmax: [C_in] per-channel activation absmax from calibration,
    clamped ≥ 1e-3 upstream (ref: ptq_wanx.py:336-341).
    """
    w_absmax = jnp.max(jnp.abs(w_in_out.astype(jnp.float32)), axis=1)
    mask = jnp.abs(w_absmax) ** alpha / jnp.abs(act_absmax.astype(jnp.float32)) ** (1.0 - alpha)
    return mask


def clamp_act_absmax(act_absmax: jax.Array, floor: float = 1e-3) -> jax.Array:
    """ref: ptq_wanx.py:336-341 — calibration absmax clamped to ≥ 1e-3."""
    return jnp.maximum(act_absmax, floor)
