"""Synthetic outlier-heavy weight/activation distributions.

Every fidelity number in this repo is measured on random-init weights, and
Gaussian random weights are exactly the distribution where SmoothQuant's
channel mask (ref sq_quant_layer.py:27-34), QuaRot's rotations
(quarot_quant_layer.py:27-45) and GPTQ's Hessian compensation have the
least to do: no per-channel outliers, near-diagonal Hessians. The helpers
here construct the regime those methods were published for —

* activations with a handful of "hot" channels whose absmax sits 1-2
  orders of magnitude above the median (the fixed-channel outliers the
  SmoothQuant paper measures in OPT/GLM; LayerNorm preserves relative
  channel dominance, so injecting them at the residual-stream producers
  makes every downstream quantized input heavy-tailed);
* cross-channel correlation (a mixed covariance spectrum), which is what
  makes the GPTQ Hessian non-diagonal and error compensation worthwhile.

Used by tests/test_outlier_benefit.py (CPU regression: the methods must
RECOVER the degradation, in the published order) and tools/outlier_probe.py
(the same measurement at 1.3B dims on-chip).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def outlier_channel_scales(
    dim: int,
    n_hot: int,
    hot_scale: float = 100.0,
    spread_sigma: float = 0.0,
    seed: int = 0,
) -> np.ndarray:
    """Per-channel scale vector: lognormal spread + ``n_hot`` hot channels."""
    rng = np.random.default_rng(seed)
    s = (
        np.exp(rng.normal(0.0, spread_sigma, size=dim)).astype(np.float32)
        if spread_sigma > 0
        else np.ones(dim, np.float32)
    )
    hot = rng.choice(dim, n_hot, replace=False)
    s[hot] *= hot_scale
    return s


def inject_stream_outliers(params, cfg, chan_scale: np.ndarray):
    """Scale a sparse channel set at every residual-stream producer
    (patch_embedding output channels + each block's self_attn.o /
    cross_attn.o / ffn.2 output columns). LayerNorm downstream rescales
    the whole token vector but keeps the hot channels dominant, so every
    quantized linear input becomes outlier-heavy — the mechanism by which
    real transformer activation outliers survive normalization.

    Mutates (and returns) ``params``; expects the list form of
    ``blocks``. ``chan_scale``: [cfg.dim] from outlier_channel_scales.
    """
    assert chan_scale.shape == (cfg.dim,)
    sc = chan_scale.astype(np.float32)

    pe = np.asarray(params["patch_embedding"]["w"], np.float32)
    params["patch_embedding"]["w"] = jnp.asarray(pe * sc[None, :])

    def _cols(leaf):
        w = np.asarray(leaf["w"], np.float32)
        out = dict(leaf)
        out["w"] = jnp.asarray(w * sc[None, :])
        return out

    for blk in params["blocks"]:
        blk["self_attn"]["o"] = _cols(blk["self_attn"]["o"])
        blk["cross_attn"]["o"] = _cols(blk["cross_attn"]["o"])
        blk["ffn"]["2"] = _cols(blk["ffn"]["2"])
    return params


def correlated_outlier_acts(
    m: int,
    dim: int,
    n_hot: int,
    hot_scale: float = 60.0,
    spread_sigma: float = 1.2,
    corr_sigma: float = 1.0,
    seed: int = 0,
    draw_seed: int = 1,
) -> np.ndarray:
    """[m, dim] activations with hot channels AND cross-channel
    correlation. ``seed`` fixes the channel structure (scales + mixing —
    shared between calibration and held-out draws); ``draw_seed`` fixes
    the sample."""
    rng = np.random.default_rng(seed)
    cs = outlier_channel_scales(dim, n_hot, hot_scale, spread_sigma, seed)
    q, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    spec = np.exp(rng.normal(0.0, corr_sigma, size=dim))
    mix = (q * spec[None, :]) @ q.T
    z = np.random.default_rng(draw_seed).normal(size=(m, dim))
    return ((z @ mix) * cs[None, :]).astype(np.float32)


def sqnr_db(y_quant, y_ref) -> float:
    """Signal-to-quantization-noise ratio in dB (f64 accumulation)."""
    yq = np.asarray(y_quant, np.float64)
    yf = np.asarray(y_ref, np.float64)
    return float(10.0 * np.log10((yf**2).sum() / ((yq - yf) ** 2).sum()))
