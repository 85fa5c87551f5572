"""Pure-function quantizers (TPU-native redesign of the reference's stateful
``BaseQuantizer``/``StaticQuantizer``/``DynamicQuantizer`` modules,
ref: ViDiT-Q/quant_utils/qdiff/base/base_quantizer.py:13-206 and
mixed_precision_quantizer.py:15-186).

The reference keeps running min/max buffers inside nn.Modules and mutates
``delta``/``zero_point`` in place. Here every quantizer is a pure function:
quant params are *returned* (and stored in an explicit quant-state pytree,
see :mod:`wanq_tpu.quant.state`), which makes them jit/scan/shard-friendly.

Quantization math (matching the reference exactly):

symmetric  (sym=True):
    n_levels = 2**(n_bits-1) - 1            (127 for 8 bits)
    delta    = absmax / n_levels,  zero_point = 0
asymmetric (sym=False):
    n_levels = 2**n_bits                    (256 for 8 bits)
    x_max    = max(x, 0) per group;  x_min = min(x, 0) per group
    delta    = (x_max - x_min) / (n_levels - 1)
    zero_point = round(x_min / delta) + n_levels/2

quantize:   q = clamp(round(x/delta) - zp, -n_levels - 1, n_levels)
dequantize: x' = (q + zp) * delta

Group convention: input is reshaped to [G, -1]; one (delta, zp) per group row.
Weights use per-output-channel groups; activations use per-token groups.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

# eps clamps mirror the reference (base_quantizer.py:122-128 sym, :141-148 asym)
_EPS_SYM = 1e-6
_EPS_ASYM = 1e-8


def nan_guard(x: jax.Array, name: str) -> jax.Array:
    """Opt-in in-path debug assertion — the reference's pervasive runtime
    nan checks and delta>eps ipdb fallbacks (base_quantizer.py:94-97,
    :113, :145) in their idiomatic-JAX form: under ``WANQ_DEBUG_NANCHECK=1``
    a host callback raises FloatingPointError on non-finite values flowing
    through the quantizers (works inside jit; on TPU the callback is
    asynchronous, so the error surfaces at the next sync point). When the
    env var is unset this is a trace-time no-op with zero runtime cost.
    """
    if os.environ.get("WANQ_DEBUG_NANCHECK", "0") != "1":
        return x

    def _chk(v):
        if not np.isfinite(v).all():
            raise FloatingPointError(
                f"non-finite values in {name}: "
                f"nan={int(np.isnan(v).sum())} inf={int(np.isinf(v).sum())}"
            )

    jax.debug.callback(_chk, x)
    return x


@dataclasses.dataclass(frozen=True)
class QuantizerCfg:
    """Static quantizer configuration (hashable; safe as a jit static arg).

    ``n_bits`` may be a tuple for mixed precision (ref:
    mixed_precision_quantizer.py:29-31); ``i_bitwidth`` selects the active
    entry. ``dynamic`` selects per-call params (DynamicQuantizer) vs
    calibration-frozen params (StaticQuantizer, base_quantizer.py:43-99);
    weights are always static, activations default to dynamic (the Wan
    config) with a config-selectable static-A8 mode.
    """

    n_bits: Union[int, Tuple[int, ...]] = 8
    sym: bool = False
    i_bitwidth: int = 0
    dynamic: bool = True

    @property
    def is_mixed(self) -> bool:
        return isinstance(self.n_bits, (tuple, list))

    @property
    def active_bits(self) -> int:
        if self.is_mixed:
            return int(self.n_bits[self.i_bitwidth])
        return int(self.n_bits)

    @property
    def bitwidth_list(self) -> Tuple[int, ...]:
        if self.is_mixed:
            return tuple(int(b) for b in self.n_bits)
        return (int(self.n_bits),)

    def with_bitwidth(self, i_bitwidth: int) -> "QuantizerCfg":
        """Reference ``bitwidth_refactor`` (mixed_precision_quantizer.py:50-54)."""
        return dataclasses.replace(self, i_bitwidth=i_bitwidth)


def n_levels_for(n_bits: int, sym: bool) -> int:
    """ref: base_quantizer.py:32."""
    return 2 ** (n_bits - 1) - 1 if sym else 2**n_bits


def compute_quant_params(
    x: jax.Array, n_bits: int, sym: bool
) -> Tuple[jax.Array, jax.Array]:
    """Per-group-row (delta, zero_point), each shaped [G, 1].

    x: [G, -1]. Matches DynamicQuantizer.quantize (base_quantizer.py:110-152)
    including the eps clamping of tiny deltas.
    """
    assert x.ndim == 2, f"expected [G, -1], got {x.shape}"
    nl = n_levels_for(n_bits, sym)
    xf = nan_guard(x.astype(jnp.float32), "compute_quant_params.x")
    if sym:
        absmax = jnp.max(jnp.abs(xf), axis=1)
        delta = absmax / nl
        delta = jnp.where(delta < _EPS_SYM, _EPS_SYM, delta)
        zp = jnp.zeros_like(delta)
    else:
        x_max = jnp.maximum(jnp.max(xf, axis=1), 0.0)
        x_min = jnp.minimum(jnp.min(xf, axis=1), 0.0)
        delta = (x_max - x_min) / (nl - 1)
        delta = jnp.where(delta < _EPS_ASYM, _EPS_ASYM, delta)
        zp = jnp.round(x_min / delta) + (nl / 2)
    return delta[:, None], zp[:, None]


def round_ste(x: jax.Array) -> jax.Array:
    """Straight-through round: exact round in the forward pass, identity
    in the backward pass. The inference numerics are bit-identical to
    jnp.round; under autodiff (QLoRA / QAT through the sim path) the
    quantizer stops killing gradients. The reference never trains through
    its quantizers (plain torch.round, base_quantizer.py:66), so this is
    forward-compatible with its semantics."""
    return x + jax.lax.stop_gradient(jnp.round(x) - x)


def quantize(
    x: jax.Array, delta: jax.Array, zp: jax.Array, n_bits: int, sym: bool
) -> jax.Array:
    """q = clamp(round(x/delta) - zp, -nl-1, nl). ref: base_quantizer.py:66-67."""
    nl = n_levels_for(n_bits, sym)
    q = round_ste(x.astype(jnp.float32) / delta) - zp
    return jnp.clip(q, -nl - 1, nl)


def dequantize(q: jax.Array, delta: jax.Array, zp: jax.Array) -> jax.Array:
    """x' = (q + zp) * delta. ref: base_quantizer.py:60."""
    return (q + zp) * delta


def fake_quant(
    x: jax.Array, delta: jax.Array, zp: jax.Array, n_bits: int, sym: bool
) -> jax.Array:
    """Quantize-then-dequantize with given params."""
    return nan_guard(
        dequantize(quantize(x, delta, zp, n_bits, sym), delta, zp),
        "fake_quant.out")


def dynamic_fake_quant(x: jax.Array, cfg: QuantizerCfg) -> jax.Array:
    """DynamicQuantizer.forward: per-call params from x itself.

    x: [G, -1] (per-token groups for activations).
    ref: base_quantizer.py:159-162.
    """
    n_bits = cfg.active_bits
    delta, zp = compute_quant_params(x, n_bits, cfg.sym)
    return fake_quant(x, delta, zp, n_bits, cfg.sym).astype(x.dtype)


# ---------------------------------------------------------------------------
# Static (weight) quantization. The reference accumulates running min/max
# across calls; for weights there is a single call at PTQ time, so the pure
# one-shot computation below is exact. Running accumulation (for multi-batch
# static act quant) is provided via `merge_minmax`.
# ---------------------------------------------------------------------------


def static_quant_params(
    x: jax.Array, cfg: QuantizerCfg
) -> Tuple[jax.Array, jax.Array]:
    """One-shot static params for the active bitwidth. x: [G, -1]."""
    return compute_quant_params(x, cfg.active_bits, cfg.sym)


def static_quant_params_all_bitwidths(
    x: jax.Array, cfg: QuantizerCfg
) -> Tuple[jax.Array, jax.Array]:
    """Params for every bitwidth in the list, stacked [n_bw, G, 1].

    ref: MixedPrecisionStaticQuantizer.init_quant_params
    (mixed_precision_quantizer.py:77-125).
    """
    deltas, zps = [], []
    for b in cfg.bitwidth_list:
        d, z = compute_quant_params(x, b, cfg.sym)
        deltas.append(d)
        zps.append(z)
    return jnp.stack(deltas, axis=0), jnp.stack(zps, axis=0)


def merge_minmax(
    acc: Optional[Tuple[jax.Array, jax.Array]], x: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Running (x_max, x_min) accumulation across calibration batches.

    ref: StaticQuantizer.init_quant_params update logic
    (base_quantizer.py:74-87).
    """
    xf = x.astype(jnp.float32)
    x_max = jnp.maximum(jnp.max(xf, axis=1), 0.0)
    x_min = jnp.minimum(jnp.min(xf, axis=1), 0.0)
    if acc is None:
        return x_max, x_min
    return jnp.maximum(acc[0], x_max), jnp.minimum(acc[1], x_min)


def params_from_minmax(
    x_max: jax.Array, x_min: jax.Array, cfg: QuantizerCfg
) -> Tuple[jax.Array, jax.Array]:
    """Finalize static params from accumulated min/max."""
    nl = n_levels_for(cfg.active_bits, cfg.sym)
    if cfg.sym:
        absmax = jnp.maximum(jnp.abs(x_max), jnp.abs(x_min))
        delta = jnp.where(absmax / nl < _EPS_SYM, _EPS_SYM, absmax / nl)
        zp = jnp.zeros_like(delta)
    else:
        delta = (x_max - x_min) / (nl - 1)
        delta = jnp.where(delta < _EPS_ASYM, _EPS_ASYM, delta)
        zp = jnp.round(x_min / delta) + (nl / 2)
    return delta[:, None], zp[:, None]


# ---------------------------------------------------------------------------
# Weight-layout helpers. Our weights are stored [C_in, C_out] (JAX x @ W
# convention; the MXU-friendly [K, N] GEMM layout), so per-output-channel
# groups are *columns*. The reference stores [C_out, C_in] and groups rows.
# ---------------------------------------------------------------------------


def weight_quant_params(
    w_in_out: jax.Array, cfg: QuantizerCfg
) -> Tuple[jax.Array, jax.Array]:
    """Per-output-channel (delta, zp) each shaped [C_out] for a [C_in, C_out] weight."""
    d, z = compute_quant_params(w_in_out.T, cfg.active_bits, cfg.sym)
    return d[:, 0], z[:, 0]


def weight_fake_quant(w_in_out: jax.Array, cfg: QuantizerCfg) -> jax.Array:
    """Static fake-quant of a [C_in, C_out] weight, per-output-channel groups."""
    d, z = weight_quant_params(w_in_out, cfg)
    return fake_quant(
        w_in_out, d[None, :], z[None, :], cfg.active_bits, cfg.sym
    ).astype(w_in_out.dtype)


def weight_int_quant(
    w_in_out: jax.Array, cfg: QuantizerCfg
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """True-int export: (w_int8 [C_in, C_out], scale [C_out], zp [C_out]).

    int8 value = clamp(round(w/scale) - zp, -128, 127); matches the reference
    INT8 export (quant_wanx_cuda.py:39-56). Dequant: w = (int + zp) * scale.
    For 4-bit weights (the W4A8 QServe path, csrc/qgemm/w4a8/*.cu) the int4
    values land in [-8, 7]; :func:`pack_int4` stores them two-per-byte for
    the packed HBM layout the W4A8 kernels consume.
    """
    assert cfg.active_bits in (4, 8), "int export supports 4/8-bit weights"
    d, z = weight_quant_params(w_in_out, cfg)
    q = jnp.round(w_in_out.astype(jnp.float32) / d[None, :]) - z[None, :]
    lo, hi = (-8, 7) if cfg.active_bits == 4 else (-128, 127)
    q = jnp.clip(q, lo, hi).astype(jnp.int8)
    return q, d, z


def pack_int4(q: jax.Array) -> jax.Array:
    """Pack int4 values (int8 containers in [-8, 7]) two-per-byte along the
    contraction axis: [K, N] int8 → [K//2, N] int8.

    Row 2i rides the low nibble, row 2i+1 the high nibble — the HBM layout
    of the reference's 4-bit packed weights (csrc/qgemm/w4a8/
    w4a8_per_channel_gemm_cuda_qserve.cu; host decl gemm_cuda.h:24-30).
    """
    k, _ = q.shape
    assert k % 2 == 0, f"K={k} must be even to pack int4 pairs"
    lo = q[0::2].astype(jnp.uint8) & 0xF
    hi = q[1::2].astype(jnp.uint8) & 0xF
    return (lo | (hi << 4)).astype(jnp.int8)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[K//2, N] packed int8 → [K, N] int8 in [-8, 7] (sign-extended via
    arithmetic shifts; the in-VMEM unpack of the W4A8 kernel prologue)."""
    kh, n = packed.shape
    lo = (packed << 4) >> 4  # arithmetic shifts on int8 sign-extend
    hi = packed >> 4
    out = jnp.stack([lo, hi], axis=1)  # [K//2, 2, N]
    return out.reshape(2 * kh, n)


# ---------------------------------------------------------------------------
# W4A4 group quantization (Atom-style, ref csrc/qgemm/w4a4/atom.cu:
# GROUP_SIZE-128 int4 for both weight and activation, one scale per
# (row, K-group)). int4 values ride int8 containers into the MXU; weights
# additionally pack two-per-byte for HBM storage.
# ---------------------------------------------------------------------------

GROUP_SIZE_W4A4 = 128


def act_group_int4_quant(
    x: jax.Array, group: int = GROUP_SIZE_W4A4
) -> Tuple[jax.Array, jax.Array]:
    """Dynamic symmetric per-(token, K-group) int4 quant.

    x: [M, K] → (q int8 in [-7,7] [M,K], scale f32 [M, K//group])."""
    m, k = x.shape
    assert k % group == 0, (k, group)
    xf = x.astype(jnp.float32).reshape(m, k // group, group)
    absmax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.maximum(absmax / 7.0, _EPS_SYM)
    q = jnp.clip(jnp.round(xf / scale[..., None]), -8, 7).astype(jnp.int8)
    return q.reshape(m, k), scale


def weight_group_int4_quant(
    w_in_out: jax.Array, group: int = GROUP_SIZE_W4A4
) -> Tuple[jax.Array, jax.Array]:
    """Static symmetric per-(K-group, out-channel) int4 weight quant.

    w: [K, N] → (q int8 in [-7,7] [K,N], scale f32 [K//group, N])."""
    k, n = w_in_out.shape
    assert k % group == 0, (k, group)
    wf = w_in_out.astype(jnp.float32).reshape(k // group, group, n)
    absmax = jnp.max(jnp.abs(wf), axis=1)
    scale = jnp.maximum(absmax / 7.0, _EPS_SYM)
    q = jnp.clip(jnp.round(wf / scale[:, None, :]), -8, 7).astype(jnp.int8)
    return q.reshape(k, n), scale


def act_dynamic_int_quant(
    x: jax.Array, sym: bool = True
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Dynamic per-token int8 activation quant: (x_int8, scale [G], sum [G]).

    ``sum`` is the scaled post-quant row sum ``scale * Σ q`` — exactly the
    ``sum_input`` produced by the reference's fused quant kernels
    (kernels/bench/bench_quant_kernel.py:11) and consumed by the int8 GEMM's
    asymmetric-weight zero-point correction term
    (kernels/bench/bench_gemm.py:26-29):
        out = (A_int @ W_int.T)·s_a·s_w + sum_input·zp_w·s_w + bias
    x: [..., C] (leading dims pass through). sym=True matches the Wan act
    config (quant_configs/config.yaml).
    """
    xf = x.astype(jnp.float32)
    if sym:
        absmax = jnp.max(jnp.abs(xf), axis=-1)
        scale = jnp.maximum(absmax / 127.0, _EPS_SYM)
    else:
        raise NotImplementedError("asymmetric activation int quant not used by Wan")
    q = jnp.clip(jnp.round(xf / scale[..., None]), -128, 127).astype(jnp.int8)
    s = scale * jnp.sum(q.astype(jnp.float32), axis=-1)
    return q, scale, s
