"""Quantized linear application + QuantCtx.

TPU-native redesign of the reference's module-surgery approach: instead of
replacing nn.Linear modules with QuantizedLinear subclasses at runtime
(qdiff/base/quant_model.py:15-74), the model calls :func:`qlinear` at every
linear site with a layer path name, and a :class:`QuantCtx` decides the
behavior — FP, calibration-collect, simulated quant, or int8 kernels —
from statically resolved per-layer policies and an explicit quant-state
pytree. One model codebase serves all four modes; jit sees static policy
and traced state arrays only.

Layer state entries (produced by :mod:`wanq_tpu.quant.ptq`):
  w_q       deployed fake-quant weight [C_in, C_out] (mask/rotation applied)
  delta_w   [C_out] final weight quant scale        (ref: w_quantizer.delta)
  zp_w      [C_out] final weight zero point         (ref: w_quantizer.zero_point)
  channel_mask [C_in]      (smooth_quant / viditq only)
  w_int8    int8 weight [C_in, C_out]               (int8 mode)
  scale_w/zp_w_int [C_out] int8 export params       (ref: scale_weight/zp_weight)
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from wanq_tpu.quant.config import FP_POLICY, LayerPolicy
from wanq_tpu.quant.quantizers import (
    act_dynamic_int_quant,
    dynamic_fake_quant,
)

Params = Dict[str, Any]

MODES = ("fp", "calib", "sim", "int8")


@dataclasses.dataclass
class QuantCtx:
    """Carried through the model forward; not a pytree leaf container —
    ``state``/``rotations``/``collect`` hold traced arrays, everything else
    is static."""

    mode: str = "fp"
    policies: Dict[str, LayerPolicy] = dataclasses.field(default_factory=dict)
    state: Dict[str, Dict[str, jax.Array]] = dataclasses.field(default_factory=dict)
    rotations: Dict[int, jax.Array] = dataclasses.field(default_factory=dict)
    # pre-stacked per-block state (suffix → leaves with leading [L]) for the
    # scan-over-blocks path; built once by models.dit.make_scan_ctx
    scan_state: Dict[str, Dict[str, jax.Array]] = None
    # attention quantization (ref quant_opensora.py QuantizedAttention):
    # AttnQuantCfg instances or None
    attn: Any = None
    cross_attn: Any = None
    # calibration outputs: layer path -> per-channel absmax [C_in] of the
    # FP input seen this call (ref: SaveActivationHook 'default' type,
    # get_calib_data_wanx.py:240-267)
    collect: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    # calib extras: also collect per-channel act min/max (for static A8)
    collect_minmax: bool = False
    # calib extras: pool factor for post-softmax attn-map capture (0 = off)
    attn_map_pool: int = 0
    # calib extras: pooling reduce for the attn-map capture — "max" (ref
    # max_pool2d semantics, feeds reorder tables) or "mean" (mass-
    # preserving, feeds select_temporal_windows)
    attn_map_reduce: str = "max"
    # calib extras: layers matching this regex also accumulate the input
    # Hessian X^T X ([C_in, C_in]) for GPTQ weight rounding (quant/gptq.py).
    # Matched with re.search against the layer path (under scan the path is
    # the scan placeholder, so match on suffixes like r"ffn\.0|self_attn").
    hessian_regex: Optional[str] = None
    # QLoRA training route: int8 mode with the weights int-at-rest but the
    # GEMM computed from a transient dequantization (the Pallas int kernels
    # are fwd-only) + STE act fake-quant — fully differentiable. Set by
    # dit_forward(training=True); static (changes the traced graph).
    trainable: bool = False
    # per-layer attn-map reorder tables {layer: [H, S] int32} (ref
    # optimal_reorder, quant_attn.py:176-238)
    attn_perms: Dict[str, jax.Array] = dataclasses.field(default_factory=dict)
    # sliding temporal-window self-attention (hardware block-sparse splash
    # mask — the TPU execution of the reference's 0-bit attention-map
    # blocks, quant_attn.py bitwidth-0 pruning). An int radius in latent
    # frames, or a models.attention.TemporalWindow with tokens_per_frame
    # pre-resolved; dit_forward resolves the int against the input grid.
    # Static (changes the compiled mask); None = dense.
    attn_window: Any = None

    def policy(self, name: str) -> LayerPolicy:
        return self.policies.get(name, FP_POLICY)

    def replace(self, **overrides) -> "QuantCtx":
        """Copy with field overrides (dataclasses.replace). Every consumer
        that needs a modified view (scan sub-ctx, trainable route, LoRA
        merge) goes through this — hand-copying the constructor has twice
        silently dropped a newly added field."""
        if "collect" not in overrides:
            # the calibration dict is mutated during tracing — never share
            # it between views
            overrides["collect"] = dict(self.collect)
        return dataclasses.replace(self, **overrides)


def _ctx_flatten(ctx: QuantCtx):
    """QuantCtx is a registered pytree so jitted step functions take it as
    an ARGUMENT. Closing over it instead embeds the whole quant state
    (GBs of int8 weights) as HLO literals — a multi-GB program that wedges
    compilation. ``collect`` stays out of the tree (calibration mutates it
    during tracing and passes the ctx by closure)."""
    children = (ctx.state, ctx.rotations, ctx.scan_state, ctx.attn_perms)
    aux = (
        ctx.mode,
        tuple(sorted(ctx.policies.items())),
        ctx.attn,
        ctx.cross_attn,
        ctx.collect_minmax,
        ctx.attn_map_pool,
        ctx.hessian_regex,
        ctx.trainable,
        ctx.attn_window,
        ctx.attn_map_reduce,
    )
    return children, aux


def _ctx_unflatten(aux, children):
    (mode, policies, attn, cross_attn, collect_minmax, attn_map_pool,
     hessian_regex, trainable, attn_window, attn_map_reduce) = aux
    ctx = QuantCtx(
        mode=mode,
        policies=dict(policies),
        state=children[0],
        rotations=children[1],
        attn=attn,
        cross_attn=cross_attn,
        collect_minmax=collect_minmax,
        attn_map_pool=attn_map_pool,
        hessian_regex=hessian_regex,
        trainable=trainable,
        attn_window=attn_window,
        attn_map_reduce=attn_map_reduce,
    )
    ctx.scan_state = children[2]
    ctx.attn_perms = children[3]
    return ctx


jax.tree_util.register_pytree_node(QuantCtx, _ctx_flatten, _ctx_unflatten)


def fp_linear(params: Params, x: jax.Array, compute_dtype=jnp.bfloat16) -> jax.Array:
    """y = x @ w + b with bf16 MXU compute; bias added in f32."""
    w = params["w"].astype(compute_dtype)
    y = jnp.dot(x.astype(compute_dtype), w, preferred_element_type=jnp.float32)
    if params.get("b") is not None:
        y = y + params["b"].astype(jnp.float32)
    return y


def resolves_fp(ctx: Optional[QuantCtx], name: str) -> bool:
    """True iff qlinear(ctx, name, ...) would run the plain FP matmul with
    no side effects — callers may then use a layout-fused FP contraction
    instead (e.g. the heads-major o-projection in models/dit.py). Calib
    mode returns False: its FP forward also captures activation stats."""
    if ctx is None or ctx.mode == "fp":
        return True
    if ctx.mode == "calib":
        return False
    return not ctx.policy(name).is_quantized


def qlinear(
    ctx: Optional[QuantCtx],
    name: str,
    params: Params,
    x: jax.Array,
    compute_dtype=jnp.bfloat16,
) -> jax.Array:
    """Quant-aware linear. x: [B, N, C_in] → [B, N, C_out] (float32 out).

    Forward semantics per mode follow the reference layers:
      sim   → {Quantized|SQ|Quarot|ViDiTQ}Linear.forward
              (quant_layer.py:57-74, sq_quant_layer.py:46-68,
               quarot_quant_layer.py:47-69, viditq_quant_layer.py:52-73)
      int8  → W8A8OF16LinearDynamicInputScale (nn/qlinear.py:107-125)
      calib → SaveActivationHook on the FP forward
    """
    if ctx is None or ctx.mode == "fp":
        return fp_linear(params, x, compute_dtype)

    policy = ctx.policy(name)

    if ctx.mode == "calib":
        # stats reduce over every leading (token) dim directly — no
        # [B·N, C] flatten, so sharded calibration keeps its token sharding
        # and GSPMD lowers these to local reductions + tiny all-reduces
        xf3 = x.astype(jnp.float32)
        lead = tuple(range(xf3.ndim - 1))
        ctx.collect[name] = jnp.max(jnp.abs(xf3), axis=lead)
        if ctx.collect_minmax:
            # per-channel running min/max for static activation quant
            # (ref StaticQuantizer accumulation, base_quantizer.py:74-87)
            ctx.collect[f"{name}.act_max"] = jnp.max(xf3, axis=lead)
            ctx.collect[f"{name}.act_min"] = jnp.min(xf3, axis=lead)
        if ctx.hessian_regex and re.search(ctx.hessian_regex, name):
            # input Hessian for GPTQ rounding (quant/gptq.py); summed over
            # the calibration sweep by the pipeline (per-step terms here)
            ctx.collect[f"{name}.hess"] = jax.lax.dot_general(
                xf3, xf3,
                dimension_numbers=((lead, lead), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return fp_linear(params, x, compute_dtype)

    if not policy.is_quantized:
        return fp_linear(params, x, compute_dtype)

    st = ctx.state[name]
    b, n, c = x.shape
    xf = x.astype(jnp.float32)
    x_raw = xf  # pre-mask/rotation input: QLoRA adapters apply to it

    # method preprocessing (activation side)
    if policy.uses_channel_mask:
        xf = xf * st["channel_mask"][None, None, :]
    if policy.uses_rotation:
        rot = ctx.rotations[c]
        xf = jnp.dot(xf, rot, preferred_element_type=jnp.float32)

    if ctx.mode == "sim":
        if policy.is_w4a4:
            # Atom W4A4 sim: per-(token, K-group) int4 act fake-quant
            # against the group-dequantized weight already in st["w_q"] —
            # the same math the hardware kernel computes, modulo f32
            # accumulation order (ref csrc/qgemm/w4a4/atom.cu)
            from wanq_tpu.quant.quantizers import act_group_int4_quant

            g = policy.group
            q4, s4 = act_group_int4_quant(xf.reshape(b * n, c), g)
            xq = (
                q4.astype(jnp.float32).reshape(b * n, c // g, g)
                * s4[..., None]
            ).reshape(b, n, c)
            w_q = st["w_q"].astype(compute_dtype)
            y = jnp.dot(
                xq.astype(compute_dtype), w_q,
                preferred_element_type=jnp.float32,
            )
            if params.get("b") is not None:
                y = y + params["b"].astype(jnp.float32)
            return _maybe_lora(st, x_raw, _maybe_lowrank(st, xf, y))
        if policy.act is not None and not policy.act.dynamic:
            # static A8: calibration-frozen per-tensor params
            # (ref StaticQuantizer.forward, base_quantizer.py:58-68)
            from wanq_tpu.quant.quantizers import fake_quant

            xq = fake_quant(
                xf, st["delta_a"], st["zp_a"],
                policy.act.active_bits, policy.act.sym,
            )
        elif policy.act is not None:
            xq = dynamic_fake_quant(xf.reshape(b * n, c), policy.act).reshape(b, n, c)
        else:
            xq = xf
        w_q = st["w_q"].astype(compute_dtype)
        y = jnp.dot(
            xq.astype(compute_dtype), w_q, preferred_element_type=jnp.float32
        )
        if params.get("b") is not None:
            y = y + params["b"].astype(jnp.float32)
        return _maybe_lora(st, x_raw, _maybe_lowrank(st, xf, y))

    if ctx.mode == "int8":
        assert policy.act is not None and policy.act.sym, (
            "int8 path implements the Wan config: symmetric per-token "
            "act quant (quant_configs/config.yaml act.sym=True)"
        )
        bias = params.get("b")

        if policy.is_w4a4:
            # Atom W4A4 hardware route (ref csrc/qgemm/w4a4/atom.cu):
            # dynamic per-(token, group) int4 act quant inside the op,
            # packed-int4 weight + per-(group, C_out) scales from state.
            # No trainable dequant route — QLoRA trains over W4A8/W8A8.
            assert not ctx.trainable, (
                "W4A4 has no trainable dequant route; use w4a8/w8a8 for "
                "QLoRA bases"
            )
            from wanq_tpu.ops.qgemm import w4a4_linear

            y = w4a4_linear(
                xf.reshape(b * n, c), st["w_int4g"], st["scale_wg"],
                bias.astype(jnp.float32) if bias is not None else None,
                group=policy.group, out_dtype=jnp.float32,
            )
            return _maybe_lora(
                st, x_raw, _maybe_lowrank(st, xf, y.reshape(b, n, -1)))

        if ctx.trainable:
            # QLoRA training route: weights stay int-at-rest (int8 /
            # packed int4 in HBM) and dequantize TRANSIENTLY for a plain
            # differentiable GEMM; the act quant uses the STE round
            # (quantizers.round_ste). Mathematically this is exactly the
            # int kernel's computation ((q·s_a) @ ((codes+zp)·scale_w));
            # the fwd-only Pallas kernels stay on the inference path.
            from wanq_tpu.quant.quantizers import (
                compute_quant_params,
                fake_quant,
                unpack_int4,
            )

            if not policy.act.dynamic:
                xq = fake_quant(xf, st["delta_a"], st["zp_a"], 8, True)
            else:
                xf2 = xf.reshape(b * n, c)
                d_a, zp_a = compute_quant_params(xf2, 8, True)
                xq = fake_quant(xf2, d_a, zp_a, 8, True).reshape(b, n, c)
            codes = (
                unpack_int4(st["w_int4"]) if "w_int4" in st else st["w_int8"]
            )
            w_deq = (
                codes.astype(jnp.float32) + st["zp_w_int"][None, :]
            ) * st["scale_w"][None, :]
            y = jnp.dot(
                xq.astype(jnp.bfloat16), w_deq.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            if bias is not None:
                y = y + bias.astype(jnp.float32)
            return _maybe_lora(st, x_raw, _maybe_lowrank(st, xf, y))

        # NO [B·N, C] flatten here: the GEMM wrappers take [..., C]
        # natively — under GSPMD a reshape merging batch with the
        # token-sharded seq dim would full-gather the sequence per layer
        # (see w8a8_linear_xla docstring)
        if not policy.act.dynamic:
            # static-scale quant: no absmax pass (the analog of the
            # reference's quant_sum_static kernel, fused.cu:586)
            scale = st["delta_a"].reshape(())
            q = jnp.clip(jnp.round(xf / scale), -128, 127).astype(jnp.int8)
            s_a = jnp.full((b, n), scale, jnp.float32)
            sum_a = s_a * jnp.sum(q.astype(jnp.float32), axis=-1)
        else:
            q, s_a, sum_a = act_dynamic_int_quant(xf, sym=True)
        y = _int_linear(
            st, q, s_a, sum_a,
            bias.astype(jnp.float32) if bias is not None else None,
            jnp.float32,
        )
        return _maybe_lora(st, x_raw, _maybe_lowrank(st, xf, y))

    raise ValueError(f"unknown quant mode {ctx.mode}")


def _maybe_lowrank(st: Params, xf: jax.Array, y: jax.Array) -> jax.Array:
    """SVDQuant low-rank branch (quant/svd.py, arXiv:2411.05007):
    y += (xf @ L1) @ L2 on the TRANSFORMED (post-mask/rotation) input —
    the space the residual weight was split in. Two rank-r GEMMs in bf16
    with f32 accumulation (the branch is 16-bit by design)."""
    a = st.get("lowrank_a")
    if a is None:
        return y
    h = jnp.dot(xf.astype(jnp.bfloat16), a.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32)
    return y + jnp.dot(h.astype(jnp.bfloat16),
                       st["lowrank_b"].astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)


def _maybe_lora(st: Params, x_raw: jax.Array, y: jax.Array) -> jax.Array:
    """QLoRA adapter riding the quant state (training/lora.py
    merge_lora_into_quant_state): y += (x @ A) @ B on the RAW layer input
    — the standard QLoRA formulation (rank-r adapters beside the frozen
    quantized base; the rank-r chain is negligible next to the GEMM).
    Differentiable end to end: training takes the sim path, where the
    dequantized-weight matmul is plain jnp."""
    a = st.get("lora_a")
    if a is None:
        return y
    h = jnp.dot(x_raw, st["lora_a"].astype(jnp.float32),
                preferred_element_type=jnp.float32)
    return y + jnp.dot(h, st["lora_b"].astype(jnp.float32),
                       preferred_element_type=jnp.float32)


def _int_linear(st, q, s_a, sum_a, bias, out_dtype):
    """Integer GEMM on the exported weight: W8A8 when the state carries
    ``w_int8``, packed-int4 W4A8 when it carries ``w_int4``."""
    from wanq_tpu.ops.qgemm import w4a8_linear, w8a8_linear

    if "w_int4" in st:
        return w4a8_linear(q, st["w_int4"], s_a, st["scale_w"], sum_a,
                           st["zp_w_int"], bias, out_dtype=out_dtype)
    return w8a8_linear(q, st["w_int8"], s_a, st["scale_w"], sum_a,
                       st["zp_w_int"], bias, out_dtype=out_dtype)


def int8_fusable(ctx: Optional[QuantCtx], names, allow_mask: bool = False) -> bool:
    """True when every site can take the fused int8 fast path: 8-bit static
    weight + dynamic symmetric 8-bit act, no rotation; per-channel masks
    only when the quantized activation has a single consumer."""
    if ctx is None or ctx.mode != "int8":
        return False
    for n in names:
        pol = ctx.policy(n)
        if not pol.is_quantized or pol.uses_rotation:
            return False
        if pol.uses_channel_mask and not allow_mask:
            return False
        if pol.weight is None or pol.weight.active_bits not in (4, 8):
            return False
        if pol.act is None or not pol.act.sym or pol.act.active_bits != 8:
            return False
        if not pol.act.dynamic:
            return False  # fused producers compute dynamic per-token scales
        st = ctx.state.get(n)
        if st is None or ("w_int8" not in st and "w_int4" not in st):
            return False
        if "lora_a" in st or "lowrank_a" in st:
            # QLoRA adapters / SVDQuant low-rank branches apply inside
            # qlinear on the FP activation; the fused block paths only see
            # the already-quantized int8 stream and would silently drop them
            return False
    return True


def int8_static_fusable(ctx: Optional[QuantCtx], name: str) -> bool:
    """True when a site can consume a STATIC-scale fused producer (the
    reference's quant_sum_static kernel, fused.cu:586): int8 mode, 8-bit
    sym static act with frozen per-tensor delta_a, exported int weight, no
    rotation/mask (those transform the activation after calibration)."""
    if ctx is None or ctx.mode != "int8":
        return False
    pol = ctx.policy(name)
    if not pol.is_quantized or pol.uses_rotation or pol.uses_channel_mask:
        return False
    if pol.weight is None or pol.weight.active_bits not in (4, 8):
        return False
    if pol.act is None or not pol.act.sym or pol.act.active_bits != 8:
        return False
    if pol.act.dynamic:
        return False
    st = ctx.state.get(name)
    return (
        st is not None
        and "delta_a" in st
        and "lora_a" not in st  # adapters apply inside qlinear only
        and "lowrank_a" not in st  # low-rank branch needs the FP input
        and ("w_int8" in st or "w_int4" in st)
    )


def w8a8_from_prequant(
    ctx: QuantCtx,
    name: str,
    params: Params,
    q8: jax.Array,
    s_a: jax.Array,
    ssum: jax.Array,
    out_dtype=jnp.float32,
) -> jax.Array:
    """int8 GEMM from an already-quantized activation (produced by a fused
    LN/GELU+quant op — the reference's QuantParams scratch-buffer pattern,
    nn/base.py:3-26). q8: [B, N, C] int8; s_a/ssum: [B, N]. Fed to the
    GEMM unflattened so the token sharding survives under GSPMD."""
    st = ctx.state[name]
    bias = params.get("b")
    return _int_linear(
        st, q8, s_a, ssum,
        bias.astype(jnp.float32) if bias is not None else None,
        out_dtype,
    )
