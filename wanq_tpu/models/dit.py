"""Wan2.1 DiT backbone in functional JAX.

TPU-native rebuild of ``WanModel`` (ref: wan/modules/model.py:418-656,
WanAttentionBlock :253-370, WanSelfAttention :105-175, Head :373-400).
Design decisions vs the reference:

* Params are an explicit pytree whose paths mirror the reference module
  names ("blocks.0.self_attn.q", ...) so the reference's regex-driven quant
  configs apply verbatim.
* No nn.Module surgery: every linear goes through
  :func:`wanq_tpu.quant.qlinear.qlinear` with a :class:`QuantCtx`.
* fp32 discipline matches the reference autocast pattern: the residual
  stream, norms, modulation, and time embeddings run in float32
  (model.py:314-317, :344-345, :592-596); matmuls run in the param dtype
  (bf16) on the MXU.
* Static shapes: x is padded to ``seq_len`` at trace time; the single
  (F, H, W) grid is shared across the batch (all reference run configs use
  homogeneous batches).
* The per-op cuda-sync timing prints of the reference (model.py:142-171,
  :311-362 — dev instrumentation) are dropped; profiling is jax.profiler's
  job. The reference's model.py:145-146 disables norm_q in a dev hack; we
  implement the original qk-norm semantics (quant path quant_wanx_cuda.py:449
  confirms RMSNorm on q and k).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.configs import WanConfig
from wanq_tpu.models.attention import TemporalWindow, attention
from wanq_tpu.models.rope import rope_apply_interleaved, rope_tables_interleaved
from wanq_tpu.quant.qlinear import QuantCtx, qlinear, resolves_fp

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def layer_norm(x: jax.Array, eps: float, w=None, b=None) -> jax.Array:
    """fp32 LayerNorm (ref WanLayerNorm, model.py:92-102)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if w is not None:
        y = y * w.astype(jnp.float32) + b.astype(jnp.float32)
    return y


def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    """fp32 RMSNorm with learnable gain (ref WanRMSNorm, model.py:73-89).
    Output keeps x's dtype (one rounding at the end — bf16 inputs stay
    bf16 at rest instead of widening the residual traffic to f32)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (y * w.astype(jnp.float32)).astype(x.dtype)


def gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


def sinusoidal_embedding_1d(dim: int, t: jax.Array) -> jax.Array:
    """ref model.py:18-28 (f64 there; f32 here — t is O(1000), benign)."""
    half = dim // 2
    freqs = jnp.power(
        10000.0, -jnp.arange(half, dtype=jnp.float32) / half
    )
    sinusoid = jnp.outer(t.astype(jnp.float32), freqs)
    return jnp.concatenate([jnp.cos(sinusoid), jnp.sin(sinusoid)], axis=1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def init_params(cfg: WanConfig, key: jax.Array) -> Params:
    """Random init mirroring WanModel.init_weights (model.py:658-680).

    Init runs host-side in numpy (one RNG stream, zero per-op device
    dispatches — important on remote-compiled TPU backends where hundreds
    of tiny random kernels would each round-trip the compile service),
    then lands on device lazily via jnp.asarray.
    """
    dtype = cfg.dtype
    d = cfg.dim
    seed = int(jax.random.key_data(key)[-1]) if hasattr(jax.random, "key_data") else 0
    rng = np.random.default_rng(seed)

    def lin(c_in, c_out, scheme="xavier"):
        if scheme == "xavier":
            bound = math.sqrt(6.0 / (c_in + c_out))
            w = rng.uniform(-bound, bound, (c_in, c_out)).astype(np.float32)
        elif scheme == "normal02":
            w = (rng.standard_normal((c_in, c_out)) * 0.02).astype(np.float32)
        elif scheme == "zeros":
            w = np.zeros((c_in, c_out), np.float32)
        else:
            raise ValueError(scheme)
        return {
            "w": jnp.asarray(w, dtype=dtype),
            "b": jnp.zeros((c_out,), jnp.float32),
        }

    def modulation(n):
        return jnp.asarray(
            (rng.standard_normal((1, n, d)) / math.sqrt(d)).astype(np.float32)
        )

    params: Params = {
        # Conv3d patch embedding stored as a dense kernel
        # [pt*ph*pw*in_dim, dim]: with stride == kernel == patch_size the
        # conv is exactly a per-patch linear (ref model.py:502-503).
        "patch_embedding": lin(int(np.prod(cfg.patch_size)) * cfg.in_dim, d),
        "text_embedding": {
            "0": lin(cfg.text_dim, d, "normal02"),
            "2": lin(d, d, "normal02"),
        },
        "time_embedding": {
            "0": lin(cfg.freq_dim, d, "normal02"),
            "2": lin(d, d, "normal02"),
        },
        "time_projection": {"1": lin(d, d * 6)},
        "head": {
            "head": lin(d, int(np.prod(cfg.patch_size)) * cfg.out_dim, "zeros"),
            "modulation": modulation(2),
        },
        "blocks": [],
    }
    if cfg.model_type == "i2v":
        params["img_emb"] = {
            "proj": {
                "0": {"w": jnp.ones((cfg.clip_dim,), jnp.float32),
                      "b": jnp.zeros((cfg.clip_dim,), jnp.float32)},
                "1": lin(cfg.clip_dim, cfg.clip_dim),
                "3": lin(cfg.clip_dim, d),
                "4": {"w": jnp.ones((d,), jnp.float32),
                      "b": jnp.zeros((d,), jnp.float32)},
            }
        }

    for _ in range(cfg.num_layers):
        block = {
            "self_attn": {
                "q": lin(d, d),
                "k": lin(d, d),
                "v": lin(d, d),
                "o": lin(d, d),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "cross_attn": {
                "q": lin(d, d),
                "k": lin(d, d),
                "v": lin(d, d),
                "o": lin(d, d),
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32),
            },
            "norm3": (
                {"w": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}
                if cfg.cross_attn_norm
                else None
            ),
            "ffn": {"0": lin(d, cfg.ffn_dim), "2": lin(cfg.ffn_dim, d)},
            "modulation": modulation(6),
        }
        if cfg.model_type == "i2v":
            block["cross_attn"]["k_img"] = lin(d, d)
            block["cross_attn"]["v_img"] = lin(d, d)
            block["cross_attn"]["norm_k_img"] = jnp.ones((d,), jnp.float32)
        params["blocks"].append(block)
    return params


def make_param_generator(cfg: WanConfig):
    """Pure param-generator fn (key → params); the single source for
    on-device init, abstract (eval_shape) params, and sharded-out init."""

    def gen(key):
        d = cfg.dim
        n_lin = 8 + cfg.num_layers * 20
        keys = iter(jax.random.split(key, n_lin + 8))

        def lin(c_in, c_out, scheme="xavier"):
            k = next(keys)
            if scheme == "xavier":
                bound = math.sqrt(6.0 / (c_in + c_out))
                w = jax.random.uniform(k, (c_in, c_out), jnp.float32, -bound, bound)
            elif scheme == "normal02":
                w = jax.random.normal(k, (c_in, c_out), jnp.float32) * 0.02
            else:
                w = jnp.zeros((c_in, c_out), jnp.float32)
            return {"w": w.astype(cfg.dtype), "b": jnp.zeros((c_out,), jnp.float32)}

        def modulation(n):
            return jax.random.normal(next(keys), (1, n, d), jnp.float32) / math.sqrt(d)

        params: Params = {
            "patch_embedding": lin(int(np.prod(cfg.patch_size)) * cfg.in_dim, d),
            "text_embedding": {"0": lin(cfg.text_dim, d, "normal02"),
                               "2": lin(d, d, "normal02")},
            "time_embedding": {"0": lin(cfg.freq_dim, d, "normal02"),
                               "2": lin(d, d, "normal02")},
            "time_projection": {"1": lin(d, d * 6)},
            "head": {"head": lin(d, int(np.prod(cfg.patch_size)) * cfg.out_dim, "zeros"),
                     "modulation": modulation(2)},
            "blocks": [],
        }
        if cfg.model_type == "i2v":
            params["img_emb"] = {
                "proj": {
                    "0": {"w": jnp.ones((cfg.clip_dim,), jnp.float32),
                          "b": jnp.zeros((cfg.clip_dim,), jnp.float32)},
                    "1": lin(cfg.clip_dim, cfg.clip_dim),
                    "3": lin(cfg.clip_dim, d),
                    "4": {"w": jnp.ones((d,), jnp.float32),
                          "b": jnp.zeros((d,), jnp.float32)},
                }
            }
        for _ in range(cfg.num_layers):
            cross = {leaf: lin(d, d) for leaf in ("q", "k", "v", "o")} | {
                "norm_q": jnp.ones((d,), jnp.float32),
                "norm_k": jnp.ones((d,), jnp.float32)}
            if cfg.model_type == "i2v":
                cross["k_img"] = lin(d, d)
                cross["v_img"] = lin(d, d)
                cross["norm_k_img"] = jnp.ones((d,), jnp.float32)
            params["blocks"].append({
                "self_attn": {leaf: lin(d, d) for leaf in ("q", "k", "v", "o")}
                | {"norm_q": jnp.ones((d,), jnp.float32),
                   "norm_k": jnp.ones((d,), jnp.float32)},
                "cross_attn": cross,
                "norm3": ({"w": jnp.ones((d,), jnp.float32),
                           "b": jnp.zeros((d,), jnp.float32)}
                          if cfg.cross_attn_norm else None),
                "ffn": {"0": lin(d, cfg.ffn_dim), "2": lin(cfg.ffn_dim, d)},
                "modulation": modulation(6),
            })
        return params

    return gen


def _gen_lin_mod(cfg: WanConfig, keys):
    d = cfg.dim

    def lin(c_in, c_out, scheme="xavier"):
        k = next(keys)
        if scheme == "xavier":
            bound = math.sqrt(6.0 / (c_in + c_out))
            w = jax.random.uniform(k, (c_in, c_out), jnp.float32, -bound, bound)
        elif scheme == "normal02":
            w = jax.random.normal(k, (c_in, c_out), jnp.float32) * 0.02
        else:
            w = jnp.zeros((c_in, c_out), jnp.float32)
        return {"w": w.astype(cfg.dtype), "b": jnp.zeros((c_out,), jnp.float32)}

    def modulation(n):
        return jax.random.normal(next(keys), (1, n, d), jnp.float32) / math.sqrt(d)

    return lin, modulation


def make_block_generator(cfg: WanConfig):
    """Generator for ONE transformer block (key → block params) — for
    streamed init at scales where the full FP model cannot reside on one
    device (14B bf16 ≈ 27 GiB): generate a block, quantize it, drop the
    FP copy, repeat (tools/deploy_14b_probe.py)."""

    def gen_block(key):
        d = cfg.dim
        keys = iter(jax.random.split(key, 24))
        lin, modulation = _gen_lin_mod(cfg, keys)
        cross = {leaf: lin(d, d) for leaf in ("q", "k", "v", "o")} | {
            "norm_q": jnp.ones((d,), jnp.float32),
            "norm_k": jnp.ones((d,), jnp.float32)}
        if cfg.model_type == "i2v":
            cross["k_img"] = lin(d, d)
            cross["v_img"] = lin(d, d)
            cross["norm_k_img"] = jnp.ones((d,), jnp.float32)
        return {
            "self_attn": {leaf: lin(d, d) for leaf in ("q", "k", "v", "o")}
            | {"norm_q": jnp.ones((d,), jnp.float32),
               "norm_k": jnp.ones((d,), jnp.float32)},
            "cross_attn": cross,
            "norm3": ({"w": jnp.ones((d,), jnp.float32),
                       "b": jnp.zeros((d,), jnp.float32)}
                      if cfg.cross_attn_norm else None),
            "ffn": {"0": lin(d, cfg.ffn_dim), "2": lin(cfg.ffn_dim, d)},
            "modulation": modulation(6),
        }

    return gen_block


def make_nonblock_generator(cfg: WanConfig):
    """Generator for every param EXCEPT the transformer blocks (the
    streamed-init prelude: embeddings, time projection, head, img_emb)."""

    def gen_nonblock(key):
        d = cfg.dim
        keys = iter(jax.random.split(key, 16))
        lin, modulation = _gen_lin_mod(cfg, keys)
        params: Params = {
            "patch_embedding": lin(int(np.prod(cfg.patch_size)) * cfg.in_dim, d),
            "text_embedding": {"0": lin(cfg.text_dim, d, "normal02"),
                               "2": lin(d, d, "normal02")},
            "time_embedding": {"0": lin(cfg.freq_dim, d, "normal02"),
                               "2": lin(d, d, "normal02")},
            "time_projection": {"1": lin(d, d * 6)},
            "head": {"head": lin(d, int(np.prod(cfg.patch_size)) * cfg.out_dim,
                                 "zeros"),
                     "modulation": modulation(2)},
        }
        if cfg.model_type == "i2v":
            params["img_emb"] = {
                "proj": {
                    "0": {"w": jnp.ones((cfg.clip_dim,), jnp.float32),
                          "b": jnp.zeros((cfg.clip_dim,), jnp.float32)},
                    "1": lin(cfg.clip_dim, cfg.clip_dim),
                    "3": lin(cfg.clip_dim, d),
                    "4": {"w": jnp.ones((d,), jnp.float32),
                          "b": jnp.zeros((d,), jnp.float32)},
                }
            }
        return params

    return gen_nonblock


def init_params_on_device(cfg: WanConfig, seed: int = 0) -> Params:
    """Random init generated *on device* by a single jitted program — no
    host→device bulk transfer (the axon-relayed TPU moves ~32 MB/s, so
    shipping 1.3B/14B random params from host is minutes of dead time).
    Distributions mirror init_params."""
    return jax.jit(make_param_generator(cfg))(jax.random.PRNGKey(seed))


def abstract_params(cfg: WanConfig) -> Params:
    """ShapeDtypeStruct pytree of the model params — zero allocation; the
    input to AOT compile-validation of large configs (14B) on meshes that
    could not hold the real weights."""
    return jax.eval_shape(make_param_generator(cfg), jax.random.PRNGKey(0))


def linear_layer_names(cfg: WanConfig) -> List[str]:
    """Every quantizable linear path, in reference naming (the set that
    apply_func_to_submodules(nn.Linear) would visit)."""
    names = [
        "text_embedding.0",
        "text_embedding.2",
        "time_embedding.0",
        "time_embedding.2",
        "time_projection.1",
        "head.head",
    ]
    for i in range(cfg.num_layers):
        for mod in ("self_attn", "cross_attn"):
            for leaf in ("q", "k", "v", "o"):
                names.append(f"blocks.{i}.{mod}.{leaf}")
            if cfg.model_type == "i2v" and mod == "cross_attn":
                names.append(f"blocks.{i}.cross_attn.k_img")
                names.append(f"blocks.{i}.cross_attn.v_img")
        names.append(f"blocks.{i}.ffn.0")
        names.append(f"blocks.{i}.ffn.2")
    return names


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def patchify(x: jax.Array, patch_size: Tuple[int, int, int]) -> jax.Array:
    """[B, C, F, H, W] → [B, L, C*pt*ph*pw] patches (ref Conv3d stride=kernel)."""
    b, c, f, h, w = x.shape
    pt, ph, pw = patch_size
    x = x.reshape(b, c, f // pt, pt, h // ph, ph, w // pw, pw)
    # order patch-position dims to match Conv3d weight layout [C_out, C_in, pt, ph, pw]
    x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # b, f', h', w', c, pt, ph, pw
    return x.reshape(b, (f // pt) * (h // ph) * (w // pw), c * pt * ph * pw)


def unpatchify(
    x: jax.Array, grid: Tuple[int, int, int], patch_size: Tuple[int, int, int], out_dim: int
) -> jax.Array:
    """[B, L, pt*ph*pw*C] → [B, C, F, H, W] (ref model.py:633-656)."""
    b = x.shape[0]
    f, h, w = grid
    pt, ph, pw = patch_size
    x = x[:, : f * h * w]
    x = x.reshape(b, f, h, w, pt, ph, pw, out_dim)
    x = jnp.einsum("bfhwpqrc->bcfphqwr", x)
    return x.reshape(b, out_dim, f * pt, h * ph, w * pw)


def _o_proj_heads_major(po: Params, y: jax.Array, dtype) -> jax.Array:
    """FP o-projection reading the attention output in splash's
    heads-major [B, N, S, D] layout: contracting (n, d) on the MXU
    directly skips the head-merge relayout pass (~18-21 ms/step/site at
    1.3B shapes; tools/profile_step.py). Only valid when the o layer
    resolves to plain FP (quant/qlinear.py::resolves_fp)."""
    b, n, s, d = y.shape
    w = po["w"].astype(dtype).reshape(n, d, -1)
    out = jnp.einsum(
        "bnsd,ndo->bso", y.astype(dtype), w,
        preferred_element_type=jnp.float32)
    if po.get("b") is not None:
        out = out + po["b"].astype(jnp.float32)
    return out


def o_proj_heads_major_int8(
    ctx: QuantCtx, name: str, po: Params, y: jax.Array
) -> jax.Array:
    """W8A8 o-projection consuming the attention output heads-major
    [B, N, S, D]: per-token int8 quant (absmax over a token's heads×dim —
    the same element set the merged [B, S, N·D] row would see, so scales
    match qlinear's exactly) + int8 contraction over (n, d), epilogue per
    ops/qgemm. Removes the merge_heads relayout penalty the quantized o
    paid vs FP (round-2 VERDICT weak #3); the reference's OpenSora hw path
    quantizes o too (quant_opensora_cuda.py:159-236)."""
    from wanq_tpu.quant.quantizers import _EPS_SYM

    st = ctx.state[name]
    b, n, s, d = y.shape
    yf = y.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(yf), axis=(1, 3))  # [B, S]
    scale = jnp.maximum(absmax / 127.0, _EPS_SYM)
    q = jnp.clip(
        jnp.round(yf / scale[:, None, :, None]), -128, 127
    ).astype(jnp.int8)
    w = st["w_int8"].reshape(n, d, -1)
    acc = jnp.einsum("bnsd,ndo->bso", q, w, preferred_element_type=jnp.int32)
    s_w = st["scale_w"].astype(jnp.float32)
    out = acc.astype(jnp.float32) * (scale[:, :, None] * s_w[None, None, :])
    zp_w = st.get("zp_w_int")
    if zp_w is not None:
        sum_a = scale * jnp.sum(q.astype(jnp.float32), axis=(1, 3))
        out = out + sum_a[:, :, None] * (zp_w.astype(jnp.float32) * s_w)[None, None, :]
    if po.get("b") is not None:
        out = out + po["b"].astype(jnp.float32)
    return out


def _o_heads_major_int8_ok(ctx: Optional[QuantCtx], name: str) -> bool:
    """True when the o-projection can run heads-major in int8: fused-class
    policy (8-bit sym dynamic act, no rotation/mask) with an unpacked int8
    weight (the packed-int4 layout keeps the merge path)."""
    from wanq_tpu.quant.qlinear import int8_fusable

    return (
        ctx is not None
        and int8_fusable(ctx, [name])
        and "w_int8" in ctx.state[name]
    )


def _self_attention(
    p: Params,
    name: str,
    ctx: Optional[QuantCtx],
    x: Optional[jax.Array],
    cfg: WanConfig,
    cos: jax.Array,
    sin: jax.Array,
    valid_len: int,
    dtype,
    plan=None,
    prequant=None,
    training: bool = False,
) -> jax.Array:
    """ref WanSelfAttention.forward (model.py:130-175). Under a sharding
    plan, q/k/v reshard from seq-sharded to head-sharded here — the Ulysses
    all-to-all (ref usp_attn_forward, xdit_context_parallel.py:66-192).
    ``prequant``: (q8, scale, sum) from the fused LN+modulate+quant op —
    one shared int8 activation feeds all three projections (the reference's
    QuantParams scratch pattern, quant_wanx_cuda.py:142)."""
    n, hd = cfg.num_heads, cfg.head_dim
    if prequant is not None:
        from wanq_tpu.quant.qlinear import w8a8_from_prequant

        q8, s_a, ssum = prequant
        b, s = q8.shape[0], q8.shape[1]
        # bf16 out: halves the GEMM-output HBM write; consumers (rms_norm,
        # rope) recompute in f32 internally so only the epilogue rounding
        # lands (PSNR-verified in bench)
        q = w8a8_from_prequant(ctx, f"{name}.q", p["q"], q8, s_a, ssum,
                               out_dtype=jnp.bfloat16)
        k = w8a8_from_prequant(ctx, f"{name}.k", p["k"], q8, s_a, ssum,
                               out_dtype=jnp.bfloat16)
        v = w8a8_from_prequant(ctx, f"{name}.v", p["v"], q8, s_a, ssum,
                               out_dtype=jnp.bfloat16)
    else:
        b, s, _ = x.shape
        # bf16 at rest from the projections on: norms/rope compute f32
        # internally, one final rounding (matches the reference's fp16
        # module dtype)
        q = qlinear(ctx, f"{name}.q", p["q"], x, dtype).astype(dtype)
        k = qlinear(ctx, f"{name}.k", p["k"], x, dtype).astype(dtype)
        v = qlinear(ctx, f"{name}.v", p["v"], x, dtype).astype(dtype)
    if plan is not None:
        # pin the projection outputs token-sharded: without this the
        # partitioner keeps activations FULL-seq at the block dot_generals
        # and pays seq all-gathers (~270 GB/step at 14B 720p,
        # tools/comm_model.py attribution); pinned, it all-gathers the far
        # smaller fsdp weight shards instead and the only seq movement left
        # is the intended Ulysses all-to-all at plan.heads below
        q, k, v = plan.tokens(q), plan.tokens(k), plan.tokens(v)
    # layout-friendly rope (x·ca + pairswap(x)·sb, see models/rope.py):
    # f32 compute inside the fusion, bf16 at rest — profiled ~10 ms/block
    # cheaper than the pair-reshape form on TPU. On the plain-attention
    # path the softmax scale folds into the q-side tables (one fewer
    # full-tensor pass); the quant/ring attention paths apply their own.
    plain_attn = not (
        (plan is not None and plan.ring_size > 1)
        or (ctx is not None and ctx.attn is not None
            and ctx.mode in ("int8", "sim"))
        or (ctx is not None and ctx.mode == "calib")
    )
    q_scale = (1.0 / math.sqrt(hd)) if plain_attn else 1.0
    # sliding temporal-window mask, resolved by dit_forward (None = dense).
    # The plain-attention paths take it, and so does ring context
    # parallelism (per-KV-shard band masks, parallel/ring.py) — calib
    # runs dense (window selection needs the full map mass) and the
    # attn-quant composition guards raise in dit_forward.
    window = None
    ring = plan is not None and plan.ring_size > 1
    if (ctx is not None and ctx.attn_window is not None
            and (plain_attn or ring)):
        assert isinstance(ctx.attn_window, TemporalWindow), ctx.attn_window
        window = ctx.attn_window

    # fused rms_norm→rope→head-split Pallas kernel (ops/rmsnorm_rope.py):
    # one HBM pass instead of norm + reshape + rope + transpose — the
    # profile's remaining ~130 ms of q/k relayout copies (BENCH_NOTES.md)
    if (
        cfg.qk_norm and plain_attn and plan is None and hd == 128
        and not training
        # map-capture passes need the q/k tensors in the non-fused path
        # (the pooled-map hook below) — the fused kernel early-returns
        and not (ctx is not None and ctx.attn_map_pool)
        and jax.default_backend() == "tpu"
        and os.environ.get("WANQ_FUSED_QK", "1") != "0"
    ):
        from wanq_tpu.models.attention import attention_heads_major
        from wanq_tpu.ops.rmsnorm_rope import (
            merge_heads, rms_rope_heads, split_heads)

        ca, sb = cos, sin
        if valid_len < s:
            pad = s - valid_len
            ca = jnp.concatenate(
                [ca[:valid_len], jnp.ones((pad, hd), ca.dtype)])
            sb = jnp.concatenate(
                [sb[:valid_len], jnp.zeros((pad, hd), sb.dtype)])
        qh = rms_rope_heads(q, p["norm_q"], ca * q_scale, sb * q_scale,
                            num_heads=n, eps=cfg.eps)
        kh = rms_rope_heads(k, p["norm_k"], ca, sb, num_heads=n, eps=cfg.eps)
        vh = split_heads(v, n, out_dtype=dtype)
        y = attention_heads_major(qh, kh, vh, k_valid_len=valid_len,
                                  window=window)
        if resolves_fp(ctx, f"{name}.o"):
            return _o_proj_heads_major(p["o"], y, dtype)
        if _o_heads_major_int8_ok(ctx, f"{name}.o"):
            return o_proj_heads_major_int8(ctx, f"{name}.o", p["o"], y)
        y = merge_heads(y, out_dtype=dtype)
        return qlinear(ctx, f"{name}.o", p["o"], y, dtype)

    if cfg.qk_norm:
        q = rms_norm(q, p["norm_q"], cfg.eps)
        k = rms_norm(k, p["norm_k"], cfg.eps)
    q = q.reshape(b, s, n, hd)
    k = k.reshape(b, s, n, hd)
    v = v.reshape(b, s, n, hd).astype(dtype)
    q = rope_apply_interleaved(q, cos, sin, valid_len, scale=q_scale).astype(dtype)
    k = rope_apply_interleaved(k, cos, sin, valid_len).astype(dtype)
    if ctx is not None and ctx.mode == "calib":
        # attention-calibration capture (ref SaveActivationHook types
        # 'qk'/'v', get_calib_data_wanx.py:227-238): per-(head, dim) absmax
        # of post-norm/rope q/k and of v — the inputs the attention
        # quantizers consume
        for tag, tensor in (("q", q), ("k", k), ("v", v)):
            ctx.collect[f"{name}.attn_{tag}"] = jnp.max(
                jnp.abs(tensor.astype(jnp.float32)), axis=(0, 1)
            )
        if ctx.attn_map_pool:
            # pooled post-softmax map (ref 'attn' hook type with max_pool2d
            # downsample) — feeds generate_reorder_tables
            from wanq_tpu.quant.attn import pooled_attn_map

            ctx.collect[f"{name}.attn_map"] = pooled_attn_map(
                q, k, ctx.attn_map_pool, k_valid_len=valid_len,
                reduce=ctx.attn_map_reduce,
            )
    elif ctx is not None and ctx.attn_map_pool:
        # quantized-deployment map capture: the 14B model only EXISTS as
        # int-at-rest streamed state on one chip (no FP copy to run a
        # calib sweep through), so per-head window calibration
        # (select_temporal_windows) captures maps from the deployed
        # int8/int4 model itself. attn_map_pool is only ever set by a
        # capture step fn (WanT2V.capture_attn_maps), which installs a
        # fresh collect dict inside the trace and returns its entries —
        # deployment ctxs never carry it.
        from wanq_tpu.quant.attn import pooled_attn_map

        ctx.collect[f"{name}.attn_map"] = pooled_attn_map(
            q, k, ctx.attn_map_pool, k_valid_len=valid_len,
            reduce=ctx.attn_map_reduce,
        )
    if plan is not None:
        q, k, v = plan.heads(q), plan.heads(k), plan.heads(v)
    if plan is not None and plan.ring_size > 1:
        # hybrid Ulysses×ring: heads sharded over 'sp', seq over 'ring';
        # KV shards rotate via ppermute (ref xFuserLongContextAttention,
        # xdit_context_parallel.py:179-184)
        if ctx is not None and ctx.attn is not None and ctx.mode in ("int8", "sim"):
            # Measured "never pays" (BENCH_NOTES.md round 4): attn-map
            # quant buys ZERO speed on this hardware (int8 PV measured
            # speed-neutral, tools/pv_int8_probe.py; int8 QK^T loses at
            # D=128), so its only role is fidelity SIMULATION of the
            # reference scheme — and the sim's row/block group scales are
            # statistics over the FULL map axis (per key column / per
            # global block), which under ring would need a per-column
            # all-reduce across the ring axis plus a second full pass over
            # every rotating KV shard: >=2x attention cost for a path
            # whose single-chip divergence from the sim is already bounded
            # at ~3 dB (tools/attn_divergence_probe.py). Simulate on one
            # chip or under Ulysses-only (--ring_size 1), deploy plain/int8
            # attention under ring.
            raise NotImplementedError(
                "attention-map quantization is not supported under ring "
                "context parallelism — measured to never pay on TPU (see "
                "BENCH_NOTES.md 'ring x attn-quant'); run with "
                "--ring_size 1 or drop the attn section"
            )
        y = plan.ring_attention(
            q.astype(dtype), k.astype(dtype), v, k_valid_len=valid_len,
            window=window,
        )
    elif ctx is not None and ctx.attn is not None and ctx.mode == "int8":
        # hardware path: int8 flash kernel (q/k per-row, v per-channel,
        # 127-level attn-map quant — ops/attn_int8.py)
        from wanq_tpu.ops.attn_int8 import attention_int8

        y = attention_int8(q, k, v, k_valid_len=valid_len)
    elif ctx is not None and ctx.attn is not None and ctx.mode == "sim":
        from wanq_tpu.quant.attn import quantized_attention

        y = quantized_attention(
            q, k, v, ctx.attn, k_valid_len=valid_len,
            perm=ctx.attn_perms.get(name),
        )
    elif plan is not None and plan.can_shard_heads(n):
        # pure Ulysses: explicit shard_map — the local splash kernel per
        # head shard, full seq per device (windows compose; GSPMD
        # auto-partitioning of the attention is never trusted with it)
        y = plan.ulysses_attention(
            q, k, v, scale=1.0 if plain_attn else None,
            k_valid_len=valid_len, window=window, trainable=training)
    else:
        # scale pre-folded into q's rope tables on the plain path
        y = attention(q, k, v, scale=1.0 if plain_attn else None,
                      k_valid_len=valid_len, trainable=training,
                      window=window)
    y = y.reshape(b, s, n * hd)
    if plan is not None:
        y = plan.tokens(y)
    return qlinear(ctx, f"{name}.o", p["o"], y, dtype)


def _cross_attention(
    p: Params,
    name: str,
    ctx: Optional[QuantCtx],
    x: Optional[jax.Array],
    context: jax.Array,
    cfg: WanConfig,
    dtype,
    plan=None,
    prequant=None,
    training: bool = False,
) -> jax.Array:
    """ref WanT2VCrossAttention / WanI2VCrossAttention (model.py:178-244).

    For i2v, context = [clip tokens (257) ; text tokens] along dim 1
    (model.py:225-226).
    ``prequant``: (q8, scale, sum) of the norm3 output from the fused
    LN+quant producer — feeds the int8 q projection (the reference's
    OpenSora hw path pre-quantizes cross-attn input the same way via
    quant_sum, quant_opensora_cuda.py:159-236).
    """
    n, hd = cfg.num_heads, cfg.head_dim
    if cfg.model_type == "i2v":
        context_img, context_txt = context[:, :257], context[:, 257:]
    else:
        context_txt = context
    # NOTE: in int8 mode cross-attention deliberately runs the SIMULATION
    # quantizer (quantized_attention), not the int8 flash kernel — at
    # KV = text_len (512) the int8 MXU path cannot pay for its quant
    # producers on this hardware (BENCH_NOTES.md); the reference's hw
    # path likewise keeps cross-attn FP (quant_wanx_cuda.py:136).

    if prequant is not None:
        from wanq_tpu.quant.qlinear import w8a8_from_prequant

        q8, s_a, ssum = prequant
        b = q8.shape[0]
        q = w8a8_from_prequant(ctx, f"{name}.q", p["q"], q8, s_a, ssum,
                               out_dtype=dtype)
    else:
        b = x.shape[0]
        # bf16 at rest out of the projections (the convert fuses into the
        # GEMM epilogue, halving the [B,S,C] q write + downstream read —
        # ~20 ms/step at 1.3B; the norms recompute f32 internally, matching
        # the self-attn path's rounding discipline)
        q = qlinear(ctx, f"{name}.q", p["q"], x, dtype).astype(dtype)
    if plan is not None:
        # queries stay token-sharded through cross-attention: KV is the
        # short text context (replicated), so each device attends its own
        # token shard with ZERO seq collectives — no Ulysses reshard needed
        q = plan.tokens(q)
    k = qlinear(ctx, f"{name}.k", p["k"], context_txt, dtype).astype(dtype)
    v = qlinear(ctx, f"{name}.v", p["v"], context_txt, dtype).astype(dtype)
    if cfg.qk_norm:
        k = rms_norm(k, p["norm_k"], cfg.eps)
    quant_attn = (
        ctx is not None and ctx.cross_attn is not None
        and ctx.mode in ("sim", "int8")
    )
    k = k.reshape(b, -1, n, hd).astype(dtype)
    v = v.reshape(b, -1, n, hd).astype(dtype)
    if cfg.model_type == "i2v":
        k_img = qlinear(ctx, f"{name}.k_img", p["k_img"], context_img, dtype)
        k_img = rms_norm(k_img, p["norm_k_img"], cfg.eps)
        v_img = qlinear(ctx, f"{name}.v_img", p["v_img"], context_img, dtype)
        k_img = k_img.reshape(b, -1, n, hd).astype(dtype)
        v_img = v_img.reshape(b, -1, n, hd).astype(dtype)

    if (
        not quant_attn and plan is None and hd == 128
        and not training
        and jax.default_backend() == "tpu"
        and os.environ.get("WANQ_FUSED_QK", "1") != "0"
    ):
        # q is the long side (the full latent sequence) — normalize and
        # head-split it in ONE Pallas pass (rms_split_heads), attend with
        # q heads-major, and feed the o-projection heads-major too: the
        # seq-major chain pays an f32 normalize write plus two full-q
        # relayout copies (~80 ms/step; tools/profile_step.py)
        from wanq_tpu.models.attention import cross_attention_heads_major
        from wanq_tpu.ops.rmsnorm_rope import (
            merge_heads, rms_split_heads, split_heads)

        if cfg.qk_norm:
            qh = rms_split_heads(
                q, p["norm_q"], n, eps=cfg.eps, out_dtype=dtype)
        else:
            qh = split_heads(q, n, out_dtype=dtype)
        y = cross_attention_heads_major(qh, k, v)
        if cfg.model_type == "i2v":
            y = y + cross_attention_heads_major(qh, k_img, v_img)
        if resolves_fp(ctx, f"{name}.o"):
            return _o_proj_heads_major(p["o"], y, dtype)
        if _o_heads_major_int8_ok(ctx, f"{name}.o"):
            return o_proj_heads_major_int8(ctx, f"{name}.o", p["o"], y)
        y = merge_heads(y, out_dtype=dtype)
        return qlinear(ctx, f"{name}.o", p["o"], y, dtype)

    if cfg.qk_norm:
        q = rms_norm(q, p["norm_q"], cfg.eps)
    q = q.reshape(b, -1, n, hd).astype(dtype)
    if quant_attn:
        from wanq_tpu.quant.attn import quantized_attention

        y = quantized_attention(q, k, v, ctx.cross_attn)
    else:
        y = attention(q, k, v, trainable=training)

    if cfg.model_type == "i2v":
        y = y + attention(q, k_img, v_img, trainable=training)

    y = y.reshape(b, -1, n * hd)
    if plan is not None:
        y = plan.tokens(y)
    return qlinear(ctx, f"{name}.o", p["o"], y, dtype)


def block_forward(
    p: Params,
    name: str,
    ctx: Optional[QuantCtx],
    x: jax.Array,
    e: jax.Array,
    context: jax.Array,
    cfg: WanConfig,
    cos: jax.Array,
    sin: jax.Array,
    valid_len: int,
    plan=None,
    training: bool = False,
) -> jax.Array:
    """ref WanAttentionBlock.forward (model.py:293-370). x: [B, L, C] f32."""
    dtype = cfg.dtype
    # modulation in fp32 (model.py:314-317)
    ee = (p["modulation"].astype(jnp.float32) + e).astype(jnp.float32)
    e0, e1, e2, e3, e4, e5 = [ee[:, i] for i in range(6)]

    from wanq_tpu.quant.qlinear import int8_fusable, int8_static_fusable

    qkv_sites = [f"{name}.self_attn.{l}" for l in ("q", "k", "v")]
    if training:
        # the fused producers are fwd-only Pallas kernels; QLoRA training
        # through the int8 path takes the plain qlinear route (the
        # QuantCtx.trainable dequant GEMMs differentiate)
        fusable_qkv = static_qkv = cq_static = cq_dyn = False
    else:
        static_qkv = all(int8_static_fusable(ctx, s) for s in qkv_sites)
        fusable_qkv = int8_fusable(ctx, qkv_sites)
        cq_site_ = f"{name}.cross_attn.q"
        cq_static = cfg.cross_attn_norm and int8_static_fusable(ctx, cq_site_)
        cq_dyn = cfg.cross_attn_norm and int8_fusable(ctx, [cq_site_])
    if static_qkv:
        # STATIC-scale shared producer (ref quant_sum_static, fused.cu:586
        # applied at the LN site): q/k/v see the same input, so their
        # calibrated scales coincide — one frozen per-tensor scale, no
        # absmax pass
        from wanq_tpu.ops.fused import ln_modulate_quant_static

        prequant = ln_modulate_quant_static(
            x, e0, e1, ctx.state[qkv_sites[0]]["delta_a"], eps=cfg.eps
        )
        if plan is not None:
            prequant = plan.prequant(prequant)
        y = _self_attention(
            p["self_attn"], f"{name}.self_attn", ctx, None, cfg,
            cos, sin, valid_len, dtype, plan=plan, prequant=prequant,
            training=training,
        )
    elif fusable_qkv:
        # fused LN + modulate + shared per-token int8 quant (one HBM pass
        # instead of an f32 LN write + three act-quant passes; the analog of
        # the reference's LayerNormGeneral + QuantParams, quant_wanx_cuda.py:142)
        from wanq_tpu.ops.fused import ln_modulate_quant

        prequant = ln_modulate_quant(x, e0, e1, eps=cfg.eps)
        if plan is not None:
            prequant = plan.prequant(prequant)
        y = _self_attention(
            p["self_attn"], f"{name}.self_attn", ctx, None, cfg,
            cos, sin, valid_len, dtype, plan=plan, prequant=prequant,
            training=training,
        )
    else:
        xn1 = layer_norm(x, cfg.eps) * (1.0 + e1[:, None, :]) + e0[:, None, :]
        y = _self_attention(
            p["self_attn"], f"{name}.self_attn", ctx, xn1.astype(dtype), cfg,
            cos, sin, valid_len, dtype, plan=plan, training=training,
        )
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e2[:, None, :]).astype(x.dtype)
    if plan is not None:
        # keep the residual stream token-sharded between sublayers so the
        # scan carry (and every LN/producer reading it) never re-gathers seq
        x = plan.tokens(x)

    cq_site = f"{name}.cross_attn.q"
    if cq_static or cq_dyn:
        # fused norm3 + per-token int8 quant: the affine LN maps onto the
        # ln_modulate producer with scale = w-1, shift = b, so the bf16
        # xn3 write and the separate act-quant passes collapse into one
        # HBM pass feeding the int8 q GEMM (ref LayerNormGeneral pattern,
        # quant_wanx_cuda.py:142; OpenSora cross-attn quant_sum,
        # quant_opensora_cuda.py:159-236)
        from wanq_tpu.ops.fused import (
            ln_modulate_quant,
            ln_modulate_quant_static,
        )

        w3 = p["norm3"]["w"].astype(jnp.float32)
        b3 = p["norm3"]["b"].astype(jnp.float32)
        bsz = x.shape[0]
        shift3 = jnp.broadcast_to(b3[None, :], (bsz, b3.shape[0]))
        scale3 = jnp.broadcast_to((w3 - 1.0)[None, :], (bsz, w3.shape[0]))
        if cq_static:
            cq_prequant = ln_modulate_quant_static(
                x, shift3, scale3, ctx.state[cq_site]["delta_a"], eps=cfg.eps
            )
        else:
            cq_prequant = ln_modulate_quant(x, shift3, scale3, eps=cfg.eps)
        if plan is not None:
            cq_prequant = plan.prequant(cq_prequant)
        y = _cross_attention(
            p["cross_attn"], f"{name}.cross_attn", ctx, None,
            context, cfg, dtype, plan=plan, prequant=cq_prequant,
            training=training,
        )
    else:
        if cfg.cross_attn_norm:
            xn3 = layer_norm(x, cfg.eps, p["norm3"]["w"], p["norm3"]["b"])
        else:
            xn3 = x
        y = _cross_attention(
            p["cross_attn"], f"{name}.cross_attn", ctx, xn3.astype(dtype),
            context, cfg, dtype, plan=plan, training=training,
        )
    x = (x.astype(jnp.float32) + y.astype(jnp.float32)).astype(x.dtype)
    if plan is not None:
        x = plan.tokens(x)

    ffn_sites = [f"{name}.ffn.0", f"{name}.ffn.2"]
    from wanq_tpu.quant.qlinear import int8_static_fusable

    ffn2_static = int8_static_fusable(ctx, ffn_sites[1])
    if not training and int8_fusable(ctx, [ffn_sites[0]], allow_mask=True) and (
        ffn2_static or int8_fusable(ctx, [ffn_sites[1]], allow_mask=True)
    ):
        # fused LN+modulate+quant → int8 GEMM (bf16 out) → fused GELU+quant
        # → int8 GEMM (the reference's FFNWithCudaKernel gelu_quant_sum
        # pipeline, quant_wanx_cuda.py:521-563)
        from wanq_tpu.ops.fused import ln_modulate_quant, quant_sum
        from wanq_tpu.quant.qlinear import w8a8_from_prequant

        st0 = ctx.state[ffn_sites[0]]
        st2 = ctx.state[ffn_sites[1]]
        h8, s_a, ssum = ln_modulate_quant(
            x, e3, e4, eps=cfg.eps, channel_scale=st0.get("channel_mask")
        )
        if plan is not None:
            h8, s_a, ssum = plan.prequant((h8, s_a, ssum))
        h = w8a8_from_prequant(ctx, ffn_sites[0], p["ffn"]["0"], h8, s_a, ssum,
                               out_dtype=jnp.bfloat16)
        if plan is not None:
            h = plan.tokens(h)
        bh, nh = h.shape[:2]
        if ffn2_static:
            # static-scale GELU+quant (ref quant_sum_static, fused.cu:586):
            # elementwise → XLA fuses it into the first GEMM's epilogue, so
            # the bf16 intermediate never round-trips HBM
            scale2 = st2["delta_a"].reshape(()).astype(jnp.float32)
            g = gelu_tanh(h.astype(jnp.float32))
            h8b = jnp.clip(jnp.round(g / scale2), -128, 127).astype(jnp.int8)
            s2 = jnp.full((bh, nh), scale2, jnp.float32)
            sm2 = scale2 * jnp.sum(
                h8b, axis=-1, dtype=jnp.float32
            )
        else:
            # 3D-native (no [B·N, C] flatten — it would full-gather the
            # token-sharded seq dim under GSPMD, see w8a8_linear_xla)
            h8b, s2, sm2 = quant_sum(
                h, gelu=True, channel_scale=st2.get("channel_mask"),
            )
        if plan is not None:
            h8b, s2, sm2 = plan.prequant((h8b, s2, sm2))
        y = w8a8_from_prequant(
            ctx, ffn_sites[1], p["ffn"]["2"], h8b, s2, sm2,
        )
    else:
        xn2 = layer_norm(x, cfg.eps) * (1.0 + e4[:, None, :]) + e3[:, None, :]
        h = qlinear(ctx, f"{name}.ffn.0", p["ffn"]["0"], xn2.astype(dtype), dtype)
        if plan is not None:
            h = plan.tokens(h)
        h = gelu_tanh(h).astype(dtype)
        y = qlinear(ctx, f"{name}.ffn.2", p["ffn"]["2"], h, dtype)
    x = (x.astype(jnp.float32) + y.astype(jnp.float32) * e5[:, None, :]).astype(x.dtype)
    if plan is not None:
        x = plan.tokens(x)
    return x


def head_forward(
    p: Params, x: jax.Array, e: jax.Array, cfg: WanConfig,
    ctx: Optional[QuantCtx] = None,
) -> jax.Array:
    """ref Head.forward (model.py:390-400). e: [B, C] time embedding."""
    ee = p["head"]["modulation"].astype(jnp.float32) + e[:, None, :]
    e0, e1 = ee[:, 0], ee[:, 1]
    xn = layer_norm(x, cfg.eps) * (1.0 + e1[:, None, :]) + e0[:, None, :]
    return qlinear(ctx, "head.head", p["head"]["head"], xn.astype(cfg.dtype))


def dit_forward(
    params: Params,
    cfg: WanConfig,
    x: jax.Array,
    t: jax.Array,
    context: jax.Array,
    seq_len: int,
    ctx: Optional[QuantCtx] = None,
    clip_fea: Optional[jax.Array] = None,
    y: Optional[jax.Array] = None,
    plan=None,
    remat: bool = False,
    training: bool = False,
) -> jax.Array:
    """Denoising forward (ref WanModel.forward, model.py:539-631).

    x: [B, C_in, F, H, W] latent video (+ y concat for i2v)
    t: [B] timesteps; context: [B, text_len, text_dim] T5 states.
    Returns [B, C_out, F, H, W] float32.
    ``plan``: optional wanq_tpu.parallel.ShardingPlan for GSPMD multi-chip
    execution (ref usp_dit_forward, xdit_context_parallel.py).
    ``training``: route attention and producers through reverse-mode-
    differentiable implementations (the inference fast paths — splash
    attention, fused Pallas layout kernels — are fwd-only).
    ``remat``: rematerialize each block under autodiff (jax.checkpoint) —
    activation memory drops from O(layers) to O(1) blocks, the standard
    TPU trade for 14B-scale training (the reference leans on torch FSDP
    activation offload instead).
    """
    dtype = cfg.dtype
    if training and ctx is not None and ctx.mode == "int8" and not ctx.trainable:
        # QLoRA/QAT route: int-at-rest weights dequantize transiently for
        # differentiable GEMMs (the Pallas int kernels are fwd-only)
        ctx = ctx.replace(trainable=True)
    if y is not None:
        x = jnp.concatenate([x, y], axis=1)  # i2v channel concat (model.py:577)

    b = x.shape[0]
    grid = (
        x.shape[2] // cfg.patch_size[0],
        x.shape[3] // cfg.patch_size[1],
        x.shape[4] // cfg.patch_size[2],
    )
    tokens = patchify(x, cfg.patch_size)
    xq = qlinear(None, "patch_embedding", params["patch_embedding"],
                 tokens.astype(dtype), dtype)
    valid_len = xq.shape[1]
    assert valid_len <= seq_len, (valid_len, seq_len)
    if valid_len < seq_len:
        xq = jnp.pad(xq, ((0, 0), (0, seq_len - valid_len), (0, 0)))
    if plan is not None:
        xq = plan.tokens(xq)

    # time embeddings, fp32 (model.py:592-596)
    e = sinusoidal_embedding_1d(cfg.freq_dim, t)
    e = qlinear(ctx, "time_embedding.0", params["time_embedding"]["0"], e[:, None, :],
                jnp.float32)
    e = jax.nn.silu(e)
    e = qlinear(ctx, "time_embedding.2", params["time_embedding"]["2"], e,
                jnp.float32)[:, 0]  # [B, dim]
    e0 = qlinear(ctx, "time_projection.1", params["time_projection"]["1"],
                 jax.nn.silu(e)[:, None, :], jnp.float32)
    e0 = e0.reshape(b, 6, cfg.dim)  # [B, 6, dim]

    # text embedding MLP (model.py:600-605); context pre-padded to text_len
    c = qlinear(ctx, "text_embedding.0", params["text_embedding"]["0"],
                context.astype(dtype), dtype)
    c = gelu_tanh(c).astype(dtype)
    c = qlinear(ctx, "text_embedding.2", params["text_embedding"]["2"], c, dtype)
    c = c.astype(dtype)

    if cfg.model_type == "i2v":
        assert clip_fea is not None
        ip = params["img_emb"]["proj"]
        ci = layer_norm(clip_fea, 1e-5, ip["0"]["w"], ip["0"]["b"]).astype(dtype)
        ci = qlinear(None, "img_emb.proj.1", ip["1"], ci, dtype)
        ci = jax.nn.gelu(ci, approximate=False).astype(dtype)
        ci = qlinear(None, "img_emb.proj.3", ip["3"], ci, dtype)
        ci = layer_norm(ci, 1e-5, ip["4"]["w"], ip["4"]["b"]).astype(dtype)
        c = jnp.concatenate([ci, c], axis=1)

    cos, sin = (
        jnp.asarray(a) for a in rope_tables_interleaved(grid, cfg.head_dim)
    )

    if ctx is not None and ctx.attn_window is not None:
        # resolve the sliding temporal-window spec against THIS input's
        # latent grid (static: grid comes from shapes). The hardware
        # block-sparse mask is the TPU execution of the reference's 0-bit
        # attention-map blocks (quant_attn.py bitwidth-0 pruning).
        aw = ctx.attn_window
        tpf = grid[1] * grid[2]
        if isinstance(aw, TemporalWindow):
            win = aw
        elif isinstance(aw, (tuple, list)):
            # per-head radii (calibration-derived) — grouped splash calls
            # per unique radius keep the zero-memory mask path per group.
            # A negative per-head entry means dense for THAT head (the
            # per-head analog of the scalar negative=dense convention):
            # map it to a radius covering every frame pair BEFORE
            # TemporalWindow's nonneg invariant, so the group machinery
            # degrades it to the dense prefix mask.
            radii = tuple(int(r) for r in aw)
            assert len(radii) == cfg.num_heads, (
                f"{len(radii)} window radii for {cfg.num_heads} heads")
            radii = tuple(grid[0] if r < 0 else r for r in radii)
            if len(set(radii)) == 1:
                # uniform per-head radii ARE the scalar window — collapse
                # here so every consumer (ring band masks included) sees
                # the scalar form
                win = TemporalWindow(tokens_per_frame=tpf, radius=radii[0])
            else:
                win = TemporalWindow(tokens_per_frame=tpf, radius=max(radii),
                                     head_radii=radii)
        else:
            win = TemporalWindow(tokens_per_frame=tpf, radius=int(aw))
        min_r = min(win.head_radii) if win.head_radii else win.radius
        if min_r < 0 or min_r >= grid[0] - 1:
            win = None  # every head covers every frame pair -> dense
        if win is not None:
            if training:
                raise NotImplementedError(
                    "attn_window is inference-only: the splash sparse mask "
                    "kernel is fwd-only (train dense, deploy windowed)")
            if ctx.attn is not None and ctx.mode in ("sim", "int8"):
                raise NotImplementedError(
                    "attn_window does not compose with attention-map "
                    "quantization: the sim materializes the full map and "
                    "the int8 kernel is dense — window the plain/int8-GEMM "
                    "deployment instead (drop the attn: section)")
            if (win.head_radii is not None
                    and len(set(win.head_radii)) > 1
                    and plan is not None and plan.sp_size > 1):
                # uniform windows compose with BOTH multi-chip attention
                # modes (Ulysses: full seq per head shard; ring:
                # per-KV-shard band masks in parallel/ring.py). Per-head
                # radii do not: the grouped splash path permutes and
                # unevenly slices the head axis, which GSPMD can only run
                # by resharding the head-sharded operands (silent
                # all-to-alls at 14B scale), and ring would need per-head
                # band masks in the fold.
                raise NotImplementedError(
                    "per-head window radii under sequence parallelism: "
                    "deploy a uniform window (scalar attn_window) on the "
                    "mesh, or per-head radii on a single chip")
        # calib AND map-capture passes run DENSE (window selection needs
        # full-map mass), but the resolved/None form is what
        # _self_attention consumes elsewhere. collect passes by REFERENCE:
        # replace() defaults to copying it, which would silently drop
        # calibration stats from the caller's ctx
        dense_pass = ctx.mode == "calib" or bool(ctx.attn_map_pool)
        ctx = ctx.replace(attn_window=None if dense_pass else win,
                          collect=ctx.collect)

    xf = xq.astype(cfg.res_dtype)  # residual-stream dtype (configs)
    if isinstance(params["blocks"], dict):
        # stacked-block form: one compiled block body via lax.scan (30-40x
        # smaller XLA graph than the unrolled loop — essential for 14B
        # compile times). Produced by stack_block_params().
        xf, scan_stats = _scan_blocks(
            params["blocks"], ctx, xf, e0, c, cfg, cos, sin, valid_len, plan,
            remat=remat, training=training,
        )
        if ctx is not None and (ctx.mode == "calib" or ctx.attn_map_pool):
            # unstack per-block stats into reference-style names (calib
            # sweep, or quantized-deployment map capture — see the
            # attn_map_pool gate in _self_attention)
            for suffix, arr in scan_stats.items():
                for i in range(cfg.num_layers):
                    ctx.collect[f"blocks.{i}.{suffix}"] = arr[i]
    else:
        for i in range(cfg.num_layers):
            def body(bp, xf_, e0_, c_, _i=i):
                if plan is not None:
                    bp = plan.gather_weights(bp)
                return block_forward(
                    bp, f"blocks.{_i}", ctx, xf_, e0_, c_, cfg,
                    cos, sin, valid_len, plan=plan, training=training,
                )

            if remat:
                body = jax.checkpoint(body)
            xf = body(params["blocks"][i], xf, e0, c)

    out = head_forward(params, xf, e, cfg, ctx)
    return unpatchify(out.astype(jnp.float32), grid, cfg.patch_size, cfg.out_dim)


# ---------------------------------------------------------------------------
# scan-over-blocks (stacked params)
# ---------------------------------------------------------------------------

_SCAN_NAME = "blocks.0"  # per-block policies must be uniform under scan


def stack_block_params(params: Params) -> Params:
    """Stack the per-block param list into leaves with a leading [L] dim
    (one-time, at load). dit_forward then scans one compiled block body."""
    blocks = params["blocks"]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *blocks)
    out = dict(params)
    out["blocks"] = stacked
    return out


def stack_quant_state(
    ctx: QuantCtx, num_layers: int
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Split ctx.state into (non-block state, per-suffix stacked block
    state with leading [L]); asserts per-block policy uniformity."""
    suffixes = sorted(
        {k.split(".", 2)[2] for k in ctx.state if k.startswith("blocks.")}
    )
    stacked = {}
    for sfx in suffixes:
        per_block = [ctx.state[f"blocks.{i}.{sfx}"] for i in range(num_layers)]
        pol0 = ctx.policies[f"blocks.0.{sfx}"]
        for i in range(num_layers):
            assert ctx.policies[f"blocks.{i}.{sfx}"] == pol0, (
                "scan-over-blocks requires uniform per-block policies; "
                f"blocks.{i}.{sfx} differs — use unstacked (list) params"
            )
        stacked[sfx] = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *per_block)
    other = {k: v for k, v in ctx.state.items() if not k.startswith("blocks.")}
    return other, stacked


def make_scan_ctx(ctx: QuantCtx, num_layers: int) -> QuantCtx:
    """Pre-stack the per-block quant state once (outside jit) so the scan
    body consumes it as xs instead of re-stacking at every trace."""
    other, stacked = stack_quant_state(ctx, num_layers)
    return ctx.replace(state=other, scan_state=stacked)


def _scan_blocks(bp_stacked, ctx, xf, e0, c, cfg, cos, sin, valid_len, plan,
                 remat: bool = False, training: bool = False):
    stacked_state: Dict[str, Any] = {}
    if ctx is not None and ctx.scan_state is not None:
        stacked_state = ctx.scan_state
    elif ctx is not None and ctx.state:
        _, stacked_state = stack_quant_state(ctx, cfg.num_layers)

    mode = ctx.mode if ctx is not None else "fp"
    policies = ctx.policies if ctx is not None else {}
    rotations = ctx.rotations if ctx is not None else {}

    stacked_perms: Dict[str, jax.Array] = {}
    if ctx is not None and ctx.attn_perms:
        # per-block reorder tables ([H, S] int32) stack to [L, H, S] and
        # ride the scan as xs — each iteration gets its own block's perm
        # (ref optimal_reorder tables are per-block, quant_attn.py:176-238)
        non_block = [k for k in ctx.attn_perms if not k.startswith("blocks.")]
        assert not non_block, (
            f"attn perms outside blocks cannot ride scan: {non_block}"
        )
        for sfx in sorted({k.split(".", 2)[2] for k in ctx.attn_perms}):
            stacked_perms[sfx] = jnp.stack(
                [
                    jnp.asarray(ctx.attn_perms[f"blocks.{i}.{sfx}"])
                    for i in range(cfg.num_layers)
                ],
                axis=0,
            )

    def body(carry, xs):
        bp, bstate, bperms = xs
        if plan is not None:
            # ZeRO-3 use-time gather (see ShardingPlan.gather_weights):
            # this block's weight + quant-state slice replicates for the
            # duration of one iteration; all block dots run comm-free on
            # token-sharded activations
            bp = plan.gather_weights(bp)
            bstate = plan.gather_weights(bstate)
        sub = None
        if ctx is not None:
            # the per-block view carries every behavior flag (ctx.replace)
            # with this iteration's xs slices as its state; collect must be
            # FRESH — the body's calibration entries are extracted below
            # and outer entries would be mis-stripped into scan outputs
            sub = ctx.replace(
                state={f"{_SCAN_NAME}.{sfx}": st for sfx, st in bstate.items()},
                policies={
                    k: v for k, v in policies.items()
                    if k.startswith(_SCAN_NAME + ".")
                },
                attn_perms={
                    f"{_SCAN_NAME}.{sfx}": p for sfx, p in bperms.items()
                },
                scan_state=None,
                collect={},
            )
        y = block_forward(
            bp, _SCAN_NAME, sub, carry, e0, c, cfg, cos, sin, valid_len,
            plan=plan, training=training,
        )
        ys = {}
        if sub is not None and (mode == "calib" or ctx.attn_map_pool):
            ys = {
                k[len(_SCAN_NAME) + 1 :]: v for k, v in sub.collect.items()
            }
        return y, ys

    if remat:
        # rematerialize each scanned block under autodiff: activation
        # memory O(1) blocks instead of O(layers)
        body = jax.checkpoint(body)
    xf, stats = jax.lax.scan(
        body, xf, (bp_stacked, stacked_state, stacked_perms)
    )
    return xf, stats
