"""Attention quantization: Q/K/V + post-softmax attention-map quant.

TPU-native rebuild of the fullest ViDiT-Q capability surface
(qdiff/base/quant_attn.py:118-241 QuantizedAttentionMapOpenSORA and the
QuantizedAttention q/k/v scheme of models/quant_opensora.py:321-478):

  q, k      dynamic per-(token, head) row quant over head_dim
  v         dynamic per-(head, channel) quant over tokens (transposed)
  attn map  post-softmax quant, group ∈
              'row'    per key column (quant_attn.py:168-174)
              'block'  2-level block decomposition with block-max deltas,
                       optional int8-quantized scales and per-block
                       mixed-precision bit masks incl. 0-bit pruning
                       (quant_attn.py:176-238); text rows/cols stay FP

The reference loops python-side over (batch, head) with per-head reorder
tables; here the block decomposition is a vectorized reshape with one
static block size per call and an optional per-head token permutation —
same math, jit/shard-friendly. ``forward_with_quant_params`` semantics
(unsigned map in [0,1], delta/(2·nl+1) steps, 0-bit masking) follow
base_quantizer.py:164-206 exactly.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from wanq_tpu.quant.quantizers import QuantizerCfg, dynamic_fake_quant, n_levels_for

_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class AttnQuantCfg:
    """Resolved from the quant YAML's attn / cross_attn sections
    (ref quant_attn.py:18-35 config surface)."""

    qk: Optional[QuantizerCfg] = None
    v: Optional[QuantizerCfg] = None
    attn_map: Optional[QuantizerCfg] = None
    attn_map_group: str = "row"  # 'row' | 'block'
    n_text_tokens: int = 0
    block_size: int = 0  # tokens per block side ('block' group)
    int8_scale: bool = False

    @classmethod
    def from_dict(cls, d: Optional[Dict[str, Any]]) -> Optional["AttnQuantCfg"]:
        if not d:
            return None

        def qcfg(sub):
            if not sub:
                return None
            nb = sub["n_bits"]
            nb = tuple(nb) if isinstance(nb, (list, tuple)) else int(nb)
            return QuantizerCfg(n_bits=nb, sym=bool(sub.get("sym", True)))

        am = d.get("attn_map") or {}
        return cls(
            qk=qcfg(d.get("qk")),
            v=qcfg(d.get("v")),
            attn_map=qcfg(am),
            attn_map_group=am.get("group", "row"),
            n_text_tokens=int(d.get("n_text_tokens", 0)),
            block_size=int(am.get("block_size", 0)),
            int8_scale=bool(am.get("int8_scale", False)),
        )


def quantize_qk(x: jax.Array, cfg: QuantizerCfg) -> jax.Array:
    """q/k fake-quant, one scale per (b, h, token) row over head_dim
    (ref quant_opensora.py:433-438)."""
    shape = x.shape
    return dynamic_fake_quant(x.reshape(-1, shape[-1]), cfg).reshape(shape)


def quantize_v(v: jax.Array, cfg: QuantizerCfg) -> jax.Array:
    """v fake-quant, one scale per (b, h, channel) over tokens
    (ref quant_opensora.py:441-443)."""
    b, h, s, d = v.shape
    vt = v.transpose(0, 1, 3, 2).reshape(-1, s)
    vq = dynamic_fake_quant(vt, cfg)
    return vq.reshape(b, h, d, s).transpose(0, 1, 3, 2)


def _fake_quant_with_delta(
    x: jax.Array, delta: jax.Array, n_bits: int, bits_mask: Optional[jax.Array]
) -> jax.Array:
    """ref DynamicQuantizer.forward_with_quant_params
    (base_quantizer.py:164-206): unsigned quant of in-[0,1] maps with a
    precomputed per-element delta (the block max)."""
    delta = jnp.where(delta < _EPS, _EPS, delta)
    if bits_mask is not None:
        n_levels = jnp.power(2.0, bits_mask) - 1.0
        zero_mask = (n_levels != 0).astype(x.dtype)
        n_levels = jnp.where(n_levels == 0, 255.0, n_levels)
        step = delta / n_levels
        x_int = jnp.round(x / step)
        x_q = jnp.minimum(x_int, n_levels)
        return x_q * step * zero_mask
    nl = n_levels_for(n_bits, sym=True)
    step = delta / (nl * 2 + 1)
    x_int = jnp.round(x / step)
    x_q = jnp.clip(x_int, 0, nl * 2 + 1)
    return x_q * step


def quantize_attn_map_row(attn: jax.Array, cfg: QuantizerCfg) -> jax.Array:
    """Per-key-column groups (ref quant_attn.py:168-174: transpose, one
    scale per row of the transposed map). attn: [B, H, Sq, Sk]."""
    b, h, sq, sk = attn.shape
    at = attn.transpose(0, 1, 3, 2).reshape(-1, sq)
    aq = dynamic_fake_quant(at, cfg)
    return aq.reshape(b, h, sk, sq).transpose(0, 1, 3, 2)


def quantize_attn_map_block(
    attn: jax.Array,
    cfg: QuantizerCfg,
    block_size: int,
    n_text_tokens: int = 0,
    int8_scale: bool = False,
    bits_mask: Optional[jax.Array] = None,
    perm: Optional[jax.Array] = None,
) -> jax.Array:
    """Blockwise attn-map quant (ref quant_attn.py:176-238).

    attn: [B, H, S, S]. The image-token submap (text rows/cols stay FP,
    ref :186-187) is tiled into (block_size × block_size) blocks; each
    block quantizes with delta = its max. ``int8_scale`` additionally
    int8-quantizes the per-block deltas against the per-head delta max
    (ref :211-218). ``bits_mask`` [n_img/bs, n_img/bs] or broadcastable
    assigns per-block bitwidths (0 = prune). ``perm`` [H, n_img] applies a
    per-head token reorder before blocking (the reference's
    optimal_reorder tables; optional)."""
    b, h, s, _ = attn.shape
    nt = n_text_tokens
    img = attn[:, :, nt:, nt:]
    n_img = s - nt
    assert n_img % block_size == 0, (n_img, block_size)
    nb = n_img // block_size

    if perm is not None:
        assert perm.shape == (h, n_img), (
            f"reorder table shape {perm.shape} != (heads, image tokens) "
            f"({h}, {n_img}) — tables are geometry-specific; regenerate for "
            "this latent size"
        )
        img = jnp.take_along_axis(img, perm[None, :, :, None], axis=2)
        img = jnp.take_along_axis(img, perm[None, :, None, :], axis=3)

    blocks = img.reshape(b, h, nb, block_size, nb, block_size)
    delta = jnp.max(blocks, axis=(3, 5))  # [B, H, nb, nb]

    if int8_scale:
        # int8-quantize the deltas against their per-(b,h) max (ref :211-218)
        dmax = jnp.max(delta, axis=(2, 3), keepdims=True)
        dmax = jnp.where(dmax < _EPS, _EPS, dmax)
        nl = 127
        step = dmax / (nl * 2 + 1)
        delta = jnp.clip(jnp.round(delta / step), 0, nl * 2 + 1) * step

    delta_full = jnp.repeat(jnp.repeat(delta, block_size, axis=2), block_size, axis=3)
    bm_full = None
    if bits_mask is not None:
        bm = jnp.broadcast_to(bits_mask, (nb, nb))
        bm_full = jnp.repeat(jnp.repeat(bm, block_size, axis=0), block_size, axis=1)
        bm_full = jnp.broadcast_to(bm_full, img.shape)

    img_q = _fake_quant_with_delta(img, delta_full, cfg.active_bits, bm_full)

    if perm is not None:
        inv = jnp.argsort(perm, axis=1)
        img_q = jnp.take_along_axis(img_q, inv[None, :, :, None], axis=2)
        img_q = jnp.take_along_axis(img_q, inv[None, :, None, :], axis=3)

    return attn.at[:, :, nt:, nt:].set(img_q)


def pooled_attn_map(
    q: jax.Array,
    k: jax.Array,
    pool: int,
    scale: Optional[float] = None,
    k_valid_len: Optional[int] = None,
    chunk: int = 1024,
    reduce: str = "max",
) -> jax.Array:
    """Pooled post-softmax attention map for calibration.

    q, k: [B, S, N, D] (post-rope). Returns [N, S//pool, S//pool] — the max
    over batch of the 2D max-pooled softmax map (ref SaveActivationHook
    'attn' type with max_pool2d downsample, get_calib_data_wanx.py:227-238).
    Computed q-chunk at a time so the full S×S map never materializes.
    ``reduce='mean'`` averages over batch and pool windows instead — the
    MASS-preserving form (each row's pooled cells sum to ~1/pool of the
    softmax mass) that :func:`select_temporal_windows` needs; max-pooling
    overweights sparse tails and cannot rank retained mass.
    """
    assert reduce in ("max", "mean"), reduce
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    b, s, n, d = q.shape
    assert s % pool == 0, (s, pool)
    # HBM cap: the per-chunk f32 score block is [B, N, chunk, S] — at 14B
    # deploy shapes (N=40, S=75776) the default chunk would transiently
    # take >10 GB next to the streamed weight state; halve the chunk until
    # the block fits in ~1.5 GB (lax.map keeps only one chunk live)
    while chunk > pool and b * n * chunk * s * 4 > 1.5e9:
        chunk //= 2
    chunk = min(chunk, s)
    while s % chunk:
        chunk //= 2
    chunk = max(chunk, pool)
    assert chunk % pool == 0, (chunk, pool)
    # bf16 operands + f32 accumulation: the einsum rides the MXU at full
    # rate and the q/k copies halve — mass-fraction selection doesn't
    # need f32 scores (softmax still computed in f32)
    qh = jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16)  # [B, N, S, D]
    kh = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
    kv_mask = None
    if k_valid_len is not None and k_valid_len < s:
        kv_mask = jnp.arange(s) < k_valid_len

    def one_chunk(q_chunk):  # [B, N, chunk, D]
        scores = jnp.einsum("bnqd,bnkd->bnqk",
                            (q_chunk.astype(jnp.float32) * scale
                             ).astype(jnp.bfloat16), kh,
                            preferred_element_type=jnp.float32)
        if kv_mask is not None:
            scores = jnp.where(kv_mask[None, None, None, :], scores,
                               jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(scores, axis=-1)
        pb = p.reshape(b, n, chunk // pool, pool, s // pool, pool)
        if reduce == "mean":
            return jnp.mean(pb, axis=(0, 3, 5))
        return jnp.max(pb, axis=(0, 3, 5))  # [N, chunk/pool, S/pool]

    chunks = qh.reshape(b, n, s // chunk, chunk, d).transpose(2, 0, 1, 3, 4)
    pooled = jax.lax.map(one_chunk, chunks)  # [n_chunks, N, chunk/p, S/p]
    return pooled.transpose(1, 0, 2, 3).reshape(n, s // pool, s // pool)


def generate_reorder_tables(
    attn_maps: Dict[str, Any], pool: int = 1, iters: int = 8
) -> Dict[str, Any]:
    """Calibration-driven per-head token reorder tables.

    ``attn_maps``: {layer: [H, Sp, Sp]} pooled post-softmax maps from
    :func:`pooled_attn_map`. For each head, tokens are ordered by their
    coordinate along the map's dominant singular vector (power iteration)
    so rows with similar attention profiles land adjacently — which is
    what tightens the per-block deltas of the blockwise quantizer. This is
    the in-framework generator for the role the reference fills with
    offline `optimal_reorder` tables (quant_attn.py:176-238,
    reorder_file_path config). Returns {layer: perm [H, S]} int32 with
    S = Sp·pool, consumable by :func:`quantize_attn_map_block` /
    ``QuantCtx.attn_perms``.
    """
    import numpy as np

    out = {}
    for layer, maps in attn_maps.items():
        maps = np.asarray(maps, dtype=np.float64)
        h, sp, _ = maps.shape
        perms = np.empty((h, sp * pool), dtype=np.int32)
        for i in range(h):
            a = maps[i]
            v = np.ones(sp) / math.sqrt(sp)
            for _ in range(iters):
                v = a.T @ (a @ v)
                nrm = np.linalg.norm(v)
                if nrm < 1e-30:
                    break
                v = v / nrm
            score = a @ v
            order = np.argsort(score, kind="stable")
            # expand pooled order back to token granularity (tokens inside
            # a pool window keep their relative order)
            tok = (order[:, None] * pool + np.arange(pool)[None, :]).reshape(-1)
            perms[i] = tok.astype(np.int32)
        out[layer] = perms
    return out


def select_temporal_windows(
    attn_maps: Dict[str, Any],
    tokens_per_frame: int,
    pool: int,
    threshold: float = 0.95,
    valid_len: Optional[int] = None,
) -> Dict[str, Any]:
    """Calibration-driven sliding-window radii for block-sparse attention.

    ``attn_maps``: {layer: [H, Sp, Sp]} MEAN-pooled post-softmax maps
    (:func:`pooled_attn_map` with ``reduce='mean'``). For each head, finds
    the smallest radius r (in latent frames) such that attention mass
    within |frame(q) − frame(k)| <= r is at least ``threshold`` of the
    total. This is the mass-retention criterion the sliding-tile-attention
    literature profiles per head — the in-framework generator for
    ``QuantCtx.attn_window`` (the deployment collapses per-head radii via
    :func:`collapse_window_radii`; splash's zero-memory in-kernel mask
    path needs one shared mask across heads).

    Returns {layer: np.ndarray [H] int radii}.
    """
    import numpy as np

    out = {}
    for layer, maps in attn_maps.items():
        maps = np.asarray(maps, dtype=np.float64)
        h, sp, _ = maps.shape
        # frame id of each pooled cell (cell centre); pooled cells beyond
        # the valid prefix carry ~zero mass (masked softmax) and don't bias
        # the fractions
        frames = (np.arange(sp) * pool + pool // 2) // tokens_per_frame
        n_frames = int(frames[-1]) + 1
        if valid_len is not None:
            n_frames = min(n_frames, -(-valid_len // tokens_per_frame))
        dist = np.abs(frames[:, None] - frames[None, :])  # [Sp, Sp]
        radii = np.empty(h, dtype=np.int32)
        for i in range(h):
            total = maps[i].sum()
            if total <= 0:
                radii[i] = n_frames - 1
                continue
            for r in range(n_frames):
                if maps[i][dist <= r].sum() / total >= threshold:
                    radii[i] = r
                    break
            else:
                radii[i] = n_frames - 1
        out[layer] = radii
    return out


def collapse_window_radii(windows: Dict[str, Any]) -> int:
    """Collapse per-layer/per-head radii to ONE deployable radius (max —
    conservative: no head loses more mass than its own threshold). One
    radius is required twice over: the scan-over-blocks path compiles one
    block body, and splash's in-kernel mask_function fast path (zero
    materialized mask bytes) only engages when all heads share one mask.
    See :func:`per_head_window_radii` for the per-head deployment that
    relaxes the second constraint via grouped splash calls."""
    import numpy as np

    return int(max(int(np.max(r)) for r in windows.values()))


def per_head_window_radii(windows: Dict[str, Any]):
    """Collapse per-layer radii to ONE PER-HEAD radius vector (max across
    layers per head). Scan-over-blocks compiles one block body, so radii
    must be layer-uniform — but heads may differ: the deployment runs one
    splash call per unique radius over grouped head subsets
    (models/attention.py::_splash_heads_major), so cheap heads stop
    paying the global max the scalar collapse charges them.

    Returns np.ndarray [H] — pass ``tuple(...)`` as ``QuantCtx.attn_window``
    or comma-joined to ``--attn_window``."""
    import numpy as np

    arrs = [np.asarray(r, dtype=int) for r in windows.values()]
    return np.max(np.stack(arrs, axis=0), axis=0)


def quantized_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    acfg: AttnQuantCfg,
    scale: Optional[float] = None,
    bits_mask: Optional[jax.Array] = None,
    perm: Optional[jax.Array] = None,
    k_valid_len: Optional[int] = None,
) -> jax.Array:
    """Explicit-BMM attention with q/k/v + attn-map quantization
    (ref quant_opensora.py:444-478; flash attention is unsupported in
    attn-quant mode there too — this is the simulation path; the int8
    flash kernel is the hardware path). q,k,v: [B, S, N, D] → [B, S, N, D].
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    qh = q.transpose(0, 2, 1, 3)  # [B, H, S, D]
    kh = k.transpose(0, 2, 1, 3)
    vh = v.transpose(0, 2, 1, 3)

    if acfg.qk is not None:
        qh = quantize_qk(qh, acfg.qk)
        kh = quantize_qk(kh, acfg.qk)
    if acfg.v is not None:
        vh = quantize_v(vh, acfg.v)

    attn = jnp.einsum(
        "bhqd,bhkd->bhqk", qh * scale, kh, preferred_element_type=jnp.float32
    )
    if k_valid_len is not None and k_valid_len < k.shape[1]:
        kv_mask = jnp.arange(k.shape[1]) < k_valid_len
        attn = jnp.where(kv_mask[None, None, None, :], attn,
                         jnp.finfo(jnp.float32).min)
    attn = jax.nn.softmax(attn, axis=-1)

    if acfg.attn_map is not None:
        if acfg.attn_map_group == "row":
            attn = quantize_attn_map_row(attn, acfg.attn_map)
        elif acfg.attn_map_group == "block":
            attn = quantize_attn_map_block(
                attn, acfg.attn_map, acfg.block_size, acfg.n_text_tokens,
                acfg.int8_scale, bits_mask, perm,
            )
        else:
            raise ValueError(acfg.attn_map_group)

    out = jnp.einsum("bhqk,bhkd->bhqd", attn.astype(vh.dtype), vh)
    return out.transpose(0, 2, 1, 3)
