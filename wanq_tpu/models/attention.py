"""Attention dispatch (TPU-native rebuild of wan/modules/attention.py:24-179).

The reference dispatches varlen FlashAttention-2/3 CUDA kernels with an SDPA
fallback. Here the TPU path uses a Pallas flash (online-softmax, blockwise)
kernel and the CPU/test path a chunked jnp reference. Raggedness is handled
with static padding + segment-id masking instead of varlen cu_seqlens (JAX
static shapes; batch entries share a resolution in all reference run
configs, so per-sample raggedness reduces to one tail mask). Wan seq lens
(e.g. 32760 = 21·30·52 patches at 1.3B/480p) are not tile-aligned, so the
wrapper pads q/k/v to the flash block size internally and slices the output.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TemporalWindow:
    """Sliding temporal-window (block-sparse) self-attention spec.

    Every video token attends only to tokens within ``radius`` latent
    frames of its own frame (plus the model pad tail rules below). This is
    the TPU-hardware realization of the reference's 0-bit attention-map
    blocks (quant_attn.py bitwidth lists with 0 entries prune whole map
    blocks — here the pruned blocks are never computed at all: the splash
    kernel's block-sparse mask skips them on the MXU).

    ``tokens_per_frame`` is resolved from the latent grid by dit_forward
    (grid h·w after patching); ``radius`` is in latent frames. The splash
    mask-info builder only takes the in-kernel mask_function fast path
    (zero materialized mask bytes) when all heads share one unique mask,
    so per-head radii (``head_radii``, from calibration — heads profile
    very differently in the sliding-tile-attention literature) run as ONE
    SPLASH CALL PER UNIQUE RADIUS over statically grouped head subsets
    (:func:`_splash_heads_major`): each call keeps the zero-memory mask
    path, and cheap heads stop paying the max-collapsed band. ``radius``
    is the collapsed (max) radius when ``head_radii`` is set.
    """

    tokens_per_frame: int
    radius: int
    head_radii: Optional[tuple] = None

    def __post_init__(self):
        if self.head_radii is not None:
            object.__setattr__(self, "head_radii",
                               tuple(int(r) for r in self.head_radii))
            assert min(self.head_radii) >= 0, self.head_radii
            assert self.radius == max(self.head_radii), (
                "radius must be the collapsed max of head_radii")

    def resolved_radii(self, n_heads: int) -> tuple:
        """Per-head radii, expanded to ``n_heads`` entries."""
        if self.head_radii is None:
            return (self.radius,) * n_heads
        assert len(self.head_radii) == n_heads, (
            f"{len(self.head_radii)} radii for {n_heads} heads")
        return self.head_radii

    def density(self, n_frames: int) -> float:
        """Fraction of the dense S×S map inside the band (exact, ignoring
        block rounding). With per-head radii this is the MEAN over heads —
        the quantity proportional to total attention FLOPs under the
        grouped-splash execution (one call per unique radius)."""
        def one(radius: int) -> float:
            f, r = n_frames, min(radius, n_frames - 1)
            inside = sum(
                min(f - 1, i + r) - max(0, i - r) + 1 for i in range(f)
            )
            return inside / (f * f)

        if self.head_radii is not None:
            return sum(one(r) for r in self.head_radii) / len(self.head_radii)
        return one(self.radius)

_DEF_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
# swept on v5e at Wan shapes (BENCH_NOTES.md): 2048/1024 beats 512/512 by ~9%
_FLASH_BLOCK_Q = 2048
_FLASH_BLOCK_K = 1024
# splash kernel beats flash by a further ~20% on long self-attention
# (79.6 vs 97.9 ms at S=32768); swept block sizes
_SPLASH_BLOCK_Q = 512
_SPLASH_BLOCK_KV = 4096
_SPLASH_BLOCK_KV_COMPUTE = 1024
_SPLASH_MIN_SEQ = 4096


def _kv_prefix_mask(shape, valid: int):
    """Lazy mask attending only kv columns < ``valid`` — the static
    pad-tail mask (Wan seq lens pad 32760→32768). Unlike dynamic
    segment-id masking (~3.4 ms/layer at 1.3B shapes), a static mask lets
    splash mark every fully-valid block as mask-free at trace time; only
    the q-row × last-kv-block tiles compute a per-element mask."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    class _KVPrefixMask(sm._ComputableMask):
        def __init__(self, shape, valid, shard_count=1):
            self.valid = valid

            def prefix_mask_function(q_ids, kv_ids):
                # q_ids term broadcasts the result to (rows, cols) under
                # both numpy (mask-info build) and jnp (in-kernel)
                return (kv_ids < valid) & (q_ids >= 0)

            super().__init__(
                shape=shape,
                mask_function=prefix_mask_function,
                shard_count=shard_count,
            )

        def __eq__(self, other):
            return (
                isinstance(other, _KVPrefixMask)
                and self.shape == other.shape
                and self.valid == other.valid
            )

        def __hash__(self):
            return hash((type(self).__name__, self.shape, self.valid))

    return _KVPrefixMask(shape, valid)


def _temporal_band_mask(shape, tpf: int, radius: int, valid: int):
    """Lazy splash mask attending kv tokens within ``radius`` latent frames
    (token index // tpf) of the query's frame, restricted to the valid kv
    prefix. Wrapper-pad q rows (>= valid, sliced off by the caller) attend
    the full valid prefix so their softmax rows are never empty — they sit
    in the final q block only, so the cost is one dense q block. The mask
    function is numpy/jnp polymorphic: numpy during the trace-time
    block-sparsity scan (fully-outside blocks are SKIPPED on device),
    jnp inside the kernel for boundary blocks."""
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_mask as sm,
    )

    class _TemporalBandMask(sm._ComputableMask):
        def __init__(self, shape, tpf, radius, valid, shard_count=1):
            self.tpf = tpf
            self.radius = radius
            self.valid = valid

            def band_mask_function(q_ids, kv_ids):
                d = q_ids // tpf - kv_ids // tpf
                band = (d <= radius) & (d >= -radius)
                pad_rows = q_ids >= valid
                return (band | pad_rows) & (kv_ids < valid)

            super().__init__(
                shape=shape,
                mask_function=band_mask_function,
                shard_count=shard_count,
            )

        def __eq__(self, other):
            return (
                isinstance(other, _TemporalBandMask)
                and self.shape == other.shape
                and self.tpf == other.tpf
                and self.radius == other.radius
                and self.valid == other.valid
            )

        def __hash__(self):
            return hash((type(self).__name__, self.shape, self.tpf,
                         self.radius, self.valid))

    return _TemporalBandMask(shape, tpf, radius, valid)


def _splash_kernel(s: int, h: int, blk_q: int, blk_kv: int, scale: float,
                   kv_valid: Optional[int] = None,
                   window: Optional[TemporalWindow] = None):
    # NOTE: deliberately not cached — make_splash_mha closes over values
    # created at call time, and reusing a kernel object across jit traces
    # leaks tracers; construction is cheap (masks are lazy)
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        splash_attention_kernel as sk,
        splash_attention_mask as sm,
    )

    valid = kv_valid if kv_valid is not None else s
    if window is not None:
        # per-head windows are grouped into shared-radius calls by
        # _splash_heads_major before reaching the kernel builder
        assert window.head_radii is None, "group per-head radii first"
    if window is not None and not _window_is_dense(window, valid):
        head_mask = _temporal_band_mask((s, s), window.tokens_per_frame,
                                        window.radius, valid)
    elif valid < s:
        head_mask = _kv_prefix_mask((s, s), valid)
    else:
        head_mask = sm.FullMask((s, s))
    mask = sm.MultiHeadMask([head_mask for _ in range(h)])
    bkv = min(blk_kv, s)
    sizes = sk.BlockSizes(
        block_q=min(blk_q, s),
        block_kv=bkv,
        # must divide block_kv (kernel requirement) — clamps when the
        # adaptive picker selects a kv block below the default compute tile
        block_kv_compute=min(_SPLASH_BLOCK_KV_COMPUTE, bkv, s),
    )
    return sk.make_splash_mha(
        mask=mask, head_shards=1, q_seq_shards=1, block_sizes=sizes
    )


def _window_is_dense(window: TemporalWindow, valid: int) -> bool:
    """A radius covering every frame pair degrades to the dense mask.
    Per-head windows are dense only when EVERY head's radius does (single
    heads degrade per group inside _splash_heads_major)."""
    n_frames = -(-valid // window.tokens_per_frame)
    r = min(window.head_radii) if window.head_radii else window.radius
    return r >= n_frames - 1


def _splash_blocks(s: int):
    """Pick (block_q, block_kv) for a padded seq len ``s`` (multiple of 512).

    Swept on v5e (tools/attn_sweep.py): at s divisible by 4096 (1.3B 480p
    pads 32760→32768) q512/kv4096 is fastest and q1024/kv4096 VMEM-OOMs;
    when the largest 2^k divisor caps kv at 2048 (14B 720p: 75776 = 2048·37)
    q1024/kv2048 beats q512/kv2048 by ~3.3% (703 vs 727 ms/chain)."""
    blk_kv = next(
        b for b in (_SPLASH_BLOCK_KV, 2048, 1024, _SPLASH_BLOCK_Q)
        if s % b == 0
    )
    if blk_kv < _SPLASH_BLOCK_KV and s % 1024 == 0:
        return 1024, blk_kv
    return _SPLASH_BLOCK_Q, blk_kv


def _head_groups(radii):
    """Group heads by window radius. Returns ``(order, groups)``: a stable
    head permutation making equal-radius heads contiguous, and
    ``[(radius, count), ...]`` in ascending radius order. Pure python on
    static radii — resolved at trace time."""
    order = sorted(range(len(radii)), key=lambda i: (radii[i], i))
    groups: list[list[int]] = []
    for i in order:
        if groups and groups[-1][0] == radii[i]:
            groups[-1][1] += 1
        else:
            groups.append([radii[i], 1])
    return order, [(r, c) for r, c in groups]


def _splash_heads_major(q, k, v, kv_len, window):
    """Splash attention on heads-major [B, N, S, D] operands with the
    softmax scale pre-folded into q. A shared-radius (or no) window is a
    single splash call; per-head radii run one call per UNIQUE radius over
    statically grouped head subsets — each group's heads share one mask,
    so every call keeps splash's in-kernel mask_function fast path (zero
    materialized mask bytes), and a group whose radius covers every frame
    pair degrades to the dense prefix mask inside _splash_kernel. The two
    static head permutes (in/out) are one gather each — noise next to the
    attention itself. Single-chip scope: under a head-sharded (Ulysses)
    mesh the permute + uneven slices would force GSPMD reshards of the
    sharded head axis — dit_forward guards per-head radii when
    plan.sp_size > 1 (uniform windows shard fine: one call, no permute).
    """
    b, n, s, d = q.shape
    blk_q, blk_kv = _splash_blocks(s)
    if window is not None and window.head_radii is not None:
        radii = window.resolved_radii(n)
        if len(set(radii)) == 1:
            window = TemporalWindow(window.tokens_per_frame, radii[0])
        else:
            order, groups = _head_groups(radii)
            perm = jnp.asarray(order)
            qs = jnp.take(q, perm, axis=1)
            ks = jnp.take(k, perm, axis=1)
            vs = jnp.take(v, perm, axis=1)
            outs, start = [], 0
            for r, cnt in groups:
                win_r = TemporalWindow(window.tokens_per_frame, r)
                kernel = _splash_kernel(s, cnt, blk_q, blk_kv, 1.0,
                                        kv_valid=kv_len, window=win_r)
                outs.append(jax.vmap(kernel)(
                    qs[:, start:start + cnt],
                    ks[:, start:start + cnt],
                    vs[:, start:start + cnt],
                ))
                start += cnt
            out = jnp.concatenate(outs, axis=1)
            inv = [0] * n
            for pos, i in enumerate(order):
                inv[i] = pos
            return jnp.take(out, jnp.asarray(inv), axis=1)
    kernel = _splash_kernel(s, n, blk_q, blk_kv, 1.0, kv_valid=kv_len,
                            window=window)
    return jax.vmap(kernel)(q, k, v)


def _splash_path(q, k, v, scale, kv_len, window=None):
    """Self-attention via the splash kernel. q,k,v: [B, S, N, D] with S
    already padded to the splash block; the sm_scale folds into q."""
    qt = (jnp.swapaxes(q, 1, 2) * scale).astype(jnp.bfloat16)
    kt = jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16)
    vt = jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16)
    out = _splash_heads_major(qt, kt, vt, kv_len, window)
    return jnp.swapaxes(out, 1, 2)


def attention_heads_major(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    k_valid_len: Optional[int] = None,
    window: Optional[TemporalWindow] = None,
) -> jax.Array:
    """Self-attention on ALREADY head-major [B, N, S, D] operands with the
    softmax scale pre-folded into q (the fused rms+rope+head-split kernel,
    ops/rmsnorm_rope.py, emits this layout directly — skipping the
    [B,S,N,D]→[B,N,S,D] transpose the splash kernel otherwise forces).
    Returns heads-major [B, N, S, D] — the splash output layout — so the
    caller can merge heads in one pass (ops/rmsnorm_rope.py::merge_heads)
    instead of paying the swapaxes relayout copy."""
    b, n, s, d = q.shape
    if (
        jax.default_backend() != "tpu"
        or s < _SPLASH_MIN_SEQ
        or d != 128
        or s % _SPLASH_BLOCK_Q != 0
    ):
        out = attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            scale=1.0, k_valid_len=k_valid_len, window=window,
        )
        return jnp.swapaxes(out, 1, 2)

    kv_len = min(k_valid_len, s) if k_valid_len is not None else s
    return _splash_heads_major(
        q.astype(jnp.bfloat16), k.astype(jnp.bfloat16),
        v.astype(jnp.bfloat16), kv_len, window,
    )


def cross_attention_heads_major(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    k_valid_len: Optional[int] = None,
) -> jax.Array:
    """Cross-attention with q ALREADY heads-major [B, N, Sq, D]; k, v stay
    seq-major [B, Sk, N, D] (Sk = text_len — transposing them is cheap).
    Returns heads-major [B, N, Sq, D].

    The seq-major `attention()` wrapper pays two full-q relayout copies
    (q transpose in + out transpose back, ~36 ms/step at 1.3B shapes);
    producing/consuming q heads-major via the Pallas split/merge kernels
    skips both. (Ref analog: flash_attention, wan/modules/attention.py:24-130.)
    """
    b, n, sq, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    if jax.default_backend() != "tpu":
        out = _sdpa_reference(
            jnp.swapaxes(q, 1, 2), k, v, scale, k_valid_len)
        return jnp.swapaxes(out, 1, 2)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    sk = k.shape[1]
    kv_len = min(k_valid_len, sk) if k_valid_len is not None else sk
    blk_q = min(_FLASH_BLOCK_Q, _round_up(sq, 128))
    blk_k = min(_FLASH_BLOCK_K, _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)
    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, sq_p - sq), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
    segment_ids = None
    if kv_len < sk_p:
        q_seg = (jnp.arange(sq_p) >= sq).astype(jnp.int32)
        kv_seg = 2 * (jnp.arange(sk_p) >= kv_len).astype(jnp.int32)
        segment_ids = fa.SegmentIds(
            q=jnp.broadcast_to(q_seg[None], (b, sq_p)),
            kv=jnp.broadcast_to(kv_seg[None], (b, sk_p)),
        )
    sizes = fa.BlockSizes(
        block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1
    )
    out = fa.flash_attention(
        q.astype(jnp.bfloat16),
        jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16),
        jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16),
        segment_ids=segment_ids,
        causal=False,
        sm_scale=scale,
        block_sizes=sizes,
    )
    if sq_p != sq:
        out = out[:, :, :sq]
    return out.astype(v.dtype)


def temporal_band_dense_mask(
    sq: int, sk: int, window: TemporalWindow, k_valid_len: Optional[int],
    radius: Optional[int] = None,
) -> jax.Array:
    """[Sq, Sk] boolean mask with the exact semantics of the splash
    band mask (_temporal_band_mask) — the reference oracle for tests and
    the CPU/sim execution path. ``radius`` overrides the window's shared
    radius (per-head construction)."""
    valid = min(k_valid_len, sk) if k_valid_len is not None else sk
    r = window.radius if radius is None else radius
    fq = jnp.arange(sq) // window.tokens_per_frame
    fk = jnp.arange(sk) // window.tokens_per_frame
    d = fq[:, None] - fk[None, :]
    band = (d <= r) & (d >= -r)
    pad_rows = (jnp.arange(sq) >= valid)[:, None]
    return (band | pad_rows) & (jnp.arange(sk) < valid)[None, :]


def _sdpa_reference(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: float,
    k_valid_len: Optional[int],
    window: Optional[TemporalWindow] = None,
) -> jax.Array:
    """Plain jnp attention with f32 softmax. q,k,v: [B, S, N, D]."""
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    scores = jnp.einsum("bsnd,btnd->bnst", qf, kf) * scale
    if window is not None:
        if window.head_radii is not None:
            # per-head bands: [N, Sq, Sk] stacked masks (test/CPU scale)
            mask = jnp.stack([
                temporal_band_dense_mask(q.shape[1], k.shape[1], window,
                                         k_valid_len, radius=r)
                for r in window.resolved_radii(q.shape[2])
            ])
            scores = jnp.where(mask[None], scores, _DEF_MASK_VALUE)
        else:
            mask = temporal_band_dense_mask(
                q.shape[1], k.shape[1], window, k_valid_len)
            scores = jnp.where(mask[None, None, :, :], scores, _DEF_MASK_VALUE)
    elif k_valid_len is not None and k_valid_len < k.shape[1]:
        mask = jnp.arange(k.shape[1]) < k_valid_len
        scores = jnp.where(mask[None, None, None, :], scores, _DEF_MASK_VALUE)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bnst,btnd->bsnd", probs.astype(v.dtype), v)
    return out


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    k_valid_len: Optional[int] = None,
    force_reference: bool = False,
    trainable: bool = False,
    window: Optional[TemporalWindow] = None,
) -> jax.Array:
    """Scaled dot-product attention. q: [B, Sq, N, D]; k,v: [B, Sk, N, D].

    On TPU the Pallas flash kernel runs (ref analog: flash_attention,
    wan/modules/attention.py:24-130); on CPU/tests, the jnp reference
    (ref :133-179 SDPA fallback). Trace-safe dispatch (keys on backend).
    ``trainable`` skips the fwd-only splash kernel so the op is
    reverse-mode differentiable (the flash kernel defines a VJP).
    """
    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])

    if force_reference or jax.default_backend() != "tpu":
        return _sdpa_reference(q, k, v, scale, k_valid_len, window=window)

    from jax.experimental.pallas.ops.tpu import flash_attention as fa

    b, sq, n, d = q.shape
    sk = k.shape[1]
    kv_len = min(k_valid_len, sk) if k_valid_len is not None else sk

    # long self-attention rides the splash kernel (~20% over flash here).
    # Sequences pre-aligned to 512 (compute_seq_len) skip the pad+slice
    # round trip entirely; block_kv adapts to the largest divisor.
    if sq == sk and sq >= _SPLASH_MIN_SEQ and d == 128 and not trainable:
        s_p = _round_up(sq, _SPLASH_BLOCK_Q)
        if s_p != sq:
            pad = ((0, 0), (0, s_p - sq), (0, 0), (0, 0))
            q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        out = _splash_path(q, k, v, scale, kv_len, window=window)
        return (out[:, :sq] if s_p != sq else out).astype(v.dtype)

    if window is not None and not _window_is_dense(window, kv_len):
        # short/odd-shape fallback: the flash kernel has no sparse mask —
        # run the exact dense-mask reference (tests, CPU, tiny shapes)
        return _sdpa_reference(q, k, v, scale, k_valid_len, window=window)

    blk_q = min(_FLASH_BLOCK_Q, _round_up(sq, 128))
    blk_k = min(_FLASH_BLOCK_K, _round_up(sk, 128))
    sq_p = _round_up(sq, blk_q)
    sk_p = _round_up(sk, blk_k)

    if sq_p != sq:
        q = jnp.pad(q, ((0, 0), (0, sq_p - sq), (0, 0), (0, 0)))
    if sk_p != sk:
        k = jnp.pad(k, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, sk_p - sk), (0, 0), (0, 0)))

    segment_ids = None
    if kv_len < sk_p:
        # KV tail (model padding or wrapper padding) gets segment 2 so no
        # query attends to it — the analog of the reference's k_lens mask
        # (attention.py:90-105). Wrapper-padded q rows (seg 1) are sliced
        # off below; model-padded q rows stay unmasked like the reference.
        q_seg = (jnp.arange(sq_p) >= sq).astype(jnp.int32)
        kv_seg = 2 * (jnp.arange(sk_p) >= kv_len).astype(jnp.int32)
        segment_ids = fa.SegmentIds(
            q=jnp.broadcast_to(q_seg[None], (b, sq_p)),
            kv=jnp.broadcast_to(kv_seg[None], (b, sk_p)),
        )

    if trainable:
        # the forward-only block spec has no dq/dkv tiles; get_default
        # fills the full set the flash VJP kernels need
        sizes = fa.BlockSizes.get_default(b, n, sq_p, sk_p, d)
    else:
        sizes = fa.BlockSizes(
            block_q=blk_q, block_k_major=blk_k, block_k=blk_k, block_b=1
        )
    out = fa.flash_attention(
        jnp.swapaxes(q, 1, 2).astype(jnp.bfloat16),
        jnp.swapaxes(k, 1, 2).astype(jnp.bfloat16),
        jnp.swapaxes(v, 1, 2).astype(jnp.bfloat16),
        segment_ids=segment_ids,
        causal=False,
        sm_scale=scale,
        block_sizes=sizes,
    )
    out = jnp.swapaxes(out, 1, 2)[:, :sq]
    return out.astype(v.dtype)
