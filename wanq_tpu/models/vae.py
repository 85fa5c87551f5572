"""Wan2.1 3D causal VAE in functional JAX.

TPU-native rebuild of wan/modules/vae.py:17-663 (CausalConv3d :17-36,
RMS_norm :39-54, Resample :66-160, ResidualBlock :186-220, AttentionBlock
:223-262, Encoder3d :265-366, Decoder3d :369-472, WanVAE_ :483-589,
WanVAE :619-663).

The reference streams decode frame-by-frame through mutable per-conv
feature caches (2 trailing frames per causal conv). Here the caches are an
explicit pytree threaded through pure chunk functions — the jit/scan-able
form of the same state machine:

  * every temporal-causal conv keeps cache[k] = last 2 input frames,
    zero-initialized (zeros ≡ the reference's fresh causal zero-padding);
    update rule: cache' = concat(cache, x)[:, :, -2:]
  * the temporal up/halve convs of Resample skip chunk 0 entirely (the
    reference's 'Rep' marker, vae.py:106-137) — chunk 0 runs a separate
    jitted function with static skip_time flags.

Params are kept as a flat {torch_key: array} dict — checkpoint conversion
is then a pure dtype cast, and layer code indexes by the reference's own
module paths. Convs run in NCDHW/OIDHW layout (torch order) via
lax.conv_general_dilated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CACHE_T = 2

# per-channel latent normalization (published Wan2.1 VAE constants,
# ref vae.py:629-639)
LATENT_MEAN = [
    -0.7571, -0.7089, -0.9113, 0.1075, -0.1745, 0.9653, -0.1517, 1.5508,
    0.4134, -0.0715, 0.5517, -0.3632, -0.1922, -0.9497, 0.2503, -0.2921,
]
LATENT_STD = [
    2.8184, 1.4541, 2.3275, 2.6558, 1.2196, 1.7708, 2.6052, 2.0743,
    3.2687, 2.1526, 2.8652, 1.5579, 1.6382, 1.1253, 2.8251, 1.9160,
]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    dim: int = 96
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)

    @property
    def temperal_upsample(self):
        return tuple(reversed(self.temperal_downsample))


WAN_VAE_CFG = VAEConfig()


def tiny_vae_config(**overrides) -> VAEConfig:
    base = dict(dim=16, z_dim=4, dim_mult=(1, 2), num_res_blocks=1,
                temperal_downsample=(True,))
    base.update(overrides)
    return VAEConfig(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

Params = Dict[str, jax.Array]
Cache = List[Optional[jax.Array]]


def conv3d(p: Params, key: str, x: jax.Array, stride=(1, 1, 1), padding=None):
    """torch-layout Conv3d. x: [B,C,T,H,W]; weight: [O,I,kt,kh,kw].

    Compute dtype follows the STORED weight dtype (the analog of the
    reference's ``amp.autocast(dtype=self.dtype)`` around encode/decode,
    vae.py:651-661): f32 weights reproduce the reference default exactly;
    bf16 weights run the conv on the MXU's fast path with f32 accumulation
    (preferred_element_type) and bf16 at rest between layers."""
    w = p[f"{key}.weight"]
    pad = padding if padding is not None else [(0, 0)] * 3
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=stride, padding=pad,
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
        preferred_element_type=jnp.float32,
    )
    b = p.get(f"{key}.bias")
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None, None, None]
    return y.astype(w.dtype)


def conv2d(p: Params, key: str, x: jax.Array, stride=(1, 1), padding=((0, 0), (0, 0))):
    """torch-layout Conv2d on [B,C,H,W]. Compute dtype follows the weight
    (see conv3d)."""
    w = p[f"{key}.weight"]
    y = jax.lax.conv_general_dilated(
        x.astype(w.dtype), w, window_strides=stride, padding=list(padding),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.float32,
    )
    b = p.get(f"{key}.bias")
    if b is not None:
        y = y + b.astype(jnp.float32)[None, :, None, None]
    return y.astype(w.dtype)


class CacheCtx:
    """Threaded feature-cache state (the pure analog of the reference's
    feat_cache/feat_idx mutation)."""

    def __init__(self, caches: Optional[Cache], chunk0: bool):
        self.caches = caches  # None → non-streaming (full causal pad)
        self.chunk0 = chunk0
        self.idx = 0
        self.new: Cache = []

    def pull(self) -> Optional[jax.Array]:
        if self.caches is None:
            return None
        c = self.caches[self.idx]
        self.idx += 1
        return c

    def push(self, c: Optional[jax.Array]):
        self.new.append(c)


def causal_conv3d(
    p: Params, key: str, x: jax.Array, cc: CacheCtx,
    stride=(1, 1, 1), space_pad: int = 1, time_pad: int = 2,
):
    """CausalConv3d (ref vae.py:17-36): front-only temporal padding of
    ``time_pad`` frames, replaced by the streaming cache when present."""
    sp = [(space_pad, space_pad)] * 2
    if time_pad == 0:
        return conv3d(p, key, x, stride, [(0, 0)] + sp)
    cache = cc.pull()
    if cache is None:
        y = conv3d(p, key, x, stride, [(time_pad, 0)] + sp)
        if cc.caches is not None:
            # store last 2 frames of the zero-extended input stream
            ext = jnp.concatenate(
                [jnp.zeros_like(x[:, :, :1]).repeat(time_pad, 2), x], axis=2
            )
            cc.push(ext[:, :, -CACHE_T:])
        return y
    xin = jnp.concatenate([cache, x], axis=2)
    y = conv3d(p, key, xin, stride, [(0, 0)] + sp)
    cc.push(xin[:, :, -CACHE_T:])
    return y


def rms_norm_image(p: Params, key: str, x: jax.Array, images: bool):
    """RMS_norm channel-first (ref vae.py:39-54): F.normalize over C."""
    g = p[f"{key}.gamma"].astype(jnp.float32)
    c = x.shape[1]
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.maximum(jnp.sum(jnp.square(xf), axis=1, keepdims=True), 1e-24))
    shape = (1, c) + (1,) * (x.ndim - 2)
    # stats in f32 always; at-rest dtype follows the stream (bf16 under the
    # fast decode path, matching torch-amp elementwise semantics)
    return (n * (c**0.5) * g.reshape(shape)).astype(x.dtype)


def residual_block(p: Params, key: str, x: jax.Array, cc: CacheCtx):
    """ref ResidualBlock (vae.py:186-220)."""
    in_dim = x.shape[1]
    out_dim = p[f"{key}.residual.2.weight"].shape[0]
    if in_dim != out_dim:
        h = conv3d(p, f"{key}.shortcut", x)  # 1x1x1, no pad, not cached
    else:
        h = x
    y = rms_norm_image(p, f"{key}.residual.0", x, images=False)
    y = jax.nn.silu(y)
    y = causal_conv3d(p, f"{key}.residual.2", y, cc)
    y = rms_norm_image(p, f"{key}.residual.3", y, images=False)
    y = jax.nn.silu(y)
    y = causal_conv3d(p, f"{key}.residual.6", y, cc)
    return y + h


# above this many tokens the full [hw, hw] f32 logits tensor dominates the
# decode chunk's memory peak (720p latent: 90*160=14400 -> 829 MB), so the
# softmax runs blockwise over query rows instead. 480p (60*104=6240 ->
# 156 MB) stays on the one-shot path.
_ATTN_BLOCKWISE_MIN_HW = 8192
_ATTN_Q_BLOCK = 1800


def _spatial_attention(q, k, v, scale):
    """softmax(q kT * scale) v for [bt, hw, c] operands, f32 softmax."""
    logits = jnp.einsum(
        "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
    )
    attn = jax.nn.softmax(logits * scale, axis=-1)
    return jnp.einsum(
        "bij,bjc->bic", attn.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def attention_block(p: Params, key: str, x: jax.Array):
    """Single-head per-frame spatial attention (ref vae.py:223-262).

    For large spatial grids the query axis is processed in blocks under
    ``lax.map`` so only one [block, hw] logits tile is live at a time —
    softmax is per-row, so row-blocking is exact (same math, ~7% of the
    logits memory at 720p). This is what lets the 720p x 81f decode fit
    on a 16 GB chip (BENCH_NOTES 'bf16 VAE decode')."""
    b, c, t, h, w = x.shape
    ident = x
    xf = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
    xn = rms_norm_image(p, f"{key}.norm", xf, images=True)
    qkv = conv2d(p, f"{key}.to_qkv", xn)  # [bt, 3c, h, w]
    qkv = qkv.reshape(b * t, 3 * c, h * w).transpose(0, 2, 1)  # [bt, hw, 3c]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    scale = 1.0 / np.sqrt(c)
    hw = h * w
    if hw < _ATTN_BLOCKWISE_MIN_HW:
        y = _spatial_attention(q, k, v, scale)
    else:
        nb = -(-hw // _ATTN_Q_BLOCK)
        qp = jnp.pad(q, ((0, 0), (0, nb * _ATTN_Q_BLOCK - hw), (0, 0)))
        qb = qp.reshape(b * t, nb, _ATTN_Q_BLOCK, c).transpose(1, 0, 2, 3)
        yb = jax.lax.map(
            lambda qi: _spatial_attention(qi, k, v, scale), qb
        )  # [nb, bt, blk, c]
        y = yb.transpose(1, 0, 2, 3).reshape(b * t, nb * _ATTN_Q_BLOCK, c)
        y = y[:, :hw]
    y = y.transpose(0, 2, 1).reshape(b * t, c, h, w)
    y = conv2d(p, f"{key}.proj", y)
    y = y.reshape(b, t, c, h, w).transpose(0, 2, 1, 3, 4)
    return y + ident


def resample(
    p: Params, key: str, x: jax.Array, mode: str, cc: CacheCtx
):
    """ref Resample (vae.py:66-160)."""
    b, c, t, h, w = x.shape
    if mode == "upsample3d" and not cc.chunk0:
        cache = cc.pull()
        if cache is None:  # non-streaming: zero history
            cache = jnp.zeros((b, c, CACHE_T, h, w), x.dtype)
        xin = jnp.concatenate([cache, x], axis=2)
        y = conv3d(p, f"{key}.time_conv", xin, padding=[(0, 0), (0, 0), (0, 0)])
        cc.push(xin[:, :, -CACHE_T:])
        # interleave the 2c channels into 2x time (ref vae.py:134-137)
        y = y.reshape(b, 2, c, t, h, w)
        y = jnp.stack([y[:, 0], y[:, 1]], axis=3)  # [b, c, t, 2, h, w]
        x = y.reshape(b, c, t * 2, h, w)
        t = t * 2
    elif mode == "upsample3d" and cc.chunk0:
        # 'Rep' chunk: time conv skipped, cache stays zero-history
        if cc.caches is not None:
            cc.pull()
            cc.push(None)

    if mode in ("upsample2d", "upsample3d"):
        xf = x.transpose(0, 2, 1, 3, 4).reshape(b * t, x.shape[1], h, w)
        xf = jnp.repeat(jnp.repeat(xf, 2, axis=2), 2, axis=3)  # nearest 2x
        xf = conv2d(p, f"{key}.resample.1", xf, padding=((1, 1), (1, 1)))
        c2 = xf.shape[1]
        x = xf.reshape(b, t, c2, 2 * h, 2 * w).transpose(0, 2, 1, 3, 4)
    elif mode in ("downsample2d", "downsample3d"):
        xf = x.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        xf = jnp.pad(xf, ((0, 0), (0, 0), (0, 1), (0, 1)))
        xf = conv2d(p, f"{key}.resample.1", xf, stride=(2, 2))
        x = xf.reshape(b, t, c, h // 2, w // 2).transpose(0, 2, 1, 3, 4)

    if mode == "downsample3d":
        if cc.caches is not None:
            cache = cc.pull()
            if cache is None or cc.chunk0:
                cc.push(x[:, :, -1:])
                # chunk 0: time conv skipped (ref vae.py:146-148)
            else:
                xin = jnp.concatenate([cache, x], axis=2)
                x = conv3d(p, f"{key}.time_conv", xin, stride=(2, 1, 1))
                cc.push(xin[:, :, -1:])
        else:
            # non-streaming: frame 0 passes through (the reference's chunk-0
            # cache-store, vae.py:146-148); the stride-2 window over the full
            # stream reproduces the chunked conv positions exactly
            head = x[:, :, :1]
            conv = conv3d(p, f"{key}.time_conv", x, stride=(2, 1, 1))
            x = jnp.concatenate([head, conv], axis=2)
    return x


# ---------------------------------------------------------------------------
# encoder / decoder
# ---------------------------------------------------------------------------


def _encoder_layers(cfg: VAEConfig):
    """(kind, key, extra) sequence mirroring Encoder3d module order."""
    dims = [cfg.dim * u for u in (1,) + tuple(cfg.dim_mult)]
    layers = []
    scale = 1.0
    li = 0
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks):
            layers.append(("res", f"encoder.downsamples.{li}")); li += 1
            if scale in cfg.attn_scales:
                layers.append(("attn", f"encoder.downsamples.{li}")); li += 1
            in_dim = out_dim
        if i != len(cfg.dim_mult) - 1:
            mode = "downsample3d" if cfg.temperal_downsample[i] else "downsample2d"
            layers.append((mode, f"encoder.downsamples.{li}")); li += 1
            scale /= 2.0
    return layers


def _decoder_layers(cfg: VAEConfig):
    dims = [cfg.dim * u for u in (cfg.dim_mult[-1],) + tuple(reversed(cfg.dim_mult))]
    layers = []
    scale = 1.0 / 2 ** (len(cfg.dim_mult) - 2)
    li = 0
    for i, (in_dim, out_dim) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfg.num_res_blocks + 1):
            layers.append(("res", f"decoder.upsamples.{li}")); li += 1
            if scale in cfg.attn_scales:
                layers.append(("attn", f"decoder.upsamples.{li}")); li += 1
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if cfg.temperal_upsample[i] else "upsample2d"
            layers.append((mode, f"decoder.upsamples.{li}")); li += 1
            scale *= 2.0
    return layers


def encoder_forward(p: Params, cfg: VAEConfig, x: jax.Array, cc: CacheCtx):
    """ref Encoder3d.forward (vae.py:318-366). x: [B,3,T,H,W] → [B,2z,t,h,w]."""
    x = causal_conv3d(p, "encoder.conv1", x, cc)
    for kind, key in _encoder_layers(cfg):
        if kind == "res":
            x = residual_block(p, key, x, cc)
        elif kind == "attn":
            x = attention_block(p, key, x)
        else:
            x = resample(p, key, x, kind, cc)
    x = residual_block(p, "encoder.middle.0", x, cc)
    x = attention_block(p, "encoder.middle.1", x)
    x = residual_block(p, "encoder.middle.2", x, cc)
    x = rms_norm_image(p, "encoder.head.0", x, images=False)
    x = jax.nn.silu(x)
    x = causal_conv3d(p, "encoder.head.2", x, cc)
    return x


def decoder_forward(p: Params, cfg: VAEConfig, x: jax.Array, cc: CacheCtx):
    """ref Decoder3d.forward (vae.py:423-472). x: [B,z,t,h,w] → [B,3,T,H,W]."""
    x = causal_conv3d(p, "decoder.conv1", x, cc)
    x = residual_block(p, "decoder.middle.0", x, cc)
    x = attention_block(p, "decoder.middle.1", x)
    x = residual_block(p, "decoder.middle.2", x, cc)
    for kind, key in _decoder_layers(cfg):
        if kind == "res":
            x = residual_block(p, key, x, cc)
        elif kind == "attn":
            x = attention_block(p, key, x)
        else:
            x = resample(p, key, x, kind, cc)
    x = rms_norm_image(p, "decoder.head.0", x, images=False)
    x = jax.nn.silu(x)
    x = causal_conv3d(p, "decoder.head.2", x, cc)
    return x


class WanVAE:
    """ref WanVAE wrapper (vae.py:619-663) with chunked streaming encode /
    decode driven from the host; each chunk function is jitted once."""

    def __init__(self, cfg: VAEConfig = WAN_VAE_CFG, params: Optional[Params] = None,
                 vae_pth: Optional[str] = None, seed: int = 0,
                 compute_dtype=jnp.float32):
        """compute_dtype is the reference's WanVAE(dtype=...) knob
        (vae.py:619-626, default torch.float): f32 = exact reference
        semantics; bf16 casts the conv weights once and keeps the stream
        bf16 at rest (f32 accumulation via preferred_element_type). On TPU
        this is a MEMORY knob, not a speed knob: XLA already executes f32
        convs as single-pass bf16 MXU ops, so bf16-at-rest halves
        activation/weight HBM bytes at ~equal speed (measured 0.96x at
        480p x 81f, 53.3 dB agreement vs f32) — and it is what makes the
        720p x 81f decode FIT on a 16 GB chip at all (f32 RESOURCE_EXHAUSTs;
        bf16 22.8 s steady; BENCH_NOTES 'bf16 VAE decode'). Norm gammas
        stay f32 (they only enter the f32 stats path)."""
        self.cfg = cfg
        if params is not None:
            self.params = params
        elif vae_pth:
            self.params = load_vae_checkpoint(vae_pth)
        else:
            self.params = init_vae_params(cfg, seed)
        if compute_dtype != jnp.float32:
            self.params = {
                k: (v if k.endswith(".gamma") else v.astype(compute_dtype))
                for k, v in self.params.items()
            }
        z = cfg.z_dim
        if z == 16:
            self.mean = jnp.asarray(LATENT_MEAN, jnp.float32)
            self.std = jnp.asarray(LATENT_STD, jnp.float32)
        else:
            self.mean = jnp.zeros((z,), jnp.float32)
            self.std = jnp.ones((z,), jnp.float32)

    # -- streaming chunk drivers -------------------------------------------

    def _chunk_runner(self, forward, donate: bool):
        """Jit one chunk step with the cache pytree as carry (static chunk0
        flag: chunk 0 skips the temporal resample convs). When ``donate``,
        the cache carry is donated: the host loop overwrites its reference
        every iteration, and without donation the old and new cache sets
        (hundreds of MB at 720p) are both live across each chunk boundary.
        Donation costs ~20% step time at 480p (XLA inserts defensive copies
        for the aliased read-early/write-late cache buffers), so it is only
        enabled at shapes that need it to FIT (BENCH_NOTES 'bf16 VAE
        decode')."""
        import functools

        kw = {"donate_argnames": ("caches",)} if donate else {}

        @functools.partial(jax.jit, static_argnames=("chunk0",), **kw)
        def run(params, chunk, caches, chunk0):
            cc = CacheCtx(caches, chunk0)
            y = forward(params, chunk, cc)
            return y, tuple(cc.new)

        return run

    def _run_chunks(self, forward, x: jax.Array, chunk_starts, chunk_lens,
                    post=None, donate: bool = False):
        """Host loop over temporal chunks with explicit cache carry. ``post``
        (epilogue on the time-concatenated result) is jitted WITH the concat
        — one fused pass instead of eager concat -> astype -> clip, each of
        which would hold a full-video copy (3 x 895 MB at 720p x 81f). The
        chunk buffers are NOT donated: XLA cannot alias differently-shaped
        inputs into a concatenated output, so donation only warns."""
        run = self._chunk_runner(forward, donate)
        caches: Any = tuple([None] * 64)
        outs = []
        for ci, (s, l) in enumerate(zip(chunk_starts, chunk_lens)):
            chunk = x[:, :, s : s + l]
            y, caches = run(self.params, chunk, caches, chunk0=(ci == 0))
            outs.append(y)

        @jax.jit
        def tail(chunks):
            out = jnp.concatenate(chunks, axis=2)
            return post(out) if post is not None else out

        return tail(tuple(outs))

    def encode(self, videos: jax.Array) -> jax.Array:
        """[B,3,T,H,W] → normalized latents [B,z,t,h,w] (ref encode,
        vae.py:516-542): chunks of 1,4,4,..."""
        t = videos.shape[2]
        n_iter = 1 + (t - 1) // 4
        starts = [0] + [1 + 4 * (i - 1) for i in range(1, n_iter)]
        lens = [1] + [4] * (n_iter - 1)
        out = self._run_chunks(
            lambda p, ch, cc: encoder_forward(p, self.cfg, ch, cc),
            videos, starts, lens,
            donate=(videos.shape[3] // 8) * (videos.shape[4] // 8)
            >= _ATTN_BLOCKWISE_MIN_HW,
        )
        mu, _ = jnp.split(conv3d(self.params, "conv1", out), 2, axis=1)
        mu = (mu - self.mean[None, :, None, None, None]) / self.std[
            None, :, None, None, None
        ]
        return mu

    def decode(self, zs: jax.Array) -> jax.Array:
        """normalized latents [B,z,t,h,w] → video [B,3,T,H,W] in [-1,1]
        (ref decode, vae.py:544-568): one latent frame per chunk."""
        z = zs * self.std[None, :, None, None, None] + self.mean[
            None, :, None, None, None
        ]
        x = conv3d(self.params, "conv2", z)
        t = x.shape[2]
        # public contract stays f32 regardless of the compute dtype
        return self._run_chunks(
            lambda p, ch, cc: decoder_forward(p, self.cfg, ch, cc),
            x, list(range(t)), [1] * t,
            post=lambda o: jnp.clip(o.astype(jnp.float32), -1.0, 1.0),
            donate=x.shape[3] * x.shape[4] >= _ATTN_BLOCKWISE_MIN_HW,
        )


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------


def load_vae_checkpoint(path: str, dtype=jnp.float32) -> Params:
    """Wan2.1_VAE.pth (torch state dict) → flat param dict (keys preserved)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return {k: jnp.asarray(v.float().numpy(), dtype=dtype) for k, v in sd.items()}


def init_vae_params(cfg: VAEConfig, seed: int = 0) -> Params:
    """Random init for tests — builds the reference module tree shapes by
    instantiating the torch reference-equivalent shapes directly."""
    rng = np.random.default_rng(seed)
    p: Dict[str, jax.Array] = {}

    def conv3(key, ci, co, k=(3, 3, 3)):
        fan_in = ci * int(np.prod(k))
        b = 1.0 / np.sqrt(fan_in)
        p[f"{key}.weight"] = jnp.asarray(
            rng.uniform(-b, b, (co, ci, *k)).astype(np.float32))
        p[f"{key}.bias"] = jnp.asarray(rng.uniform(-b, b, co).astype(np.float32))

    def conv2(key, ci, co, k=(3, 3)):
        fan_in = ci * int(np.prod(k))
        b = 1.0 / np.sqrt(fan_in)
        p[f"{key}.weight"] = jnp.asarray(
            rng.uniform(-b, b, (co, ci, *k)).astype(np.float32))
        p[f"{key}.bias"] = jnp.asarray(rng.uniform(-b, b, co).astype(np.float32))

    def gamma(key, c, images):
        shape = (c, 1, 1) if images else (c, 1, 1, 1)
        p[f"{key}.gamma"] = jnp.ones(shape, jnp.float32)

    def res(key, ci, co):
        gamma(f"{key}.residual.0", ci, images=False)
        conv3(f"{key}.residual.2", ci, co)
        gamma(f"{key}.residual.3", co, images=False)
        conv3(f"{key}.residual.6", co, co)
        if ci != co:
            conv3(f"{key}.shortcut", ci, co, k=(1, 1, 1))

    def attn(key, c):
        gamma(f"{key}.norm", c, images=True)
        conv2(f"{key}.to_qkv", c, 3 * c, k=(1, 1))
        conv2(f"{key}.proj", c, c, k=(1, 1))

    cfgd = cfg
    # encoder
    dims = [cfgd.dim * u for u in (1,) + tuple(cfgd.dim_mult)]
    conv3("encoder.conv1", 3, dims[0])
    li = 0
    scale = 1.0
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        for _ in range(cfgd.num_res_blocks):
            res(f"encoder.downsamples.{li}", ci, co); li += 1
            if scale in cfgd.attn_scales:
                attn(f"encoder.downsamples.{li}", co); li += 1
            ci = co
        if i != len(cfgd.dim_mult) - 1:
            conv2(f"encoder.downsamples.{li}.resample.1", co, co)
            if cfgd.temperal_downsample[i]:
                conv3(f"encoder.downsamples.{li}.time_conv", co, co, k=(3, 1, 1))
            li += 1
            scale /= 2
    out_dim = dims[-1]
    res("encoder.middle.0", out_dim, out_dim)
    attn("encoder.middle.1", out_dim)
    res("encoder.middle.2", out_dim, out_dim)
    gamma("encoder.head.0", out_dim, images=False)
    conv3("encoder.head.2", out_dim, 2 * cfgd.z_dim)
    conv3("conv1", 2 * cfgd.z_dim, 2 * cfgd.z_dim, k=(1, 1, 1))
    conv3("conv2", cfgd.z_dim, cfgd.z_dim, k=(1, 1, 1))
    # decoder
    ddims = [cfgd.dim * u for u in (cfgd.dim_mult[-1],) + tuple(reversed(cfgd.dim_mult))]
    conv3("decoder.conv1", cfgd.z_dim, ddims[0])
    res("decoder.middle.0", ddims[0], ddims[0])
    attn("decoder.middle.1", ddims[0])
    res("decoder.middle.2", ddims[0], ddims[0])
    li = 0
    scale = 1.0 / 2 ** (len(cfgd.dim_mult) - 2)
    for i, (ci, co) in enumerate(zip(ddims[:-1], ddims[1:])):
        if i in (1, 2, 3):
            ci = ci // 2
        for _ in range(cfgd.num_res_blocks + 1):
            res(f"decoder.upsamples.{li}", ci, co); li += 1
            if scale in cfgd.attn_scales:
                attn(f"decoder.upsamples.{li}", co); li += 1
            ci = co
        if i != len(cfgd.dim_mult) - 1:
            conv2(f"decoder.upsamples.{li}.resample.1", co, co // 2)
            if cfgd.temperal_upsample[i]:
                conv3(f"decoder.upsamples.{li}.time_conv", co, 2 * co, k=(3, 1, 1))
            li += 1
            scale *= 2
    gamma("decoder.head.0", ddims[-1], images=False)
    conv3("decoder.head.2", ddims[-1], 3)
    return p


def decode_latents(ckpt_dir: str, wan_cfg, latents: jax.Array) -> jax.Array:
    """Pipeline hook: VAE-decode latents given a Wan checkpoint dir."""
    import os

    vae = WanVAE(vae_pth=os.path.join(ckpt_dir, wan_cfg.vae_checkpoint))
    return vae.decode(latents)
