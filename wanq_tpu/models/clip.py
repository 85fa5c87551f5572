"""XLM-Roberta-CLIP (vision conditioning for i2v) in functional JAX.

TPU-native rebuild of wan/modules/clip.py (VisionTransformer :209-302,
XLMRobertaWithHead :305-325, XLMRobertaCLIP :328-412, CLIPModel :434-542)
and wan/modules/xlm_roberta.py (XLMRoberta :77-143).

Params are a flat {torch_key: array} dict (checkpoint conversion = dtype
cast). The i2v pipeline consumes ``CLIPModel.visual`` with use_31_block
semantics: the ViT-H/14 tower up to the second-to-last block → [B, 257,
1280] features (ref clip.py:198-213).

Deviation: image resizing uses jax.image 'cubic' (Keys kernel) instead of
torch's bicubic-antialias — sub-pixel differences only.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jax.Array]

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    # ref clip_xlm_roberta_vit_h_14 (clip.py:142-169)
    embed_dim: int = 1024
    image_size: int = 224
    patch_size: int = 14
    vision_dim: int = 1280
    vision_mlp_ratio: int = 4
    vision_heads: int = 16
    vision_layers: int = 32
    activation: str = "gelu"
    vocab_size: int = 250002
    max_text_len: int = 514
    pad_id: int = 1
    text_dim: int = 1024
    text_heads: int = 16
    text_layers: int = 24
    norm_eps: float = 1e-5

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_XLM_ROBERTA_VIT_H_14 = CLIPConfig()


def tiny_clip_config(**overrides) -> CLIPConfig:
    base = dict(embed_dim=16, image_size=28, patch_size=14, vision_dim=32,
                vision_heads=4, vision_layers=2, vocab_size=64,
                max_text_len=16, text_dim=32, text_heads=4, text_layers=2)
    base.update(overrides)
    return CLIPConfig(**base)


def _ln(p, key, x, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return y * p[f"{key}.weight"].astype(jnp.float32) + p[f"{key}.bias"].astype(jnp.float32)


def _lin(p, key, x, bias=True):
    y = jnp.dot(x, p[f"{key}.weight"].astype(x.dtype).T,
                preferred_element_type=jnp.float32)
    if bias and f"{key}.bias" in p:
        y = y + p[f"{key}.bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def _mha(q, k, v, num_heads, mask=None):
    b, sq, c = q.shape
    d = c // num_heads
    qh = q.reshape(b, sq, num_heads, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, -1, num_heads, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, -1, num_heads, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh).astype(jnp.float32) / math.sqrt(d)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
    return out.transpose(0, 2, 1, 3).reshape(b, sq, c)


# ---------------------------------------------------------------------------
# vision tower (ref VisionTransformer, clip.py:209-302)
# ---------------------------------------------------------------------------


def vision_forward(
    p: Params, cfg: CLIPConfig, x: jax.Array, use_31_block: bool = False
) -> jax.Array:
    """x: [B, 3, H, W] normalized images → tokens [B, 1+P, dim]."""
    b = x.shape[0]
    ps = cfg.patch_size
    w = p["visual.patch_embedding.weight"].astype(jnp.float32)
    tok = jax.lax.conv_general_dilated(
        x.astype(jnp.float32), w, window_strides=(ps, ps), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    if "visual.patch_embedding.bias" in p:
        tok = tok + p["visual.patch_embedding.bias"][None, :, None, None]
    tok = tok.reshape(b, cfg.vision_dim, -1).transpose(0, 2, 1)
    cls = jnp.broadcast_to(p["visual.cls_embedding"], (b, 1, cfg.vision_dim))
    h = jnp.concatenate([cls, tok], axis=1) + p["visual.pos_embedding"]
    h = _ln(p, "visual.pre_norm", h, cfg.norm_eps)

    n_blocks = cfg.vision_layers - (1 if use_31_block else 0)
    for i in range(n_blocks):
        key = f"visual.transformer.{i}"
        hn = _ln(p, f"{key}.norm1", h, cfg.norm_eps)
        qkv = _lin(p, f"{key}.attn.to_qkv", hn)
        # ref SelfAttention: view(b, s, 3, n, d).unbind(2)
        b_, s_, _ = qkv.shape
        qkv3 = qkv.reshape(b_, s_, 3, cfg.vision_dim)
        q, k, v = qkv3[:, :, 0], qkv3[:, :, 1], qkv3[:, :, 2]
        a = _mha(q, k, v, cfg.vision_heads)
        h = h + _lin(p, f"{key}.attn.proj", a)
        hn = _ln(p, f"{key}.norm2", h, cfg.norm_eps)
        m = _lin(p, f"{key}.mlp.0", hn)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False).astype(m.dtype)
        h = h + _lin(p, f"{key}.mlp.2", m)
    return h


# ---------------------------------------------------------------------------
# text tower (ref XLMRoberta, xlm_roberta.py:77-143; head clip.py:305-325)
# ---------------------------------------------------------------------------


def text_forward(p: Params, cfg: CLIPConfig, ids: jax.Array) -> jax.Array:
    """ids: [B, L] → pooled + projected [B, embed_dim]."""
    b, s = ids.shape
    mask = (ids != cfg.pad_id).astype(jnp.int32)
    pos_ids = cfg.pad_id + jnp.cumsum(mask, axis=1) * mask
    x = (
        p["textual.token_embedding.weight"][ids]
        + p["textual.type_embedding.weight"][jnp.zeros_like(ids)]
        + p["textual.pos_embedding.weight"][pos_ids]
    ).astype(jnp.float32)
    x = _ln(p, "textual.norm", x, 1e-5)  # post_norm=True applies pre-blocks

    attn_mask = jnp.where(
        mask[:, None, None, :] > 0, 0.0, jnp.finfo(jnp.float32).min
    )
    for i in range(cfg.text_layers):
        key = f"textual.blocks.{i}"
        # post-norm residual order (xlm_roberta.py:68-70)
        q = _lin(p, f"{key}.attn.q", x)
        k = _lin(p, f"{key}.attn.k", x)
        v = _lin(p, f"{key}.attn.v", x)
        a = _mha(q, k, v, cfg.text_heads, mask=attn_mask)
        x = _ln(p, f"{key}.norm1", x + _lin(p, f"{key}.attn.o", a), 1e-5)
        m = _lin(p, f"{key}.ffn.0", x)
        m = jax.nn.gelu(m.astype(jnp.float32), approximate=False)
        m = _lin(p, f"{key}.ffn.2", m.astype(x.dtype))
        x = _ln(p, f"{key}.norm2", x + m, 1e-5)

    # average pool over non-pad (clip.py:318-321)
    mf = mask[:, :, None].astype(jnp.float32)
    pooled = jnp.sum(x * mf, axis=1) / jnp.sum(mf, axis=1)
    h = _lin(p, "textual.head.0", pooled, bias=False)
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False)
    return _lin(p, "textual.head.2", h.astype(pooled.dtype), bias=False)


class CLIPModel:
    """ref CLIPModel (clip.py:172-213): preprocess video first frames and
    return the use_31_block ViT features for i2v conditioning."""

    def __init__(self, cfg: CLIPConfig = CLIP_XLM_ROBERTA_VIT_H_14,
                 params: Optional[Params] = None,
                 checkpoint_path: Optional[str] = None):
        self.cfg = cfg
        if params is not None:
            self.params = params
        elif checkpoint_path:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
            self.params = {
                k: jnp.asarray(v.float().numpy()) for k, v in sd.items()
            }
        else:
            self.params = init_clip_params(cfg)

    def visual(self, videos: jax.Array) -> jax.Array:
        """videos: [B, 3, T, H, W] in [-1, 1] → [B*T, 257, vision_dim]."""
        b, c, t, h, w = videos.shape
        imgs = videos.transpose(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        size = (self.cfg.image_size, self.cfg.image_size)
        imgs = jax.image.resize(imgs, (b * t, c, *size), method="cubic")
        imgs = imgs * 0.5 + 0.5
        mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
        std = jnp.asarray(CLIP_STD)[None, :, None, None]
        imgs = (imgs - mean) / std
        return vision_forward(self.params, self.cfg, imgs, use_31_block=True)


def init_clip_params(cfg: CLIPConfig, seed: int = 0) -> Params:
    """Random init (shapes mirror the torch state dict exactly)."""
    rng = np.random.default_rng(seed)
    p: Params = {}
    gain = 1.0 / math.sqrt(cfg.vision_dim)

    def lin(key, ci, co, bias=True):
        b = 1.0 / math.sqrt(ci)
        p[f"{key}.weight"] = jnp.asarray(rng.uniform(-b, b, (co, ci)).astype(np.float32))
        if bias:
            p[f"{key}.bias"] = jnp.asarray(rng.uniform(-b, b, co).astype(np.float32))

    def ln(key, c):
        p[f"{key}.weight"] = jnp.ones((c,), jnp.float32)
        p[f"{key}.bias"] = jnp.zeros((c,), jnp.float32)

    vd = cfg.vision_dim
    p["visual.patch_embedding.weight"] = jnp.asarray(
        (rng.standard_normal((vd, 3, cfg.patch_size, cfg.patch_size)) * 0.02).astype(np.float32))
    p["visual.cls_embedding"] = jnp.asarray(
        (gain * rng.standard_normal((1, 1, vd))).astype(np.float32))
    p["visual.pos_embedding"] = jnp.asarray(
        (gain * rng.standard_normal((1, cfg.num_patches + 1, vd))).astype(np.float32))
    ln("visual.pre_norm", vd)
    for i in range(cfg.vision_layers):
        key = f"visual.transformer.{i}"
        ln(f"{key}.norm1", vd)
        lin(f"{key}.attn.to_qkv", vd, 3 * vd)
        lin(f"{key}.attn.proj", vd, vd)
        ln(f"{key}.norm2", vd)
        lin(f"{key}.mlp.0", vd, vd * cfg.vision_mlp_ratio)
        lin(f"{key}.mlp.2", vd * cfg.vision_mlp_ratio, vd)
    ln("visual.post_norm", vd)
    p["visual.head"] = jnp.asarray(
        (gain * rng.standard_normal((vd, cfg.embed_dim))).astype(np.float32))

    td = cfg.text_dim
    p["textual.token_embedding.weight"] = jnp.asarray(
        (rng.standard_normal((cfg.vocab_size, td)) * 0.02).astype(np.float32))
    p["textual.type_embedding.weight"] = jnp.asarray(
        (rng.standard_normal((1, td)) * 0.02).astype(np.float32))
    p["textual.pos_embedding.weight"] = jnp.asarray(
        (rng.standard_normal((cfg.max_text_len, td)) * 0.02).astype(np.float32))
    ln("textual.norm", td)
    for i in range(cfg.text_layers):
        key = f"textual.blocks.{i}"
        for leaf in ("q", "k", "v", "o"):
            lin(f"{key}.attn.{leaf}", td, td)
        ln(f"{key}.norm1", td)
        lin(f"{key}.ffn.0", td, 4 * td)
        lin(f"{key}.ffn.2", 4 * td, td)
        ln(f"{key}.norm2", td)
    mid = (td + cfg.embed_dim) // 2
    lin("textual.head.0", td, mid, bias=False)
    lin("textual.head.2", mid, cfg.embed_dim, bias=False)
    return p
