"""CLIP-based video quality metrics: CLIPSIM, CLIP-Temp, temporal flickering.

TPU-native rebuild of the reference's CLIP video metrics
(eval/video/metrics/clip_score.py: calculate_clip_score averages per-frame
image-embedding ↔ text-embedding cosine; calculate_clip_temp_score averages
consecutive-frame embedding cosine; temporal_flickering.py:cal_score is
(255 − mean frame MAE)/255). The reference rides the HF `openai/clip`
checkpoint; this environment has no network egress, so the feature tower
here is the in-repo XLM-Roberta-CLIP (models/clip.py — the same tower the
i2v pipeline conditions on), loadable from the Wan CLIP checkpoint
(`models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth`). With a real
checkpoint the numbers are standard CLIP metrics; with random init they
are rank-preserving fidelity probes only (same caveat as the FVD
random-feature path, utils/fvd.py).

Pooled image embedding: cls token of the full vision tower projected by
`visual.head` (the reference's VisionTransformer pool_type='token' head,
clip.py:270-276; its forward leaves pooling to the caller), then
L2-normalized — the standard CLIP image embedding.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.models.clip import (
    CLIP_MEAN,
    CLIP_STD,
    CLIPConfig,
    Params,
    text_forward,
    vision_forward,
)


def vision_embed(p: Params, cfg: CLIPConfig, imgs: jax.Array) -> jax.Array:
    """imgs [B, 3, H, W] (CLIP-normalized) → L2-normalized [B, embed_dim].

    Full 32-block tower → cls token → visual.head projection
    (ref clip.py:270-276 'token' pool)."""
    h = vision_forward(p, cfg, imgs, use_31_block=False)
    cls = h[:, 0].astype(jnp.float32)
    e = cls @ p["visual.head"].astype(jnp.float32)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)


def text_embed(p: Params, cfg: CLIPConfig, ids: jax.Array) -> jax.Array:
    """ids [B, L] → L2-normalized [B, embed_dim]."""
    e = text_forward(p, cfg, ids).astype(jnp.float32)
    return e / jnp.linalg.norm(e, axis=-1, keepdims=True).clip(1e-12)


def _preprocess_frames(frames: jax.Array, image_size: int) -> jax.Array:
    """frames [B, T, H, W, 3] in [-1, 1] → [B*T, 3, S, S] CLIP-normalized
    (same resize + mean/std recipe as CLIPModel.visual, models/clip.py)."""
    b, t, h, w, c = frames.shape
    imgs = frames.reshape(b * t, h, w, c).transpose(0, 3, 1, 2)
    imgs = jax.image.resize(
        imgs, (b * t, c, image_size, image_size), method="cubic"
    )
    imgs = imgs * 0.5 + 0.5
    mean = jnp.asarray(CLIP_MEAN)[None, :, None, None]
    std = jnp.asarray(CLIP_STD)[None, :, None, None]
    return (imgs - mean) / std


def clip_frame_features(
    p: Params,
    cfg: CLIPConfig,
    videos: np.ndarray,
    frame_chunk: int = 8,
) -> np.ndarray:
    """videos [N, T, H, W, 3] in [-1, 1] → normalized features [N, T, D].

    Frames stream through a jitted chunk function (one compile, bounded
    device memory) — the JAX version of the reference's per-frame loop
    (clip_score.py:49-54)."""
    videos = np.asarray(videos, np.float32)
    n, t, h, w, c = videos.shape
    flat = videos.reshape(n * t, 1, h, w, c)

    # params ride as a pytree ARGUMENT — closing over them would embed the
    # tower's weights as HLO literals (multi-GB programs on the full tower)
    @jax.jit
    def chunk_fn(pp, x):
        return vision_embed(pp, cfg, _preprocess_frames(x, cfg.image_size))

    feats = []
    for i in range(0, n * t, frame_chunk):
        blk = flat[i : i + frame_chunk]  # [b, 1, H, W, 3]
        pad = frame_chunk - blk.shape[0]
        if pad:  # keep one jit specialization for the ragged tail
            blk = np.concatenate([blk, np.zeros_like(blk[:1]).repeat(pad, 0)])
        out = np.asarray(chunk_fn(p, jnp.asarray(blk)))
        feats.append(out[: frame_chunk - pad] if pad else out)
    return np.concatenate(feats, axis=0).reshape(n, t, -1)


def clipsim(frame_feats: np.ndarray, text_feats: np.ndarray) -> float:
    """Mean over videos and frames of cos(frame, its prompt's text emb)
    (ref clip_score.py:66-72). frame_feats [N, T, D], text_feats [N, D];
    both assumed L2-normalized."""
    sims = np.einsum("ntd,nd->nt", frame_feats, text_feats)
    return float(sims.mean())


def clip_temp(frame_feats: np.ndarray) -> float:
    """Mean cosine between consecutive frames' embeddings
    (ref clip_score.py calculate_clip_temp_score). frame_feats [N, T, D]."""
    if frame_feats.shape[1] < 2:
        return 1.0
    sims = np.einsum("ntd,ntd->nt", frame_feats[:, :-1], frame_feats[:, 1:])
    return float(sims.mean())


def temporal_flickering(videos: np.ndarray) -> float:
    """(255 − mean consecutive-frame MAE) / 255 on the uint8 scale
    (ref temporal_flickering.py:cal_score). videos [N, T, H, W, 3] in
    [-1, 1]; higher = less flicker (1.0 for a static video)."""
    v = (np.asarray(videos, np.float32) + 1.0) * 127.5
    if v.shape[1] < 2:
        return 1.0
    mae = np.abs(v[:, 1:] - v[:, :-1]).mean()
    return float((255.0 - mae) / 255.0)


def clip_fidelity_report(
    fp_videos: np.ndarray,
    quant_videos: np.ndarray,
    params: Params,
    cfg: CLIPConfig,
    text_ids: Optional[np.ndarray] = None,
    frame_chunk: int = 8,
) -> Dict[str, float]:
    """FP-vs-quant CLIP report: per-set CLIP-Temp and flicker, the
    frame-level FP↔quant embedding cosine (semantic drift of the quantized
    outputs), and — when prompt token ids are given — CLIPSIM for both sets.
    """
    fp_f = clip_frame_features(params, cfg, fp_videos, frame_chunk)
    q_f = clip_frame_features(params, cfg, quant_videos, frame_chunk)
    rep: Dict[str, float] = {
        "clip_temp_fp": clip_temp(fp_f),
        "clip_temp_quant": clip_temp(q_f),
        "flicker_fp": temporal_flickering(fp_videos),
        "flicker_quant": temporal_flickering(quant_videos),
        "clip_frame_cosine_fp_vs_quant": float(
            np.einsum("ntd,ntd->nt", fp_f, q_f).mean()
        ),
    }
    if text_ids is not None:
        t_f = np.asarray(text_embed(params, cfg, jnp.asarray(text_ids)))
        rep["clipsim_fp"] = clipsim(fp_f, t_f)
        rep["clipsim_quant"] = clipsim(q_f, t_f)
    return rep
