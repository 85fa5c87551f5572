"""Image metrics: FPFID and CLIPScore (the t2i side of the eval layer).

TPU-native rebuild of the reference's eval/image/evaluation suite
(readme.md: CLIPScore for text-image alignment, FPFID — FID between FP16
and quantized outputs — for PTQ fidelity; fid_score.py is the standard
pytorch-fid InceptionV3 pipeline, test_score.py dispatches CLIP scoring).
ImageReward / HPS / Aesthetic / PickScore are external pretrained reward
models (test_score.py:127) and remain external tooling, like VBench/DOVER
on the video side.

As with utils/fvd.py, the environment has no network egress so the FID
feature extractor is pluggable: the default is a seeded random-projection
2D conv net (rank-preserving fidelity probe, reported as
``fid_random_feat``); any ``images [N,H,W,3] → [N,D]`` callable — e.g. a
converted InceptionV3 — yields standard FID. CLIPScore rides the in-repo
XLM-Roberta-CLIP tower (models/clip.py) and is the standard
``2.5 · max(cos(image, text), 0)`` formula.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.utils.fvd import frechet_distance


class InceptionLikeFeatures:
    """Seeded random 2D conv pyramid (stride-2 stages + GAP + linear head)
    — the image analog of fvd.I3DLikeFeatures. Deterministic given seed."""

    def __init__(self, feat_dim: int = 256, seed: int = 0):
        self.feat_dim = feat_dim
        widths = [16, 32, 64, 128]
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, len(widths) + 1)
        self.kernels = []
        c_in = 3
        for i, c_out in enumerate(widths):
            fan = c_in * 9
            self.kernels.append(
                jax.random.normal(ks[i], (3, 3, c_in, c_out), jnp.float32)
                / math.sqrt(fan)
            )
            c_in = c_out
        self.head = jax.random.normal(
            ks[-1], (c_in, feat_dim), jnp.float32
        ) / math.sqrt(c_in)
        self._fn = jax.jit(self._forward)

    def _forward(self, images: jax.Array) -> jax.Array:
        x = images.astype(jnp.float32)  # [N, H, W, 3]
        for k in self.kernels:
            x = jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2))
        return x @ self.head

    def __call__(self, images) -> np.ndarray:
        return np.asarray(self._fn(jnp.asarray(images)))


def _stats(feats: np.ndarray, eps: float):
    mu = feats.mean(axis=0)
    d = feats - mu[None]
    n = max(feats.shape[0] - 1, 1)
    cov = (d.T @ d) / n + eps * np.eye(feats.shape[1])
    return mu, cov


def fid(
    images_a,
    images_b,
    feature_fn: Optional[Callable] = None,
    eps: float = 1e-6,
) -> float:
    """FID between two image sets [N, H, W, 3] (fid_score.py
    calculate_fid_given_paths semantics, feature net pluggable)."""
    if feature_fn is None:
        feature_fn = InceptionLikeFeatures()
    fa = np.asarray(feature_fn(images_a), np.float64)
    fb = np.asarray(feature_fn(images_b), np.float64)
    return frechet_distance(*_stats(fa, eps), *_stats(fb, eps))


def clipscore(
    images: np.ndarray,
    text_ids: np.ndarray,
    params,
    cfg,
    frame_chunk: int = 8,
) -> float:
    """Mean CLIPScore = 2.5 · max(cos(image, its prompt), 0) over the set
    (the metric the reference dispatches via test_score.py 'CLIP').
    images [N, H, W, 3] in [-1, 1]; text_ids [N, L]."""
    from wanq_tpu.utils.clip_metrics import clip_frame_features, text_embed

    imgs = np.asarray(images, np.float32)[:, None]  # [N, 1, H, W, 3]
    f = clip_frame_features(params, cfg, imgs, frame_chunk)[:, 0]  # [N, D]
    t = np.asarray(text_embed(params, cfg, jnp.asarray(text_ids)))
    sims = np.einsum("nd,nd->n", f, t)
    return float(np.mean(2.5 * np.clip(sims, 0.0, None)))


def fpfid_report(
    fp_images,
    quant_images,
    feature_fn: Optional[Callable] = None,
) -> Dict[str, float]:
    """FPFID (eval/image/readme.md): FID of quantized outputs against the
    FP outputs of the same prompts/seeds, plus elementwise fidelity."""
    from wanq_tpu.utils.metrics import quant_fidelity_report

    rep = quant_fidelity_report(np.asarray(fp_images), np.asarray(quant_images))
    random_feat = feature_fn is None or isinstance(feature_fn, InceptionLikeFeatures)
    key = "fid_random_feat" if random_feat else "fid"
    rep[key] = fid(fp_images, quant_images, feature_fn=feature_fn)
    return rep
