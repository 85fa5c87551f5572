"""FVD (Fréchet Video Distance) and the FP-vs-quant FPFVD harness.

The reference's key PTQ-fidelity metric is FPFVD — FVD computed between
the FP16 outputs and the quantized outputs of the same prompts
(eval/video/readme.md:9-16, eval/video/metrics/). Its implementation rides
a vendored I3D network with downloaded pretrained weights; this
environment has no network egress, so the feature extractor here is
**pluggable**:

* default: a seeded random-projection 3D conv network (`I3DLikeFeatures`).
  Random-feature Fréchet distances are a studied, rank-preserving variant
  (they discriminate distribution shifts monotonically even without
  pretrained semantics); absolute values are NOT comparable to published
  I3D-FVD numbers and the report labels them `fvd_random_feat`.
* any callable `videos [N,T,H,W,3] -> features [N,D]` can be passed
  instead (e.g. a converted I3D/VideoMAE checkpoint when available) —
  then the numbers are standard FVD.

The Fréchet math itself (`frechet_distance`) is exact and matches the
standard FID/FVD formula: |mu1-mu2|^2 + tr(C1 + C2 - 2 (C1 C2)^1/2).
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def frechet_distance(
    mu1: np.ndarray, cov1: np.ndarray, mu2: np.ndarray, cov2: np.ndarray
) -> float:
    """Exact Fréchet distance between two Gaussians.

    tr((C1 C2)^1/2) is computed via the symmetric form
    C1^1/2 C2 C1^1/2 (eigendecompositions only — no scipy sqrtm)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    cov1 = np.asarray(cov1, np.float64)
    cov2 = np.asarray(cov2, np.float64)
    diff = float(np.sum((mu1 - mu2) ** 2))
    # C1^1/2 via eigh (C1 symmetric PSD)
    w1, v1 = np.linalg.eigh(cov1)
    w1 = np.clip(w1, 0.0, None)
    s1 = (v1 * np.sqrt(w1)[None, :]) @ v1.T
    m = s1 @ cov2 @ s1
    wm = np.linalg.eigvalsh((m + m.T) / 2.0)
    wm = np.clip(wm, 0.0, None)
    tr_sqrt = float(np.sum(np.sqrt(wm)))
    return diff + float(np.trace(cov1) + np.trace(cov2)) - 2.0 * tr_sqrt


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


class I3DLikeFeatures:
    """Seeded random-projection 3D conv feature net (I3D-shaped stages:
    four stride-2 conv3d + gelu, global average pool, linear head).

    Deterministic given ``seed``; weights are generated once and reused, so
    FVDs computed in different processes agree."""

    def __init__(self, feat_dim: int = 256, seed: int = 0):
        self.feat_dim = feat_dim
        widths = [16, 32, 64, 128]
        key = jax.random.PRNGKey(seed)
        ks = jax.random.split(key, len(widths) + 1)
        self.kernels = []
        c_in = 3
        for i, c_out in enumerate(widths):
            fan = c_in * 27
            self.kernels.append(
                jax.random.normal(ks[i], (3, 3, 3, c_in, c_out), jnp.float32)
                / math.sqrt(fan)
            )
            c_in = c_out
        self.head = jax.random.normal(
            ks[-1], (c_in, feat_dim), jnp.float32
        ) / math.sqrt(c_in)
        self._fn = jax.jit(self._forward)

    def _forward(self, videos: jax.Array) -> jax.Array:
        x = videos.astype(jnp.float32)  # [N, T, H, W, 3] in [-1, 1] or [0,1]
        for k in self.kernels:
            x = jax.lax.conv_general_dilated(
                x, k,
                window_strides=(2, 2, 2),
                padding="SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
            x = jax.nn.gelu(x)
        x = jnp.mean(x, axis=(1, 2, 3))  # global average pool
        return x @ self.head

    def __call__(self, videos) -> np.ndarray:
        v = jnp.asarray(videos)
        if v.ndim == 4:  # [T, H, W, 3] single video
            v = v[None]
        return np.asarray(self._fn(v))


# ---------------------------------------------------------------------------
# FVD
# ---------------------------------------------------------------------------


def _stats(feats: np.ndarray, eps: float):
    mu = feats.mean(axis=0)
    d = feats - mu[None]
    n = max(feats.shape[0] - 1, 1)
    cov = (d.T @ d) / n + eps * np.eye(feats.shape[1])
    return mu, cov


def fvd(
    videos_a,
    videos_b,
    feature_fn: Optional[Callable] = None,
    eps: float = 1e-6,
) -> float:
    """FVD between two sets of videos [N, T, H, W, 3].

    With the default random-feature extractor the value is a relative
    fidelity score (0 for identical sets, monotone in distortion), not an
    I3D-FVD absolute."""
    if feature_fn is None:
        feature_fn = I3DLikeFeatures()
    fa = np.asarray(feature_fn(videos_a), np.float64)
    fb = np.asarray(feature_fn(videos_b), np.float64)
    mu_a, cov_a = _stats(fa, eps)
    mu_b, cov_b = _stats(fb, eps)
    return frechet_distance(mu_a, cov_a, mu_b, cov_b)


def fpfvd_report(
    fp_videos, quant_videos, feature_fn: Optional[Callable] = None
) -> Dict[str, float]:
    """The reference's FPFVD harness (eval/video/readme.md:9-16): FVD of
    quantized outputs against the FP outputs of the same seeds/prompts,
    plus the elementwise fidelity metrics."""
    from wanq_tpu.utils.metrics import quant_fidelity_report

    rep = quant_fidelity_report(np.asarray(fp_videos), np.asarray(quant_videos))
    random_feat = feature_fn is None or isinstance(feature_fn, I3DLikeFeatures)
    key = "fvd_random_feat" if random_feat else "fvd"
    rep[key] = fvd(fp_videos, quant_videos, feature_fn=feature_fn)
    return rep


def latents_as_videos(latents) -> np.ndarray:
    """Adapt DiT latents [B, C, F, h, w] into the video layout the feature
    net consumes: channels fold into a spatial grid, 3 pseudo-RGB planes.
    Lets the FPFVD harness run on latent outputs when no VAE decode is in
    the loop (bench.py's seeded pair)."""
    z = np.asarray(latents, np.float32)
    b, c, f, h, w = z.shape
    # zero-pad channels up to a multiple of 3 — every latent channel
    # contributes to the features (dropping the remainder would blind the
    # metric to defects concentrated there)
    c3 = -(-c // 3) * 3
    if c3 != c:
        z = np.concatenate([z, np.zeros((b, c3 - c, f, h, w), z.dtype)], axis=1)
    g = c3 // 3
    # [B, 3, g, F, h, w] -> tile the g channel-groups along width
    z = z.reshape(b, 3, g, f, h, w).transpose(0, 3, 4, 2, 5, 1)
    return z.reshape(b, f, h, g * w, 3)
