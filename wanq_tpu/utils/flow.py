"""Optical-flow score (motion-amount metric).

The reference computes 'flow-score' as the mean optical-flow magnitude
between consecutive frames using RAFT (eval/video/metrics/
optical_flow_scores.py — a pretrained torch net, external to the
framework). Here the same metric is computed with a classical pyramidal
Horn–Schunck estimator — no pretrained weights, pure numpy, deterministic
— which preserves the metric's ranking use (comparing motion between an
FP set and a quantized set; absolute values differ from RAFT's).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _to_gray(frame: np.ndarray) -> np.ndarray:
    """[H, W, 3] (uint8 or float) → [H, W] float32 luminance in [0, 1]."""
    f = np.asarray(frame, np.float32)
    if f.max() > 1.5:
        f = f / 255.0
    if f.ndim == 3:
        f = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    return f


def _downsample(img: np.ndarray) -> np.ndarray:
    h, w = img.shape
    h2, w2 = h // 2 * 2, w // 2 * 2
    x = img[:h2, :w2]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2] + x[1::2, 1::2])


def _upsample2(f: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    out = np.repeat(np.repeat(f, 2, axis=0), 2, axis=1)
    return out[: shape[0], : shape[1]]


def _gradients(i1: np.ndarray, i2: np.ndarray):
    """Horn–Schunck spatiotemporal derivatives (forward differences
    averaged over the two frames)."""
    kx = np.array([[-1.0, 1.0], [-1.0, 1.0]]) * 0.25
    ky = np.array([[-1.0, -1.0], [1.0, 1.0]]) * 0.25

    def conv2(img, k):
        from numpy.lib.stride_tricks import sliding_window_view

        pad = np.pad(img, ((0, 1), (0, 1)), mode="edge")
        win = sliding_window_view(pad, (2, 2))
        return np.einsum("ijkl,kl->ij", win, k)

    ix = conv2(i1, kx) + conv2(i2, kx)
    iy = conv2(i1, ky) + conv2(i2, ky)
    it = conv2(i2 - i1, np.full((2, 2), 0.25))
    return ix, iy, it


def _avg(f: np.ndarray) -> np.ndarray:
    """Horn–Schunck neighborhood average (cross kernel)."""
    p = np.pad(f, 1, mode="edge")
    return (
        (p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:]) / 6.0
        + (p[:-2, :-2] + p[:-2, 2:] + p[2:, :-2] + p[2:, 2:]) / 12.0
    )


def _warp(img: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    xs = np.clip(xx + u, 0, w - 1)
    ys = np.clip(yy + v, 0, h - 1)
    x0, y0 = np.floor(xs).astype(int), np.floor(ys).astype(int)
    x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
    fx, fy = xs - x0, ys - y0
    return (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x1] * fx * (1 - fy)
        + img[y1, x0] * (1 - fx) * fy
        + img[y1, x1] * fx * fy
    )


def horn_schunck(
    i1: np.ndarray,
    i2: np.ndarray,
    alpha: float = 1.0,
    iters: int = 40,
    u0=None,
    v0=None,
):
    """Single-level Horn–Schunck. Returns (u, v) flow in pixels."""
    u = np.zeros_like(i1) if u0 is None else u0
    v = np.zeros_like(i1) if v0 is None else v0
    i2w = _warp(i2, u, v) if u0 is not None else i2
    ix, iy, it = _gradients(i1, i2w)
    du = np.zeros_like(u)
    dv = np.zeros_like(v)
    denom = alpha**2 + ix**2 + iy**2
    for _ in range(iters):
        ubar, vbar = _avg(du), _avg(dv)
        t = (ix * ubar + iy * vbar + it) / denom
        du = ubar - ix * t
        dv = vbar - iy * t
    return u + du, v + dv


def pyramidal_flow(
    f1: np.ndarray,
    f2: np.ndarray,
    levels: int = 3,
    alpha: float = 1.0,
    iters: int = 40,
):
    """Coarse-to-fine Horn–Schunck between two frames ([H,W,3] or [H,W])."""
    i1, i2 = _to_gray(f1), _to_gray(f2)
    pyr1, pyr2 = [i1], [i2]
    for _ in range(levels - 1):
        if min(pyr1[-1].shape) < 16:
            break
        pyr1.append(_downsample(pyr1[-1]))
        pyr2.append(_downsample(pyr2[-1]))
    u = v = None
    for a, b in zip(reversed(pyr1), reversed(pyr2)):
        if u is not None:
            u = 2.0 * _upsample2(u, a.shape)
            v = 2.0 * _upsample2(v, a.shape)
        u, v = horn_schunck(a, b, alpha=alpha, iters=iters, u0=u, v0=v)
    return u, v


def flow_score(videos: np.ndarray, max_side: int = 128) -> float:
    """Mean flow magnitude over all consecutive frame pairs of all videos
    (the reference's flow_score semantics, optical_flow_scores.py) —
    frames are downscaled so max(H, W) <= max_side for tractability; the
    reported magnitude is rescaled back to original-resolution pixels."""
    videos = np.asarray(videos, np.float32)
    assert videos.ndim == 5, videos.shape
    if videos.shape[-1] not in (1, 3):  # N,C,T,H,W → N,T,H,W,C
        videos = videos.transpose(0, 2, 3, 4, 1)
    mags = []
    for vid in videos:
        frames = [_to_gray(f) for f in vid]
        scale = 1.0
        while max(frames[0].shape) > max_side:
            frames = [_downsample(f) for f in frames]
            scale *= 2.0
        for a, b in zip(frames[:-1], frames[1:]):
            u, v = pyramidal_flow(a, b)
            mags.append(scale * float(np.mean(np.sqrt(u**2 + v**2))))
    return float(np.mean(mags)) if mags else 0.0
