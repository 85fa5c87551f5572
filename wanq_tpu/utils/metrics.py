"""Quantization-fidelity metrics.

The reference's eval layer vendors ~30k LoC of third-party suites (VBench,
DOVER, RAFT flow, ImageReward — SURVEY.md §2, L8); those stay external
tooling. What the PTQ workflow itself needs — FP-vs-quant fidelity numbers
(the FPFVD idea of eval/video/readme.md:9-16, and the PSNR target in
BASELINE.md) — is provided here natively."""

from __future__ import annotations

from typing import Dict

import numpy as np


def psnr(a, b, data_range: float = 2.0) -> float:
    """Peak signal-to-noise ratio in dB (default range 2.0 for [-1,1] video)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(data_range**2 / mse)


def latent_psnr(a, b) -> float:
    """PSNR on latents, range set by the FP latents' dynamic range."""
    a = np.asarray(a, dtype=np.float64)
    rng = float(a.max() - a.min()) or 1.0
    return psnr(a, b, data_range=rng)


def relative_error(a, b) -> float:
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    denom = float(np.abs(a).max()) or 1.0
    return float(np.abs(a - b).max()) / denom


def cosine_similarity(a, b) -> float:
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 1.0 if na == nb else 0.0
    return float(a @ b / (na * nb))


def quant_fidelity_report(fp, quant) -> Dict[str, float]:
    """The per-run FP↔quant comparison the reference computes offline with
    its eval scripts. Non-finite outputs are surfaced explicitly (the
    TPU-side analog of the reference's in-path NaN asserts,
    base_quantizer.py:113)."""
    fp = np.asarray(fp)
    quant = np.asarray(quant)
    rep = {
        "psnr_db": latent_psnr(fp, quant),
        "rel_err": relative_error(fp, quant),
        "cosine": cosine_similarity(fp, quant),
    }
    nonfinite = int(np.size(quant) - np.isfinite(quant).sum())
    if nonfinite or not np.all(np.isfinite(fp)):
        rep["nonfinite_quant"] = float(nonfinite)
        rep["nonfinite_fp"] = float(np.size(fp) - np.isfinite(fp).sum())
    return rep
