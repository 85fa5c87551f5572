"""FVD / FPFVD harness tests (VERDICT round-1 missing #4)."""

import numpy as np
import pytest

from wanq_tpu.utils.fvd import (
    I3DLikeFeatures,
    fpfvd_report,
    frechet_distance,
    fvd,
    latents_as_videos,
)


def test_frechet_distance_closed_form():
    """Diagonal Gaussians: FD = |dmu|^2 + sum (sqrt(s1)-sqrt(s2))^2."""
    rng = np.random.default_rng(0)
    d = 6
    mu1, mu2 = rng.normal(size=d), rng.normal(size=d)
    s1, s2 = rng.random(d) + 0.5, rng.random(d) + 0.5
    got = frechet_distance(mu1, np.diag(s1), mu2, np.diag(s2))
    want = float(np.sum((mu1 - mu2) ** 2) + np.sum((np.sqrt(s1) - np.sqrt(s2)) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-8)


def test_frechet_distance_zero_for_identical():
    rng = np.random.default_rng(1)
    a = rng.normal(size=(16, 8))
    cov = a.T @ a / 15 + 0.01 * np.eye(8)
    mu = rng.normal(size=8)
    assert abs(frechet_distance(mu, cov, mu, cov)) < 1e-8


def test_fvd_zero_for_identical_and_monotone_in_noise():
    rng = np.random.default_rng(2)
    vids = rng.random((6, 8, 16, 16, 3)).astype(np.float32)
    feat = I3DLikeFeatures(feat_dim=32, seed=0)
    assert fvd(vids, vids, feature_fn=feat) < 1e-6
    d_small = fvd(vids, vids + 0.05 * rng.standard_normal(vids.shape).astype(np.float32), feature_fn=feat)
    d_large = fvd(vids, vids + 0.5 * rng.standard_normal(vids.shape).astype(np.float32), feature_fn=feat)
    assert 0 < d_small < d_large


def test_features_deterministic_across_instances():
    rng = np.random.default_rng(3)
    vids = rng.random((2, 8, 16, 16, 3)).astype(np.float32)
    f1 = I3DLikeFeatures(feat_dim=16, seed=7)(vids)
    f2 = I3DLikeFeatures(feat_dim=16, seed=7)(vids)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)
    f3 = I3DLikeFeatures(feat_dim=16, seed=8)(vids)
    assert not np.allclose(f1, f3)


def test_fpfvd_report_on_latents():
    rng = np.random.default_rng(4)
    lat_fp = rng.normal(size=(4, 16, 4, 8, 8)).astype(np.float32)
    lat_q = lat_fp + 0.02 * rng.standard_normal(lat_fp.shape).astype(np.float32)
    vids_fp = latents_as_videos(lat_fp)
    vids_q = latents_as_videos(lat_q)
    assert vids_fp.shape == (4, 4, 8, 6 * 8, 3)  # 16ch zero-pads to 18 -> 6 groups
    rep = fpfvd_report(vids_fp, vids_q)
    assert "fvd_random_feat" in rep and rep["fvd_random_feat"] > 0
    assert rep["psnr_db"] > 20
