"""Image metrics: FPFID + CLIPScore (eval/image/evaluation rebuild)."""

import numpy as np
import pytest

from wanq_tpu.models.clip import init_clip_params, tiny_clip_config
from wanq_tpu.utils.image_metrics import (
    InceptionLikeFeatures,
    clipscore,
    fid,
    fpfid_report,
)


def _images(rng, n=6, hw=16):
    return (rng.random((n, hw, hw, 3), dtype=np.float32) * 2 - 1)


def test_fid_zero_for_identical_and_monotone_in_noise(rng):
    imgs = _images(rng)
    feat = InceptionLikeFeatures(feat_dim=32, seed=0)
    assert fid(imgs, imgs, feature_fn=feat) < 1e-6
    d1 = fid(imgs, imgs + 0.05 * rng.standard_normal(imgs.shape).astype(np.float32), feature_fn=feat)
    d2 = fid(imgs, imgs + 0.5 * rng.standard_normal(imgs.shape).astype(np.float32), feature_fn=feat)
    assert 0 < d1 < d2


def test_features_deterministic(rng):
    imgs = _images(rng, n=2)
    f1 = InceptionLikeFeatures(16, seed=3)(imgs)
    f2 = InceptionLikeFeatures(16, seed=3)(imgs)
    np.testing.assert_allclose(f1, f2, rtol=1e-6)
    assert not np.allclose(f1, InceptionLikeFeatures(16, seed=4)(imgs))


def test_fpfid_report_keys(rng):
    imgs = _images(rng, n=4)
    rep = fpfid_report(imgs, imgs + 0.01)
    assert {"psnr_db", "rel_err", "cosine", "fid_random_feat"} <= set(rep)
    assert rep["fid_random_feat"] >= 0


def test_clipscore_formula(rng):
    """2.5 · max(cos, 0) averaged — and perfect-alignment bound 2.5."""
    cfg = tiny_clip_config()
    p = init_clip_params(cfg, seed=0)
    imgs = _images(rng, n=2, hw=28)
    ids = rng.integers(2, cfg.vocab_size, (2, 8))
    s = clipscore(imgs, ids, p, cfg)
    assert 0.0 <= s <= 2.5


def test_evaluate_cli_images_path(tmp_path, rng):
    """4-D arrays route through FPFID in the CLI."""
    import io
    import json
    from contextlib import redirect_stdout

    from wanq_tpu.cli import evaluate as ev

    fp = _images(rng, n=3)
    np.savez(tmp_path / "fp.npz", images=fp)
    np.savez(tmp_path / "q.npz", images=np.clip(fp + 0.02, -1, 1))
    buf = io.StringIO()
    with redirect_stdout(buf):
        ev.main(["--fp", str(tmp_path / "fp.npz"), "--quant", str(tmp_path / "q.npz")])
    rep = json.loads(buf.getvalue())
    assert "fid_random_feat" in rep and "psnr_db" in rep
