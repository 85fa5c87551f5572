"""CLIP video metrics: CLIPSIM / CLIP-Temp / temporal flickering
(TPU-native slice of eval/video/metrics/{clip_score,temporal_flickering}.py)."""

import numpy as np
import pytest

from wanq_tpu.models.clip import init_clip_params, tiny_clip_config
from wanq_tpu.utils.clip_metrics import (
    clip_fidelity_report,
    clip_frame_features,
    clip_temp,
    clipsim,
    temporal_flickering,
    text_embed,
    vision_embed,
)


@pytest.fixture(scope="module")
def clip_tiny():
    cfg = tiny_clip_config()
    return init_clip_params(cfg, seed=0), cfg


def _videos(rng, n=2, t=4, hw=28):
    return (rng.random((n, t, hw, hw, 3), dtype=np.float32) * 2 - 1)


def test_frame_features_normalized_and_shaped(clip_tiny, rng):
    p, cfg = clip_tiny
    vids = _videos(rng)
    f = clip_frame_features(p, cfg, vids, frame_chunk=3)  # ragged tail
    assert f.shape == (2, 4, cfg.embed_dim)
    np.testing.assert_allclose(np.linalg.norm(f, axis=-1), 1.0, atol=1e-4)


def test_frame_features_chunking_invariant(clip_tiny, rng):
    """Chunked streaming must not change the features (incl. pad tail)."""
    p, cfg = clip_tiny
    vids = _videos(rng, n=1, t=5)
    f1 = clip_frame_features(p, cfg, vids, frame_chunk=2)
    f2 = clip_frame_features(p, cfg, vids, frame_chunk=5)
    np.testing.assert_allclose(f1, f2, atol=1e-4)


def test_clip_temp_one_for_static_video(clip_tiny, rng):
    p, cfg = clip_tiny
    frame = rng.random((1, 1, 28, 28, 3), dtype=np.float32) * 2 - 1
    vids = np.repeat(frame, 4, axis=1)
    f = clip_frame_features(p, cfg, vids)
    assert clip_temp(f) == pytest.approx(1.0, abs=1e-4)
    # and a changing video scores strictly lower
    f2 = clip_frame_features(p, cfg, _videos(rng, n=1))
    assert clip_temp(f2) < clip_temp(f)


def test_temporal_flickering_reference_formula(rng):
    """(255 - mean MAE)/255 on the uint8 scale (temporal_flickering.py:36-40)."""
    static = np.repeat(rng.random((1, 1, 8, 8, 3), dtype=np.float32), 3, axis=1)
    assert temporal_flickering(static) == pytest.approx(1.0)
    vids = _videos(rng, n=1, t=3, hw=8)
    v255 = (vids + 1) * 127.5
    want = (255.0 - np.abs(v255[:, 1:] - v255[:, :-1]).mean()) / 255.0
    assert temporal_flickering(vids) == pytest.approx(want, rel=1e-6)


def test_clipsim_matches_manual_cosine(clip_tiny, rng):
    p, cfg = clip_tiny
    vids = _videos(rng, n=2, t=3)
    ids = rng.integers(2, cfg.vocab_size, (2, 8))
    f = clip_frame_features(p, cfg, vids)
    t = np.asarray(text_embed(p, cfg, ids))
    want = np.mean([f[i] @ t[i] for i in range(2)])
    assert clipsim(f, t) == pytest.approx(float(want), rel=1e-5)


def test_fidelity_report_identity_and_drift(clip_tiny, rng):
    p, cfg = clip_tiny
    fp = _videos(rng, n=2, t=3)
    ids = rng.integers(2, cfg.vocab_size, (2, 8))
    rep = clip_fidelity_report(fp, fp.copy(), p, cfg, text_ids=ids)
    assert rep["clip_frame_cosine_fp_vs_quant"] == pytest.approx(1.0, abs=1e-4)
    assert rep["clip_temp_fp"] == pytest.approx(rep["clip_temp_quant"], abs=1e-5)
    assert rep["clipsim_fp"] == pytest.approx(rep["clipsim_quant"], abs=1e-5)
    # heavy perturbation drifts the FP-vs-quant frame cosine below identity
    q = np.clip(fp + 0.5 * rng.standard_normal(fp.shape).astype(np.float32), -1, 1)
    rep2 = clip_fidelity_report(fp, q, p, cfg)
    assert rep2["clip_frame_cosine_fp_vs_quant"] < rep["clip_frame_cosine_fp_vs_quant"]


@pytest.mark.slow
def test_evaluate_cli_clip_metrics(tmp_path, rng, monkeypatch):
    """--clip_metrics path through the CLI on tiny videos (random CLIP init
    is flagged in the report)."""
    from wanq_tpu.cli import evaluate as ev
    import wanq_tpu.models.clip as clip_mod

    fp = _videos(rng, n=1, t=2, hw=28)
    q = np.clip(fp + 0.01, -1, 1)
    fpp, qp = tmp_path / "fp.npz", tmp_path / "q.npz"
    np.savez(fpp, videos=fp)
    np.savez(qp, videos=q)

    # keep the CLI fast: swap the full tower for the tiny config
    tiny = tiny_clip_config()
    monkeypatch.setattr(clip_mod, "CLIP_XLM_ROBERTA_VIT_H_14", tiny)
    import json
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        ev.main(["--fp", str(fpp), "--quant", str(qp), "--clip_metrics"])
    rep = json.loads(buf.getvalue())
    assert "clip_temp_fp" in rep and "flicker_quant" in rep
    assert rep["clip_random_init"] == 1.0
