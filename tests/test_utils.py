"""utils layer tests: video/image caching, metrics, checkpointing, prompt
expansion interface."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from wanq_tpu.utils.metrics import (
    cosine_similarity,
    latent_psnr,
    psnr,
    quant_fidelity_report,
    relative_error,
)
from wanq_tpu.utils.video import cache_image, cache_video, str2bool
from wanq_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from wanq_tpu.utils.prompt_extend import IdentityPromptExpander


def test_psnr_basic(rng):
    a = rng.uniform(-1, 1, size=(3, 4, 8, 8)).astype(np.float32)
    assert psnr(a, a) == float("inf")
    noisy = a + rng.normal(scale=0.01, size=a.shape).astype(np.float32)
    p = psnr(a, noisy)
    assert 35 < p < 60
    assert latent_psnr(a, noisy) > 30
    assert relative_error(a, a) == 0.0
    assert cosine_similarity(a, a) == pytest.approx(1.0)
    rep = quant_fidelity_report(a, noisy)
    assert set(rep) == {"psnr_db", "rel_err", "cosine"}


def test_cache_video_and_image(tmp_path, rng):
    video = rng.uniform(-1, 1, size=(3, 5, 16, 16)).astype(np.float32)
    out = cache_video(video, str(tmp_path / "v.mp4"), fps=8)
    assert out is not None
    import os

    assert os.path.getsize(out) > 0
    img = cache_image(video[:, 0], str(tmp_path / "i.png"))
    assert img is not None and os.path.getsize(img) > 0


def test_str2bool():
    assert str2bool("yes") and str2bool("1") and str2bool(True)
    assert not str2bool("no") and not str2bool("F")
    with pytest.raises(ValueError):
        str2bool("maybe")


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "a": jnp.asarray(rng.normal(size=(4, 8)).astype(np.float32)),
        "nested": {"b": jnp.arange(10, dtype=jnp.int32)},
    }
    path = save_checkpoint(str(tmp_path / "ckpt"), tree)
    back = load_checkpoint(path, target=tree)
    np.testing.assert_array_equal(np.asarray(back["a"]), np.asarray(tree["a"]))
    np.testing.assert_array_equal(
        np.asarray(back["nested"]["b"]), np.asarray(tree["nested"]["b"])
    )


def test_identity_prompt_expander():
    exp = IdentityPromptExpander()
    out = exp("a cat", tar_lang="en", seed=1)
    assert out.status and out.prompt == "a cat"
    out_zh = exp("一只猫", tar_lang="zh")
    assert out_zh.status and "提示词" in out_zh.system_prompt


def test_flow_score_motion_ranking():
    """Classical flow-score (ref optical_flow_scores.py semantics): zero on
    static video, increases with motion magnitude."""
    import numpy as np
    from wanq_tpu.utils.flow import flow_score

    # smooth structure (real video is low-frequency; iid noise aliases
    # under the pyramid and defeats any classical flow)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    base = (
        0.5 + 0.3 * np.sin(2 * np.pi * xx * 3) * np.cos(2 * np.pi * yy * 2)
    )

    def vid(shift):
        return np.stack(
            [np.stack([np.roll(base, shift * i, axis=1)] * 3, -1)
             for i in range(5)]
        )[None]

    s0 = flow_score(vid(0))
    s1 = flow_score(vid(1))
    s2 = flow_score(vid(3))
    assert s0 < 1e-6
    assert s1 > 0.2
    assert s2 > 1.5 * s1
