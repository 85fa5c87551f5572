"""Sequential vs batched classifier-free guidance.

``cfg_mode='sequential'`` runs the CFG pair as two [B] forwards through
one compiled function instead of a single [2B] forward — the reference's
own schedule (ref text2video.py:255-261) and the memory route that lets
14B denoise at 720p x 81f on one 16 GB chip (BENCH_NOTES '14B 720p REAL
CFG'). The math is identical, so these tests demand exact latent parity
against the batched path on the tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import init_params
from wanq_tpu.pipelines.text2video import StepCachePolicy, WanT2V


@pytest.fixture(scope="module")
def tiny():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


@pytest.fixture(scope="module")
def contexts(tiny):
    cfg, _ = tiny
    rng = np.random.default_rng(1)
    mk = lambda: jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return mk(), mk()


GEN_KW = dict(size=(64, 64), frame_num=5, sampling_steps=6, seed=11)


def test_sequential_matches_batched(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    lat_b = np.asarray(pipe.generate(c, cn, **GEN_KW))
    lat_s = np.asarray(pipe.generate(c, cn, cfg_mode="sequential", **GEN_KW))
    # same FLOPs in a different batching: agreement up to XLA
    # reduction-order noise amplified over the solver steps (measured
    # 103.5 dB PSNR / 7e-4 max-abs on this setup)
    np.testing.assert_allclose(lat_s, lat_b, atol=3e-3)
    span = lat_b.max() - lat_b.min()
    psnr = 20 * np.log10(span / np.sqrt(((lat_s - lat_b) ** 2).mean()))
    assert psnr > 90.0, f"sequential CFG diverged: {psnr:.1f} dB"


def test_sequential_cached_matches_batched_cached(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    pol = StepCachePolicy(cfg_interval=2, reuse_interval=2, warmup=1, tail=1)
    lat_b = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    stats_b = dict(pipe.last_cache_stats)
    lat_s = np.asarray(pipe.generate(c, cn, cache_policy=pol,
                                     cfg_mode="sequential", **GEN_KW))
    assert pipe.last_cache_stats == stats_b  # same action schedule
    np.testing.assert_allclose(lat_s, lat_b, atol=3e-3)


def test_sequential_rejects_calibration(tiny, contexts):
    from wanq_tpu.pipelines.text2video import make_calib_ctx

    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params, quant_ctx=make_calib_ctx(cfg))
    with pytest.raises(ValueError, match="batched"):
        pipe.generate(c, cn, collect_calib=True, cfg_mode="sequential",
                      **GEN_KW)


def test_bad_cfg_mode_rejected(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    with pytest.raises(ValueError, match="cfg_mode"):
        pipe.generate(c, cn, cfg_mode="interleaved", **GEN_KW)


def test_i2v_sequential_matches_batched(rng):
    from tests.conftest import randomize_head
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.pipelines.image2video import WanI2V, i2v_latent_size

    cfg = tiny_config(model_type="i2v", in_dim=36, clip_dim=32)
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    img = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32)).astype(np.float32))
    c = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    cn = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    lat_h, lat_w = i2v_latent_size(cfg, (32, 32), 32 * 32)
    lat_f = (5 - 1) // 4 + 1
    clip_fea = jnp.asarray(rng.normal(
        size=(1, 257, cfg.clip_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(
        size=(20, lat_f, lat_h, lat_w)).astype(np.float32))

    pipe = WanI2V(cfg, params)
    kw = dict(max_area=32 * 32, frame_num=5, sampling_steps=4, seed=3,
              clip_fea=clip_fea, y=y)
    lat_b = np.asarray(pipe.generate(img, c, cn, **kw))
    lat_s = np.asarray(pipe.generate(img, c, cn, cfg_mode="sequential", **kw))
    np.testing.assert_allclose(lat_s, lat_b, atol=3e-3)


def test_on_step_callback_fires_each_step(tiny, contexts):
    """on_step (the tqdm-analog progress/timing hook) fires once per
    solver step with the step index, host timestep, and current latents,
    in both the plain and cached loops."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    seen = []
    pipe.generate(c, cn, on_step=lambda i, t, lat: seen.append((i, t, lat.shape)),
                  **GEN_KW)
    n = GEN_KW["sampling_steps"]
    assert [s[0] for s in seen] == list(range(n))
    ts = [s[1] for s in seen]
    assert ts == sorted(ts, reverse=True)  # denoise runs t high -> low
    assert all(s[2] == seen[0][2] for s in seen)

    seen.clear()
    pol = StepCachePolicy(cfg_interval=2, reuse_interval=2, warmup=1, tail=1)
    pipe.generate(c, cn, cache_policy=pol,
                  on_step=lambda i, t, lat: seen.append(i), **GEN_KW)
    assert seen == list(range(n))  # fires on reuse steps too
