"""I2V pipeline tests on the tiny config (mask construction parity vs the
reference formula, end-to-end latent generation with precomputed
conditioning, and the full vae+clip wiring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import init_params
from wanq_tpu.models import clip as jclip
from wanq_tpu.models import vae as jvae
from wanq_tpu.pipelines.image2video import WanI2V, first_frame_mask, i2v_latent_size


def test_first_frame_mask_matches_reference():
    frame_num, lat_h, lat_w = 81, 4, 6
    got = np.asarray(first_frame_mask(frame_num, lat_h, lat_w))
    # reference construction (image2video.py:235-242)
    msk = torch.ones(1, frame_num, lat_h, lat_w)
    msk[:, 1:] = 0
    msk = torch.concat(
        [torch.repeat_interleave(msk[:, 0:1], repeats=4, dim=1), msk[:, 1:]], dim=1
    )
    msk = msk.view(1, msk.shape[1] // 4, 4, lat_h, lat_w)
    want = msk.transpose(1, 2)[0].numpy()
    np.testing.assert_array_equal(got, want)
    assert got.shape == (4, 21, lat_h, lat_w)


def test_i2v_latent_size():
    cfg = tiny_config(model_type="i2v", in_dim=36)
    lat_h, lat_w = i2v_latent_size(cfg, (480, 832), 480 * 832)
    assert lat_h % cfg.patch_size[1] == 0 and lat_w % cfg.patch_size[2] == 0
    # square area roughly preserved
    assert abs((lat_h * 8) * (lat_w * 8) - 480 * 832) / (480 * 832) < 0.15


@pytest.fixture(scope="module")
def i2v_setup():
    from tests.conftest import randomize_head

    cfg = tiny_config(model_type="i2v", in_dim=36, clip_dim=32)
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


def test_i2v_generate_with_precomputed_conditioning(i2v_setup, rng):
    cfg, params = i2v_setup
    pipe = WanI2V(cfg, params)
    img = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctxn = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    lat_h, lat_w = i2v_latent_size(cfg, (32, 32), 32 * 32)
    lat_f = (5 - 1) // 4 + 1
    clip_fea = jnp.asarray(rng.normal(size=(1, 257, cfg.clip_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(20, lat_f, lat_h, lat_w)).astype(np.float32))
    latents = pipe.generate(
        img, ctx, ctxn, max_area=32 * 32, frame_num=5, sampling_steps=2,
        seed=3, clip_fea=clip_fea, y=y,
    )
    assert latents.shape == (1, 16, lat_f, lat_h, lat_w)
    assert np.isfinite(np.asarray(latents)).all()


@pytest.mark.slow
def test_i2v_generate_with_vae_and_clip(rng):
    # tiny VAE has overall stride (2,2,2); the Wan config must agree and
    # in_dim = z(16) + cond z(16) + mask channels (t_stride 2) = 34
    cfg = tiny_config(model_type="i2v", in_dim=34, clip_dim=32,
                      vae_stride=(2, 2, 2))
    params = init_params(cfg, jax.random.PRNGKey(0))
    vcfg = jvae.tiny_vae_config(z_dim=16)
    # z_dim 16 tiny VAE so mask(4) + latent(16) = 20 channels and the
    # published mean/std tables apply
    vae = jvae.WanVAE(vcfg, params=jvae.init_vae_params(vcfg, seed=1))
    ccfg = jclip.tiny_clip_config(vision_dim=cfg.clip_dim)
    clip = jclip.CLIPModel(ccfg, params=jclip.init_clip_params(ccfg, seed=2))
    pipe = WanI2V(cfg, params, vae=vae, clip=clip)
    img = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctxn = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    latents = pipe.generate(
        img, ctx, ctxn, max_area=32 * 32, frame_num=5, sampling_steps=1, seed=3
    )
    assert np.isfinite(np.asarray(latents)).all()
    video = vae.decode(latents)
    assert video.shape[1] == 3 and video.shape[2] == 5


def test_i2v_ref_latent_noise_injection(i2v_setup, rng):
    """WanI2V_Noise capability (image2video_noise_easy.py): the initial
    latent is (1-s)*noise + s*encoded-reference-video; s=0 reproduces the
    plain run, s>0 shifts the trajectory."""
    cfg, params = i2v_setup
    pipe = WanI2V(cfg, params)
    img = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32)).astype(np.float32))
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctxn = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    lat_h, lat_w = i2v_latent_size(cfg, (32, 32), 32 * 32)
    lat_f = (5 - 1) // 4 + 1
    clip_fea = jnp.asarray(rng.normal(size=(1, 257, cfg.clip_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(20, lat_f, lat_h, lat_w)).astype(np.float32))
    ref = jnp.asarray(
        rng.normal(size=(16, lat_f, lat_h, lat_w)).astype(np.float32))
    kw = dict(max_area=32 * 32, frame_num=5, sampling_steps=2, seed=3,
              clip_fea=clip_fea, y=y)
    base = pipe.generate(img, ctx, ctxn, **kw)
    same = pipe.generate(img, ctx, ctxn, ref_latents=ref,
                         ref_latent_strength=0.0, **kw)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    mixed = pipe.generate(img, ctx, ctxn, ref_latents=ref,
                          ref_latent_strength=0.01, **kw)
    assert np.isfinite(np.asarray(mixed)).all()
    assert not np.allclose(np.asarray(mixed), np.asarray(base))
