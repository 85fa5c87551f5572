"""3D causal VAE tests: golden parity against the reference torch
implementation (loaded from /root/reference as a test oracle), exercising
the chunked streaming encode/decode with feature caches."""

import importlib.util
import sys

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wanq_tpu.models import vae as jvae

REF_VAE = "/root/reference/ViDiT-Q/examples/Wan2.1/wan/modules/vae.py"


@pytest.fixture(scope="module")
def ref_vae():
    spec = importlib.util.spec_from_file_location("ref_vae", REF_VAE)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_vae"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny(ref_vae):
    cfg = jvae.tiny_vae_config()
    params = jvae.init_vae_params(cfg, seed=0)
    ref = ref_vae.WanVAE_(
        dim=cfg.dim,
        z_dim=cfg.z_dim,
        dim_mult=list(cfg.dim_mult),
        num_res_blocks=cfg.num_res_blocks,
        attn_scales=list(cfg.attn_scales),
        temperal_downsample=list(cfg.temperal_downsample),
        dropout=0.0,
    ).eval()
    sd = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
    missing, unexpected = ref.load_state_dict(sd, strict=True), None
    return cfg, params, ref


def test_param_keys_match_reference_exactly(tiny):
    cfg, params, ref = tiny
    assert set(params.keys()) == set(k for k, _ in ref.state_dict().items())


@pytest.mark.slow
def test_encode_parity(tiny, rng):
    cfg, params, ref = tiny
    vae = jvae.WanVAE(cfg, params=params)
    x = rng.normal(size=(1, 3, 9, 16, 16)).astype(np.float32)

    with torch.no_grad():
        want = ref.encode(torch.tensor(x), scale=[0.0, 1.0]).numpy()
    got = np.asarray(vae.encode(jnp.asarray(x)))
    assert got.shape == want.shape == (1, cfg.z_dim, 5, 8, 8)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_decode_parity(tiny, rng):
    cfg, params, ref = tiny
    vae = jvae.WanVAE(cfg, params=params)
    z = rng.normal(size=(1, cfg.z_dim, 3, 8, 8)).astype(np.float32)

    with torch.no_grad():
        want = ref.decode(torch.tensor(z), scale=[0.0, 1.0]).clamp(-1, 1).numpy()
    got = np.asarray(vae.decode(jnp.asarray(z)))
    assert got.shape == want.shape == (1, 3, 5, 16, 16)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


@pytest.mark.slow
def test_full_wan_vae_shape_roundtrip(rng):
    """Real Wan VAE config (dim 96, z 16, strides (4,8,8)) at tiny spatial
    size: T frames → (T-1)/4+1 latents → back to T frames."""
    cfg = jvae.WAN_VAE_CFG
    params = jvae.init_vae_params(cfg, seed=1)
    vae = jvae.WanVAE(cfg, params=params)
    x = rng.normal(size=(1, 3, 9, 32, 32)).astype(np.float32) * 0.1
    z = vae.encode(jnp.asarray(x))
    assert z.shape == (1, 16, 3, 4, 4)
    y = vae.decode(z)
    assert y.shape == (1, 3, 9, 32, 32)
    assert np.isfinite(np.asarray(y)).all()


def test_bf16_compute_dtype_decode_close_to_f32(tiny, rng):
    """WanVAE(compute_dtype=bf16) is the reference's WanVAE(dtype=...) amp
    knob (ref vae.py:619-661): convs run bf16 with f32 accumulation, norm
    stats and gammas stay f32, output contract stays f32. The bf16 path
    must track the f32 path closely (it shares every op, only at-rest
    precision differs)."""
    cfg, params, _ = tiny
    vae32 = jvae.WanVAE(cfg, params=params)
    vae16 = jvae.WanVAE(cfg, params=params, compute_dtype=jnp.bfloat16)
    # gammas kept f32, everything else cast once
    assert all(v.dtype == jnp.float32 for k, v in vae16.params.items()
               if k.endswith(".gamma"))
    assert all(v.dtype == jnp.bfloat16 for k, v in vae16.params.items()
               if k.endswith(".weight"))

    z = rng.normal(size=(1, cfg.z_dim, 3, 8, 8)).astype(np.float32)
    y32 = np.asarray(vae32.decode(jnp.asarray(z)))
    y16 = np.asarray(vae16.decode(jnp.asarray(z)))
    assert y16.dtype == np.float32  # public contract independent of compute
    err = np.abs(y32 - y16).max()
    rng_span = y32.max() - y32.min() + 1e-9
    psnr = 20 * np.log10(rng_span / max(np.sqrt(np.mean((y32 - y16) ** 2)), 1e-12))
    assert psnr > 35.0, f"bf16 decode diverged: PSNR {psnr:.1f} dB, max {err:.4f}"

    x = rng.normal(size=(1, 3, 5, 16, 16)).astype(np.float32)
    z32 = np.asarray(vae32.encode(jnp.asarray(x)))
    z16 = np.asarray(vae16.encode(jnp.asarray(x)))
    zpsnr = 20 * np.log10(
        (z32.max() - z32.min() + 1e-9)
        / max(np.sqrt(np.mean((z32 - z16) ** 2)), 1e-12))
    assert zpsnr > 35.0, f"bf16 encode diverged: PSNR {zpsnr:.1f} dB"


def test_blockwise_spatial_attention_matches_oneshot(rng, monkeypatch):
    """The 720p memory path (lax.map over query-row blocks, models/vae.py
    attention_block) is exact: softmax is per-row, so row-blocking must
    reproduce the one-shot attention bit-for-bit up to reduction order.
    Production shapes only cross the 8192-token threshold at 720p latents,
    so force it here and compare against the one-shot path on the SAME
    weights/input (incl. a non-divisible hw to exercise the pad/slice)."""
    cfg = jvae.tiny_vae_config()
    params = jvae.init_vae_params(cfg, seed=1)
    # tiny cfg attends at the deepest scale; pick the middle decoder attn key
    keys = sorted({k.rsplit(".", 2)[0] for k in params
                   if ".to_qkv.weight" in k and k.startswith("decoder")})
    assert keys, "tiny decoder has no attention blocks"
    key = keys[0]
    c = params[f"{key}.to_qkv.weight"].shape[1]
    x = jnp.asarray(rng.normal(size=(1, c, 2, 5, 7)).astype(np.float32))

    y_ref = jvae.attention_block(params, key, x)
    monkeypatch.setattr(jvae, "_ATTN_BLOCKWISE_MIN_HW", 1)
    monkeypatch.setattr(jvae, "_ATTN_Q_BLOCK", 16)  # 35 tokens -> 3 blocks+pad
    y_blk = jvae.attention_block(params, key, x)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
