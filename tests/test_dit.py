"""Wan DiT model tests: golden parity of the primitives vs torch/numpy
reference formulas (SURVEY.md §4 'golden-activation tests at tiny configs'),
plus end-to-end forward shape/finiteness/determinism."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wanq_tpu.configs import tiny_config
from wanq_tpu.models import dit
from wanq_tpu.models.attention import attention
from wanq_tpu.models.rope import rope_apply, rope_tables


def test_layer_norm_matches_torch(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    got = np.asarray(dit.layer_norm(jnp.asarray(x), eps=1e-6))
    want = torch.nn.functional.layer_norm(torch.tensor(x), (32,), eps=1e-6).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_rms_norm_matches_reference(rng):
    x = rng.normal(size=(2, 5, 32)).astype(np.float32)
    w = rng.normal(size=(32,)).astype(np.float32)
    got = np.asarray(dit.rms_norm(jnp.asarray(x), jnp.asarray(w), eps=1e-5))
    xt = torch.tensor(x)
    want = (xt * torch.rsqrt(xt.pow(2).mean(dim=-1, keepdim=True) + 1e-5)) * torch.tensor(w)
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5)


def test_sinusoidal_embedding_matches_reference():
    t = jnp.asarray([0.0, 1.0, 500.0, 999.0])
    dim = 32
    got = np.asarray(dit.sinusoidal_embedding_1d(dim, t))
    # ref model.py:18-28
    half = dim // 2
    pos = np.asarray(t, dtype=np.float64)
    sinusoid = np.outer(pos, np.power(10000.0, -np.arange(half) / half))
    want = np.concatenate([np.cos(sinusoid), np.sin(sinusoid)], axis=1)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_patchify_matches_conv3d(rng):
    """patch_embedding-as-dense-matmul == Conv3d(stride=kernel) (model.py:502)."""
    b, c_in, f, h, w = 2, 4, 4, 6, 8
    pt, ph, pw = 1, 2, 2
    c_out = 16
    x = rng.normal(size=(b, c_in, f, h, w)).astype(np.float32)
    conv = torch.nn.Conv3d(c_in, c_out, (pt, ph, pw), stride=(pt, ph, pw))
    want = conv(torch.tensor(x)).flatten(2).transpose(1, 2).detach().numpy()  # [B,L,C]

    kernel = conv.weight.detach().numpy().reshape(c_out, -1).T  # [c_in*pt*ph*pw, c_out]
    tokens = np.asarray(dit.patchify(jnp.asarray(x), (pt, ph, pw)))
    got = tokens @ kernel + conv.bias.detach().numpy()
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_unpatchify_roundtrip(rng):
    grid, patch, c = (3, 4, 5), (1, 2, 2), 6
    x = rng.normal(size=(2, c, grid[0] * patch[0], grid[1] * patch[1], grid[2] * patch[2])).astype(np.float32)
    # patchify with out_dim channels then unpatchify must give back x
    tokens = dit.patchify(jnp.asarray(x), patch)
    # reorder token features from (c,pt,ph,pw) to unpatchify's (pt,ph,pw,c)
    t = tokens.reshape(2, -1, c, *patch)
    t = jnp.einsum("blcpqr->blpqrc", t).reshape(2, -1, np.prod(patch) * c)
    back = dit.unpatchify(t, grid, patch, c)
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def _rope_reference_complex(x, grid, head_dim):
    """Transliteration of the reference rope math (model.py:31-70)."""
    b, s, n, d = x.shape
    c = d // 2
    f, h, w = grid

    def freqs_1d(dim):
        return np.outer(
            np.arange(1024, dtype=np.float64),
            1.0 / np.power(10000.0, np.arange(0, dim, 2, dtype=np.float64) / dim),
        )

    parts = [c - 2 * (c // 3), c // 3, c // 3]
    fr = [freqs_1d(2 * p) for p in parts]
    ang = np.concatenate(
        [
            np.broadcast_to(fr[0][:f][:, None, None, :], (f, h, w, parts[0])),
            np.broadcast_to(fr[1][:h][None, :, None, :], (f, h, w, parts[1])),
            np.broadcast_to(fr[2][:w][None, None, :, :], (f, h, w, parts[2])),
        ],
        axis=-1,
    ).reshape(f * h * w, 1, c)
    freqs_i = np.exp(1j * ang)
    out = []
    for i in range(b):
        xi = x[i, : f * h * w].astype(np.float64).reshape(f * h * w, n, c, 2)
        xc = xi[..., 0] + 1j * xi[..., 1]
        xc = xc * freqs_i
        xr = np.stack([xc.real, xc.imag], axis=-1).reshape(f * h * w, n, d)
        out.append(np.concatenate([xr, x[i, f * h * w:]], axis=0))
    return np.stack(out).astype(np.float32)


def test_rope_matches_reference_complex(rng):
    grid, n, d = (2, 3, 4), 2, 24
    s = grid[0] * grid[1] * grid[2]
    x = rng.normal(size=(2, s, n, d)).astype(np.float32)
    cos, sin = rope_tables(grid, d)
    got = np.asarray(rope_apply(jnp.asarray(x), jnp.asarray(cos), jnp.asarray(sin)))
    want = _rope_reference_complex(x, grid, d)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_splash_block_selection():
    """Swept-on-v5e tile rule (tools/attn_sweep.py): q512/kv4096 where the
    seq divides 4096 (1.3B 480p pads to 32768); q1024 when the largest 2^k
    divisor caps kv at 2048 (14B 720p: 75776 = 2048*37) — q1024/kv4096
    VMEM-OOMs, so q1024 only rides the capped-kv shapes."""
    from wanq_tpu.models.attention import _splash_blocks

    assert _splash_blocks(32768) == (512, 4096)   # 1.3B 480p (padded)
    assert _splash_blocks(75776) == (1024, 2048)  # 14B 720p
    assert _splash_blocks(4096) == (512, 4096)
    assert _splash_blocks(5120) == (1024, 1024)   # %1024, not %2048
    assert _splash_blocks(4608) == (512, 512)     # only %512


def test_attention_reference_masking(rng):
    q = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 8, 2, 16)).astype(np.float32))
    full = attention(q, k, v, k_valid_len=4)
    short = attention(q, k[:, :4], v[:, :4])
    np.testing.assert_allclose(np.asarray(full), np.asarray(short), atol=1e-5)


@pytest.fixture(scope="module")
def tiny_model():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(dit.init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


def test_dit_forward_shape_and_determinism(tiny_model, rng):
    cfg, params = tiny_model
    b, f, h, w = 1, 4, 8, 8
    x = jnp.asarray(rng.normal(size=(b, cfg.in_dim, f, h, w)).astype(np.float32))
    t = jnp.asarray([500.0])
    ctx_txt = jnp.asarray(rng.normal(size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32))
    seq_len = (f // 1) * (h // 2) * (w // 2)
    out = dit.dit_forward(params, cfg, x, t, ctx_txt, seq_len)
    assert out.shape == (b, cfg.out_dim, f, h, w)
    assert bool(jnp.all(jnp.isfinite(out)))
    out2 = dit.dit_forward(params, cfg, x, t, ctx_txt, seq_len)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


@pytest.mark.slow
def test_dit_forward_padded_seq_matches_unpadded(tiny_model, rng):
    """Padding tokens to seq_len (sp multiple round-up, text2video.py:170)
    must not change the valid outputs."""
    cfg, params = tiny_model
    b, f, h, w = 1, 2, 8, 8
    x = jnp.asarray(rng.normal(size=(b, cfg.in_dim, f, h, w)).astype(np.float32))
    t = jnp.asarray([100.0])
    ctx_txt = jnp.asarray(rng.normal(size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32))
    exact = (f // 1) * (h // 2) * (w // 2)
    out1 = dit.dit_forward(params, cfg, x, t, ctx_txt, seq_len=exact)
    out2 = dit.dit_forward(params, cfg, x, t, ctx_txt, seq_len=exact + 8)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=2e-4)


def test_dit_forward_jit_compiles(tiny_model, rng):
    cfg, params = tiny_model
    b, f, h, w = 2, 2, 4, 4
    x = jnp.asarray(rng.normal(size=(b, cfg.in_dim, f, h, w)).astype(np.float32))
    t = jnp.asarray([500.0, 500.0])
    ctx_txt = jnp.asarray(rng.normal(size=(b, cfg.text_len, cfg.text_dim)).astype(np.float32))
    fwd = jax.jit(lambda p, x, t, c: dit.dit_forward(p, cfg, x, t, c, seq_len=8))
    out = fwd(params, x, t, ctx_txt)
    assert out.shape == (b, cfg.out_dim, f, h, w)


def test_linear_layer_names_cover_reference_regexes():
    cfg = tiny_config()
    names = dit.linear_layer_names(cfg)
    assert "blocks.0.self_attn.q" in names
    assert "blocks.1.ffn.2" in names
    assert "text_embedding.0" in names
    assert "head.head" in names
    # i2v adds k_img/v_img
    cfg_i2v = tiny_config(model_type="i2v", in_dim=36)
    names_i2v = dit.linear_layer_names(cfg_i2v)
    assert "blocks.0.cross_attn.k_img" in names_i2v


def test_rope_interleaved_matches_pair_form(rng):
    """The TPU layout-friendly x*ca + (x@P)*sb form == the pair/complex
    reference form, including the identity-rotation padding tail."""
    from wanq_tpu.models.rope import (
        rope_apply_padded,
        rope_apply_interleaved,
        rope_tables,
        rope_tables_interleaved,
    )
    import jax.numpy as jnp

    grid, d = (2, 4, 4), 24
    s_valid = 2 * 4 * 4
    x = jnp.asarray(rng.normal(size=(2, s_valid + 8, 4, d)).astype(np.float32))
    cos, sin = (jnp.asarray(a) for a in rope_tables(grid, d))
    ca, sb = (jnp.asarray(a) for a in rope_tables_interleaved(grid, d))
    want = np.asarray(rope_apply_padded(x, cos, sin, s_valid))
    got = np.asarray(rope_apply_interleaved(x, ca, sb, s_valid))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_o_proj_heads_major_int8_matches_qlinear():
    """The heads-major W8A8 o-projection (per-token quant over a token's
    heads*dim + int8 (n,d) contraction) must equal the merge_heads +
    qlinear reference path — scales see the same element set, the int32
    accumulation is exact."""
    import numpy as np
    from wanq_tpu.models.dit import o_proj_heads_major_int8
    from wanq_tpu.quant.config import QuantConfig
    from wanq_tpu.quant.ptq import prepare_layer_state
    from wanq_tpu.quant.qlinear import QuantCtx, qlinear

    rng = np.random.default_rng(0)
    b, n, s, d, o = 2, 4, 16, 8, 32
    y = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(n * d, o)).astype(np.float32) * 0.05)
    bias = jnp.asarray(rng.normal(size=(o,)).astype(np.float32))
    qcfg = QuantConfig.from_dict(
        {"weight": {"n_bits": 8, "sym": False},
         "act": {"n_bits": 8, "sym": True}})
    pol = qcfg.resolve("blocks.0.self_attn.o")
    st = prepare_layer_state(pol, w, None, None, targets="int8")
    ctx = QuantCtx(mode="int8", policies={"blocks.0.self_attn.o": pol},
                   state={"blocks.0.self_attn.o": st})
    po = {"w": w, "b": bias}
    got = o_proj_heads_major_int8(ctx, "blocks.0.self_attn.o", po, y)
    merged = jnp.transpose(y, (0, 2, 1, 3)).reshape(b, s, n * d)
    ref = qlinear(ctx, "blocks.0.self_attn.o", po, merged)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
