"""Attention quantization tests vs reference semantics (quant_attn.py /
quant_opensora.py QuantizedAttention)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.quant.attn import (
    AttnQuantCfg,
    quantize_attn_map_block,
    quantize_attn_map_row,
    quantize_qk,
    quantize_v,
    quantized_attention,
)
from wanq_tpu.quant.quantizers import QuantizerCfg, dynamic_fake_quant


def test_quantize_qk_per_row(rng):
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 16)).astype(np.float32))
    cfg = QuantizerCfg(n_bits=8, sym=True)
    got = np.asarray(quantize_qk(x, cfg))
    want = np.asarray(dynamic_fake_quant(x.reshape(-1, 16), cfg)).reshape(2, 4, 8, 16)
    np.testing.assert_array_equal(got, want)


def test_quantize_v_per_channel(rng):
    v = jnp.asarray(rng.normal(size=(2, 4, 8, 16)).astype(np.float32))
    cfg = QuantizerCfg(n_bits=8, sym=True)
    got = np.asarray(quantize_v(v, cfg))
    # reference: permute tokens<->dims, quantize per row, permute back
    vt = np.asarray(v).transpose(0, 1, 3, 2).reshape(-1, 8)
    want = np.asarray(dynamic_fake_quant(jnp.asarray(vt), cfg))
    want = want.reshape(2, 4, 16, 8).transpose(0, 1, 3, 2)
    np.testing.assert_array_equal(got, want)


def test_attn_map_row_quant_preserves_simplex_approx(rng):
    attn = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(1, 2, 12, 12)).astype(np.float32)), axis=-1
    )
    cfg = QuantizerCfg(n_bits=8, sym=True)
    q = np.asarray(quantize_attn_map_row(attn, cfg))
    assert np.abs(q - np.asarray(attn)).max() < 0.05
    # column j uses one scale: max error within column bounded by col_absmax/254
    col_max = np.abs(np.asarray(attn)).max(axis=2)
    err = np.abs(q - np.asarray(attn)).max(axis=2)
    assert np.all(err <= col_max / 254 + 1e-6)


def _ref_block_quant(attn, block, n_text, n_bits=8, int8_scale=False):
    """numpy transliteration of the reference block path
    (quant_attn.py:176-238 with uniform block tables)."""
    x = np.array(attn, dtype=np.float32, copy=True)
    B, H, S, _ = x.shape
    n_img = S - n_text
    nb = n_img // block
    img = x[:, :, n_text:, n_text:]
    out = img.copy()
    nl = 2 ** (n_bits - 1) - 1
    for b in range(B):
        for h in range(H):
            m = img[b, h]
            blocks = m.reshape(nb, block, nb, block).transpose(0, 2, 1, 3)
            delta = blocks.max(axis=(2, 3))
            if int8_scale:
                dmax = max(delta.max(), 1e-6)
                step = dmax / 255.0
                delta = np.clip(np.round(delta / step), 0, 255) * step
            dfull = np.repeat(np.repeat(delta, block, 0), block, 1)
            dfull = np.where(dfull < 1e-6, 1e-6, dfull)
            step = dfull / (2 * nl + 1)
            q = np.clip(np.round(m / step), 0, 2 * nl + 1)
            out[b, h] = q * step
    x[:, :, n_text:, n_text:] = out
    return x


@pytest.mark.parametrize("int8_scale", [False, True])
@pytest.mark.parametrize("n_text", [0, 4])
def test_attn_map_block_quant_matches_reference(rng, n_text, int8_scale):
    s = n_text + 16
    attn = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(2, 3, s, s)).astype(np.float32) * 2), axis=-1
    )
    cfg = QuantizerCfg(n_bits=8, sym=True)
    got = np.asarray(
        quantize_attn_map_block(attn, cfg, block_size=4, n_text_tokens=n_text,
                                int8_scale=int8_scale)
    )
    want = _ref_block_quant(np.asarray(attn), 4, n_text, int8_scale=int8_scale)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # text rows/cols untouched
    if n_text:
        np.testing.assert_array_equal(got[:, :, :n_text, :], np.asarray(attn)[:, :, :n_text, :])


def test_block_quant_zero_bit_pruning(rng):
    attn = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(1, 1, 8, 8)).astype(np.float32)), axis=-1
    )
    cfg = QuantizerCfg(n_bits=8, sym=True)
    bits = jnp.asarray([[8.0, 0.0], [0.0, 8.0]])  # prune off-diagonal blocks
    got = np.asarray(
        quantize_attn_map_block(attn, cfg, block_size=4, bits_mask=bits)
    )
    assert np.all(got[0, 0, :4, 4:] == 0)
    assert np.all(got[0, 0, 4:, :4] == 0)
    assert np.abs(got[0, 0, :4, :4] - np.asarray(attn)[0, 0, :4, :4]).max() < 0.05


def test_quantized_attention_close_to_fp(rng):
    q = jnp.asarray(rng.normal(size=(1, 24, 4, 16)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 24, 4, 16)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(1, 24, 4, 16)).astype(np.float32))
    acfg = AttnQuantCfg(
        qk=QuantizerCfg(n_bits=8, sym=True),
        v=QuantizerCfg(n_bits=8, sym=True),
        attn_map=QuantizerCfg(n_bits=8, sym=True),
        attn_map_group="row",
    )
    got = np.asarray(quantized_attention(q, k, v, acfg))
    from wanq_tpu.models.attention import attention

    fp = np.asarray(attention(q, k, v, force_reference=True))
    rel = np.abs(got - fp).max() / np.abs(fp).max()
    assert rel < 0.1, rel


def test_attn_cfg_from_yaml_dict():
    acfg = AttnQuantCfg.from_dict(
        {
            "qk": {"n_bits": 8, "sym": True},
            "v": {"n_bits": 8, "sym": True},
            "attn_map": {"n_bits": 8, "sym": True, "group": "block",
                         "block_size": 16, "int8_scale": True},
            "n_text_tokens": 512,
        }
    )
    assert acfg.attn_map_group == "block" and acfg.block_size == 16
    assert acfg.int8_scale and acfg.n_text_tokens == 512
    assert AttnQuantCfg.from_dict(None) is None


def test_dit_forward_with_attn_quant(rng):
    """End-to-end: attention quant engaged via QuantCtx in the DiT."""
    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import dit_forward, init_params
    from wanq_tpu.quant.qlinear import QuantCtx

    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    acfg = AttnQuantCfg(
        qk=QuantizerCfg(n_bits=8, sym=True),
        v=QuantizerCfg(n_bits=8, sym=True),
        attn_map=QuantizerCfg(n_bits=8, sym=True),
        attn_map_group="row",
    )
    ctx = QuantCtx(mode="sim", attn=acfg, cross_attn=acfg)
    out_q = dit_forward(params, cfg, x, t, txt, 32, ctx=ctx)
    out_fp = dit_forward(params, cfg, x, t, txt, 32)
    assert np.isfinite(np.asarray(out_q)).all()
    rel = np.abs(np.asarray(out_q) - np.asarray(out_fp)).max() / (
        np.abs(np.asarray(out_fp)).max() + 1e-9
    )
    assert 0 < rel < 0.3
