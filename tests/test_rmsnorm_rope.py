"""Fused RMSNorm+RoPE+head-split kernel parity (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.models.rope import rope_tables_interleaved
from wanq_tpu.ops.rmsnorm_rope import rms_rope_heads, rms_rope_heads_reference


def _tables(grid, d, s, valid_len, scale=1.0):
    ca, sb = rope_tables_interleaved(grid, d)
    ca, sb = jnp.asarray(ca[:valid_len]), jnp.asarray(sb[:valid_len])
    if valid_len < s:
        pad = s - valid_len
        ca = jnp.concatenate([ca, jnp.ones((pad, d), ca.dtype)])
        sb = jnp.concatenate([sb, jnp.zeros((pad, d), sb.dtype)])
    return ca * scale, sb * scale


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
@pytest.mark.parametrize("scale", [1.0, 0.088388])
def test_fused_matches_unfused_chain(rng, dtype, scale):
    b, s, n, d = 2, 32, 4, 8
    nd = n * d
    x = jnp.asarray(rng.normal(size=(b, s, nd)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.normal(size=(nd,)).astype(np.float32))
    ca, sb = _tables((2, 2, 7), d, s, valid_len=28, scale=scale)

    got = rms_rope_heads(x, w, ca, sb, num_heads=n, eps=1e-6,
                         out_dtype=jnp.bfloat16, interpret=True)
    want = rms_rope_heads_reference(x, w, ca, sb, num_heads=n, eps=1e-6,
                                    out_dtype=jnp.bfloat16)
    assert got.shape == (b, n, s, d) == want.shape
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_matches_dit_chain_semantics(rng):
    """End-to-end semantics: equals rms_norm → reshape →
    rope_apply_interleaved(valid_len, scale) → swapaxes."""
    from wanq_tpu.models.dit import rms_norm
    from wanq_tpu.models.rope import rope_apply_interleaved

    b, s, n, d, valid = 1, 16, 2, 8, 12
    nd = n * d
    x = jnp.asarray(rng.normal(size=(b, s, nd)).astype(np.float32)).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(nd,)).astype(np.float32))
    ca_raw, sb_raw = rope_tables_interleaved((2, 2, 4), d)
    ca_raw = jnp.asarray(ca_raw[:valid])
    sb_raw = jnp.asarray(sb_raw[:valid])
    scale = 0.25

    want = rope_apply_interleaved(
        rms_norm(x, w, 1e-6).reshape(b, s, n, d), ca_raw, sb_raw, valid,
        scale=scale,
    )
    want = jnp.swapaxes(want, 1, 2).astype(jnp.bfloat16)

    ca = jnp.concatenate([ca_raw, jnp.ones((s - valid, d), ca_raw.dtype)]) * scale
    sb = jnp.concatenate([sb_raw, jnp.zeros((s - valid, d), sb_raw.dtype)]) * scale
    got = rms_rope_heads(x, w, ca, sb, num_heads=n, eps=1e-6, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_odd_seq_tile_fallback(rng):
    """Sequence lengths with no nice divisor still work (single tile)."""
    b, s, n, d = 1, 24, 2, 8
    x = jnp.asarray(rng.normal(size=(b, s, n * d)).astype(np.float32))
    w = jnp.ones((n * d,), jnp.float32)
    ca = jnp.ones((s, d), jnp.float32)
    sb = jnp.zeros((s, d), jnp.float32)
    got = rms_rope_heads(x, w, ca, sb, num_heads=n, interpret=True)
    want = rms_rope_heads_reference(x, w, ca, sb, num_heads=n)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_split_heads_matches_reshape_transpose(rng):
    from wanq_tpu.ops.rmsnorm_rope import split_heads

    b, s, n, d = 2, 24, 4, 8
    x = jnp.asarray(rng.normal(size=(b, s, n * d)).astype(np.float32))
    got = split_heads(x, n, out_dtype=jnp.bfloat16, interpret=True)
    want = jnp.swapaxes(
        x.reshape(b, s, n, d).astype(jnp.bfloat16), 1, 2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merge_heads_matches_reshape(rng):
    from wanq_tpu.ops.rmsnorm_rope import merge_heads

    b, n, s, d = 2, 4, 24, 8
    x = jnp.asarray(rng.normal(size=(b, n, s, d)).astype(np.float32))
    got = merge_heads(x, out_dtype=jnp.bfloat16, interpret=True)
    want = jnp.swapaxes(x, 1, 2).reshape(b, s, n * d).astype(jnp.bfloat16)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_merge_inverts_split(rng):
    from wanq_tpu.ops.rmsnorm_rope import merge_heads, split_heads

    b, s, n, d = 1, 16, 2, 8
    x = jnp.asarray(rng.normal(size=(b, s, n * d)).astype(np.float32))
    back = merge_heads(
        split_heads(x, n, out_dtype=jnp.float32, interpret=True),
        out_dtype=jnp.float32, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_cross_attention_heads_major_parity(rng):
    from wanq_tpu.models.attention import (
        attention, cross_attention_heads_major)

    b, n, sq, sk, d = 2, 4, 40, 12, 16
    q = jnp.asarray(rng.normal(size=(b, sq, n, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, sk, n, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, sk, n, d)).astype(np.float32))
    got = cross_attention_heads_major(
        jnp.swapaxes(q, 1, 2), k, v, k_valid_len=10)
    want = attention(q, k, v, k_valid_len=10)
    np.testing.assert_allclose(
        np.asarray(jnp.swapaxes(got, 1, 2)), np.asarray(want),
        rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_rms_split_heads_matches_unfused(rng, dtype):
    from wanq_tpu.models.dit import rms_norm
    from wanq_tpu.ops.rmsnorm_rope import rms_split_heads

    b, s, n, d = 2, 24, 4, 8
    nd = n * d
    x = jnp.asarray(
        rng.normal(size=(b, s, nd)).astype(np.float32)).astype(dtype)
    w = jnp.asarray(rng.normal(size=(nd,)).astype(np.float32))
    got = rms_split_heads(
        x, w, n, eps=1e-6, out_dtype=jnp.bfloat16, interpret=True)
    want = jnp.swapaxes(
        rms_norm(x, w, 1e-6).reshape(b, s, n, d), 1, 2).astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2)
