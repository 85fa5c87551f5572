"""Int8 flash attention kernel tests (interpret mode on CPU) vs the jnp
reference and vs FP attention."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.models.attention import attention
from wanq_tpu.ops import attn_int8 as A


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    shape = (1, 2, 256, 128)  # B, H, S, D
    q = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    k = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    v = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return q, k, v


def test_quantize_qkv_roundtrip(qkv):
    q, k, v = qkv
    qi, ki, vi, s_q, s_k, s_v = A.quantize_qkv_int8(q, k, v, blk=128)
    assert qi.dtype == jnp.int8
    assert s_q.shape == (1, 2, 2)  # one scale per (b, h, 128-token block)
    sq_full = np.repeat(np.asarray(s_q), 128, axis=2)
    q_deq = np.asarray(qi, np.float32) * sq_full[..., None]
    assert np.abs(q_deq - np.asarray(q)).max() <= np.asarray(s_q).max() * 0.51
    v_deq = np.asarray(vi, np.float32) * np.asarray(s_v)[:, :, None, :]
    assert np.abs(v_deq - np.asarray(v)).max() <= np.asarray(s_v).max() * 0.51


def test_xla_reference_close_to_fp(qkv):
    q, k, v = qkv
    sm = 1.0 / math.sqrt(q.shape[-1])
    qi, ki, vi, s_q, s_k, s_v = A.quantize_qkv_int8(q, k, v, blk=128)
    got = np.asarray(A.attention_int8_xla(qi, ki, vi, s_q, s_k, s_v, sm))
    # FP attention in [B,S,H,D] layout
    fp = np.asarray(
        attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                  jnp.swapaxes(v, 1, 2), force_reference=True)
    ).transpose(0, 2, 1, 3)
    rel = np.abs(got - fp).max() / np.abs(fp).max()
    assert rel < 0.15, rel


@pytest.mark.parametrize("k_valid_len", [None, 200])
def test_pallas_kernel_matches_xla_reference(qkv, k_valid_len):
    q, k, v = qkv
    sm = 1.0 / math.sqrt(q.shape[-1])
    qi, ki, vi, s_q, s_k, s_v = A.quantize_qkv_int8(q, k, v, blk=128)
    want = np.asarray(
        A.attention_int8_xla(qi, ki, vi, s_q, s_k, s_v, sm, k_valid_len)
    )
    got = np.asarray(
        A.attention_int8_pallas(
            qi, ki, vi, s_q, s_k, s_v, sm, k_valid_len,
            blk_q=128, blk_k=128, interpret=True,
        )
    )
    # the online-softmax quantizes probs against the running block max, not
    # the global row max (SageAttention-style), so the grid differs from the
    # global reference by a few quant steps
    np.testing.assert_allclose(got, want, atol=4 / A.P_LEVELS)


def test_pallas_kernel_ragged_seq(qkv):
    """Non-tile-aligned sequence: quantizer pads to the block, the
    wrapper masks the KV tail and slices q."""
    q, k, v = qkv
    q, k, v = q[:, :, :200], k[:, :, :200], v[:, :, :200]
    sm = 1.0 / math.sqrt(q.shape[-1])
    qi, ki, vi, s_q, s_k, s_v = A.quantize_qkv_int8(q, k, v, blk=128)
    assert qi.shape[2] == 256  # padded
    want = np.asarray(
        A.attention_int8_xla(qi, ki, vi, s_q, s_k, s_v, sm, k_valid_len=200)
    )
    got = np.asarray(
        A.attention_int8_pallas(qi, ki, vi, s_q, s_k, s_v, sm, k_valid_len=200,
                                blk_q=128, blk_k=128, interpret=True)
    )
    assert got.shape == want.shape == (1, 2, 256, 128)
    np.testing.assert_allclose(got[:, :, :200], want[:, :, :200],
                               atol=4 / A.P_LEVELS)


def test_attention_int8_wrapper_layout(qkv):
    q, k, v = qkv
    # model layout [B, S, H, D]
    qm = jnp.swapaxes(q, 1, 2)
    km = jnp.swapaxes(k, 1, 2)
    vm = jnp.swapaxes(v, 1, 2)
    out = A.attention_int8(qm, km, vm)
    assert out.shape == qm.shape
    fp = np.asarray(attention(qm, km, vm, force_reference=True))
    rel = np.abs(np.asarray(out) - fp).max() / np.abs(fp).max()
    assert rel < 0.15, rel
