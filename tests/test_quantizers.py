"""Unit tests for the pure quantizer math vs the closed-form reference
formulas (ViDiT-Q qdiff/base/base_quantizer.py — see SURVEY.md §2.1)."""

import jax
import numpy as np
import jax.numpy as jnp
import pytest

from wanq_tpu.quant import quantizers as Q


def _ref_dynamic_fake_quant(x, n_bits, sym):
    """Straight numpy transliteration of the reference formulas."""
    x = np.asarray(x, dtype=np.float32)
    if sym:
        nl = 2 ** (n_bits - 1) - 1
        delta = np.abs(x).max(axis=1) / nl
        delta = np.where(delta < 1e-6, 1e-6, delta)
        zp = np.zeros_like(delta)
    else:
        nl = 2**n_bits
        x_max = np.maximum(x.max(axis=1), 0.0)
        x_min = np.minimum(x.min(axis=1), 0.0)
        delta = (x_max - x_min) / (nl - 1)
        delta = np.where(delta < 1e-8, 1e-8, delta)
        zp = np.round(x_min / delta) + nl / 2
    delta = delta[:, None]
    zp = zp[:, None]
    q = np.clip(np.round(x / delta) - zp, -nl - 1, nl)
    return (q + zp) * delta


@pytest.mark.parametrize("sym", [True, False])
@pytest.mark.parametrize("n_bits", [4, 8])
def test_dynamic_fake_quant_matches_reference_formula(rng, sym, n_bits):
    x = rng.normal(size=(16, 64)).astype(np.float32) * 3.0
    got = Q.dynamic_fake_quant(jnp.asarray(x), Q.QuantizerCfg(n_bits=n_bits, sym=sym))
    want = _ref_dynamic_fake_quant(x, n_bits, sym)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("sym", [True, False])
def test_fake_quant_error_bounded_by_delta(rng, sym):
    x = rng.normal(size=(8, 128)).astype(np.float32)
    cfg = Q.QuantizerCfg(n_bits=8, sym=sym)
    delta, zp = Q.compute_quant_params(jnp.asarray(x), 8, sym)
    xq = Q.dynamic_fake_quant(jnp.asarray(x), cfg)
    err = np.abs(np.asarray(xq) - x)
    # round-to-nearest: error ≤ delta/2 per row (no clipping for in-range x)
    assert np.all(err <= np.asarray(delta) / 2 + 1e-6)


def test_sym_levels():
    assert Q.n_levels_for(8, True) == 127
    assert Q.n_levels_for(8, False) == 256
    assert Q.n_levels_for(4, True) == 7


def test_weight_quant_per_output_channel(rng):
    w = rng.normal(size=(32, 16)).astype(np.float32)  # [C_in, C_out]
    cfg = Q.QuantizerCfg(n_bits=8, sym=False)
    d, z = Q.weight_quant_params(jnp.asarray(w), cfg)
    assert d.shape == (16,) and z.shape == (16,)
    # matches reference row-group math on the transposed weight
    dd, zz = Q.compute_quant_params(jnp.asarray(w.T), 8, False)
    np.testing.assert_allclose(np.asarray(d), np.asarray(dd)[:, 0])
    np.testing.assert_allclose(np.asarray(z), np.asarray(zz)[:, 0])


def test_weight_int_quant_roundtrip(rng):
    w = rng.normal(size=(64, 32)).astype(np.float32)
    cfg = Q.QuantizerCfg(n_bits=8, sym=False)
    w_int, scale, zp = Q.weight_int_quant(jnp.asarray(w), cfg)
    assert w_int.dtype == jnp.int8
    w_deq = (np.asarray(w_int, dtype=np.float32) + np.asarray(zp)[None, :]) * np.asarray(scale)[None, :]
    # dequantized int8 weight equals the fake-quant weight
    w_fq = Q.weight_fake_quant(jnp.asarray(w), cfg)
    np.testing.assert_allclose(w_deq, np.asarray(w_fq), rtol=1e-4, atol=1e-4)


def test_act_dynamic_int_quant_epilogue_identity(rng):
    """(A_int @ W_int)·s_a·s_w + sum·zp_w·s_w + b  ==  dequant(A)·dequant(W) + b.

    This is the fused-dequant GEMM epilogue ground truth the reference bench
    asserts (kernels/bench/bench_gemm.py:26-32)."""
    x = rng.normal(size=(24, 48)).astype(np.float32)
    w = rng.normal(size=(48, 16)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    q, s_a, sum_a = Q.act_dynamic_int_quant(jnp.asarray(x))
    w_int, s_w, zp_w = Q.weight_int_quant(jnp.asarray(w), Q.QuantizerCfg(n_bits=8, sym=False))
    q = np.asarray(q, dtype=np.float32)
    w_int = np.asarray(w_int, dtype=np.float32)
    s_a, sum_a, s_w, zp_w = map(np.asarray, (s_a, sum_a, s_w, zp_w))

    out_epilogue = (q @ w_int) * s_a[:, None] * s_w[None, :] + sum_a[:, None] * zp_w[None, :] * s_w[None, :] + b

    x_deq = q * s_a[:, None]
    w_deq = (w_int + zp_w[None, :]) * s_w[None, :]
    out_direct = x_deq @ w_deq + b
    np.testing.assert_allclose(out_epilogue, out_direct, rtol=1e-4, atol=1e-4)


def test_mixed_precision_bitwidth_switch(rng):
    x = rng.normal(size=(4, 32)).astype(np.float32)
    cfg = Q.QuantizerCfg(n_bits=(4, 8), sym=True, i_bitwidth=0)
    d4, _ = Q.static_quant_params(jnp.asarray(x), cfg)
    d8, _ = Q.static_quant_params(jnp.asarray(x), cfg.with_bitwidth(1))
    # 4-bit delta is 127/7 ≈ 18x larger than 8-bit
    np.testing.assert_allclose(np.asarray(d4) / np.asarray(d8), 127 / 7, rtol=1e-5)
    dl, zl = Q.static_quant_params_all_bitwidths(jnp.asarray(x), cfg)
    assert dl.shape[0] == 2
    np.testing.assert_allclose(np.asarray(dl[0]), np.asarray(d4))


def test_merge_minmax_accumulates(rng):
    cfg = Q.QuantizerCfg(n_bits=8, sym=False)
    x1 = rng.normal(size=(4, 16)).astype(np.float32)
    x2 = rng.normal(size=(4, 16)).astype(np.float32) * 2
    acc = Q.merge_minmax(None, jnp.asarray(x1))
    acc = Q.merge_minmax(acc, jnp.asarray(x2))
    d, z = Q.params_from_minmax(acc[0], acc[1], cfg)
    both = np.concatenate([x1, x2], axis=1)
    d_ref, z_ref = Q.compute_quant_params(jnp.asarray(both), 8, False)
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_ref), rtol=1e-5)


def test_nan_guard_debug_assertions(rng, monkeypatch):
    """The reference's in-path runtime nan checks (base_quantizer.py:113)
    as the opt-in WANQ_DEBUG_NANCHECK guard: raises on non-finite input
    under jit when enabled, free no-op when off."""
    bad = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    bad = bad.at[1, 3].set(jnp.nan)

    monkeypatch.delenv("WANQ_DEBUG_NANCHECK", raising=False)
    d, z = Q.compute_quant_params(bad, 8, True)  # off: silent (ref parity)
    assert d.shape == (4, 1)

    monkeypatch.setenv("WANQ_DEBUG_NANCHECK", "1")
    f = jax.jit(lambda x: Q.compute_quant_params(x, 8, True))
    with pytest.raises(Exception, match="non-finite|FloatingPointError"):
        jax.block_until_ready(f(bad))
    # clean input passes with the guard enabled (new jit avoids the
    # poisoned cache entry's device state)
    good = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    d, _ = jax.jit(lambda x: Q.compute_quant_params(x, 8, True))(good)
    assert np.isfinite(np.asarray(d)).all()
