"""Kernel correctness tests (the TPU analog of the reference's
kernels/bench correctness-vs-reference checks, SURVEY.md §4):
Pallas kernels in interpreter mode vs their jnp references, and the jnp
references vs closed-form math."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.ops import fused
from wanq_tpu.ops.qgemm import w8a8_linear_pallas, w8a8_linear_xla


@pytest.fixture(scope="module")
def data(rng=None):
    rng = np.random.default_rng(0)
    return rng


def test_w8a8_xla_epilogue_formula(rng):
    m, k, n = 24, 64, 32
    a = rng.integers(-80, 80, (m, k)).astype(np.int8)
    w = rng.integers(-80, 80, (k, n)).astype(np.int8)
    s_a = (0.01 * rng.random(m) + 0.005).astype(np.float32)
    s_w = (0.1 * rng.random(n) + 0.1).astype(np.float32)
    zp_w = rng.integers(-10, 10, n).astype(np.float32)
    bias = (rng.random(n) * 2).astype(np.float32)
    sum_a = (s_a * a.astype(np.float32).sum(1)).astype(np.float32)

    got = np.asarray(w8a8_linear_xla(
        jnp.asarray(a), jnp.asarray(w), jnp.asarray(s_a), jnp.asarray(s_w),
        jnp.asarray(sum_a), jnp.asarray(zp_w), jnp.asarray(bias)))
    # ground truth (ref bench_gemm.py:26-32)
    want = (a.astype(np.float32) @ w.astype(np.float32)) * s_a[:, None] * s_w[None, :] \
        + sum_a[:, None] * zp_w[None, :] * s_w[None, :] + bias
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


@pytest.mark.parametrize("m", [128, 300])
@pytest.mark.parametrize("asym,bias", [(True, True), (False, False)])
def test_w8a8_pallas_matches_xla(rng, m, asym, bias):
    k, n = 256, 128
    a = jnp.asarray(rng.integers(-80, 80, (m, k)).astype(np.int8))
    w = jnp.asarray(rng.integers(-80, 80, (k, n)).astype(np.int8))
    s_a = jnp.asarray((0.01 * rng.random(m) + 0.005).astype(np.float32))
    s_w = jnp.asarray((0.1 * rng.random(n) + 0.1).astype(np.float32))
    sum_a = jnp.asarray(rng.random(m).astype(np.float32)) if asym else None
    zp_w = jnp.asarray(rng.integers(-10, 10, n).astype(np.float32)) if asym else None
    b = jnp.asarray(rng.random(n).astype(np.float32)) if bias else None

    want = np.asarray(w8a8_linear_xla(a, w, s_a, s_w, sum_a, zp_w, b))
    got = np.asarray(w8a8_linear_pallas(
        a, w, s_a, s_w, sum_a, zp_w, b,
        block_m=128, block_n=128, block_k=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)


def test_pack_unpack_int4_roundtrip(rng):
    from wanq_tpu.quant.quantizers import pack_int4, unpack_int4

    q = jnp.asarray(rng.integers(-8, 8, (64, 32)).astype(np.int8))
    packed = pack_int4(q)
    assert packed.shape == (32, 32)
    assert packed.nbytes == q.nbytes // 2
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(q))


@pytest.mark.parametrize("asym,bias", [(True, True), (False, False)])
def test_w4a8_packed_matches_w8a8(rng, asym, bias):
    """Packed-int4 GEMM == int8-container GEMM on the same int4 values
    (ref W4A8 kernel, csrc/qgemm/w4a8/w4a8_per_channel_gemm_cuda_qserve.cu)."""
    from wanq_tpu.ops.qgemm import w4a8_linear_pallas, w4a8_linear_xla
    from wanq_tpu.quant.quantizers import pack_int4

    m, k, n = 160, 256, 128
    a = jnp.asarray(rng.integers(-80, 80, (m, k)).astype(np.int8))
    w4 = jnp.asarray(rng.integers(-8, 8, (k, n)).astype(np.int8))
    s_a = jnp.asarray((0.01 * rng.random(m) + 0.005).astype(np.float32))
    s_w = jnp.asarray((0.1 * rng.random(n) + 0.1).astype(np.float32))
    sum_a = jnp.asarray(rng.random(m).astype(np.float32)) if asym else None
    zp_w = jnp.asarray(rng.integers(-4, 4, n).astype(np.float32)) if asym else None
    b = jnp.asarray(rng.random(n).astype(np.float32)) if bias else None

    want = np.asarray(w8a8_linear_xla(a, w4, s_a, s_w, sum_a, zp_w, b))
    packed = pack_int4(w4)
    got_xla = np.asarray(w4a8_linear_xla(a, packed, s_a, s_w, sum_a, zp_w, b))
    np.testing.assert_allclose(got_xla, want, rtol=1e-5, atol=1e-3)
    got_pl = np.asarray(w4a8_linear_pallas(
        a, packed, s_a, s_w, sum_a, zp_w, b,
        block_m=128, block_n=128, block_k=256, interpret=True))
    np.testing.assert_allclose(got_pl, want, rtol=1e-5, atol=1e-3)


def test_w4a4_group_quant_roundtrip(rng):
    """Group quant error bound: |x - dequant| <= scale/2 per element."""
    from wanq_tpu.quant.quantizers import act_group_int4_quant, weight_group_int4_quant

    x = jnp.asarray((rng.normal(size=(16, 256)) * 3).astype(np.float32))
    q, s = act_group_int4_quant(x, group=128)
    assert q.shape == (16, 256) and s.shape == (16, 2)
    deq = np.asarray(q, np.float32).reshape(16, 2, 128) * np.asarray(s)[..., None]
    err = np.abs(deq.reshape(16, 256) - np.asarray(x))
    assert (err <= np.repeat(np.asarray(s), 128, axis=1) * 0.5 + 1e-6).all()

    w = jnp.asarray((rng.normal(size=(256, 64))).astype(np.float32))
    qw, sw = weight_group_int4_quant(w, group=128)
    assert qw.shape == (256, 64) and sw.shape == (2, 64)
    assert int(np.abs(np.asarray(qw)).max()) <= 7


@pytest.mark.parametrize("bias", [True, False])
def test_w4a4_atom_gemm_parity(rng, bias):
    """Atom-style W4A4 (ref csrc/qgemm/w4a4/atom.cu): XLA group-scaled
    reference == Pallas kernel == f32 dequant ground truth."""
    from wanq_tpu.ops.qgemm import w4a4_linear_pallas, w4a4_linear_xla
    from wanq_tpu.quant.quantizers import (
        act_group_int4_quant,
        pack_int4,
        weight_group_int4_quant,
    )

    m, k, n = 160, 512, 128
    x = jnp.asarray((rng.normal(size=(m, k)) * 2).astype(np.float32))
    w = jnp.asarray((rng.normal(size=(k, n)) * 0.05).astype(np.float32))
    b = jnp.asarray(rng.random(n).astype(np.float32)) if bias else None

    q, s_a = act_group_int4_quant(x)
    qw, s_w = weight_group_int4_quant(w)
    packed = pack_int4(qw)

    # ground truth: f32 GEMM of the dequantized operands
    deq_a = np.asarray(q, np.float32).reshape(m, 4, 128) * np.asarray(s_a)[..., None]
    deq_w = np.asarray(qw, np.float32).reshape(4, 128, n) * np.asarray(s_w)[:, None, :]
    want = deq_a.reshape(m, k) @ deq_w.reshape(k, n)
    if bias is not None and b is not None:
        want = want + np.asarray(b)[None]

    got_xla = np.asarray(w4a4_linear_xla(q, packed, s_a, s_w, b))
    np.testing.assert_allclose(got_xla, want, rtol=1e-4, atol=1e-3)
    got_pl = np.asarray(w4a4_linear_pallas(
        q, packed, s_a, s_w, b, block_m=128, block_n=128, block_k=256,
        interpret=True))
    np.testing.assert_allclose(got_pl, want, rtol=1e-4, atol=1e-3)


def test_quant_sum_xla_matches_quantizer_math(rng):
    from wanq_tpu.quant.quantizers import act_dynamic_int_quant

    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    q1, s1, m1 = fused.quant_sum_xla(x)
    q2, s2, m2 = act_dynamic_int_quant(x)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-6)


@pytest.mark.parametrize("gelu", [False, True])
def test_quant_sum_pallas_matches_xla(rng, gelu):
    x = jnp.asarray(rng.normal(size=(100, 128)).astype(np.float32) * 3)
    ref = fused.gelu_quant_sum_xla(x) if gelu else fused.quant_sum_xla(x)
    got = fused.quant_sum_pallas(x, gelu=gelu, block_m=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), rtol=1e-5)


def test_ln_modulate_quant_pallas_matches_xla(rng):
    b, n, c = 2, 40, 128
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.1)
    ref = fused.ln_modulate_quant_xla(x, shift, scale)
    got = fused.ln_modulate_quant_pallas(x, shift, scale, block_n=16, interpret=True)
    np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(ref[0]))
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got[2]), np.asarray(ref[2]), rtol=1e-4)


def test_ln_modulate_quant_dequant_close_to_fp(rng):
    """int8 round-trip of the fused op stays within quant error of the FP
    LN+modulate."""
    b, n, c = 1, 16, 64
    x = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
    shift = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(b, c)).astype(np.float32) * 0.1)
    q, s, _ = fused.ln_modulate_quant_xla(x, shift, scale)
    deq = np.asarray(q, dtype=np.float32) * np.asarray(s)[..., None]

    from wanq_tpu.models.dit import layer_norm

    fp = np.asarray(layer_norm(x, 1e-6)) * (1 + np.asarray(scale)[:, None, :]) \
        + np.asarray(shift)[:, None, :]
    assert np.abs(deq - fp).max() <= np.asarray(s).max() * 0.51 + 1e-6


def test_gate_residual(rng):
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    y = rng.normal(size=(2, 8, 16)).astype(np.float32)
    g = rng.normal(size=(2, 1, 16)).astype(np.float32)
    got = np.asarray(fused.gate_residual(jnp.asarray(x), jnp.asarray(y), jnp.asarray(g)))
    np.testing.assert_allclose(got, x + y * g, rtol=1e-6)


def test_w8a8_nd_flatten_route_matches_xla(rng):
    """The WANQ_PALLAS_QGEMM dispatch flattens ND activations to 2D for
    the kernel and reshapes back (qlinear feeds [B,S,C] unflattened to
    preserve GSPMD shardings) — exercise the ACTUAL dispatch helper
    (_flatten_for_pallas) the env flag takes on hardware, for both the
    w8a8 and the asym w4a8 kernels."""
    from wanq_tpu.ops import qgemm
    from wanq_tpu.quant.quantizers import pack_int4

    a = jnp.asarray(rng.integers(-127, 128, size=(2, 64, 256)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, size=(256, 128)), jnp.int8)
    s_a = jnp.asarray(rng.uniform(0.01, 0.1, size=(2, 64)), jnp.float32)
    s_w = jnp.asarray(rng.uniform(0.01, 0.1, size=(128,)), jnp.float32)
    ref = qgemm.w8a8_linear_xla(a, w, s_a, s_w)
    got = qgemm._flatten_for_pallas(
        qgemm.w8a8_linear_pallas, a, w, s_a, s_w, None, None, None,
        jnp.float32, block_m=128, block_n=128, block_k=128, interpret=True,
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)

    # w4a8 asym: the sum_a/zp_w plumbing must flatten alongside s_a
    codes = jnp.asarray(rng.integers(-8, 8, size=(256, 128)), jnp.int8)
    wp = pack_int4(codes)
    zp = jnp.asarray(rng.uniform(-2, 2, size=(128,)), jnp.float32)
    sum_a = s_a * jnp.sum(a.astype(jnp.float32), axis=-1)
    ref4 = qgemm.w4a8_linear_xla(a, wp, s_a, s_w, sum_a, zp)
    got4 = qgemm._flatten_for_pallas(
        qgemm.w4a8_linear_pallas, a, wp, s_a, s_w, sum_a, zp, None,
        jnp.float32, interpret=True,
    )
    assert got4.shape == ref4.shape
    np.testing.assert_allclose(np.asarray(got4), np.asarray(ref4),
                               rtol=1e-5, atol=1e-3)


def test_pallas_flag_inert_on_multidevice(rng, monkeypatch):
    """WANQ_PALLAS_QGEMM must be ignored when >1 device is visible — the
    flatten would merge token-sharded leading dims under GSPMD."""
    from wanq_tpu.ops import qgemm

    monkeypatch.setenv("WANQ_PALLAS_QGEMM", "1")
    # conftest provisions 8 virtual CPU devices; backend is 'cpu' anyway,
    # but assert the device_count() clause independently of the backend
    assert jax.device_count() > 1
    assert not qgemm._pallas_flag_engaged(256, 128, k_mult=128)
