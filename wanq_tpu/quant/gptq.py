"""GPTQ: Hessian-aware, error-compensated weight quantization (optional).

Beyond-parity addition. The reference rounds every weight to the nearest
grid point (RTN) on per-output-channel scales (quant_wanx_cuda.py:39-56,
base_quantizer.py:110-152). GPTQ (Frantar et al., "GPTQ: Accurate
Post-Training Quantization for Generative Pre-trained Transformers",
2023) instead walks the *input* dimension sequentially and spreads each
row's rounding error onto the not-yet-quantized rows through the upper
Cholesky factor of the inverse input Hessian H = X^T X, minimizing the
layer output error ||X W - X W_q||^2 on the calibration distribution —
the classical OBS/OBQ update applied greedily in fixed order.

TPU-native formulation: one jitted BLOCK STEP (inner `lax.scan` over the
rows of a block, block offset as a traced scalar, working buffers
donated) driven by an eager outer loop — each (K, N, block) shape
compiles once and warm solves are sub-second even at 14B ffn dims, where
a single all-blocks jitted scan blew up XLA compile time. Static shapes
throughout (ragged K is zero-padded with an identity Hessian block,
which is exactly a no-op: padded rows quantize to 0 with zero error).
The cross-block error propagation is a masked [block, K] x [block, N]
matmul that rides the MXU, so the sequential part is only the
within-block rank-1 chain — the same blocking the published CUDA
implementations use, but expressed functionally instead of as in-place
tensor mutation.

Grid semantics match the framework's weight quantizers exactly
(quantizers.py): per-output-channel (delta, zp) computed from the
(method-transformed) weight upfront; codes use the same
clamp(round(w/delta) - zp) convention, so GPTQ state is a drop-in for
the sim / int8 / packed-int4 deployment paths.

Calibration coverage matters (measured, tests/test_gptq.py +
BENCH_NOTES): GPTQ shifts rounding error into the low-energy directions
of the *sampled* Hessian, so H must cover the deployment input subspace.
One denoise trajectory's tokens span a draw-specific subspace — collect
across several seeds/prompts (`get_calib_data --calib_rounds N`; Hessians
sum). With single-draw calibration on a tiny random-init model, GPTQ wins
12x on the calibration distribution but loses held-out; with 8 draws it
wins held-out at the model level too.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from wanq_tpu.quant.quantizers import (
    QuantizerCfg,
    n_levels_for,
    weight_quant_params,
)


def _code_bounds(cfg: QuantizerCfg) -> Tuple[int, int]:
    """Integer code range. Hardware bitwidths use the container range the
    int kernels consume (weight_int_quant); other (sim-only) bitwidths use
    the reference fake-quant clamp (base_quantizer.py:66-67)."""
    bits = cfg.active_bits
    if bits == 4:
        return -8, 7
    if bits == 8:
        return -128, 127
    nl = n_levels_for(bits, cfg.sym)
    return -nl - 1, nl


def transform_hessian(
    hess: jax.Array,
    channel_mask: Optional[jax.Array] = None,
    act_rotation: Optional[jax.Array] = None,
) -> jax.Array:
    """Map a raw-input Hessian H = X^T X into the space the GEMM actually
    contracts in. qlinear applies x -> (x * mask) @ Q before the quantized
    matmul (qlinear.py method preprocessing), so the Hessian of the GEMM
    input is Q^T diag(m) H diag(m) Q."""
    h = hess.astype(jnp.float32)
    if channel_mask is not None:
        m = channel_mask.astype(jnp.float32)
        h = h * m[:, None] * m[None, :]
    if act_rotation is not None:
        q = act_rotation.astype(jnp.float32)
        h = q.T @ h @ q
    return h


def _inverse_hessian_cholesky(
    hess: jax.Array, percdamp: float
) -> jax.Array:
    """U upper-triangular with H^{-1} = U^T U (the factor GPTQ propagates
    errors through), after standard diagonal damping. Dead input channels
    (H_ii = 0: the channel never fires in calibration) get a unit diagonal
    — their rows then quantize independently with no error coupling."""
    k = hess.shape[0]
    diag = jnp.diagonal(hess)
    dead = diag <= 0.0
    hess = jnp.where(
        (dead[:, None] | dead[None, :]) & ~jnp.eye(k, dtype=bool),
        0.0,
        hess,
    )
    hess = hess + jnp.diag(jnp.where(dead, 1.0 - diag, 0.0))
    damp = percdamp * jnp.mean(jnp.diagonal(hess))
    hess = hess + damp * jnp.eye(k, dtype=jnp.float32)
    chol = jnp.linalg.cholesky(hess)
    if k <= 8192:
        eye = jnp.eye(k, dtype=jnp.float32)
        hinv = jax.scipy.linalg.cho_solve((chol, True), eye)
    else:
        # huge K (14B ffn.2 is 13824): a single cho_solve against a full
        # [K, K] identity crashes the XLA compile at this size — chunk the
        # triangular solves over column blocks instead
        from jax.lax.linalg import triangular_solve

        cols = []
        step = 2048
        for i in range(0, k, step):
            b = min(step, k - i)
            rhs = jnp.eye(k, b, -i, dtype=jnp.float32)
            y = triangular_solve(chol, rhs, left_side=True, lower=True)
            cols.append(
                triangular_solve(
                    chol, y, left_side=True, lower=True, transpose_a=True
                )
            )
        hinv = jnp.concatenate(cols, axis=1)
    # lower L with H^{-1} = L L^T  =>  U = L^T is upper with U^T U = H^{-1}
    return jnp.linalg.cholesky(hinv).T


@functools.partial(
    jax.jit, static_argnames=("block", "lo", "hi"), donate_argnums=(0, 1)
)
def _gptq_block_step(
    wcur: jax.Array,    # [Kp, N] f32 (padded working weight, donated)
    qcur: jax.Array,    # [Kp, N] int8 codes so far (donated)
    u: jax.Array,       # [Kp, Kp] f32 upper Cholesky of H^{-1}
    delta: jax.Array,   # [N]
    zp: jax.Array,      # [N]
    i0: jax.Array,      # scalar int32 block offset (traced: one compile)
    block: int,
    lo: int,
    hi: int,
):
    """One GPTQ block: sequential rank-1 sweep inside [i0, i0+block),
    then a masked MXU matmul propagates the block's error onto every
    later row. The block offset rides as a traced scalar so the whole
    solve compiles ONCE per (Kp, N, block) — a single jitted program over
    all Kp/block blocks blows up XLA compile time at 14B ffn dims."""
    kp, n = wcur.shape
    u_tile = jax.lax.dynamic_slice(u, (i0, i0), (block, block))

    def inner(c, i):
        wb, qb, errb = c
        row = jax.lax.dynamic_slice(wb, (i, 0), (1, n))[0]
        q = jnp.clip(jnp.round(row / delta) - zp, lo, hi)
        wq = (q + zp) * delta
        err = (row - wq) / u_tile[i, i]
        # propagate within the block onto rows > i (rank-1, masked)
        mask = (jnp.arange(block) > i).astype(jnp.float32)
        wb = wb - (u_tile[i, :] * mask)[:, None] * err[None, :]
        wb = jax.lax.dynamic_update_slice(wb, wq[None, :], (i, 0))
        qb = jax.lax.dynamic_update_slice(
            qb, q.astype(jnp.int8)[None, :], (i, 0)
        )
        errb = jax.lax.dynamic_update_slice(errb, err[None, :], (i, 0))
        return (wb, qb, errb), None

    wblk = jax.lax.dynamic_slice(wcur, (i0, 0), (block, n))
    qblk = jnp.zeros((block, n), jnp.int8)
    eblk = jnp.zeros((block, n), jnp.float32)
    (wblk, qblk, eblk), _ = jax.lax.scan(
        inner, (wblk, qblk, eblk), jnp.arange(block)
    )
    wcur = jax.lax.dynamic_update_slice(wcur, wblk, (i0, 0))
    qcur = jax.lax.dynamic_update_slice(qcur, qblk, (i0, 0))
    # cross-block propagation onto rows >= i0 + block (MXU matmul,
    # columns of U belonging to this or earlier blocks masked out)
    u_rows = jax.lax.dynamic_slice(u, (i0, 0), (block, kp))
    rowmask = (jnp.arange(kp) >= i0 + block).astype(jnp.float32)
    wcur = wcur - (u_rows * rowmask[None, :]).T @ eblk
    return wcur, qcur


def _gptq_solve(
    w: jax.Array,       # [Kp, N] f32 (padded)
    u: jax.Array,       # [Kp, Kp] f32 upper Cholesky of H^{-1}
    delta: jax.Array,   # [N]
    zp: jax.Array,      # [N]
    block: int,
    lo: int,
    hi: int,
):
    """Blocked GPTQ sweep. Returns (w_q dequantized [Kp, N] f32,
    codes int8 [Kp, N])."""
    # the block step donates its working buffers; detach from the caller's
    # array (astype(f32) of an f32 input aliases, it does not copy)
    w = w.copy()
    q = jnp.zeros(w.shape, jnp.int8)
    for jb in range(w.shape[0] // block):
        w, q = _gptq_block_step(
            w, q, u, delta, zp, jnp.int32(jb * block), block, lo, hi
        )
    return w, q


def gptq_quantize(
    w: jax.Array,
    hess: jax.Array,
    cfg: QuantizerCfg,
    block: int = 128,
    percdamp: float = 0.01,
    act_order: bool = False,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Error-compensated quantization of a [C_in, C_out] weight against the
    input Hessian ``hess`` = sum over calibration tokens of x x^T
    ([C_in, C_in], already in the GEMM's input space — see
    :func:`transform_hessian`).

    Returns ``(w_q, codes, delta, zp)``: the dequantized weight [C_in,
    C_out] f32 (for the sim path), int8-container codes [C_in, C_out]
    (for the int8 / packed-int4 paths), and the per-output-channel grid
    [C_out] each — the same convention as
    :func:`wanq_tpu.quant.quantizers.weight_int_quant`.

    ``act_order`` processes rows by descending Hessian diagonal (the
    desc_act refinement): high-energy input channels quantize first,
    while later rows can still absorb their error. Pure reindexing —
    outputs come back in the original row order, so nothing downstream
    changes.
    """
    k, n = w.shape
    assert hess.shape == (k, k), f"hessian {hess.shape} vs weight K={k}"
    wf = w.astype(jnp.float32)
    delta, zp = weight_quant_params(wf, cfg)
    lo, hi = _code_bounds(cfg)

    inv_perm = None
    if act_order:
        perm = jnp.argsort(-jnp.diagonal(hess))
        inv_perm = jnp.argsort(perm)
        wf = wf[perm]
        hess = hess[perm][:, perm]

    block = min(block, k)
    kp = ((k + block - 1) // block) * block
    if kp != k:
        # identity-Hessian padding: padded rows are exactly a no-op
        wf = jnp.pad(wf, ((0, kp - k), (0, 0)))
        h = jnp.zeros((kp, kp), jnp.float32)
        h = h.at[:k, :k].set(hess.astype(jnp.float32))
        h = h.at[jnp.arange(k, kp), jnp.arange(k, kp)].set(1.0)
    else:
        h = hess.astype(jnp.float32)

    u = _inverse_hessian_cholesky(h, percdamp)
    wq, codes = _gptq_solve(wf, u, delta, zp, block, lo, hi)
    wq, codes = wq[:k], codes[:k]
    if inv_perm is not None:
        wq, codes = wq[inv_perm], codes[inv_perm]
    return wq, codes, delta, zp
