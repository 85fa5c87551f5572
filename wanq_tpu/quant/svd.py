"""SVDQuant-style low-rank outlier absorption (beyond-reference).

SVDQuant (arXiv:2411.05007) makes aggressive low-bit PTQ (W4A4 /
heavily-outliered W4) viable for diffusion transformers by splitting the
(smoothed) weight into a 16-bit low-rank branch plus a quantized
residual:

    W = L1 @ L2 + R,   y = (x @ L1) @ L2 + Q(x) @ Q(R)

The dominant singular directions — which after SmoothQuant-style
migration carry the weight outliers — live in the full-precision branch,
so the residual R has a much flatter magnitude profile and quantizes
with far less error. The branch costs two thin rank-r GEMMs per layer
(r = 16-64 vs C_in/C_out in the thousands — <2% extra FLOPs at Wan
dims) and 2·r·(C_in+C_out) bf16 bytes of state.

The reference has no analog (its lowest-precision route is the plain
Atom W4A4 kernel, csrc/qgemm/w4a4/atom.cu — RTN, no outlier handling);
this module upgrades that route and composes with every method in
quant/ptq.py: the split runs AFTER channel-mask/rotation, in the same
input space as the quantized GEMM, so the branch input is the already
transformed activation (see qlinear._maybe_lowrank).

The truncated SVD uses randomized range finding (Halko et al. 2011,
arXiv:0909.4061) with power iterations — exact SVD at 14B ffn dims
[13824, 5120] is O(min(m,n)^2 · max(m,n)) and needlessly slow for a
rank-32 split; the randomized form is a few tall-skinny GEMMs + QR on
the device.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def svd_lowrank(
    w: jax.Array,
    rank: int,
    *,
    n_iter: int = 4,
    oversample: int = 8,
    seed: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Best rank-``rank`` split of ``w`` [K, N] → (L1 [K, r], L2 [r, N]).

    Randomized SVD: sketch the column space with a Gaussian test matrix,
    refine with ``n_iter`` subspace (power) iterations — each a
    QR-stabilized W·Wᵀ application — then solve the small [r+p, N] SVD
    exactly. Singular values are folded into L1 (L2 has orthonormal
    rows). f32 throughout; callers cast the factors to their storage
    dtype.
    """
    k, n = w.shape
    r = min(rank + oversample, min(k, n))
    wf = w.astype(jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(seed), (n, r), jnp.float32)
    q = jnp.linalg.qr(wf @ g)[0]  # [K, r] orthonormal range sketch
    for _ in range(n_iter):
        q = jnp.linalg.qr(wf.T @ q)[0]  # [N, r]
        q = jnp.linalg.qr(wf @ q)[0]  # [K, r]
    b = q.T @ wf  # [r, N] — small, exact SVD is cheap
    u_b, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = q @ u_b  # [K, r]
    l1 = u[:, :rank] * s[None, :rank]
    l2 = vt[:rank]
    return l1, l2


def lowrank_split(
    w: jax.Array, rank: int, *, seed: int = 0
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(L1, L2, residual) with ``w = L1 @ L2 + residual`` exactly (the
    residual is computed by subtraction, so the identity holds to float
    round-off regardless of the SVD's truncation error)."""
    l1, l2 = svd_lowrank(w, rank, seed=seed)
    resid = w.astype(jnp.float32) - l1 @ l2
    return l1, l2, resid
