"""Measure sliding temporal-window (block-sparse) self-attention on-chip.

Part A — kernel level: splash dense vs banded at the 1.3B 480p self-attn
shape (B=2, H=12, S=32768 padded from 32760, 1560 tokens/frame, 21 latent
frames), radii swept. The band mask rides splash's in-kernel mask_function
path: fully-out-of-band KV blocks are skipped on the MXU, boundary blocks
compute with an in-kernel mask. Expected ceiling = band density plus block
rounding (BLOCK_KV 4096 ~= 2.6 frames).

Part B — step level: the full W8A8 1.3B denoise step (bench.py config)
with QuantCtx.attn_window set, vs the dense step from the same run, plus
noise-pred PSNR vs the dense W8A8 step. NOTE the fidelity caveat: on
random-init Gaussian weights attention is near-uniform (the WORST case
for windowing — real checkpoints concentrate mass locally, which is why
the sliding-tile-attention literature reports high retained mass); these
PSNRs are mechanism floors, not deployment quality. Window selection on a
real checkpoint goes through select_temporal_windows (mass threshold).

Usage: python tools/sparse_attn_probe.py [kernel|step|all] [radii...]
A radius given as a comma list ("1,1,1,1,2,2,2,2,4,4,8,8", len = H) is a
PER-HEAD spec: grouped splash calls per unique radius
(models/attention.py::_splash_heads_major) vs the max-collapsed single
radius the scalar deployment would charge every head.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wanq_tpu.models.attention import TemporalWindow, attention_heads_major

B, H, D = 2, 12, 128
S_VALID, S_PAD, TPF = 32760, 32768, 1560  # 21 latent frames at 1.3B 480p
CHAIN = int(os.environ.get("WANQ_SWEEP_CHAIN", 8))


def log(m):
    print(m, flush=True)


def chain_time(fn, q, k, v, iters=3):
    def chained(q, k, v):
        out = fn(q, k, v)
        for _ in range(CHAIN - 1):
            q2 = (q + 0.001 * out).astype(jnp.bfloat16)
            out = fn(q2, k, v)
        return out

    jf = jax.jit(chained)
    out = jf(q, k, v)
    float(jnp.sum(out.astype(jnp.float32)))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jf(q, k, v)
        float(jnp.sum(out.astype(jnp.float32)))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN * 1000


def part_kernel(radii):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, S_PAD, D), jnp.bfloat16) * (D**-0.5)
    k = jax.random.normal(jax.random.PRNGKey(1), (B, H, S_PAD, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, H, S_PAD, D), jnp.bfloat16)
    n_frames = -(-S_VALID // TPF)

    dense_ms = chain_time(
        lambda q, k, v: attention_heads_major(q, k, v, k_valid_len=S_VALID),
        q, k, v)
    log(f"dense splash                  {dense_ms:8.2f} ms   (density 1.000)")
    for r in radii:
        win, label, dens = _resolve_spec(r, n_frames)
        ms = chain_time(
            lambda q, k, v, w=win: attention_heads_major(
                q, k, v, k_valid_len=S_VALID, window=w),
            q, k, v)
        log(f"window {label} (density {dens:.3f})  {ms:8.2f} ms   "
            f"{dense_ms/ms:5.2f}x  (ceiling {1/dens:4.2f}x)")


def _resolve_spec(r, n_frames):
    """int radius or per-head tuple -> (TemporalWindow, label, density)."""
    if isinstance(r, tuple):
        win = TemporalWindow(TPF, max(r), head_radii=r)
        dens = float(np.mean([TemporalWindow(TPF, ri).density(n_frames)
                              for ri in r]))
        return win, f"per-head {','.join(map(str, r))}", dens
    win = TemporalWindow(TPF, r)
    return win, f"r={r:<2d}", win.density(n_frames)


def part_step(radii):
    import bench

    r = bench.run(int(os.environ.get("WANQ_PROBE_FRAMES", "81")))
    step_fn = bench.make_step(r["cfg"], r["seq_len"])
    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (1, *bench.compute_target_shape(
                                    r["cfg"], (832, 480), r["frame_num"])),
                                jnp.float32)
    t = jnp.asarray([999.0])
    gs = jnp.float32(5.0)
    args = (latents, t, r["context"], r["context_null"], gs)

    def fid(ctx_w):
        outs_d, outs_w = [], []
        for s in range(2):
            lat = jax.random.normal(jax.random.PRNGKey(10 + s), latents.shape,
                                    jnp.float32)
            outs_d.append(np.asarray(step_fn(
                r["params"], r["ctx"], lat, t, r["context"],
                r["context_null"], gs)))
            outs_w.append(np.asarray(step_fn(
                r["params"], ctx_w, lat, t, r["context"],
                r["context_null"], gs)))
        from wanq_tpu.utils.metrics import quant_fidelity_report
        return quant_fidelity_report(np.concatenate(outs_d),
                                     np.concatenate(outs_w))

    log(f"\nstep level (W8A8 1.3B 480p, dense w8a8 {r['q_time']*1000:.1f} ms, "
        f"bf16 {r['fp_time']*1000:.1f} ms):")
    for rad in radii:
        ctx_w = r["ctx"].replace(attn_window=rad)
        tw = bench.time_step(step_fn, r["params"], ctx_w, *args)
        rep = fid(ctx_w)
        log(f"window {rad}: {tw*1000:8.1f} ms/step  "
            f"{r['q_time']/tw:5.2f}x over dense-w8a8  "
            f"{r['fp_time']/tw:5.2f}x over bf16  | vs dense-w8a8 noise-pred "
            f"PSNR {rep['psnr_db']:.1f} dB cos {rep['cosine']:.5f} "
            f"(random-init = worst case, see header)")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    radii = [tuple(int(x) for x in a.split(",")) if "," in a else int(a)
             for a in sys.argv[2:]] or [1, 2, 4, 8]
    if mode in ("kernel", "all"):
        part_kernel(radii)
    if mode in ("step", "all"):
        part_step(radii)


if __name__ == "__main__":
    main()
