"""bf16 vs f32 VAE decode at production shape on ONE chip.

The reference exposes WanVAE(dtype=...) and runs encode/decode under
``amp.autocast(dtype=self.dtype)`` (ref examples/Wan2.1/wan/modules/
vae.py:619-661); the TPU analog is WanVAE(compute_dtype=jnp.bfloat16):
conv weights cast once, convs run at the MXU bf16 rate with f32
accumulation, norm stats stay f32. This probe measures both paths at
the production 480p latent [1,16,21,60,104] -> video [1,3,81,480,832]
and reports the steady decode time plus on-chip PSNR agreement.

Usage: python -u tools/vae_probe.py [res]   (480 default, or 720)
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

from wanq_tpu.models.vae import WanVAE, init_vae_params, WAN_VAE_CFG


def fence(x):
    float(jnp.sum(x))  # scalar fetch fences the relay's async dispatch


def time_decode(vae: WanVAE, z: jax.Array, tag: str) -> float:
    t0 = time.time()
    y = vae.decode(z)
    fence(y)
    cold = time.time() - t0
    t0 = time.time()
    y = vae.decode(z)
    fence(y)
    dt = time.time() - t0
    print(f"{tag}: cold {cold:.1f} s, steady {dt:.2f} s", flush=True)
    return dt


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 480
    h, w = (60, 104) if res == 480 else (90, 160)
    print(f"VAE decode probe @ {res}p: latent [1,16,21,{h},{w}] "
          f"-> [1,3,81,{8*h},{8*w}]", flush=True)

    params = init_vae_params(WAN_VAE_CFG, seed=0)
    z = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 21, h, w),
                          jnp.float32)

    # bf16 first: at 720p the f32 path OOMs on a 16 GB chip (measured —
    # that fit is the knob's actual payoff; see BENCH_NOTES 'bf16 VAE
    # decode'), so run the always-fitting path before the one that may die.
    vae16 = WanVAE(WAN_VAE_CFG, params=params,
                   compute_dtype=jnp.bfloat16)
    t16 = time_decode(vae16, z, "bf16")
    y16 = vae16.decode(z)

    try:
        vae32 = WanVAE(WAN_VAE_CFG, params=params)
        t32 = time_decode(vae32, z, "f32 ")
        y32 = vae32.decode(z)
    except Exception as e:  # noqa: BLE001 — RESOURCE_EXHAUSTED at 720p
        print(f"f32 decode failed at {res}p ({type(e).__name__}): "
              "bf16-at-rest is the only path that fits this shape "
              "on a 16 GB chip", flush=True)
        print("VAE PROBE OK (bf16-only)", flush=True)
        return

    # on-chip agreement (output span is [-1,1] after clip)
    mse = float(jnp.mean(jnp.square(y32 - y16)))
    psnr = 20 * np.log10(2.0 / max(np.sqrt(mse), 1e-12))
    print(f"bf16 vs f32 decode: {t32/t16:.2f}x speed, "
          f"agreement {psnr:.1f} dB PSNR (span 2.0)", flush=True)
    print("VAE PROBE OK", flush=True)


if __name__ == "__main__":
    main()
