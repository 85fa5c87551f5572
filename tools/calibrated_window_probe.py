"""Close the calib->select->deploy loop for per-head windows ON-CHIP at
the 1.3B production shape (round-4 VERDICT #4: the 1.53x grouped-splash
win was measured with a HAND-WRITTEN radius profile; this replaces it
with selector-emitted radii, end to end through the REAL CLIs).

Chain (the reference's 4-stage workflow, stages 2-4):
  1. python -m wanq_tpu.cli.get_calib_data --attn_map_pool P
     --attn_map_reduce mean            (real CLI, on-chip FP sweep)
  2. python -m wanq_tpu.cli.ptq --suggest_window T
     (real CLI; emits the per-head comma list)
  3. deploy the EMITTED comma list through parse_attn_window (the CLI
     round-trip) into the W8A8 step; measure step ms + 12-step
     final-latent PSNR vs the dense W8A8 trajectory.

Expected on random-init weights (stated in BENCH_NOTES): attention is
near-uniform, so retained-mass radii scale like threshold x n_frames —
the selector should emit WIDE windows (the honest behavior; trained
checkpoints concentrate mass locally and would emit narrow ones). The
value measured here is the mechanism: selector-emitted radii deploy
unmodified and the speed/fidelity table is real.

Usage: python -u tools/calibrated_window_probe.py [--masses 0.5,0.7,0.9]
       [--steps 12] [--calib_steps 2] [--pool 256]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def log(m):
    print(m, flush=True)


def run_cli(mod, args):
    cmd = [sys.executable, "-m", mod] + args
    log("  $ " + " ".join(cmd))
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       timeout=3600)
    if r.returncode != 0:
        raise RuntimeError(f"{mod} failed:\n{r.stdout[-2000:]}\n"
                           f"{r.stderr[-4000:]}")
    return r.stdout + r.stderr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--masses", default="0.5,0.7,0.9")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--calib_steps", type=int, default=2)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--calib_npz", default="/tmp/calib_window.npz")
    args = ap.parse_args()
    masses = [float(m) for m in args.masses.split(",")]

    common = ["--task", "t2v-1.3B", "--random_init", "--size", "832*480",
              "--frame_num", "81", "--base_seed", "42"]

    # 1. REAL calibration CLI with mean-pooled map capture (subprocess:
    # the chip is free before/after; each CLI owns the device serially)
    if not os.path.exists(args.calib_npz):
        t0 = time.time()
        out = run_cli("wanq_tpu.cli.get_calib_data", common + [
            "--sample_steps", str(args.calib_steps),
            "--attn_map_pool", str(args.pool),
            "--attn_map_reduce", "mean",
            "--collect_minmax",
            "--calib_save_path", args.calib_npz])
        log(f"1. get_calib_data ({time.time()-t0:.0f}s): "
            + out.strip().splitlines()[-1])
    else:
        log(f"1. reusing {args.calib_npz}")

    # 2. REAL ptq CLI --suggest_window per mass threshold; parse the
    # emitted per-head comma list from the log (the deploy artifact)
    emitted = {}
    for m in masses:
        out = run_cli("wanq_tpu.cli.ptq", common + [
            "--quant_config", "quant_configs/wan_w8a8_speed.yaml",
            "--calib_data", args.calib_npz,
            "--save_path", f"/tmp/qp_win_{m}.npz",
            "--suggest_window", str(m)])
        mm = re.findall(r"--attn_window (\d+(?:,\d+)+)", out)
        if not mm:
            raise RuntimeError(f"no per-head list in ptq output:\n{out[-2000:]}")
        emitted[m] = mm[-1]
        log(f"2. mass>={m}: emitted per-head radii {emitted[m]}")

    # 3. deploy through the CLI parser + measure (in-process; chip free)
    from types import SimpleNamespace

    from bench import run as bench_setup, make_step, time_step
    from wanq_tpu.cli.common import parse_attn_window
    from wanq_tpu.models.attention import TemporalWindow
    from wanq_tpu.pipelines.text2video import WanT2V
    from wanq_tpu.utils.metrics import latent_psnr

    r = bench_setup(81)
    n_frames = 21
    tpf = 1560
    step_fn = make_step(r["cfg"], r["seq_len"])
    latents = jax.random.normal(jax.random.PRNGKey(1),
                                (1, 16, 21, 60, 104), jnp.float32)
    tt = jnp.asarray([999.0])
    targs = (r["context"], r["context_null"], jnp.float32(5.0))

    dense_ms = r["q_time"] * 1e3
    log(f"3. dense W8A8 step (same-run): {dense_ms:.1f} ms")
    gen_kw = dict(size=(832, 480), frame_num=81,
                  sampling_steps=args.steps, seed=42)
    dense_pipe = WanT2V(r["cfg"], r["params"], quant_ctx=r["ctx"])
    dense_pipe.generate(r["context"], r["context_null"],
                        **{**gen_kw, "sampling_steps": 2})
    ref = np.asarray(dense_pipe.generate(r["context"], r["context_null"],
                                         **gen_kw))

    log(f"{'mass':>6} {'radii':>24} {'density':>8} {'step ms':>8} "
        f"{'x dense':>8} {'PSNR dB':>8}")
    for m in masses:
        radii = parse_attn_window(SimpleNamespace(attn_window=emitted[m]))
        assert isinstance(radii, tuple) and len(radii) == r["cfg"].num_heads
        win = TemporalWindow(tpf, max(radii), head_radii=radii)
        wctx = r["ctx"].replace(attn_window=radii, collect=r["ctx"].collect)
        w_ms = time_step(step_fn, r["params"], wctx, latents, tt,
                         *targs) * 1e3
        pipe = WanT2V(r["cfg"], r["params"], quant_ctx=wctx)
        pipe.generate(r["context"], r["context_null"],
                      **{**gen_kw, "sampling_steps": 2})
        lat = np.asarray(pipe.generate(r["context"], r["context_null"],
                                       **gen_kw))
        psnr = latent_psnr(ref, lat)
        rtxt = ",".join(map(str, radii))
        if len(rtxt) > 23:
            rtxt = rtxt[:20] + "..."
        log(f"{m:>6} {rtxt:>24} {win.density(n_frames):>8.3f} "
            f"{w_ms:>8.1f} {dense_ms/w_ms:>8.3f} {psnr:>8.1f}")
        del pipe

    log("CALIBRATED WINDOW CHAIN OK")


if __name__ == "__main__":
    main()
