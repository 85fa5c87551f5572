"""Measure GPTQ vs RTN weight rounding at 1.3B scale on the attached TPU.

Flow: on-device 1.3B init → multi-round Hessian calibration (device-side
accumulation; dim-1536 input sites) → two W4 PTQ builds (RTN / GPTQ) →
single-step noise-pred PSNR vs the FP forward across seeds.

Weight-only W4 (acts FP) isolates the rounding error GPTQ optimizes.
Run: python -u tools/gptq_probe.py [rounds] [steps] [act_order(0|1)]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/wanq_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from wanq_tpu.configs import WAN_CONFIGS
from wanq_tpu.models.dit import (
    dit_forward,
    init_params_on_device,
    linear_layer_names,
    make_scan_ctx,
    stack_block_params,
)
from wanq_tpu.pipelines.text2video import (
    WanT2V,
    compute_seq_len,
    compute_target_shape,
)
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import prepare_quant_state
from wanq_tpu.quant.qlinear import QuantCtx

HESS_RE = r"self_attn\.(q|k|v|o)|cross_attn\.q|ffn\.0"
QDICT = {
    # quantize exactly the Hessian-covered sites; everything else FP so
    # the comparison isolates weight-rounding error at those sites
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"cross_attn\.(k|v|o)|ffn\.2"
    ),
    "weight": {"n_bits": 4, "sym": False},
}


def log(m):
    print(m, flush=True)


def main(rounds=3, steps=4, act_order=False):
    cfg = WAN_CONFIGS["t2v-1.3B"]
    size, frames = (832, 480), 21  # short clip: calib speed; seq still 8k+
    target_shape = compute_target_shape(cfg, size, frames)
    seq_len = compute_seq_len(cfg, target_shape)
    log(f"1.3B {size} f{frames} seq={seq_len} on {jax.devices()[0]}")

    t0 = time.time()
    list_params = init_params_on_device(cfg, 0)  # PTQ consumes list form
    # the reference zero-inits head.head; randomize it so PSNR carries
    # signal (same as bench.py)
    list_params["head"]["head"]["w"] = (
        0.02 * jax.random.normal(
            jax.random.PRNGKey(7), list_params["head"]["head"]["w"].shape
        )
    ).astype(list_params["head"]["head"]["w"].dtype)
    params = stack_block_params(list_params)
    log(f"on-device init {time.time()-t0:.1f}s")

    rng = np.random.default_rng(3)
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32)
    ctxn = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)), jnp.float32)

    t0 = time.time()
    acc = None
    # ONE pipe across rounds: the jitted-step cache lives on the instance
    pipe = WanT2V(
        cfg, params,
        quant_ctx=QuantCtx(mode="calib", hessian_regex=HESS_RE),
    )
    for rnd in range(rounds):
        st = pipe.collect_calibration(
            ctx, ctxn, size=size, frame_num=frames, sampling_steps=steps,
            seed=11 + rnd,
        )
        if acc is None:
            acc = dict(st)
        else:
            for k, v in st.items():
                if k.endswith(".hess"):
                    acc[k] = acc[k] + v
        log(f"calib round {rnd+1}/{rounds} done {time.time()-t0:.1f}s")
    n_hess = sum(1 for k in acc if k.endswith(".hess"))
    log(f"calib total {time.time()-t0:.1f}s: {n_hess} hessians "
        f"({rounds}x{steps} steps, {rounds*steps*2*seq_len} tokens)")

    names = linear_layer_names(cfg)

    @jax.jit
    def fwd(p, qctx, x, t, c):
        return dit_forward(p, cfg, x, t, c, seq_len, ctx=qctx)

    n_seeds = 4
    inputs, fps, peaks = [], [], []
    for seed in range(n_seeds):
        x = jax.random.normal(
            jax.random.PRNGKey(100 + seed), (1, *target_shape), jnp.float32
        )
        t = jnp.asarray([float(200 + 300 * seed % 800)], jnp.float32)
        fp = fwd(params, None, x, t, ctx)
        inputs.append((x, t))
        fps.append(fp)
        peaks.append(float(jnp.max(jnp.abs(fp))))

    # HBM discipline on the 16 GB chip: build BOTH states while the list
    # params + Hessians are alive, free those, then stack/evaluate one
    # state at a time (the f32 w_q copies are ~3 GB per state and
    # stacking transiently doubles one)
    built = {}
    for label, gptq in (("rtn", False), ("gptq", True)):
        qd = dict(QDICT)
        qd["weight"] = dict(
            qd["weight"], gptq=gptq, gptq_act_order=act_order
        )
        t0 = time.time()
        built[label] = prepare_quant_state(
            list_params, names, QuantConfig.from_dict(qd), calib=acc,
            targets="sim",
        )
        jax.block_until_ready(built[label][1])
        log(f"PTQ {label}: {time.time()-t0:.1f}s")
    del acc, list_params

    psnrs = {"rtn": [], "gptq": []}
    for label in ("rtn", "gptq"):
        pol, state, rot = built.pop(label)
        qctx = make_scan_ctx(
            QuantCtx(mode="sim", policies=pol, state=state, rotations=rot),
            cfg.num_layers,
        )
        del state
        for seed in range(n_seeds):
            x, t = inputs[seed]
            out = fwd(params, qctx, x, t, ctx)
            mse = float(jnp.mean((out - fps[seed]) ** 2))
            psnrs[label].append(10 * np.log10(peaks[seed] ** 2 / mse))
        del qctx
        log(f"{label}: " + "  ".join(f"{p:.2f}" for p in psnrs[label]) + " dB")

    log(f"W4 weight-only PSNR vs FP (mean of {len(psnrs['rtn'])} seeds): "
        f"RTN {np.mean(psnrs['rtn']):.2f} dB, "
        f"GPTQ {np.mean(psnrs['gptq']):.2f} dB "
        f"(+{np.mean(psnrs['gptq']) - np.mean(psnrs['rtn']):.2f} dB)")


if __name__ == "__main__":
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    act_order = bool(int(sys.argv[3])) if len(sys.argv) > 3 else False
    main(rounds, steps, act_order)
