"""PTQ CLI (TPU-native rebuild of ptq_wanx.py): compute quant params
(scales / zero-points / channel masks / rotation seeds) and the deployed
quantized weights; save the quant-state artifact.

    python -m wanq_tpu.cli.ptq --task t2v-1.3B --random_init \
        --quant_config quant_configs/config.yaml \
        --calib_data calib_data.npz --save_path quant_params.npz
"""

from __future__ import annotations

import argparse
import logging
import time

import numpy as np

from wanq_tpu.cli.common import add_common_args, load_params, setup_logging, validate_args
from wanq_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS
from wanq_tpu.models.dit import linear_layer_names
from wanq_tpu.quant import QuantConfig
from wanq_tpu.quant.ptq import load_reference_calib, prepare_quant_state, save_quant_state


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq ptq")
    add_common_args(p)
    p.add_argument("--quant_config", type=str, required=True)
    p.add_argument("--calib_data", type=str, default=None,
                   help="npz from get_calib_data (or a reference .pth)")
    p.add_argument("--save_path", type=str, default="quant_params.npz")
    p.add_argument("--rotation_seed", type=int, default=0)
    p.add_argument("--suggest_window", type=float, default=0.0,
                   metavar="THRESHOLD",
                   help="derive a sliding temporal-window radius from "
                        "calibration attention maps (collect with "
                        "get_calib_data --attn_map_pool N "
                        "--attn_map_reduce mean): smallest per-head radius "
                        "retaining >= THRESHOLD of attention mass, "
                        "collapsed to one deployable radius (max over "
                        "heads). Logged + returned; deploy with generate "
                        "--attn_window R. 0 = off")
    p.add_argument("--check_reference_params", type=str, default=None,
                   metavar="QUANT_PARAMS_PTH",
                   help="after PTQ, import a reference quant_params.pth "
                        "artifact and print a scale-dict parity report "
                        "(per-layer max rel err of delta_w/zp_w/"
                        "channel_mask/static-act scales)")
    return p.parse_args(argv)


def generate(args):
    setup_logging()
    validate_args(args)
    cfg = WAN_CONFIGS[args.task]
    qcfg = QuantConfig.from_yaml(args.quant_config)

    params = load_params(args, cfg)
    calib = None
    path = args.calib_data or (
        qcfg.calib_save_path and qcfg.calib_save_path.replace(".pth", ".npz")
    )
    if path:
        try:
            if path.endswith(".pth"):
                calib = load_reference_calib(path)
            else:
                calib = dict(np.load(path))
            logging.info("loaded calibration data: %d layers from %s", len(calib), path)
        except FileNotFoundError:
            logging.warning("no calibration data at %s", path)

    t0 = time.time()
    policies, state, _ = prepare_quant_state(
        params, linear_layer_names(cfg), qcfg, calib=calib, seed=args.rotation_seed
    )
    n_q = sum(p.is_quantized for p in policies.values())
    logging.info(
        "PTQ done in %.2fs: %d/%d layers quantized", time.time() - t0, n_q, len(policies)
    )
    save_quant_state(args.save_path, state, seed=args.rotation_seed)
    logging.info("saved %s", args.save_path)

    if args.suggest_window > 0.0:
        # calibration-driven sliding-window selection (BENCH_NOTES
        # 'Sliding temporal-window'): per-head smallest radius retaining
        # >= threshold attention mass, collapsed to one deployable radius
        from wanq_tpu.pipelines.text2video import compute_target_shape
        from wanq_tpu.quant.attn import (
            collapse_window_radii,
            select_temporal_windows,
        )

        maps = {
            k[: -len(".attn_map")]: np.asarray(v, np.float64).mean(axis=0)
            for k, v in (calib or {}).items() if k.endswith(".attn_map")
        }
        if not maps:
            raise SystemExit(
                "--suggest_window needs pooled attention maps in the "
                "calibration artifact; run get_calib_data with "
                "--attn_map_pool N --attn_map_reduce mean")
        pool = int((calib or {}).get("attn_map_pool", 1))
        ts = compute_target_shape(cfg, SIZE_CONFIGS[args.size], args.frame_num)
        tpf = (ts[2] // cfg.patch_size[1]) * (ts[3] // cfg.patch_size[2])
        n_frames = ts[1] // cfg.patch_size[0]
        radii = select_temporal_windows(
            maps, tpf, pool, threshold=args.suggest_window,
            valid_len=n_frames * tpf)
        radius = collapse_window_radii(radii)
        for lname, r in sorted(radii.items()):
            logging.info("  %s: per-head radii %s", lname, r.tolist())
        from wanq_tpu.quant.attn import per_head_window_radii

        ph = per_head_window_radii(radii)
        logging.info(
            "suggested sliding-window radius (mass >= %.2f, %d latent "
            "frames): %d — deploy with --attn_window %d; per-head "
            "(grouped splash calls, cheap heads keep narrow bands): "
            "--attn_window %s",
            args.suggest_window, n_frames, radius, radius,
            ",".join(str(int(r)) for r in ph))
        # deployment guard: banded attention only PAYS below a measured
        # density break-even on this hardware — boundary blocks run the
        # in-kernel mask, which costs more than the skipped work once the
        # band covers most of the map (measured: density 0.38 -> 1.31x,
        # 0.63 -> 0.92x, 0.65 -> 0.96-0.97x; BENCH_NOTES 'Sliding
        # temporal-window' + 'calibrated window chain'). Near-uniform
        # attention (e.g. random-init calib) emits wide radii that land
        # past it.
        from wanq_tpu.models.attention import TemporalWindow

        mean_density = float(np.mean([
            TemporalWindow(tpf, int(np.max(r)),
                           head_radii=tuple(int(x) for x in r)
                           ).density(n_frames)
            for r in radii.values()
        ]))
        BREAK_EVEN = 0.55
        if mean_density > BREAK_EVEN:
            logging.warning(
                "calibrated band density %.2f exceeds the measured "
                "break-even (~%.2f on v5e): windowing at these radii "
                "will NOT pay — deploy dense, or lower --suggest_window "
                "(calibration maps this uniform usually mean random-init "
                "weights or a genuinely global-attention model)",
                mean_density, BREAK_EVEN)
        return args.save_path, radius

    if args.check_reference_params:
        from wanq_tpu.quant.ptq import (
            compare_scale_dicts,
            load_reference_quant_params,
        )

        theirs = load_reference_quant_params(args.check_reference_params)
        report = compare_scale_dicts(state, theirs)
        layer, key, err = report["worst"]
        logging.info(
            "scale-dict parity vs %s: %d shared layers, worst %s.%s "
            "rel_err=%.3e, pass(rtol=1e-3)=%s",
            args.check_reference_params, len(report["layers"]),
            layer, key, err, report["pass"],
        )
        for lname, errs in sorted(report["layers"].items()):
            bad = {k: v for k, v in errs.items() if v > 1e-3}
            if bad:
                logging.warning("  %s: %s", lname, bad)
    return args.save_path


if __name__ == "__main__":
    generate(parse_args())
