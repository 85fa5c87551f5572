"""Offline fidelity evaluation CLI (the framework-native slice of the
reference's L8 eval layer, eval/video/metrics/ — PSNR + FPFVD between an
FP output set and a quantized output set).

    python -m wanq_tpu.cli.evaluate --fp fp_videos.npz --quant q_videos.npz

Inputs: .npz files holding one array each — either videos [N, T, H, W, 3]
(key 'videos', or the first array) or DiT latents [N, C, F, h, w] (key
'latents'; adapted via latents_as_videos). The reference's VBench /
DOVER / CLIP suites remain external tooling (SURVEY.md L8 note).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load(path: str) -> np.ndarray:
    data = np.load(path)
    if "videos" in data.files:
        return data["videos"], False
    if "latents" in data.files:
        return data["latents"], True
    arr = data[data.files[0]]
    if arr.ndim != 5:
        raise SystemExit(
            f"{path}: expected a 5-D array (videos [N,T,H,W,3] or latents "
            f"[N,C,F,h,w]); got shape {arr.shape}. Save under an explicit "
            "'videos' or 'latents' key to disambiguate."
        )
    # videos are channels-last RGB; anything else is a latent stack
    return arr, arr.shape[-1] != 3


def main(argv=None):
    p = argparse.ArgumentParser("wanq evaluate")
    p.add_argument("--fp", required=True, help="FP outputs (.npz)")
    p.add_argument("--quant", required=True, help="quantized outputs (.npz)")
    p.add_argument("--feat_dim", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)

    from wanq_tpu.utils.fvd import I3DLikeFeatures, fpfvd_report, latents_as_videos

    fp, fp_lat = _load(args.fp)
    q, q_lat = _load(args.quant)
    if fp_lat:
        fp = latents_as_videos(fp)
    if q_lat:
        q = latents_as_videos(q)
    assert fp.shape == q.shape, (fp.shape, q.shape)

    rep = fpfvd_report(
        fp, q, feature_fn=None if args.feat_dim == 256 and args.seed == 0
        else I3DLikeFeatures(args.feat_dim, args.seed)
    )
    print(json.dumps({k: float(v) for k, v in rep.items()}))
    return rep


if __name__ == "__main__":
    main()
