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
    p.add_argument(
        "--clip_metrics", action="store_true",
        help="also compute CLIP-Temp / temporal-flicker / FP-vs-quant CLIP "
        "frame cosine via the in-repo CLIP tower (utils/clip_metrics.py)",
    )
    p.add_argument(
        "--clip_checkpoint", default=None,
        help="Wan CLIP .pth for real CLIP features (random init otherwise)",
    )
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

    if args.clip_metrics:
        from wanq_tpu.models.clip import CLIP_XLM_ROBERTA_VIT_H_14, CLIPModel
        from wanq_tpu.utils.clip_metrics import clip_fidelity_report

        clip = CLIPModel(CLIP_XLM_ROBERTA_VIT_H_14,
                         checkpoint_path=args.clip_checkpoint)
        rep.update(clip_fidelity_report(fp, q, clip.params, clip.cfg))
        if not args.clip_checkpoint:
            rep["clip_random_init"] = 1.0  # flag: rank-preserving probe only

    print(json.dumps({k: float(v) for k, v in rep.items()}))
    return rep


if __name__ == "__main__":
    main()
