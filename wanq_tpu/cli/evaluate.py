"""Offline fidelity evaluation CLI (the framework-native slice of the
reference's L8 eval layer, eval/video/metrics/ — PSNR + FPFVD between an
FP output set and a quantized output set).

    python -m wanq_tpu.cli.evaluate --fp fp_videos.npz --quant q_videos.npz

Inputs: .npz files holding one array each — videos [N, T, H, W, 3]
(key 'videos', or the first array), DiT latents [N, C, F, h, w] (key
'latents'; adapted via latents_as_videos), or t2i images [N, H, W, 3]
(key 'images'; scored with FPFID per eval/image/readme.md).
--clip_metrics adds CLIP-Temp / flicker / FP-vs-quant CLIP frame cosine
via the in-repo tower (utils/clip_metrics.py). The reference's VBench /
DOVER / ImageReward suites remain external tooling (SURVEY.md L8 note).
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def _load(path: str):
    """→ (array, kind) with kind in {'videos', 'latents', 'images'}."""
    data = np.load(path)
    if "videos" in data.files:
        return data["videos"], "videos"
    if "latents" in data.files:
        return data["latents"], "latents"
    if "images" in data.files:
        return data["images"], "images"
    arr = data[data.files[0]]
    if arr.ndim == 4 and arr.shape[-1] == 3:  # t2i outputs [N, H, W, 3]
        return arr, "images"
    if arr.ndim != 5:
        raise SystemExit(
            f"{path}: expected videos [N,T,H,W,3], latents [N,C,F,h,w], or "
            f"images [N,H,W,3]; got shape {arr.shape}. Save under an "
            "explicit 'videos'/'latents'/'images' key to disambiguate."
        )
    # videos are channels-last RGB; anything else is a latent stack
    return arr, "videos" if arr.shape[-1] == 3 else "latents"


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
    p.add_argument(
        "--flow_score", action="store_true",
        help="also compute the motion flow-score for both sets via the "
        "in-repo classical optical flow (utils/flow.py; the reference uses "
        "RAFT — an external pretrained net — for the same metric)",
    )
    p.add_argument(
        "--vbench_out", default=None,
        help="also export the QUANT videos in the VBench-consumable layout "
        "(<dim-group>/<prompt>.mp4 + full-info json + runner script) so the "
        "reference's eval/video/Vbench/evaluate.py scores them unchanged",
    )
    p.add_argument(
        "--prompts", default=None,
        help="prompt file (one per line) naming the videos for --vbench_out",
    )
    p.add_argument("--fps", type=int, default=16)
    p.add_argument(
        "--vbench_results", nargs="+", default=None,
        help="ingest VBench *_eval_results.json files (or dirs) produced "
        "by the exported run_vbench.sh and fold the per-dimension scores "
        "into this report (ref vbench/__init__.py:88 save_json format)",
    )
    p.add_argument(
        "--imagereward_out", default=None,
        help="export the QUANT images in the reward-scoring layout "
        "(output_{i}.jpg + prompts.txt + runner) consumed by the "
        "reference's eval/image/evaluation/test_score.py (t2i only)",
    )
    p.add_argument(
        "--imagereward_results", default=None,
        help="ingest a result-score.json written by the reference's "
        "test_score.py and fold reward stats into this report",
    )
    args = p.parse_args(argv)

    from wanq_tpu.utils.fvd import I3DLikeFeatures, fpfvd_report, latents_as_videos

    fp, fp_kind = _load(args.fp)
    q, q_kind = _load(args.quant)
    if fp_kind == "latents":
        fp, fp_kind = latents_as_videos(fp), "videos"
    if q_kind == "latents":
        q, q_kind = latents_as_videos(q), "videos"
    assert fp.shape == q.shape, (fp.shape, q.shape)
    assert fp_kind == q_kind, (fp_kind, q_kind)

    if fp_kind == "images":  # t2i: FPFID (eval/image/readme.md)
        from wanq_tpu.utils.image_metrics import InceptionLikeFeatures, fpfid_report

        rep = fpfid_report(
            fp, q, feature_fn=None if args.feat_dim == 256 and args.seed == 0
            else InceptionLikeFeatures(args.feat_dim, args.seed)
        )
    else:
        rep = fpfvd_report(
            fp, q, feature_fn=None if args.feat_dim == 256 and args.seed == 0
            else I3DLikeFeatures(args.feat_dim, args.seed)
        )

    if args.clip_metrics:
        from wanq_tpu.models.clip import CLIP_XLM_ROBERTA_VIT_H_14, CLIPModel
        from wanq_tpu.utils.clip_metrics import clip_fidelity_report

        clip = CLIPModel(CLIP_XLM_ROBERTA_VIT_H_14,
                         checkpoint_path=args.clip_checkpoint)
        fp_v = fp[:, None] if fp_kind == "images" else fp
        q_v = q[:, None] if q_kind == "images" else q
        crep = clip_fidelity_report(fp_v, q_v, clip.params, clip.cfg)
        if fp_kind == "images":
            # single-frame "videos": temporal metrics are constant 1.0 and
            # would read as perfect scores — report frame-level entries only
            crep = {k: v for k, v in crep.items()
                    if not k.startswith(("clip_temp", "flicker"))}
        rep.update(crep)
        if not args.clip_checkpoint:
            rep["clip_random_init"] = 1.0  # flag: rank-preserving probe only

    if args.flow_score:
        if fp_kind == "images":
            raise SystemExit("--flow_score needs videos, not t2i images")
        from wanq_tpu.utils.flow import flow_score

        rep["flow_score_fp"] = flow_score(fp)
        rep["flow_score_quant"] = flow_score(q)

    if args.vbench_out:
        from wanq_tpu.utils.vbench import export_vbench

        if fp_kind == "images":
            raise SystemExit("--vbench_out needs videos, not t2i images")
        if args.prompts:
            with open(args.prompts) as f:
                prompts = [ln.strip() for ln in f if ln.strip()]
        else:
            prompts = [f"sample_{i:04d}" for i in range(q.shape[0])]
        assert len(prompts) == q.shape[0], (
            f"{len(prompts)} prompts for {q.shape[0]} videos"
        )
        info = export_vbench(q, prompts, args.vbench_out, fps=args.fps)
        rep["vbench_export"] = 1.0
        print(f"VBench layout written: {info}")

    if args.vbench_results:
        from wanq_tpu.utils.vbench import ingest_vbench_results

        rep.update({f"vbench_{k}" if not k.startswith("vbench") else k: v
                    for k, v in ingest_vbench_results(args.vbench_results).items()})

    if args.imagereward_out:
        from wanq_tpu.utils.imagereward import export_imagereward

        if q_kind != "images":
            raise SystemExit("--imagereward_out needs t2i images")
        if args.prompts:
            with open(args.prompts) as f:
                ir_prompts = [ln.strip() for ln in f if ln.strip()]
        else:
            ir_prompts = [f"sample_{i:04d}" for i in range(q.shape[0])]
        export_imagereward(q, ir_prompts, args.imagereward_out)
        rep["imagereward_export"] = 1.0
        print(f"reward-scoring layout written: {args.imagereward_out}")

    if args.imagereward_results:
        from wanq_tpu.utils.imagereward import ingest_imagereward

        rep.update(ingest_imagereward(args.imagereward_results))

    print(json.dumps({k: float(v) for k, v in rep.items()}))
    return rep


if __name__ == "__main__":
    main()
