"""Gradio web demo (TPU-native rebuild of the reference's
gradio/t2v_1.3B_singleGPU.py family): text → video with optional prompt
extension, FP or quantized. Gated on gradio availability (not baked into
the TPU image); everything it calls is the plain pipeline API.

    python -m wanq_tpu.cli.gradio_demo --task t2v-1.3B --ckpt_dir ...
"""

from __future__ import annotations

import argparse
import logging

import numpy as np

from wanq_tpu.cli.common import add_common_args, load_params, setup_logging
from wanq_tpu.configs import SIZE_CONFIGS, WAN_CONFIGS


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq gradio demo")
    add_common_args(p)
    p.add_argument("--server_port", type=int, default=7860)
    p.add_argument("--prompt_extend", choices=["none", "local", "dashscope"],
                   default="none")
    return p.parse_args(argv)


def build_demo(args):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - env without gradio
        raise SystemExit(
            "gradio is not installed in this image; the demo wraps the same "
            "pipeline API used by wanq_tpu.cli.generate"
        ) from e

    import jax.numpy as jnp

    from wanq_tpu.pipelines.text2video import WanT2V
    from wanq_tpu.utils.prompt_extend import (
        DashScopePromptExpander,
        IdentityPromptExpander,
        LocalPromptExpander,
    )
    from wanq_tpu.utils.video import cache_video

    setup_logging()
    cfg = WAN_CONFIGS[args.task]
    params = load_params(args, cfg)
    pipe = WanT2V(cfg, params)

    expander = {
        "none": IdentityPromptExpander,
        "local": LocalPromptExpander,
        "dashscope": DashScopePromptExpander,
    }[args.prompt_extend]()

    encoder = None
    if args.ckpt_dir:
        import os

        from wanq_tpu.models.t5 import T5EncoderModel

        encoder = T5EncoderModel(
            cfg.text_len,
            checkpoint_path=os.path.join(args.ckpt_dir, cfg.t5_checkpoint),
            tokenizer_path=cfg.t5_tokenizer,
        )

    def run(prompt, steps, guide_scale, shift, seed, extend):
        if extend:
            prompt = expander(prompt, tar_lang="en").prompt
        if encoder is None:
            raise gr.Error("no --ckpt_dir: demo needs the T5 checkpoint")
        ctx = encoder([prompt])
        ctx_null = encoder([args.neg_prompt])
        latents = pipe.generate(
            jnp.asarray(ctx), jnp.asarray(ctx_null),
            size=SIZE_CONFIGS[args.size], frame_num=args.frame_num,
            sampling_steps=int(steps), guide_scale=float(guide_scale),
            shift=float(shift), seed=int(seed),
        )
        import os

        from wanq_tpu.models.vae import WanVAE

        vae = WanVAE(vae_pth=os.path.join(args.ckpt_dir, cfg.vae_checkpoint))
        video = vae.decode(latents)
        path = cache_video(np.asarray(video), "gradio_out.mp4", fps=cfg.sample_fps)
        return path, prompt

    with gr.Blocks(title=f"wanq_tpu {args.task}") as demo:
        gr.Markdown(f"## Wan2.1 {args.task} (TPU-native)")
        with gr.Row():
            prompt = gr.Textbox(label="Prompt", lines=3)
        with gr.Row():
            steps = gr.Slider(1, 100, value=args.sample_steps, label="Steps")
            gs = gr.Slider(1, 15, value=args.sample_guide_scale, label="Guidance")
            shift = gr.Slider(1, 10, value=args.sample_shift, label="Shift")
            seed = gr.Number(value=args.base_seed, label="Seed")
            extend = gr.Checkbox(label="Extend prompt")
        btn = gr.Button("Generate")
        video = gr.Video(label="Output")
        final_prompt = gr.Textbox(label="Final prompt", interactive=False)
        btn.click(run, [prompt, steps, gs, shift, seed, extend],
                  [video, final_prompt])
    return demo


def main():
    args = parse_args()
    demo = build_demo(args)
    demo.launch(server_name="0.0.0.0", server_port=args.server_port)


if __name__ == "__main__":
    main()
