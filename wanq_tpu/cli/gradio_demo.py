"""Gradio web demo (TPU-native rebuild of the reference's
gradio/ directory: t2v_1.3B_singleGPU.py, t2v_14B_singleGPU.py,
t2i_14B_singleGPU.py, i2v_14B_singleGPU.py — one parametric demo
instead of four near-identical scripts; --task selects the surface):

    python -m wanq_tpu.cli.gradio_demo --task t2v-1.3B --ckpt_dir ...
    python -m wanq_tpu.cli.gradio_demo --task t2i-14B  --ckpt_dir ...
    python -m wanq_tpu.cli.gradio_demo --task i2v-14B --size 1280*720 ...

Gated on gradio availability (not baked into the TPU image); everything
it calls is the plain pipeline API used by wanq_tpu.cli.generate.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np

from wanq_tpu.cli.common import add_common_args, load_params, setup_logging
from wanq_tpu.configs import MAX_AREA_CONFIGS, SIZE_CONFIGS, WAN_CONFIGS


def parse_args(argv=None):
    p = argparse.ArgumentParser("wanq gradio demo")
    add_common_args(p)
    p.add_argument("--server_port", type=int, default=7860)
    p.add_argument("--prompt_extend", choices=["none", "local", "dashscope"],
                   default="none")
    return p.parse_args(argv)


class DemoRuntime:
    """Everything the demo callback needs, built WITHOUT gradio — so the
    callback logic is exercisable in environments where gradio is not
    installed (this TPU image). build_demo() only adds the gr.Blocks
    wiring on top. ``encoder``/``vae``/``clip`` stay None without a
    --ckpt_dir; tests inject substitutes."""

    def __init__(self, args):
        import jax.numpy as jnp

        from wanq_tpu.utils.prompt_extend import (
            DashScopePromptExpander,
            IdentityPromptExpander,
            LocalPromptExpander,
        )

        self.args = args
        self.cfg = cfg = WAN_CONFIGS[args.task]
        self.is_i2v = cfg.model_type == "i2v"
        self.is_t2i = args.task.startswith("t2i")
        params = load_params(args, cfg)
        self.expander = {
            "none": IdentityPromptExpander,
            "local": LocalPromptExpander,
            "dashscope": DashScopePromptExpander,
        }[args.prompt_extend]()

        self.encoder = self.vae = self.clip = None
        if args.ckpt_dir:
            from wanq_tpu.models.t5 import T5EncoderModel
            from wanq_tpu.models.vae import WanVAE

            self.encoder = T5EncoderModel(
                cfg.text_len,
                checkpoint_path=os.path.join(args.ckpt_dir, cfg.t5_checkpoint),
                tokenizer_path=cfg.t5_tokenizer,
            )
            self.vae = WanVAE(
                vae_pth=os.path.join(args.ckpt_dir, cfg.vae_checkpoint),
                compute_dtype=jnp.dtype(args.vae_dtype).type)
            if self.is_i2v:
                from wanq_tpu.models.clip import CLIPModel

                self.clip = CLIPModel(checkpoint_path=os.path.join(
                    args.ckpt_dir, cfg.clip_checkpoint))

        if self.is_i2v:
            from wanq_tpu.pipelines.image2video import WanI2V

            self.pipe = WanI2V(cfg, params, vae=self.vae, clip=self.clip)
        else:
            from wanq_tpu.pipelines.text2video import WanT2V

            self.pipe = WanT2V(cfg, params)

    def run(self, prompt, image, steps, guide_scale, shift, seed, extend,
            error_cls=RuntimeError, out_path="gradio_out.mp4"):
        """The Generate-button callback: one full generate + decode.
        Returns (video_path, image_array, final_prompt) — exactly the
        demo's three outputs. ``error_cls`` is gr.Error under gradio."""
        import jax.numpy as jnp

        from wanq_tpu.utils.video import cache_video

        args, cfg = self.args, self.cfg
        if extend:
            prompt = self.expander(prompt, tar_lang="en").prompt
        if self.encoder is None:
            raise error_cls("no --ckpt_dir: demo needs the T5 checkpoint")
        ctx = self.encoder([prompt])
        ctx_null = self.encoder([args.neg_prompt])
        frame_num = 1 if self.is_t2i else args.frame_num
        if self.is_i2v:
            if image is None:
                raise error_cls("i2v needs an input image")
            img = jnp.asarray(
                np.asarray(image, np.float32).transpose(2, 0, 1) / 127.5 - 1.0)
            latents = self.pipe.generate(
                img, jnp.asarray(ctx), jnp.asarray(ctx_null),
                max_area=MAX_AREA_CONFIGS[args.size], frame_num=frame_num,
                sampling_steps=int(steps), guide_scale=float(guide_scale),
                shift=float(shift), seed=int(seed),
            )
        else:
            latents = self.pipe.generate(
                jnp.asarray(ctx), jnp.asarray(ctx_null),
                size=SIZE_CONFIGS[args.size], frame_num=frame_num,
                sampling_steps=int(steps), guide_scale=float(guide_scale),
                shift=float(shift), seed=int(seed),
            )
        video = self.vae.decode(latents)
        if self.is_t2i:
            frame = np.asarray(video)[0, :, 0]  # [3, H, W] in [-1, 1]
            img_out = ((frame.transpose(1, 2, 0) + 1.0) * 127.5).clip(0, 255)
            return None, img_out.astype(np.uint8), prompt
        path = cache_video(np.asarray(video), out_path, fps=cfg.sample_fps)
        return path, None, prompt


def build_demo(args):
    try:
        import gradio as gr
    except ImportError as e:  # pragma: no cover - env without gradio
        raise SystemExit(
            "gradio is not installed in this image; the demo wraps the same "
            "pipeline API used by wanq_tpu.cli.generate"
        ) from e

    setup_logging()
    rt = DemoRuntime(args)
    is_i2v, is_t2i = rt.is_i2v, rt.is_t2i

    def run(prompt, image, steps, guide_scale, shift, seed, extend):
        return rt.run(prompt, image, steps, guide_scale, shift, seed,
                      extend, error_cls=gr.Error)

    title = f"Wan2.1 {args.task} (TPU-native)"
    with gr.Blocks(title=f"wanq_tpu {args.task}") as demo:
        gr.Markdown(f"## {title}")
        with gr.Row():
            prompt = gr.Textbox(label="Prompt", lines=3)
            image = gr.Image(label="Input image", visible=is_i2v)
        with gr.Row():
            steps = gr.Slider(1, 100, value=args.sample_steps, label="Steps")
            gs = gr.Slider(1, 15, value=args.sample_guide_scale, label="Guidance")
            shift = gr.Slider(1, 10, value=args.sample_shift, label="Shift")
            seed = gr.Number(value=args.base_seed, label="Seed")
            extend = gr.Checkbox(label="Extend prompt")
        btn = gr.Button("Generate")
        video = gr.Video(label="Output video", visible=not is_t2i)
        image_out = gr.Image(label="Output image", visible=is_t2i)
        final_prompt = gr.Textbox(label="Final prompt", interactive=False)
        btn.click(run, [prompt, image, steps, gs, shift, seed, extend],
                  [video, image_out, final_prompt])
    return demo


def main():
    args = parse_args()
    demo = build_demo(args)
    demo.launch(server_name="0.0.0.0", server_port=args.server_port)


if __name__ == "__main__":
    main()
