"""Model configs (TPU-native rebuild of wan/configs/*, ref:
wan/configs/__init__.py:15-42, shared_config.py, wan_t2v_1_3B.py,
wan_t2v_14B.py, wan_i2v_14B.py).

Frozen dataclasses instead of EasyDicts: hashable, so a config can ride
along as a jit static argument.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Tuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class WanConfig:
    name: str = "t2v-1.3B"
    model_type: str = "t2v"  # 't2v' | 'i2v'

    # t5 (ref: shared_config.py)
    t5_model: str = "umt5_xxl"
    t5_checkpoint: str = "models_t5_umt5-xxl-enc-bf16.pth"
    t5_tokenizer: str = "google/umt5-xxl"
    text_len: int = 512
    text_dim: int = 4096

    # vae
    vae_checkpoint: str = "Wan2.1_VAE.pth"
    vae_stride: Tuple[int, int, int] = (4, 8, 8)
    z_dim: int = 16

    # clip (i2v only)
    clip_checkpoint: str = ""
    clip_dim: int = 1280

    # transformer
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    in_dim: int = 16
    out_dim: int = 16
    dim: int = 1536
    ffn_dim: int = 8960
    freq_dim: int = 256
    num_heads: int = 12
    num_layers: int = 30
    window_size: Tuple[int, int] = (-1, -1)
    qk_norm: bool = True
    cross_attn_norm: bool = True
    eps: float = 1e-6

    # inference (ref: shared_config.py:13-16)
    num_train_timesteps: int = 1000
    sample_fps: int = 16
    param_dtype: str = "bfloat16"
    # dtype of the residual stream between blocks. The reference rides its
    # fp16 module dtype with fp32 norm/modulation pockets (model.py:314-317);
    # float32 here is the conservative default, bfloat16 trades ~8 mantissa
    # bits of the stream for less HBM traffic (norms still compute f32).
    residual_dtype: str = "float32"

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def dtype(self):
        return jnp.dtype(self.param_dtype)

    @property
    def res_dtype(self):
        return jnp.dtype(self.residual_dtype)


# default negative prompt (ref: shared_config.py:16)
SAMPLE_NEG_PROMPT = (
    "色调艳丽，过曝，静态，细节模糊不清，字幕，风格，作品，画作，画面，静止，整体发灰，最差质量，"
    "低质量，JPEG压缩残留，丑陋的，残缺的，多余的手指，画得不好的手部，画得不好的脸部，畸形的，"
    "毁容的，形态畸形的肢体，手指融合，静止不动的画面，杂乱的背景，三条腿，背景人很多，倒着走"
)

# shipped configs ride a bf16 residual stream — the analog of the
# reference's fp16 module dtype (model.py autocast; norms/modulation stay
# f32 pockets). Measured on v5e: -80..-90 ms/step both precisions at a
# stream drift (55 dB PSNR vs an f32 stream) on par with W8A8's own
# quantization noise. Tests/tiny configs keep the f32 default.
t2v_1_3B = WanConfig(name="t2v-1.3B", residual_dtype="bfloat16")

t2v_14B = WanConfig(
    name="t2v-14B",
    dim=5120,
    ffn_dim=13824,
    num_heads=40,
    num_layers=40,
    residual_dtype="bfloat16",
)

i2v_14B = WanConfig(
    name="i2v-14B",
    model_type="i2v",
    residual_dtype="bfloat16",
    dim=5120,
    ffn_dim=13824,
    num_heads=40,
    num_layers=40,
    in_dim=36,  # 16 latent + 16 cond latent + 4 mask (ref: wan_i2v_14B.py)
    clip_checkpoint="models_clip_open-clip-xlm-roberta-large-vit-huge-14.pth",
)

t2i_14B = dataclasses.replace(t2v_14B, name="t2i-14B")

WAN_CONFIGS: Dict[str, WanConfig] = {
    "t2v-1.3B": t2v_1_3B,
    "t2v-14B": t2v_14B,
    "i2v-14B": i2v_14B,
    "t2i-14B": t2i_14B,
}

SIZE_CONFIGS: Dict[str, Tuple[int, int]] = {
    "720*1280": (720, 1280),
    "1280*720": (1280, 720),
    "480*832": (480, 832),
    "832*480": (832, 480),
    "1024*1024": (1024, 1024),
    # smoke-test size (not in the reference table; used by the 'tiny' task)
    "64*64": (64, 64),
}

MAX_AREA_CONFIGS: Dict[str, int] = {
    "720*1280": 720 * 1280,
    "1280*720": 1280 * 720,
    "480*832": 480 * 832,
    "832*480": 832 * 480,
}

def tiny_config(**overrides) -> WanConfig:
    """A CPU-testable miniature of the Wan architecture for unit tests and
    CLI smoke runs (task name 'tiny')."""
    base = dict(
        name="tiny",
        dim=96,
        ffn_dim=192,
        freq_dim=32,
        num_heads=4,
        num_layers=2,
        text_len=16,
        text_dim=64,
        param_dtype="float32",
    )
    base.update(overrides)
    return WanConfig(**base)


WAN_CONFIGS["tiny"] = tiny_config()

SUPPORTED_SIZES: Dict[str, Tuple[str, ...]] = {
    "t2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2v-1.3B": ("480*832", "832*480"),
    "i2v-14B": ("720*1280", "1280*720", "480*832", "832*480"),
    "t2i-14B": tuple(SIZE_CONFIGS.keys()),
    "tiny": tuple(SIZE_CONFIGS.keys()),
}
