"""Output utilities (TPU-native rebuild of wan/utils/utils.py:23-118):
tensor → mp4 / image files, plus misc helpers."""

from __future__ import annotations

import logging
import os
from typing import Optional

import numpy as np


def _to_uint8(video: np.ndarray, value_range=(-1.0, 1.0)) -> np.ndarray:
    lo, hi = value_range
    v = np.clip((video - lo) / (hi - lo), 0.0, 1.0)
    return (v * 255.0).round().astype(np.uint8)


def cache_video(
    tensor,
    save_file: str,
    fps: int = 30,
    value_range=(-1.0, 1.0),
    retry: int = 5,
) -> Optional[str]:
    """Save [C, T, H, W] (or [B, C, T, H, W], first sample) video to mp4
    (ref cache_video, utils.py:23-60)."""
    import imageio

    arr = np.asarray(tensor, dtype=np.float32)
    if arr.ndim == 5:
        arr = arr[0]
    assert arr.ndim == 4 and arr.shape[0] in (1, 3)
    frames = _to_uint8(arr, value_range).transpose(1, 2, 3, 0)  # T,H,W,C
    if frames.shape[-1] == 1:
        frames = np.repeat(frames, 3, axis=-1)
    for _ in range(retry):
        try:
            writer = imageio.get_writer(save_file, fps=fps, codec="libx264",
                                        quality=8)
            for f in frames:
                writer.append_data(f)
            writer.close()
            return save_file
        except ValueError:
            # no mp4 backend (imageio-ffmpeg absent) → GIF via Pillow
            gif = os.path.splitext(save_file)[0] + ".gif"
            logging.warning("no mp4 backend; writing %s instead", gif)
            imageio.mimsave(gif, list(frames), duration=1000.0 / fps, loop=0)
            return gif
        except Exception as e:  # noqa: BLE001 — mirror the reference's retry
            logging.warning("cache_video retry after %s", e)
    logging.error("cache_video failed for %s", save_file)
    return None


def cache_image(
    tensor, save_file: str, value_range=(-1.0, 1.0)
) -> Optional[str]:
    """Save [C, H, W] image (ref cache_image, utils.py:64-91)."""
    import imageio

    arr = np.asarray(tensor, dtype=np.float32)
    if arr.ndim == 4:
        arr = arr[0]
    img = _to_uint8(arr, value_range).transpose(1, 2, 0)
    imageio.imwrite(save_file, img)
    return save_file


def str2bool(v) -> bool:
    """ref utils.py:94-118."""
    if isinstance(v, bool):
        return v
    v = str(v).lower()
    if v in ("yes", "true", "t", "y", "1"):
        return True
    if v in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError(f"invalid boolean value {v!r}")
