"""Vision preprocessing for VL prompt expanders (clean-room equivalent of
the reference's vendored qwen_vl_utils.py — smart_resize :54, fetch_image
:85, smart_nframes :133, process_vision_info :344)."""

import numpy as np
import pytest

from wanq_tpu.utils.vision import (
    IMAGE_FACTOR,
    MAX_PIXELS,
    MIN_PIXELS,
    extract_vision_info,
    fetch_image,
    process_vision_info,
    smart_nframes,
    smart_resize,
)


def test_smart_resize_multiples_and_budget():
    for h, w in [(480, 832), (720, 1280), (28, 28), (1000, 3000), (37, 53)]:
        rh, rw = smart_resize(h, w)
        assert rh % IMAGE_FACTOR == 0 and rw % IMAGE_FACTOR == 0
        assert MIN_PIXELS <= rh * rw <= MAX_PIXELS
        # aspect ratio approximately preserved
        assert abs((rh / rw) - (h / w)) / (h / w) < 0.35


def test_smart_resize_downscales_huge():
    rh, rw = smart_resize(8000, 8000)
    assert rh * rw <= MAX_PIXELS


def test_smart_resize_rejects_extreme_aspect():
    with pytest.raises(ValueError, match="aspect"):
        smart_resize(10, 10000)


def test_fetch_image_from_array_and_resized():
    img = (np.random.default_rng(0).uniform(0, 255, (100, 160, 3))).astype(
        np.uint8
    )
    out = fetch_image({"image": img})
    w, h = out.size
    assert h % IMAGE_FACTOR == 0 and w % IMAGE_FACTOR == 0
    out2 = fetch_image({"image": img, "resized_height": 56,
                        "resized_width": 84})
    assert out2.size == (84, 56)


def test_smart_nframes():
    assert smart_nframes({"nframes": 17}, total_frames=100, video_fps=30) == 16
    n = smart_nframes({"fps": 2.0}, total_frames=300, video_fps=30)
    assert n % 2 == 0 and 4 <= n <= 300
    with pytest.raises(ValueError):
        smart_nframes({"nframes": 10, "fps": 1.0}, 100, 30)


def test_process_vision_info_images():
    img = np.zeros((56, 56, 3), np.uint8)
    messages = [
        {"role": "system", "content": "sys"},
        {"role": "user", "content": [
            {"type": "image", "image": img},
            {"type": "text", "text": "hi"},
        ]},
    ]
    infos = extract_vision_info(messages)
    assert len(infos) == 1
    images, videos = process_vision_info(messages)
    assert videos is None and len(images) == 1
    assert images[0].size[0] % IMAGE_FACTOR == 0


def test_video_frame_list():
    from wanq_tpu.utils.vision import fetch_video

    frames = [np.zeros((56, 56, 3), np.uint8) for _ in range(3)]
    vid = fetch_video({"video": frames})
    assert vid.shape[0] == 4  # padded to FRAME_FACTOR
    assert vid.shape[-1] == 3


def test_vl_system_prompt_routing():
    from wanq_tpu.utils.prompt_extend import (
        VL_EN_SYS_PROMPT,
        PromptExpander,
    )

    e = PromptExpander(is_vl=True)
    assert e.decide_system_prompt("en") == VL_EN_SYS_PROMPT
