"""VBench output adapter (round-2 VERDICT #8): the exported directory
layout + full-info json must match what the reference's
eval/video/Vbench/evaluate.py consumes (vbench/__init__.py:26-59 name
matching: <prompt>.mp4 inside the per-dimension-group folder)."""

import json
import os

import numpy as np

from wanq_tpu.utils.vbench import DIMENSION_GROUPS, export_vbench


def test_export_vbench_layout(tmp_path):
    rng = np.random.default_rng(0)
    vids = rng.uniform(-1, 1, size=(2, 3, 4, 16, 16)).astype(np.float32)
    prompts = ["a cat boxing", "a dog surfing"]
    info_path = export_vbench(vids, prompts, str(tmp_path), fps=4)

    assert os.path.exists(info_path)
    with open(info_path) as f:
        info = json.load(f)
    assert len(info) == 2
    assert info[0]["prompt_en"] == "a cat boxing"
    assert set(info[0]["dimension"]) == set(DIMENSION_GROUPS)
    assert info[0]["video_list"], "no videos written"

    # every dimension group dir holds one file per prompt, named by prompt
    groups = sorted(set(DIMENSION_GROUPS.values()))
    for g in groups:
        gdir = tmp_path / g
        names = sorted(os.listdir(gdir))
        assert len(names) == 2
        stems = {os.path.splitext(n)[0] for n in names}
        assert stems == {"a cat boxing", "a dog surfing"}

    # runner script references every selected dimension
    runner = (tmp_path / "run_vbench.sh").read_text()
    for d in DIMENSION_GROUPS:
        assert f"--dimension '{d}'" in runner


def test_export_vbench_channels_last_and_subset(tmp_path):
    rng = np.random.default_rng(1)
    vids = rng.uniform(-1, 1, size=(1, 4, 16, 16, 3)).astype(np.float32)
    info_path = export_vbench(
        vids, ["hello world"], str(tmp_path), fps=4,
        dimensions=["scene", "background_consistency"],
    )
    with open(info_path) as f:
        info = json.load(f)
    assert info[0]["dimension"] == ["scene", "background_consistency"]
    assert sorted(os.listdir(tmp_path / "scene")) != []
    assert not (tmp_path / "subject_consistency").exists()
