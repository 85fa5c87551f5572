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


def test_ingest_vbench_results(tmp_path):
    """Round-trip the reference runner's save_json format
    (vbench/__init__.py:88): {dim: [avg, per_video_list]} per JSON file,
    one file per dimension-group invocation."""
    from wanq_tpu.utils.vbench import ingest_vbench_results

    r1 = {
        "scene": [0.42, [{"video_path": "a.mp4", "video_results": 0.4}]],
        "background_consistency": [0.91, []],
    }
    r2 = {"subject_consistency": 0.88}  # bare-float variant
    (tmp_path / "scene_eval_results.json").write_text(json.dumps(r1))
    (tmp_path / "subject_consistency_eval_results.json").write_text(
        json.dumps(r2)
    )
    # directory scan
    rep = ingest_vbench_results(str(tmp_path))
    assert rep["scene"] == 0.42
    assert rep["background_consistency"] == 0.91
    assert rep["subject_consistency"] == 0.88
    assert abs(rep["vbench_mean_raw"] - (0.42 + 0.91 + 0.88) / 3) < 1e-9
    # explicit file list
    rep2 = ingest_vbench_results([str(tmp_path / "scene_eval_results.json")])
    assert set(rep2) == {"scene", "background_consistency", "vbench_mean_raw"}


def test_imagereward_adapter_roundtrip(tmp_path):
    """Export layout matches test_score.py's CocoDataset contract
    (output_{i}.jpg + one-prompt-per-line txt, test_score.py:18-45) and
    the result-score.json ingest summarizes {id: reward}."""
    from wanq_tpu.utils.imagereward import export_imagereward, ingest_imagereward

    rng = np.random.default_rng(2)
    imgs = rng.uniform(-1, 1, size=(3, 16, 16, 3)).astype(np.float32)
    prompts = ["a red cube", "a blue sphere", "a green cone"]
    out = export_imagereward(imgs, prompts, str(tmp_path / "ir"))
    for i in range(3):
        assert os.path.exists(os.path.join(out, f"output_{i}.jpg"))
    lines = (tmp_path / "ir" / "prompts.txt").read_text().splitlines()
    assert lines == prompts
    runner = (tmp_path / "ir" / "run_imagereward.sh").read_text()
    assert "test_score.py" in runner and "--img_dir" in runner

    (tmp_path / "result-score.json").write_text(
        json.dumps({"0": 1.2, "1": -0.4, "2": 0.1})
    )
    rep = ingest_imagereward(str(tmp_path / "result-score.json"))
    assert abs(rep["reward_mean"] - 0.3) < 1e-9
    assert rep["n_scored"] == 3.0


def test_evaluate_cli_ingest_flags(tmp_path):
    """The evaluate CLI folds VBench + reward ingests into its report."""
    from wanq_tpu.cli.evaluate import main as eval_main

    rng = np.random.default_rng(3)
    imgs = rng.uniform(-1, 1, size=(2, 16, 16, 3)).astype(np.float32)
    np.savez(tmp_path / "fp.npz", images=imgs)
    np.savez(tmp_path / "q.npz", images=imgs + 0.01 * rng.standard_normal(imgs.shape).astype(np.float32))
    (tmp_path / "scene_eval_results.json").write_text(
        json.dumps({"scene": [0.5, []]})
    )
    (tmp_path / "result-score.json").write_text(json.dumps({"0": 2.0}))
    rep = eval_main([
        "--fp", str(tmp_path / "fp.npz"), "--quant", str(tmp_path / "q.npz"),
        "--vbench_results", str(tmp_path / "scene_eval_results.json"),
        "--imagereward_out", str(tmp_path / "ir_out"),
        "--imagereward_results", str(tmp_path / "result-score.json"),
    ])
    assert rep["vbench_scene"] == 0.5
    assert rep["reward_mean"] == 2.0
    assert os.path.exists(tmp_path / "ir_out" / "output_1.jpg")
