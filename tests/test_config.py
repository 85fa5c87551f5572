"""Quant-config / per-layer policy resolution tests, including the shipped
Wan config semantics (quant_configs/config.yaml)."""

import numpy as np
import jax.numpy as jnp

from wanq_tpu.quant import LayerPolicy, QuantConfig
from wanq_tpu.quant.smooth import channel_mask

# the reference's shipped Wan2.1 quant config (quant_configs/config.yaml)
WAN_CFG = {
    "remain_fp_regex": (
        r"text_embedding|time_embedding|time_projection|head\.head|"
        r"blocks\.\d+\.self_attn\.(?!q$)(?!k$)(?!v$)[^.]+|blocks\.\d+\.o|"
        r"blocks\.\d+\.ffn.*|cross_attn"
    ),
    "calib_data": {"save_path": "./quant_data/calib_data_wanx1.pth"},
    "weight": {"n_bits": 8, "sym": False},
    "act": {"n_bits": 8, "sym": True},
    "viditq": {"alpha": 0.5665, "layer_name_regex": ""},
}


def test_wan_config_policies():
    cfg = QuantConfig.from_dict(WAN_CFG)
    # self-attn q/k/v are quantized with the viditq method
    for name in ("blocks.0.self_attn.q", "blocks.29.self_attn.k", "blocks.5.self_attn.v"):
        p = cfg.resolve(name)
        assert p.method == "viditq", name
        assert p.is_quantized
        assert p.weight.n_bits == 8 and not p.weight.sym
        assert p.act.n_bits == 8 and p.act.sym
        assert abs(p.alpha - 0.5665) < 1e-9
    # everything else stays FP
    for name in (
        "text_embedding.0",
        "time_embedding.0",
        "time_projection.1",
        "head.head",
        "blocks.0.self_attn.o",
        "blocks.0.cross_attn.q",
        "blocks.0.ffn.0",
        "blocks.0.ffn.2",
    ):
        p = cfg.resolve(name)
        assert not p.is_quantized, name


def test_empty_method_regex_matches_everything():
    cfg = QuantConfig.from_dict(
        {"weight": {"n_bits": 8}, "act": {"n_bits": 8, "sym": True},
         "viditq": {"alpha": 0.5, "layer_name_regex": ""}}
    )
    assert cfg.resolve("blocks.3.ffn.0").method == "viditq"


def test_method_priority_later_wins():
    cfg = QuantConfig.from_dict(
        {
            "weight": {"n_bits": 8},
            "act": {"n_bits": 8, "sym": True},
            "smooth_quant": {"alpha": 0.4, "layer_name_regex": "ffn"},
            "viditq": {"alpha": 0.6, "layer_name_regex": "ffn"},
        }
    )
    p = cfg.resolve("blocks.0.ffn.0")
    assert p.method == "viditq" and abs(p.alpha - 0.6) < 1e-9
    p = cfg.resolve("blocks.0.self_attn.q")
    assert p.method == "base"


def test_mixed_precision_regex_lists():
    cfg = QuantConfig.from_dict(
        {
            "weight": {"n_bits": [4, 8], "sym": True},
            "act": {"n_bits": [4, 8], "sym": True},
            "mixed_precision": {
                "weight": {"layer_name_regex": [r"blocks\.0\.", r"blocks\.1\.", r"blocks\.2\."]},
                "act": {"layer_name_regex": ["", "", r"blocks\.\d+"]},
            },
        }
    )
    # idx 0 → FP16 override
    assert not cfg.resolve("blocks.0.self_attn.q").quant_mode
    # idx 1 → bitwidth index 0 (4-bit weight)
    p = cfg.resolve("blocks.1.self_attn.q")
    assert p.quant_mode and p.weight.active_bits == 4
    # idx 2 → bitwidth index 1 (8-bit weight); act regex idx 2 → act 8-bit
    p = cfg.resolve("blocks.2.self_attn.q")
    assert p.weight.active_bits == 8 and p.act.active_bits == 8


def test_channel_mask_formula(rng):
    w = rng.normal(size=(32, 8)).astype(np.float32)  # [C_in, C_out]
    a = np.abs(rng.normal(size=(32,))).astype(np.float32) + 0.1
    alpha = 0.5665
    m = np.asarray(channel_mask(jnp.asarray(w), jnp.asarray(a), alpha))
    want = np.abs(w).max(axis=1) ** alpha / a ** (1 - alpha)
    np.testing.assert_allclose(m, want, rtol=1e-5)
    assert np.all(np.isfinite(m))


def test_yaml_roundtrip(tmp_path):
    import yaml

    p = tmp_path / "q.yaml"
    p.write_text(yaml.safe_dump(WAN_CFG))
    cfg = QuantConfig.from_yaml(str(p))
    assert cfg.resolve("blocks.0.self_attn.q").method == "viditq"
    assert cfg.calib_save_path.endswith("calib_data_wanx1.pth")


def test_shipped_quant_configs_load_and_resolve():
    """The repo's quant_configs/ YAMLs parse and resolve sensibly."""
    import os

    base = os.path.join(os.path.dirname(__file__), "..", "quant_configs")
    wan = QuantConfig.from_yaml(os.path.join(base, "config.yaml"))
    assert wan.resolve("blocks.0.self_attn.q").method == "viditq"
    assert not wan.resolve("blocks.0.ffn.0").is_quantized

    speed = QuantConfig.from_yaml(os.path.join(base, "wan_w8a8_speed.yaml"))
    assert speed.resolve("blocks.0.ffn.0").is_quantized
    assert not speed.resolve("blocks.0.self_attn.o").is_quantized

    mixed = QuantConfig.from_yaml(os.path.join(base, "wan_w4a8_mixed.yaml"))
    assert mixed.resolve("blocks.0.ffn.0").weight.active_bits == 4
    assert mixed.resolve("blocks.0.self_attn.q").weight.active_bits == 8
    assert not mixed.resolve("blocks.0.cross_attn.q").is_quantized
