"""CLIP tower tests: golden parity against the reference torch modules
(clip.py / xlm_roberta.py loaded from /root/reference as an oracle)."""

import importlib.util
import sys
import types

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wanq_tpu.models import clip as jclip

REF_DIR = "/root/reference/ViDiT-Q/examples/Wan2.1/wan/modules"


@pytest.fixture(scope="module")
def ref_clip():
    pkg = types.ModuleType("refwanc")
    pkg.__path__ = []
    sys.modules["refwanc"] = pkg
    # torchvision isn't installed (CPU-only env); clip.py only uses it for
    # preprocessing transforms we don't exercise
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
    # stub modules clip.py pulls in
    for name, attrs in [
        ("refwanc.attention", {"flash_attention": None}),
        ("refwanc.tokenizers", {"HuggingfaceTokenizer": object}),
        ("refwanc.xlm_roberta", {}),
    ]:
        sys.modules[name] = types.ModuleType(name)
        for a, v in attrs.items():
            setattr(sys.modules[name], a, v)
    # real xlm_roberta first
    spec = importlib.util.spec_from_file_location(
        "refwanc.xlm_roberta", f"{REF_DIR}/xlm_roberta.py")
    xr = importlib.util.module_from_spec(spec)
    sys.modules["refwanc.xlm_roberta"] = xr
    spec.loader.exec_module(xr)

    # flash_attention fallback: plain SDPA so the reference runs on CPU
    def sdpa_flash(q, k, v, dropout_p=0.0, causal=False, version=2):
        qt = q.transpose(1, 2)
        kt = k.transpose(1, 2)
        vt = v.transpose(1, 2)
        o = torch.nn.functional.scaled_dot_product_attention(qt, kt, vt, is_causal=causal)
        return o.transpose(1, 2)

    sys.modules["refwanc.attention"].flash_attention = sdpa_flash
    spec = importlib.util.spec_from_file_location("refwanc.clip", f"{REF_DIR}/clip.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refwanc.clip"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tiny(ref_clip):
    cfg = jclip.tiny_clip_config()
    params = jclip.init_clip_params(cfg, seed=0)
    ref = ref_clip.XLMRobertaCLIP(
        embed_dim=cfg.embed_dim,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        vision_dim=cfg.vision_dim,
        vision_heads=cfg.vision_heads,
        vision_layers=cfg.vision_layers,
        activation="gelu",
        vocab_size=cfg.vocab_size,
        max_text_len=cfg.max_text_len,
        text_dim=cfg.text_dim,
        text_heads=cfg.text_heads,
        text_layers=cfg.text_layers,
        text_dropout=0.0,
    ).eval()
    sd = {k: torch.tensor(np.asarray(v)) for k, v in params.items()}
    sd["log_scale"] = ref.log_scale.detach().clone()
    ref.load_state_dict(sd, strict=True)
    return cfg, params, ref


def test_vision_tower_parity(tiny, rng):
    cfg, params, ref = tiny
    x = rng.normal(size=(2, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        want = ref.visual(torch.tensor(x)).numpy()
    got = np.asarray(jclip.vision_forward(params, cfg, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_vision_use_31_block(tiny, rng):
    cfg, params, ref = tiny
    x = rng.normal(size=(1, 3, cfg.image_size, cfg.image_size)).astype(np.float32)
    with torch.no_grad():
        want = ref.visual(torch.tensor(x), use_31_block=True).numpy()
    got = np.asarray(jclip.vision_forward(params, cfg, jnp.asarray(x), use_31_block=True))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)
    assert got.shape == (1, cfg.num_patches + 1, cfg.vision_dim)


def test_text_tower_parity(tiny, rng):
    cfg, params, ref = tiny
    ids = rng.integers(2, cfg.vocab_size, size=(2, 10))
    ids[1, 6:] = cfg.pad_id
    with torch.no_grad():
        want = ref.textual(torch.tensor(ids)).numpy()
    got = np.asarray(jclip.text_forward(params, cfg, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_clip_model_visual_shape(tiny, rng):
    cfg, params, _ = tiny
    model = jclip.CLIPModel(cfg, params=params)
    videos = jnp.asarray(rng.normal(size=(1, 3, 2, 16, 20)).astype(np.float32))
    out = model.visual(videos)
    assert out.shape == (2, cfg.num_patches + 1, cfg.vision_dim)
    assert np.isfinite(np.asarray(out)).all()
