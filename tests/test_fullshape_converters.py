"""Full-shape converter dry-runs (VERDICT round-1 'do this' #10): build
torch-layout state dicts at REAL checkpoint dims (zero-filled — value
parity is covered by the tiny-config golden tests; this catches key-layout,
shape, transpose-orientation, and dtype bugs that only appear at real
scale), run every converter, and check the resulting pytrees leaf for leaf
against the model's own init shapes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import WAN_CONFIGS


def _dit_torch_sd(cfg, dtype=np.float16):
    """Torch-layout (diffusers safetensors) key set for a WanModel t2v
    checkpoint (ref wan/modules/model.py:418-537 module tree)."""
    d, ffn = cfg.dim, cfg.ffn_dim
    sd = {}

    def lin(key, c_in, c_out):
        sd[f"{key}.weight"] = np.zeros((c_out, c_in), dtype)
        sd[f"{key}.bias"] = np.zeros((c_out,), dtype)

    sd["patch_embedding.weight"] = np.zeros(
        (d, cfg.in_dim, *cfg.patch_size), dtype)
    sd["patch_embedding.bias"] = np.zeros((d,), dtype)
    lin("text_embedding.0", cfg.text_dim, d)
    lin("text_embedding.2", d, d)
    lin("time_embedding.0", cfg.freq_dim, d)
    lin("time_embedding.2", d, d)
    lin("time_projection.1", d, d * 6)
    lin("head.head", d, int(np.prod(cfg.patch_size)) * cfg.out_dim)
    sd["head.modulation"] = np.zeros((1, 2, d), dtype)
    for i in range(cfg.num_layers):
        for mod in ("self_attn", "cross_attn"):
            for leaf in ("q", "k", "v", "o"):
                lin(f"blocks.{i}.{mod}.{leaf}", d, d)
            sd[f"blocks.{i}.{mod}.norm_q.weight"] = np.zeros((d,), dtype)
            sd[f"blocks.{i}.{mod}.norm_k.weight"] = np.zeros((d,), dtype)
        sd[f"blocks.{i}.norm3.weight"] = np.zeros((d,), dtype)
        sd[f"blocks.{i}.norm3.bias"] = np.zeros((d,), dtype)
        lin(f"blocks.{i}.ffn.0", d, ffn)
        lin(f"blocks.{i}.ffn.2", ffn, d)
        sd[f"blocks.{i}.modulation"] = np.zeros((1, 6, d), dtype)
    return sd


def _assert_same_tree_shapes(got, want, where=""):
    gl, gt = jax.tree_util.tree_flatten_with_path(got)
    wl, wt = jax.tree_util.tree_flatten_with_path(want)
    gmap = {jax.tree_util.keystr(p): l.shape for p, l in gl}
    wmap = {jax.tree_util.keystr(p): l.shape for p, l in wl}
    assert gmap == wmap, (
        where
        + " extra: " + str(sorted(set(gmap) - set(wmap))[:5])
        + " missing: " + str(sorted(set(wmap) - set(gmap))[:5])
        + " mismatched: "
        + str([k for k in gmap.keys() & wmap.keys() if gmap[k] != wmap[k]][:5])
    )


@pytest.mark.slow
def test_dit_converter_full_1_3b_shape():
    from wanq_tpu.models.dit import abstract_params
    from wanq_tpu.models.params import convert_state_dict

    cfg = WAN_CONFIGS["t2v-1.3B"]
    sd = _dit_torch_sd(cfg)
    params = convert_state_dict(sd, dtype=jnp.bfloat16)
    _assert_same_tree_shapes(params, abstract_params(cfg), "dit-1.3B")
    w = params["blocks"][0]["ffn"]["0"]["w"]
    assert w.shape == (cfg.dim, cfg.ffn_dim) and w.dtype == jnp.bfloat16


@pytest.mark.slow
def test_dit_converter_full_14b_shape_streamed(tmp_path):
    """14B dims through the STREAMING safetensors loader (a single block —
    per-block keys are identical across the 40 layers; full 40x zero
    tensors would only burn CI time, not coverage)."""
    pytest.importorskip("safetensors")
    import dataclasses

    from safetensors.numpy import save_file

    from wanq_tpu.models.dit import abstract_params
    from wanq_tpu.models.params import load_wan_checkpoint

    cfg = dataclasses.replace(WAN_CONFIGS["t2v-14B"], num_layers=1)
    sd = _dit_torch_sd(cfg, dtype=np.float16)
    # safetensors-numpy rejects f16? it supports it; keep f32 for safety
    sd = {k: v.astype(np.float32) for k, v in sd.items()}
    save_file(sd, str(tmp_path / "diffusion_pytorch_model.safetensors"))
    params = load_wan_checkpoint(str(tmp_path), dtype=jnp.bfloat16)
    _assert_same_tree_shapes(params, abstract_params(cfg), "dit-14B")
    assert params["blocks"][0]["ffn"]["0"]["w"].shape == (5120, 13824)


@pytest.mark.slow
def test_t5_converter_full_width():
    """umT5-XXL real widths (vocab 256384, dim 4096, ffn 10240, 64 heads);
    2 layers — per-layer keys are identical across the 24."""
    import dataclasses

    from wanq_tpu.models import t5 as jt5

    cfg = dataclasses.replace(jt5.UMT5_XXL, num_layers=2)
    d, ffn, nb, nh = cfg.dim, cfg.dim_ffn, cfg.num_buckets, cfg.num_heads
    sd = {
        "token_embedding.weight": np.zeros((cfg.vocab_size, d), np.float16),
        "norm.weight": np.zeros((d,), np.float16),
    }
    for i in range(cfg.num_layers):
        for leaf in ("q", "k", "v", "o"):
            sd[f"blocks.{i}.attn.{leaf}.weight"] = np.zeros(
                (cfg.dim_attn, cfg.dim_attn), np.float16)
        sd[f"blocks.{i}.norm1.weight"] = np.zeros((d,), np.float16)
        sd[f"blocks.{i}.norm2.weight"] = np.zeros((d,), np.float16)
        sd[f"blocks.{i}.ffn.gate.0.weight"] = np.zeros((ffn, d), np.float16)
        sd[f"blocks.{i}.ffn.fc1.weight"] = np.zeros((ffn, d), np.float16)
        sd[f"blocks.{i}.ffn.fc2.weight"] = np.zeros((d, ffn), np.float16)
        sd[f"blocks.{i}.pos_embedding.embedding.weight"] = np.zeros(
            (nb, nh), np.float16)
    params = jt5.convert_t5_state_dict(sd, dtype=jnp.bfloat16)
    _assert_same_tree_shapes(
        params, jax.eval_shape(lambda: jt5.init_t5_params(cfg, seed=0)),
        "umt5-xxl",
    )
    assert params["token_embedding"].shape == (256384, 4096)


@pytest.mark.slow
def test_vae_converter_full_shape(tmp_path):
    """Full real-dim Wan VAE param dict through torch save →
    load_vae_checkpoint round trip."""
    torch = pytest.importorskip("torch")
    from wanq_tpu.models.vae import VAEConfig, init_vae_params, load_vae_checkpoint

    cfg = VAEConfig()
    params = init_vae_params(cfg, seed=0)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in params.items()}
    path = str(tmp_path / "Wan2.1_VAE.pth")
    torch.save(sd, path)
    loaded = load_vae_checkpoint(path)
    assert set(loaded.keys()) == set(params.keys())
    for k in params:
        assert loaded[k].shape == params[k].shape, k


@pytest.mark.slow
def test_param_generator_matches_host_init_i2v():
    """make_param_generator must produce the same tree as init_params for
    i2v configs (img_emb + per-block k_img/v_img/norm_k_img) — it feeds
    init_params_on_device, abstract_params, and the sharded init."""
    import dataclasses

    from wanq_tpu.models.dit import init_params, make_param_generator

    cfg = dataclasses.replace(
        WAN_CONFIGS["i2v-14B"], dim=64, ffn_dim=128, num_heads=4,
        num_layers=2, text_len=16, freq_dim=32, text_dim=48, clip_dim=40)
    host = init_params(cfg, jax.random.PRNGKey(0))
    gen = make_param_generator(cfg)(jax.random.PRNGKey(0))
    hpaths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(host)
    }
    gpaths = {
        jax.tree_util.keystr(p): l.shape
        for p, l in jax.tree_util.tree_leaves_with_path(gen)
    }
    assert hpaths == gpaths, (
        sorted(set(hpaths) ^ set(gpaths))[:6],
        [k for k in hpaths.keys() & gpaths.keys() if hpaths[k] != gpaths[k]][:6])
