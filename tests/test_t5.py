"""umT5 encoder tests, including golden parity against the *reference torch
implementation itself* (loaded from /root/reference with a stubbed
tokenizer module — used as a test oracle only)."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from wanq_tpu.models import t5 as jt5

REF_T5 = "/root/reference/ViDiT-Q/examples/Wan2.1/wan/modules/t5.py"


@pytest.fixture(scope="module")
def ref_t5():
    """Load the reference t5.py as an importable module (its only relative
    import, .tokenizers, is stubbed — we never tokenize here)."""
    pkg = types.ModuleType("refwan")
    pkg.__path__ = []
    sys.modules["refwan"] = pkg
    tok_stub = types.ModuleType("refwan.tokenizers")
    tok_stub.HuggingfaceTokenizer = object
    sys.modules["refwan.tokenizers"] = tok_stub
    # T5EncoderModel's signature evaluates torch.cuda.current_device() at
    # class-definition time; stub it for CPU-only torch
    torch.cuda.current_device = lambda: "cpu"
    spec = importlib.util.spec_from_file_location("refwan.t5", REF_T5)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["refwan.t5"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_t5_layer_norm_matches_reference(ref_t5, rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    ln = ref_t5.T5LayerNorm(16)
    want = ln(torch.tensor(x)).detach().numpy()
    got = np.asarray(jt5.t5_layer_norm(jnp.asarray(x), jnp.ones(16)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_gelu_matches_reference(ref_t5, rng):
    x = rng.normal(size=(4, 8)).astype(np.float32)
    want = ref_t5.GELU()(torch.tensor(x)).numpy()
    got = np.asarray(jt5.t5_gelu(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_relative_position_bucket_matches_reference(ref_t5):
    emb = ref_t5.T5RelativeEmbedding(32, 4, bidirectional=True)
    rel = np.arange(24)[None, :] - np.arange(24)[:, None]
    want = emb._relative_position_bucket(torch.tensor(rel)).numpy()
    got = jt5.relative_position_bucket(rel, 32, True)
    np.testing.assert_array_equal(got, want)


def _torchify(ref_t5, cfg, params):
    """Build the reference T5Encoder and copy our params into it."""
    enc = ref_t5.T5Encoder(
        vocab=cfg.vocab_size,
        dim=cfg.dim,
        dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn,
        num_heads=cfg.num_heads,
        num_layers=cfg.num_layers,
        num_buckets=cfg.num_buckets,
        shared_pos=cfg.shared_pos,
        dropout=0.0,
    ).eval()
    with torch.no_grad():
        enc.token_embedding.weight.copy_(
            torch.tensor(np.asarray(params["token_embedding"], dtype=np.float32)))
        enc.norm.weight.copy_(torch.tensor(np.asarray(params["norm"]["w"])))
        for i, blk in enumerate(enc.blocks):
            bp = params["blocks"][i]
            blk.norm1.weight.copy_(torch.tensor(np.asarray(bp["norm1"]["w"])))
            blk.norm2.weight.copy_(torch.tensor(np.asarray(bp["norm2"]["w"])))
            for leaf in ("q", "k", "v", "o"):
                getattr(blk.attn, leaf).weight.copy_(
                    torch.tensor(np.asarray(bp["attn"][leaf]["w"], dtype=np.float32).T))
            blk.ffn.gate[0].weight.copy_(
                torch.tensor(np.asarray(bp["ffn"]["gate"]["0"]["w"], dtype=np.float32).T))
            blk.ffn.fc1.weight.copy_(
                torch.tensor(np.asarray(bp["ffn"]["fc1"]["w"], dtype=np.float32).T))
            blk.ffn.fc2.weight.copy_(
                torch.tensor(np.asarray(bp["ffn"]["fc2"]["w"], dtype=np.float32).T))
            blk.pos_embedding.embedding.weight.copy_(
                torch.tensor(np.asarray(bp["pos_embedding"]["embedding"])))
    return enc


def test_encoder_golden_parity_vs_reference(ref_t5, rng):
    """Full-encoder output parity: our JAX encoder vs the reference torch
    T5Encoder carrying identical weights."""
    cfg = jt5.tiny_t5_config()
    params = jt5.init_t5_params(cfg, seed=0)
    enc = _torchify(ref_t5, cfg, params)

    ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    mask = np.ones((2, 12), dtype=np.int64)
    mask[1, 8:] = 0

    want = enc(torch.tensor(ids), torch.tensor(mask)).detach().numpy()
    got = np.asarray(
        jt5.encoder_forward(params, cfg, jnp.asarray(ids), jnp.asarray(mask))
    )
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def _copy_attn(dst, src_p):
    for leaf in ("q", "k", "v", "o"):
        getattr(dst, leaf).weight.copy_(
            torch.tensor(np.asarray(src_p[leaf]["w"], dtype=np.float32).T))


def test_t5_model_golden_parity_vs_reference(ref_t5, rng):
    """Full T5Model (encoder + causal decoder + vocab head) parity vs the
    reference torch T5Model carrying identical weights (t5.py:314-411)."""
    cfg = jt5.tiny_t5_config()
    params = jt5.init_t5_params(cfg, seed=3, encoder_only=False)

    model = ref_t5.T5Model(
        vocab_size=cfg.vocab_size, dim=cfg.dim, dim_attn=cfg.dim_attn,
        dim_ffn=cfg.dim_ffn, num_heads=cfg.num_heads,
        encoder_layers=cfg.num_layers, decoder_layers=cfg.decoder_layers,
        num_buckets=cfg.num_buckets, shared_pos=cfg.shared_pos, dropout=0.0,
    ).eval()
    with torch.no_grad():
        model.token_embedding.weight.copy_(torch.tensor(
            np.asarray(params["token_embedding"], dtype=np.float32)))
        model.head.weight.copy_(torch.tensor(
            np.asarray(params["head"]["w"], dtype=np.float32).T))
        model.encoder.norm.weight.copy_(torch.tensor(
            np.asarray(params["encoder"]["norm"]["w"])))
        for i, blk in enumerate(model.encoder.blocks):
            bp = params["encoder"]["blocks"][i]
            blk.norm1.weight.copy_(torch.tensor(np.asarray(bp["norm1"]["w"])))
            blk.norm2.weight.copy_(torch.tensor(np.asarray(bp["norm2"]["w"])))
            _copy_attn(blk.attn, bp["attn"])
            blk.ffn.gate[0].weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["gate"]["0"]["w"], dtype=np.float32).T))
            blk.ffn.fc1.weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["fc1"]["w"], dtype=np.float32).T))
            blk.ffn.fc2.weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["fc2"]["w"], dtype=np.float32).T))
            blk.pos_embedding.embedding.weight.copy_(torch.tensor(
                np.asarray(bp["pos_embedding"]["embedding"])))
        model.decoder.norm.weight.copy_(torch.tensor(
            np.asarray(params["decoder"]["norm"]["w"])))
        for i, blk in enumerate(model.decoder.blocks):
            bp = params["decoder"]["blocks"][i]
            blk.norm1.weight.copy_(torch.tensor(np.asarray(bp["norm1"]["w"])))
            blk.norm2.weight.copy_(torch.tensor(np.asarray(bp["norm2"]["w"])))
            blk.norm3.weight.copy_(torch.tensor(np.asarray(bp["norm3"]["w"])))
            _copy_attn(blk.self_attn, bp["self_attn"])
            _copy_attn(blk.cross_attn, bp["cross_attn"])
            blk.ffn.gate[0].weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["gate"]["0"]["w"], dtype=np.float32).T))
            blk.ffn.fc1.weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["fc1"]["w"], dtype=np.float32).T))
            blk.ffn.fc2.weight.copy_(torch.tensor(
                np.asarray(bp["ffn"]["fc2"]["w"], dtype=np.float32).T))
            blk.pos_embedding.embedding.weight.copy_(torch.tensor(
                np.asarray(bp["pos_embedding"]["embedding"])))

    enc_ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    enc_mask = np.ones((2, 12), dtype=np.int64)
    enc_mask[1, 9:] = 0
    dec_ids = rng.integers(0, cfg.vocab_size, size=(2, 7))
    dec_mask = np.ones((2, 7), dtype=np.int64)

    want = model(
        torch.tensor(enc_ids), torch.tensor(enc_mask),
        torch.tensor(dec_ids), torch.tensor(dec_mask),
    ).detach().numpy()
    got = np.asarray(jt5.t5_model_forward(
        params, cfg, jnp.asarray(enc_ids), jnp.asarray(enc_mask),
        jnp.asarray(dec_ids), jnp.asarray(dec_mask),
    ))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_decoder_is_causal(rng):
    """Future decoder tokens cannot influence earlier positions."""
    cfg = jt5.tiny_t5_config()
    params = jt5.init_t5_params(cfg, seed=4, encoder_only=False)
    dec_view = {
        "token_embedding": params["token_embedding"],
        "blocks": params["decoder"]["blocks"],
        "norm": params["decoder"]["norm"],
    }
    enc = jnp.asarray(rng.normal(size=(1, 6, cfg.dim)).astype(np.float32))
    ids = rng.integers(0, cfg.vocab_size, size=(1, 8))
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % cfg.vocab_size
    o1 = np.asarray(jt5.decoder_forward(dec_view, cfg, jnp.asarray(ids),
                                        encoder_states=enc))
    o2 = np.asarray(jt5.decoder_forward(dec_view, cfg, jnp.asarray(ids2),
                                        encoder_states=enc))
    np.testing.assert_allclose(o1[:, :-1], o2[:, :-1], atol=1e-5)
    assert not np.allclose(o1[:, -1], o2[:, -1])


def test_encoder_roundtrip_through_state_dict_converter(ref_t5, rng):
    """reference state_dict → convert_t5_state_dict → same outputs."""
    cfg = jt5.tiny_t5_config()
    params = jt5.init_t5_params(cfg, seed=1)
    enc = _torchify(ref_t5, cfg, params)
    sd = enc.state_dict()
    params2 = jt5.convert_t5_state_dict(sd, dtype=jnp.float32)
    ids = rng.integers(0, cfg.vocab_size, size=(1, 9))
    out1 = jt5.encoder_forward(params, cfg, jnp.asarray(ids), None)
    out2 = jt5.encoder_forward(params2, cfg, jnp.asarray(ids), None)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)
