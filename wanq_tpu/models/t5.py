"""umT5 text encoder in functional JAX.

TPU-native rebuild of the reference's from-scratch T5 implementation
(wan/modules/t5.py:20-513): T5LayerNorm (RMS, no mean subtraction),
unscaled attention with additive relative-position bias, gated-GELU FFN,
per-layer relative embeddings (umT5 shared_pos=False), plus the encoder /
decoder / full-model assemblies and the T5EncoderModel convenience wrapper.

Param paths mirror the reference module names (token_embedding,
blocks.N.{norm1,attn.{q,k,v,o},pos_embedding.embedding,norm2,
ffn.{gate.0,fc1,fc2}}, norm) so the reference .pth checkpoint converts
mechanically. Dropout is inference-off (the pipeline only runs eval).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class T5Config:
    vocab_size: int = 256384
    dim: int = 4096
    dim_attn: int = 4096
    dim_ffn: int = 10240
    num_heads: int = 64
    num_layers: int = 24  # encoder layers
    decoder_layers: int = 24
    num_buckets: int = 32
    shared_pos: bool = False
    param_dtype: str = "bfloat16"

    @property
    def head_dim(self):
        return self.dim_attn // self.num_heads

    @property
    def dtype(self):
        return jnp.dtype(self.param_dtype)


UMT5_XXL = T5Config()  # ref umt5_xxl (t5.py:456-469)


def tiny_t5_config(**overrides) -> T5Config:
    base = dict(vocab_size=128, dim=32, dim_attn=32, dim_ffn=64, num_heads=4,
                num_layers=2, num_buckets=8, param_dtype="float32")
    base.update(overrides)
    return T5Config(**base)


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------


def t5_layer_norm(x: jax.Array, w: jax.Array, eps: float = 1e-6) -> jax.Array:
    """RMS norm without mean subtraction (ref T5LayerNorm, t5.py:53-66)."""
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return (w.astype(jnp.float32) * y).astype(x.dtype)


def t5_gelu(x: jax.Array) -> jax.Array:
    """tanh GELU (ref GELU, t5.py:46-50)."""
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (xf + 0.044715 * xf**3)))
    return y.astype(x.dtype)


def relative_position_bucket(
    rel_pos: np.ndarray, num_buckets: int, bidirectional: bool, max_dist: int = 128
) -> np.ndarray:
    """ref T5RelativeEmbedding._relative_position_bucket (t5.py:245-264).
    Host-side (static shapes; tables are built once per seq_len)."""
    if bidirectional:
        nb = num_buckets // 2
        rel_buckets = (rel_pos > 0).astype(np.int64) * nb
        rel_pos = np.abs(rel_pos)
    else:
        nb = num_buckets
        rel_buckets = np.zeros_like(rel_pos)
        rel_pos = -np.minimum(rel_pos, 0)
    max_exact = nb // 2
    # clamp to >=1 before the log: entries < max_exact take the exact branch
    # in the where() below, so the clamp never changes a selected value but
    # keeps log(0) (NaN -> int64 cast warnings) out of the table build
    safe = np.maximum(rel_pos, 1).astype(np.float64)
    rel_large = max_exact + (
        np.log(safe / max_exact)
        / math.log(max_dist / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    rel_large = np.minimum(rel_large, nb - 1)
    rel_buckets = rel_buckets + np.where(rel_pos < max_exact, rel_pos, rel_large)
    return rel_buckets


def rel_pos_bias(
    emb: jax.Array, lq: int, lk: int, num_buckets: int, bidirectional: bool
) -> jax.Array:
    """[1, N, Lq, Lk] additive bias (ref T5RelativeEmbedding.forward)."""
    rel = np.arange(lk)[None, :] - np.arange(lq)[:, None]
    buckets = relative_position_bucket(rel, num_buckets, bidirectional)
    bias = emb[jnp.asarray(buckets)]  # [Lq, Lk, N]
    return jnp.transpose(bias, (2, 0, 1))[None].astype(jnp.float32)


def _attention(
    p: Params, cfg: T5Config, x, context=None, mask=None, pos_bias=None
):
    """Unscaled T5 attention with additive bias (ref T5Attention.forward,
    t5.py:86-120)."""
    context = x if context is None else context
    b = x.shape[0]
    n, c = cfg.num_heads, cfg.head_dim
    dtype = cfg.dtype

    def lin(name, v):
        return jnp.dot(v.astype(dtype), p[name]["w"].astype(dtype),
                       preferred_element_type=jnp.float32)

    q = lin("q", x).reshape(b, -1, n, c)
    k = lin("k", context).reshape(b, -1, n, c)
    v = lin("v", context).reshape(b, -1, n, c)

    attn = jnp.einsum("binc,bjnc->bnij", q, k, preferred_element_type=jnp.float32)
    if pos_bias is not None:
        attn = attn + pos_bias
    if mask is not None:
        if mask.ndim == 2:
            m = mask[:, None, None, :]
        else:
            m = mask[:, None, :, :]
        attn = jnp.where(m == 0, jnp.finfo(jnp.float32).min, attn)
    attn = jax.nn.softmax(attn, axis=-1)
    y = jnp.einsum("bnij,bjnc->binc", attn.astype(dtype), v.astype(dtype))
    y = y.reshape(b, -1, n * c)
    return jnp.dot(y, p["o"]["w"].astype(dtype), preferred_element_type=jnp.float32)


def _ffn(p: Params, cfg: T5Config, x):
    """Gated-GELU FFN (ref T5FeedForward, t5.py:123-141)."""
    dtype = cfg.dtype
    xd = x.astype(dtype)
    gate = t5_gelu(jnp.dot(xd, p["gate"]["0"]["w"].astype(dtype),
                           preferred_element_type=jnp.float32))
    h = jnp.dot(xd, p["fc1"]["w"].astype(dtype),
                preferred_element_type=jnp.float32)
    h = (h * gate).astype(dtype)
    return jnp.dot(h, p["fc2"]["w"].astype(dtype),
                   preferred_element_type=jnp.float32)


def decoder_forward(
    params: Params,
    cfg: T5Config,
    ids: jax.Array,
    mask: Optional[jax.Array] = None,
    encoder_states: Optional[jax.Array] = None,
    encoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """ref T5Decoder.forward (t5.py:350-369): causal self-attention with
    unidirectional relative-position bias, cross-attention over encoder
    states, gated-GELU FFN. ids: [B, S] → [B, S, dim].

    Unused by every Wan pipeline (the DiT consumes encoder states only) —
    implemented for full T5Model surface parity; no pretrained decoder
    checkpoint ships with Wan2.1."""
    b, s = ids.shape
    x = params["token_embedding"][ids].astype(jnp.float32)

    causal = np.tril(np.ones((s, s), np.float32))
    if mask is None:
        m3 = jnp.asarray(causal)[None]  # [1, S, S]
    else:
        # 2-D key mask ∧ causal (ref :355-358)
        m3 = jnp.asarray(causal)[None] * mask.astype(jnp.float32)[:, None, :]

    shared_bias = None
    if cfg.shared_pos:
        shared_bias = rel_pos_bias(
            params["pos_embedding"]["embedding"], s, s, cfg.num_buckets, False
        )
    for i in range(cfg.decoder_layers):
        bp = params["blocks"][i]
        bias = shared_bias if cfg.shared_pos else rel_pos_bias(
            bp["pos_embedding"]["embedding"], s, s, cfg.num_buckets, False
        )
        h = t5_layer_norm(x, bp["norm1"]["w"])
        x = x + _attention(bp["self_attn"], cfg, h, mask=m3, pos_bias=bias)
        h = t5_layer_norm(x, bp["norm2"]["w"])
        x = x + _attention(bp["cross_attn"], cfg, h, context=encoder_states,
                           mask=encoder_mask)
        h = t5_layer_norm(x, bp["norm3"]["w"])
        x = x + _ffn(bp["ffn"], cfg, h)
    return t5_layer_norm(x, params["norm"]["w"]).astype(jnp.float32)


def t5_model_forward(
    params: Params,
    cfg: T5Config,
    encoder_ids: jax.Array,
    encoder_mask: Optional[jax.Array],
    decoder_ids: jax.Array,
    decoder_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """ref T5Model.forward (t5.py:407-411): encode → decode → vocab head.
    Returns logits [B, S_dec, vocab]."""
    enc_view = {
        "token_embedding": params["token_embedding"],
        "blocks": params["encoder"]["blocks"],
        "norm": params["encoder"]["norm"],
    }
    dec_view = {
        "token_embedding": params["token_embedding"],
        "blocks": params["decoder"]["blocks"],
        "norm": params["decoder"]["norm"],
    }
    enc = encoder_forward(enc_view, cfg, encoder_ids, encoder_mask)
    dec = decoder_forward(dec_view, cfg, decoder_ids, decoder_mask,
                          encoder_states=enc, encoder_mask=encoder_mask)
    return jnp.dot(dec.astype(cfg.dtype), params["head"]["w"].astype(cfg.dtype),
                   preferred_element_type=jnp.float32)


def encoder_forward(
    params: Params, cfg: T5Config, ids: jax.Array, mask: Optional[jax.Array] = None
) -> jax.Array:
    """ref T5Encoder.forward (t5.py:303-312). ids: [B, L] → [B, L, dim]."""
    x = params["token_embedding"][ids].astype(jnp.float32)
    lq = ids.shape[1]
    shared_bias = None
    if cfg.shared_pos:
        shared_bias = rel_pos_bias(
            params["pos_embedding"]["embedding"], lq, lq, cfg.num_buckets, True
        )
    for i in range(cfg.num_layers):
        bp = params["blocks"][i]
        bias = shared_bias if cfg.shared_pos else rel_pos_bias(
            bp["pos_embedding"]["embedding"], lq, lq, cfg.num_buckets, True
        )
        h = t5_layer_norm(x, bp["norm1"]["w"])
        x = x + _attention(bp["attn"], cfg, h, mask=mask, pos_bias=bias)
        h = t5_layer_norm(x, bp["norm2"]["w"])
        x = x + _ffn(bp["ffn"], cfg, h)
    return t5_layer_norm(x, params["norm"]["w"]).astype(jnp.float32)


def init_t5_params(cfg: T5Config, seed: int = 0, encoder_only: bool = True) -> Params:
    """Random init mirroring t5.py init_weights (:27-43), host-side numpy."""
    rng = np.random.default_rng(seed)
    dtype = cfg.dtype

    def lin(c_in, c_out, std):
        return {"w": jnp.asarray(
            (rng.standard_normal((c_in, c_out)) * std).astype(np.float32), dtype=dtype
        )}

    def block():
        return {
            "norm1": {"w": jnp.ones((cfg.dim,), jnp.float32)},
            "attn": {
                "q": lin(cfg.dim, cfg.dim_attn, (cfg.dim * cfg.dim_attn) ** -0.5),
                "k": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "v": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "o": lin(cfg.dim_attn, cfg.dim, (cfg.num_heads * cfg.head_dim) ** -0.5),
            },
            "norm2": {"w": jnp.ones((cfg.dim,), jnp.float32)},
            "ffn": {
                "gate": {"0": lin(cfg.dim, cfg.dim_ffn, cfg.dim**-0.5)},
                "fc1": lin(cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                "fc2": lin(cfg.dim_ffn, cfg.dim, cfg.dim_ffn**-0.5),
            },
            "pos_embedding": {
                "embedding": jnp.asarray(
                    (rng.standard_normal((cfg.num_buckets, cfg.num_heads))
                     * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5).astype(np.float32)
                )
            },
        }

    def dec_block():
        b = block()
        return {
            "norm1": b["norm1"],
            "self_attn": b["attn"],
            "norm2": {"w": jnp.ones((cfg.dim,), jnp.float32)},
            "cross_attn": {
                "q": lin(cfg.dim, cfg.dim_attn, (cfg.dim * cfg.dim_attn) ** -0.5),
                "k": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "v": lin(cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                "o": lin(cfg.dim_attn, cfg.dim,
                         (cfg.num_heads * cfg.head_dim) ** -0.5),
            },
            "norm3": b["norm2"],
            "ffn": b["ffn"],
            "pos_embedding": {
                "embedding": jnp.asarray(
                    (rng.standard_normal((cfg.num_buckets, cfg.num_heads))
                     * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5).astype(np.float32)
                )
            },
        }

    token_embedding = jnp.asarray(
        rng.standard_normal((cfg.vocab_size, cfg.dim)).astype(np.float32),
        dtype=dtype,
    )
    if encoder_only:
        return {
            "token_embedding": token_embedding,
            "blocks": [block() for _ in range(cfg.num_layers)],
            "norm": {"w": jnp.ones((cfg.dim,), jnp.float32)},
        }
    # full T5Model: shared token embedding, encoder + decoder stacks,
    # vocab head (ref T5Model, t5.py:372-411)
    return {
        "token_embedding": token_embedding,
        "encoder": {
            "blocks": [block() for _ in range(cfg.num_layers)],
            "norm": {"w": jnp.ones((cfg.dim,), jnp.float32)},
        },
        "decoder": {
            "blocks": [dec_block() for _ in range(cfg.decoder_layers)],
            "norm": {"w": jnp.ones((cfg.dim,), jnp.float32)},
        },
        "head": {"w": jnp.asarray(
            (rng.standard_normal((cfg.dim, cfg.vocab_size))
             * cfg.dim**-0.5).astype(np.float32), dtype=dtype)},
    }


def init_t5_params_on_device(cfg: T5Config, seed: int = 0) -> Params:
    """Encoder-only random init generated ON the accelerator.

    Same structure/stds as ``init_t5_params`` (ref t5.py init_weights
    :27-43) but built by one jitted program of ``seed`` — the host-numpy
    init moves ~11 GiB for umT5-XXL over the host link (~16 min on a
    tunneled chip) while this lands in seconds. Draws differ from the
    numpy RNG; use for benches/probes, not for pinned-value tests.
    """
    dtype = cfg.dtype

    def build(key):
        def lin(k, c_in, c_out, std):
            return {"w": (jax.random.normal(k, (c_in, c_out), jnp.float32)
                          * std).astype(dtype)}

        def block(k):
            ks = jax.random.split(k, 8)
            return {
                "norm1": {"w": jnp.ones((cfg.dim,), jnp.float32)},
                "attn": {
                    "q": lin(ks[0], cfg.dim, cfg.dim_attn,
                             (cfg.dim * cfg.dim_attn) ** -0.5),
                    "k": lin(ks[1], cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                    "v": lin(ks[2], cfg.dim, cfg.dim_attn, cfg.dim**-0.5),
                    "o": lin(ks[3], cfg.dim_attn, cfg.dim,
                             (cfg.num_heads * cfg.head_dim) ** -0.5),
                },
                "norm2": {"w": jnp.ones((cfg.dim,), jnp.float32)},
                "ffn": {
                    "gate": {"0": lin(ks[4], cfg.dim, cfg.dim_ffn,
                                      cfg.dim**-0.5)},
                    "fc1": lin(ks[5], cfg.dim, cfg.dim_ffn, cfg.dim**-0.5),
                    "fc2": lin(ks[6], cfg.dim_ffn, cfg.dim, cfg.dim_ffn**-0.5),
                },
                "pos_embedding": {"embedding": jax.random.normal(
                    ks[7], (cfg.num_buckets, cfg.num_heads), jnp.float32)
                    * (2 * cfg.num_buckets * cfg.num_heads) ** -0.5},
            }

        keys = jax.random.split(key, cfg.num_layers + 1)
        return {
            "token_embedding": jax.random.normal(
                keys[0], (cfg.vocab_size, cfg.dim), jnp.float32).astype(dtype),
            "blocks": [block(keys[i + 1]) for i in range(cfg.num_layers)],
            "norm": {"w": jnp.ones((cfg.dim,), jnp.float32)},
        }

    return jax.jit(build)(jax.random.PRNGKey(seed))


def convert_t5_state_dict(sd: Dict[str, Any], dtype=jnp.bfloat16) -> Params:
    """Reference models_t5_umt5-xxl-enc-bf16.pth state dict → pytree."""
    import re as _re

    def to_np(t):
        if hasattr(t, "float"):
            t = t.float().numpy()
        return np.asarray(t)

    params: Params = {"blocks": []}

    def ensure_block(i):
        while len(params["blocks"]) <= i:
            params["blocks"].append({})
        return params["blocks"][i]

    for key, val in sd.items():
        v = to_np(val)
        m = _re.match(r"blocks\.(\d+)\.(.+)", key)
        if key == "token_embedding.weight":
            params["token_embedding"] = jnp.asarray(v, dtype=dtype)
        elif key == "norm.weight":
            params["norm"] = {"w": jnp.asarray(v, dtype=jnp.float32)}
        elif key == "pos_embedding.embedding.weight":
            params["pos_embedding"] = {"embedding": jnp.asarray(v, jnp.float32)}
        elif m:
            blk = ensure_block(int(m.group(1)))
            sub = m.group(2)
            if sub in ("norm1.weight", "norm2.weight"):
                blk[sub.split(".")[0]] = {"w": jnp.asarray(v, jnp.float32)}
            elif sub.startswith("attn."):
                _, leaf, _ = sub.split(".")
                blk.setdefault("attn", {})[leaf] = {"w": jnp.asarray(v.T, dtype=dtype)}
            elif sub == "pos_embedding.embedding.weight":
                blk["pos_embedding"] = {"embedding": jnp.asarray(v, jnp.float32)}
            elif sub == "ffn.gate.0.weight":
                blk.setdefault("ffn", {}).setdefault("gate", {})["0"] = {
                    "w": jnp.asarray(v.T, dtype=dtype)
                }
            elif sub in ("ffn.fc1.weight", "ffn.fc2.weight"):
                leaf = sub.split(".")[1]
                blk.setdefault("ffn", {})[leaf] = {"w": jnp.asarray(v.T, dtype=dtype)}
            else:
                raise KeyError(f"unexpected T5 key {key}")
        else:
            raise KeyError(f"unexpected T5 key {key}")
    return params


class T5EncoderModel:
    """ref T5EncoderModel (t5.py:472-513): tokenize, encode, zero-pad to
    text_len. Returns [B, text_len, dim] float32 (the DiT consumes fixed
    shapes; the reference trims per-sample then re-pads in the DiT,
    model.py:600-605 — net effect identical)."""

    def __init__(self, text_len: int, checkpoint_path: Optional[str] = None,
                 tokenizer_path: str = "google/umt5-xxl",
                 cfg: T5Config = UMT5_XXL, seed: int = 0, mesh=None):
        self.text_len = text_len
        self.cfg = cfg
        if checkpoint_path:
            import torch

            sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
            self.params = convert_t5_state_dict(sd, dtype=cfg.dtype)
        else:
            self.params = init_t5_params(cfg, seed=seed)
        if mesh is not None:
            # FSDP-style weight sharding (the reference t5_fsdp flag)
            from wanq_tpu.parallel import shard_t5_params

            self.params = shard_t5_params(self.params, mesh)
        from wanq_tpu.models.tokenizers import HuggingfaceTokenizer

        self.tokenizer = HuggingfaceTokenizer(
            name=tokenizer_path, seq_len=text_len, clean="whitespace"
        )
        self._fwd = jax.jit(
            lambda p, ids, mask: encoder_forward(p, cfg, ids, mask)
        )

    def __call__(self, texts):
        ids, mask = self.tokenizer(texts, return_mask=True, add_special_tokens=True)
        ids = jnp.asarray(np.asarray(ids))
        mask = jnp.asarray(np.asarray(mask))
        context = self._fwd(self.params, ids, mask)
        # zero out padding positions (ref trims to seq_lens, t5.py:512-513)
        return context * mask[:, :, None].astype(context.dtype)


def encode_prompts(ckpt_dir: str, wan_cfg, prompts, neg_prompts, mesh=None,
                   on_cpu: bool = False):
    """CLI hook: T5-encode positive/negative prompts from a Wan checkpoint
    dir (ref text2video.py:180-190). Returns two [B, text_len, dim] arrays.
    ``on_cpu`` pins params and compute to host CPU — the reference's
    --t5_cpu, freeing accelerator HBM for the DiT (fp_generate.py:107)."""
    import os

    import jax

    def build_and_run():
        enc = T5EncoderModel(
            wan_cfg.text_len,
            checkpoint_path=os.path.join(ckpt_dir, wan_cfg.t5_checkpoint),
            tokenizer_path=wan_cfg.t5_tokenizer,
            mesh=mesh,
        )
        return np.asarray(enc(prompts)), np.asarray(enc(neg_prompts))

    if on_cpu:
        with jax.default_device(jax.devices("cpu")[0]):
            return build_and_run()
    return build_and_run()
