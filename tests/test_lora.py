"""LoRA adapter tests: zero-init identity, merge correctness, artifact
roundtrip, and gradient flow through only the adapters."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import dit_forward, init_params, linear_layer_names
from wanq_tpu.training.lora import (
    apply_lora,
    init_lora,
    load_lora,
    lora_layer_names,
    save_lora,
)


def _setup():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    names = linear_layer_names(cfg)
    return cfg, params, names


def test_zero_init_is_identity(rng):
    cfg, params, names = _setup()
    lora = init_lora(params, names, rank=4)
    merged = apply_lora(params, lora)
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    o1 = dit_forward(params, cfg, x, t, txt, 32)
    o2 = dit_forward(merged, cfg, x, t, txt, 32)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
    # base params untouched
    assert params["blocks"][0]["self_attn"]["q"]["w"] is not merged["blocks"][0]["self_attn"]["q"]["w"]


def test_merge_math(rng):
    cfg, params, names = _setup()
    lora = init_lora(params, names, rank=4, seed=1)
    name = "blocks.0.self_attn.q"
    lora[name]["b"] = jnp.asarray(rng.normal(size=lora[name]["b"].shape).astype(np.float32))
    merged = apply_lora(params, lora)
    w0 = np.asarray(params["blocks"][0]["self_attn"]["q"]["w"], dtype=np.float32)
    wm = np.asarray(merged["blocks"][0]["self_attn"]["q"]["w"], dtype=np.float32)
    delta = np.asarray(lora[name]["a"]) @ np.asarray(lora[name]["b"])
    np.testing.assert_allclose(wm - w0, delta, atol=1e-5)
    # non-target layers untouched
    np.testing.assert_array_equal(
        np.asarray(merged["text_embedding"]["0"]["w"]),
        np.asarray(params["text_embedding"]["0"]["w"]),
    )


@pytest.mark.slow
def test_lora_grads_only_through_adapters(rng):
    cfg, params, names = _setup()
    lora = init_lora(params, names, rank=2)
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))

    def loss(lora_tree):
        out = dit_forward(apply_lora(params, lora_tree), cfg, x, t, txt, 32)
        return jnp.mean(jnp.square(out))

    grads = jax.grad(loss)(lora)
    ga = np.asarray(grads["blocks.0.self_attn.q"]["a"])
    gb = np.asarray(grads["blocks.0.self_attn.q"]["b"])
    # with b=0, dL/da is 0 but dL/db is not
    assert np.allclose(ga, 0)
    assert not np.allclose(gb, 0)


def test_lora_roundtrip(tmp_path):
    cfg, params, names = _setup()
    lora = init_lora(params, names, rank=4, seed=3)
    p = save_lora(str(tmp_path / "lora.npz"), lora)
    back = load_lora(p)
    assert set(back) == set(lora)
    np.testing.assert_array_equal(
        np.asarray(back["blocks.0.ffn.0"]["a"]),
        np.asarray(lora["blocks.0.ffn.0"]["a"]),
    )


def test_lora_layer_selection():
    cfg, params, names = _setup()
    sel = lora_layer_names(names, r"self_attn\.q")
    assert all("self_attn.q" in n for n in sel)
    assert len(sel) == cfg.num_layers

def test_lora_checkpoint_roundtrip(tmp_path):
    """save_lora_checkpoint / resume_lora_checkpoint (ref wan/checkpoint.py
    :248-302): adapters + optimizer state + config metadata."""
    import optax

    from wanq_tpu.training.lora import (
        resume_lora_checkpoint,
        save_lora_checkpoint,
    )

    cfg, params, names = _setup()
    lora = init_lora(params, names, rank=4, alpha=8.0, seed=3)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(lora)
    # advance the optimizer once so its state is non-trivial
    grads = jax.tree.map(jnp.ones_like, lora)
    updates, opt_state = tx.update(grads, opt_state, lora)
    lora = optax.apply_updates(lora, updates)

    d = save_lora_checkpoint(str(tmp_path), 17, lora, opt_state,
                             rank=4, alpha=8.0)
    assert d.endswith("lora-checkpoint-17")
    back, opt_back, step, meta = resume_lora_checkpoint(
        d, opt_state_target=tx.init(lora))
    assert step == 17
    assert meta["lora_params"]["lora_rank"] == 4
    assert meta["lora_params"]["lora_alpha"] == 8.0
    np.testing.assert_array_equal(
        np.asarray(back["blocks.0.ffn.0"]["a"]),
        np.asarray(lora["blocks.0.ffn.0"]["a"]))
    got_mu = jax.tree.leaves(opt_back)
    want_mu = jax.tree.leaves(opt_state)
    assert len(got_mu) == len(want_mu)
    for g, w in zip(got_mu, want_mu):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w))
