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


# ---------------------------------------------------------------------------
# QLoRA: adapters riding the quant-state pytree over a FROZEN quantized base
# ---------------------------------------------------------------------------


def _qlora_setup(rng, targets=r"self_attn\.(q|k|v)|ffn\.0"):
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg, params, names = _setup()
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": (
            r"text_embedding|time_embedding|time_projection|head\.head|"
            r"self_attn\.o|cross_attn|ffn\.2"
        ),
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    pol, state, rot = prepare_quant_state(params, names, qcfg)
    qctx = QuantCtx(mode="sim", policies=pol, state=state, rotations=rot)
    lora = init_lora(params, names, rank=4, seed=3, targets=targets)
    return cfg, params, names, qctx, lora


def test_qlora_zero_init_is_identity_and_merge_math(rng):
    """Zero-init adapters leave the quantized forward unchanged; a nonzero
    adapter adds exactly (x @ a) @ b·scale on the RAW input (before any
    channel mask / rotation)."""
    from wanq_tpu.quant.qlinear import qlinear
    from wanq_tpu.training.lora import merge_lora_into_quant_state

    cfg, params, names, qctx, lora = _qlora_setup(rng)
    name = "blocks.0.self_attn.q"
    x = jnp.asarray(rng.normal(size=(1, 12, cfg.dim)).astype(np.float32))
    p = params["blocks"][0]["self_attn"]["q"]

    base = qlinear(qctx, name, p, x)
    qctx0 = _ctx_with_state(qctx, merge_lora_into_quant_state(qctx.state, lora))
    np.testing.assert_allclose(
        np.asarray(qlinear(qctx0, name, p, x)), np.asarray(base), atol=1e-6
    )

    lora[name]["b"] = jnp.asarray(
        rng.normal(size=lora[name]["b"].shape).astype(np.float32)
    )
    qctx1 = _ctx_with_state(qctx, merge_lora_into_quant_state(qctx.state, lora))
    got = np.asarray(qlinear(qctx1, name, p, x))
    scale = float(lora["__scale__"])
    want = np.asarray(base) + (
        np.asarray(x) @ np.asarray(lora[name]["a"])
    ) @ np.asarray(lora[name]["b"]) * scale
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _ctx_with_state(qctx, state):
    from wanq_tpu.quant.qlinear import QuantCtx

    new = QuantCtx(mode=qctx.mode, policies=qctx.policies, state=state,
                   rotations=qctx.rotations)
    new.scan_state = qctx.scan_state
    new.attn_perms = qctx.attn_perms
    return new


def test_qlora_grads_reach_every_adapter(rng):
    """STE through the sim quant path: d loss / d lora is nonzero for the
    b of every adapted layer in the full quantized DiT forward."""
    from wanq_tpu.training.lora import merge_lora_into_quant_state

    cfg, params, names, qctx, lora = _qlora_setup(rng)
    # one gradient step off zero-init so a-grads are live too
    for k in lora:
        if k != "__scale__":
            lora[k]["b"] = 0.01 * jnp.asarray(
                rng.normal(size=lora[k]["b"].shape).astype(np.float32)
            )
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )

    def loss(lo):
        ctx2 = _ctx_with_state(
            qctx, merge_lora_into_quant_state(qctx.state, lo)
        )
        out = dit_forward(params, cfg, x, t, txt, 32, ctx=ctx2, training=True)
        return jnp.mean(out**2)

    grads = jax.grad(loss)(lora)
    for k, g in grads.items():
        if k == "__scale__":
            continue
        assert float(jnp.max(jnp.abs(g["a"]))) > 0, f"dead a-grad at {k}"
        assert float(jnp.max(jnp.abs(g["b"]))) > 0, f"dead b-grad at {k}"


def test_qlora_scan_matches_unrolled(rng):
    """merge_lora_into_scan_ctx (adapters stacked to scan xs) produces the
    same forward as the unrolled merged state."""
    from wanq_tpu.models.dit import make_scan_ctx, stack_block_params
    from wanq_tpu.training.lora import (
        merge_lora_into_quant_state,
        merge_lora_into_scan_ctx,
    )

    cfg, params, names, qctx, lora = _qlora_setup(rng)
    for k in lora:
        if k != "__scale__":
            lora[k]["b"] = 0.1 * jnp.asarray(
                rng.normal(size=lora[k]["b"].shape).astype(np.float32)
            )
    x = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    ctx_u = _ctx_with_state(qctx, merge_lora_into_quant_state(qctx.state, lora))
    out_u = dit_forward(params, cfg, x, t, txt, 32, ctx=ctx_u)

    sctx = make_scan_ctx(qctx, cfg.num_layers)
    sctx_l = merge_lora_into_scan_ctx(sctx, lora, cfg.num_layers)
    out_s = dit_forward(
        stack_block_params(params), cfg, x, t, txt, 32, ctx=sctx_l
    )
    np.testing.assert_allclose(
        np.asarray(out_s), np.asarray(out_u), rtol=2e-4, atol=2e-5
    )


def test_qlora_distill_step_trains(rng):
    """make_qlora_distill_step: loss is finite, adapters move, base params
    and quant state stay frozen, and a few steps reduce the loss."""
    import optax

    from wanq_tpu.training import DistillConfig, make_qlora_distill_step

    cfg, params, names, qctx, lora = _qlora_setup(rng)
    dcfg = DistillConfig(seq_len=32, remat=False)
    tx = optax.adamw(1e-3)
    step = make_qlora_distill_step(cfg, dcfg, tx)
    opt_state = tx.init(lora)
    ema = jax.tree.map(lambda x: x, lora)

    x0 = jnp.asarray(rng.normal(size=(1, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    noise = jnp.asarray(rng.normal(size=x0.shape).astype(np.float32))
    t = jnp.asarray([500.0])
    txt = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    null = jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    g = jnp.float32(3.0)

    w_q_before = np.asarray(qctx.state["blocks.0.ffn.0"]["w_q"]).copy()
    losses = []
    for _ in range(5):
        lora, ema, opt_state, loss, gnorm = step(
            lora, ema, opt_state, params, qctx, x0, noise, t, txt, null, g
        )
        losses.append(float(loss))
        assert np.isfinite(losses[-1]) and float(gnorm) > 0
    assert losses[-1] < losses[0], losses
    # the quantized base never moves
    np.testing.assert_array_equal(
        np.asarray(qctx.state["blocks.0.ffn.0"]["w_q"]), w_q_before
    )


def test_qlora_blocks_fused_paths(rng):
    """int8 fused fast paths must refuse sites that carry adapters (they
    would silently drop them)."""
    from wanq_tpu.quant.qlinear import int8_fusable
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx
    from wanq_tpu.training.lora import merge_lora_into_quant_state

    cfg, params, names = _setup()
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    pol, state, rot = prepare_quant_state(params, names, qcfg, targets="int8")
    qctx = QuantCtx(mode="int8", policies=pol, state=state, rotations=rot)
    sites = [f"blocks.0.self_attn.{s}" for s in ("q", "k", "v")]
    assert int8_fusable(qctx, sites)
    lora = init_lora(params, names, rank=4, targets=r"blocks\.0\.self_attn\.q$")
    qctx2 = _ctx_with_state(qctx, merge_lora_into_quant_state(qctx.state, lora))
    assert not int8_fusable(qctx2, sites)


def test_int8_path_ste_gradients_match_sim(rng):
    """The int8 hardware path is now trainable-through: its STE backward
    (g @ dequant(W)^T) matches the sim path's input gradient, and QLoRA
    adapters train against the REAL int8 kernels with int-at-rest base
    weights."""
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state
    from wanq_tpu.quant.qlinear import QuantCtx, qlinear
    from wanq_tpu.training.lora import merge_lora_into_quant_state

    cfg, params, names = _setup()
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": (
            r"text_embedding|time_embedding|time_projection|head\.head|"
            r"self_attn\.(k|v|o)|cross_attn|ffn"
        ),
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    pol, state, rot = prepare_quant_state(params, names, qcfg, targets="both")
    name = "blocks.0.self_attn.q"
    p = params["blocks"][0]["self_attn"]["q"]
    x = jnp.asarray(rng.normal(size=(1, 12, cfg.dim)).astype(np.float32))

    def out_sum(mode, xin):
        ctx = QuantCtx(mode=mode, policies=pol, state=state, rotations=rot,
                       trainable=(mode == "int8"))
        return jnp.sum(qlinear(ctx, name, p, xin) ** 2)

    g_sim = jax.grad(lambda xx: out_sum("sim", xx))(x)
    g_int = jax.grad(lambda xx: out_sum("int8", xx))(x)
    # forward parity: the trainable dequant route computes the kernel's
    # math with plain GEMMs
    f_int = float(out_sum("int8", x))
    ctx_hw = QuantCtx(mode="int8", policies=pol, state=state, rotations=rot)
    f_hw = float(jnp.sum(qlinear(ctx_hw, name, p, x) ** 2))
    assert abs(f_int - f_hw) / abs(f_hw) < 5e-2, (f_int, f_hw)
    # same STE rule up to the sim path's extra delta(absmax) terms and the
    # int kernel's own rounding — direction and magnitude must agree
    cos = float(
        jnp.sum(g_sim * g_int)
        / (jnp.linalg.norm(g_sim) * jnp.linalg.norm(g_int))
    )
    assert cos > 0.99, cos

    # adapter gradients flow through the int8 kernels
    lora = init_lora(params, names, rank=4, seed=5,
                     targets=r"blocks\.0\.self_attn\.q$")
    lora[name]["b"] = 0.01 * jnp.asarray(
        rng.normal(size=lora[name]["b"].shape).astype(np.float32)
    )

    def loss(lo):
        ctx = QuantCtx(mode="int8", policies=pol,
                       state=merge_lora_into_quant_state(state, lo),
                       rotations=rot, trainable=True)
        return jnp.sum(qlinear(ctx, name, p, x) ** 2)

    grads = jax.grad(loss)(lora)
    assert float(jnp.max(jnp.abs(grads[name]["a"]))) > 0
    assert float(jnp.max(jnp.abs(grads[name]["b"]))) > 0


@pytest.mark.mesh
@pytest.mark.slow
def test_qlora_grads_on_mesh_match_single_device(rng):
    """QLoRA under GSPMD: int8 trainable forward + adapter gradients on
    the 8-virtual-device mesh match single-device — the pod-scale
    fine-tuning path (sharded int base, replicated adapters)."""
    from wanq_tpu.models.dit import make_scan_ctx, stack_block_params
    from wanq_tpu.parallel import ShardingPlan, make_mesh, shard_params
    from wanq_tpu.quant import QuantConfig
    from wanq_tpu.quant.ptq import prepare_quant_state, shard_scan_ctx
    from wanq_tpu.quant.qlinear import QuantCtx
    from wanq_tpu.training.lora import merge_lora_into_scan_ctx

    from wanq_tpu.configs import tiny_config
    from wanq_tpu.models.dit import dit_forward, init_params, linear_layer_names
    from tests.conftest import randomize_head

    cfg = tiny_config(num_heads=8, dim=96)
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    names = linear_layer_names(cfg)
    qcfg = QuantConfig.from_dict({
        "remain_fp_regex": r"text_embedding|time_embedding|time_projection|head\.head",
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
    })
    pol, state, rot = prepare_quant_state(params, names, qcfg, targets="int8")
    base = QuantCtx(mode="int8", policies=pol, state=state, rotations=rot,
                    trainable=True)
    sctx = make_scan_ctx(base, cfg.num_layers)
    lora = init_lora(params, names, rank=4, seed=9,
                     targets=r"self_attn\.(q|v)|ffn\.0")
    for k in lora:
        if k != "__scale__":
            lora[k]["b"] = 0.05 * jnp.asarray(
                np.random.default_rng(4).normal(
                    size=lora[k]["b"].shape
                ).astype(np.float32)
            )
    stacked = stack_block_params(params)
    x = jnp.asarray(rng.normal(size=(2, cfg.in_dim, 2, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0, 500.0])
    txt = jnp.asarray(
        rng.normal(size=(2, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )

    def make_loss(plan):
        def loss(lo, p, qctx):
            ctx2 = merge_lora_into_scan_ctx(qctx, lo, cfg.num_layers)
            out = dit_forward(p, cfg, x, t, txt, 32, ctx=ctx2, plan=plan,
                              training=True)
            return jnp.mean(out**2)
        return loss

    l_host, g_host = jax.value_and_grad(make_loss(None))(lora, stacked, sctx)

    mesh = make_mesh(1, 2, 2, 2)
    plan = ShardingPlan(mesh)
    sp = shard_params(stacked, mesh)
    mctx = shard_scan_ctx(sctx, mesh)
    l_mesh, g_mesh = jax.jit(jax.value_and_grad(make_loss(plan)))(lora, sp, mctx)

    np.testing.assert_allclose(float(l_mesh), float(l_host), rtol=2e-4)
    for k in g_host:
        if k == "__scale__":
            continue
        np.testing.assert_allclose(
            np.asarray(g_mesh[k]["b"]), np.asarray(g_host[k]["b"]),
            rtol=5e-3, atol=1e-6,
        )
