"""Multi-device GSPMD tests on the 8-virtual-CPU mesh — validating what the
reference could only test on real GPUs (SURVEY.md §2.5, §4): FSDP weight
sharding, Ulysses sequence parallelism, and dp/fsdp/sp combinations, with
output parity against the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import dit_forward, init_params
from wanq_tpu.parallel import ShardingPlan, make_mesh, shard_params
from wanq_tpu.pipelines.text2video import WanT2V

pytestmark = [pytest.mark.mesh, pytest.mark.slow]


@pytest.fixture(scope="module")
def tiny():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


@pytest.fixture(scope="module")
def inputs(tiny):
    cfg, _ = tiny
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(2, cfg.in_dim, 4, 8, 8)).astype(np.float32))
    t = jnp.asarray([500.0, 500.0])
    txt = jnp.asarray(
        rng.normal(size=(2, cfg.text_len, cfg.text_dim)).astype(np.float32)
    )
    return x, t, txt


def _run(cfg, params, inputs, mesh_dims=None, full_shard=False):
    x, t, txt = inputs
    seq_len = 4 * 4 * 4
    if mesh_dims is None:
        return dit_forward(params, cfg, x, t, txt, seq_len)
    mesh = make_mesh(*mesh_dims)
    plan = ShardingPlan(mesh)
    sharded = shard_params(params, mesh, full_shard)
    fwd = jax.jit(
        lambda p, x, t, c: dit_forward(p, cfg, x, t, c, seq_len, plan=plan)
    )
    return fwd(sharded, x, t, txt)


def test_eight_devices_available():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize(
    "dims", [(1, 1, 8), (1, 8, 1), (2, 1, 4), (2, 2, 2), (1, 2, 4)],
    ids=["sp8", "fsdp8", "dp2sp4", "dp2fsdp2sp2", "fsdp2sp4"],
)
def test_sharded_forward_matches_single_device(tiny, inputs, dims):
    cfg, params = tiny
    ref = np.asarray(_run(cfg, params, inputs))
    got = np.asarray(_run(cfg, params, inputs, dims))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize(
    "dims", [(1, 1, 1, 8), (1, 1, 2, 2), (1, 2, 2, 2), (2, 1, 2, 2)],
    ids=["ring8", "sp2ring2", "fsdp2sp2ring2", "dp2sp2ring2"],
)
def test_ring_forward_matches_single_device(tiny, inputs, dims):
    """Hybrid Ulysses×ring context parallelism through the full DiT
    (ref xdit_context_parallel.py:179-184; VERDICT round-1 missing #3)."""
    cfg, params = tiny
    ref = np.asarray(_run(cfg, params, inputs))
    got = np.asarray(_run(cfg, params, inputs, dims))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_param_sharding_actually_shards(tiny):
    cfg, params = tiny
    mesh = make_mesh(1, 8, 1)
    sharded = shard_params(params, mesh)
    w = sharded["blocks"][0]["self_attn"]["q"]["w"]
    # output dim split over 8 devices
    shard_shapes = {s.data.shape for s in w.addressable_shards}
    assert shard_shapes == {(cfg.dim, cfg.dim // 8)}


def test_full_shard_stores_over_all_non_dp_axes(tiny):
    """--full_shard: weight storage over fsdp×sp×ring (the reference's
    dit_fsdp-on-all-8-ranks layout, fsdp.py:10-33 + ulysses_size 8)."""
    cfg, params = tiny
    mesh = make_mesh(1, 2, 2, 2)
    sharded = shard_params(params, mesh, full_shard=True)
    w = sharded["blocks"][0]["self_attn"]["q"]["w"]
    assert {s.data.shape for s in w.addressable_shards} == {
        (cfg.dim, cfg.dim // 8)
    }
    # fsdp-only storage on the same mesh keeps 4x more per device
    base = shard_params(params, mesh)
    wb = base["blocks"][0]["self_attn"]["q"]["w"]
    assert {s.data.shape for s in wb.addressable_shards} == {
        (cfg.dim, cfg.dim // 2)
    }


def test_full_shard_forward_matches_single_device(tiny, inputs):
    cfg, params = tiny
    ref = np.asarray(_run(cfg, params, inputs))
    got = np.asarray(_run(cfg, params, inputs, (1, 2, 2, 2), full_shard=True))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-3)


def test_ulysses_pipeline_generate(tiny):
    """Full pipeline with sp sharding: parity with single-device latents."""
    cfg, params = tiny
    rng = np.random.default_rng(2)
    ctx = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    ctx_null = jnp.asarray(rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))

    single = WanT2V(cfg, params).generate(
        ctx, ctx_null, size=(32, 32), frame_num=5, sampling_steps=2, seed=11
    )
    mesh = make_mesh(1, 1, 8)
    pipe = WanT2V(
        cfg, shard_params(params, mesh), sp_size=8, mesh=mesh,
        shardings=ShardingPlan(mesh),
    )
    multi = pipe.generate(
        ctx, ctx_null, size=(32, 32), frame_num=5, sampling_steps=2, seed=11
    )
    np.testing.assert_allclose(
        np.asarray(multi), np.asarray(single), atol=2e-4, rtol=1e-3
    )


def test_t5_sharding(tiny):
    from wanq_tpu.models.t5 import encoder_forward, init_t5_params, tiny_t5_config
    from wanq_tpu.parallel import shard_t5_params

    tcfg = tiny_t5_config()
    tparams = init_t5_params(tcfg, seed=0)
    ref = encoder_forward(tparams, tcfg, jnp.arange(24).reshape(2, 12) % tcfg.vocab_size, None)
    mesh = make_mesh(1, 8, 1)
    sharded = shard_t5_params(tparams, mesh)
    emb = sharded["token_embedding"]
    assert {s.data.shape for s in emb.addressable_shards} == {(tcfg.vocab_size // 8, tcfg.dim)}
    got = encoder_forward(sharded, tcfg, jnp.arange(24).reshape(2, 12) % tcfg.vocab_size, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4, rtol=1e-3)
