"""StepCachePolicy: CFG-cache + step-reuse denoise schedules.

Beyond-reference capability (the reference always runs two full DiT
forwards per step, text2video.py:255-261); fidelity is measured on-chip
by tools/cache_probe.py — these tests pin the schedule mechanics and
exact-parity guarantees on the tiny model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wanq_tpu.configs import tiny_config
from wanq_tpu.models.dit import init_params
from wanq_tpu.pipelines.text2video import StepCachePolicy, WanT2V
from wanq_tpu.utils.metrics import latent_psnr


@pytest.fixture(scope="module")
def tiny():
    from tests.conftest import randomize_head

    cfg = tiny_config()
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    return cfg, params


@pytest.fixture(scope="module")
def contexts(tiny):
    cfg, _ = tiny
    rng = np.random.default_rng(1)
    mk = lambda s: jnp.asarray(
        rng.normal(size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    return mk(2), mk(3)


GEN_KW = dict(size=(64, 64), frame_num=5, sampling_steps=8, seed=11)


def test_plan_shapes_and_protected_windows():
    p = StepCachePolicy(cfg_interval=2, reuse_interval=1, warmup=2, tail=2)
    acts = p.plan(10)
    assert len(acts) == 10
    assert acts[:2] == ["full", "full"] and acts[-2:] == ["full", "full"]
    # inside the window: full on even offsets, cond on odd
    assert acts[2:8] == ["full", "cond", "full", "cond", "full", "cond"]

    p2 = StepCachePolicy(cfg_interval=1, reuse_interval=3, warmup=1, tail=1)
    acts2 = p2.plan(8)
    assert acts2 == ["full", "full", "reuse", "reuse",
                     "full", "reuse", "reuse", "full"]

    # reuse takes precedence; the cfg cycle advances over MODEL-EVAL steps
    # so the two mechanisms interleave instead of collapsing
    p3 = StepCachePolicy(cfg_interval=2, reuse_interval=2, warmup=1, tail=1)
    assert p3.plan(6) == ["full", "cond", "reuse", "full", "reuse", "full"]
    p4 = StepCachePolicy(cfg_interval=2, reuse_interval=2, warmup=2, tail=2)
    acts4 = p4.plan(10)
    assert acts4 == ["full", "full", "full", "reuse", "cond", "reuse",
                     "full", "reuse", "full", "full"]


def test_inactive_policy_is_exact_parity(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    cached = np.asarray(pipe.generate(
        c, cn, cache_policy=StepCachePolicy(), **GEN_KW))
    np.testing.assert_array_equal(base, cached)
    assert pipe.last_cache_stats is None or True  # inactive path skips loop


def test_all_full_schedule_matches_baseline(tiny, contexts):
    """A policy whose plan degenerates to all-'full' must reproduce the
    uncached trajectory bit-for-bit (split-fn path vs combined-fn path)."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    # warmup covers the whole trajectory -> every step 'full'
    pol = StepCachePolicy(cfg_interval=2, warmup=100, tail=0)
    cached = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    assert pipe.last_cache_stats == {"full": 8, "cond": 0, "reuse": 0}
    assert latent_psnr(base, cached) > 60.0, "split/combined step fns diverge"


def test_cfg_cache_counts_and_fidelity(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    pol = StepCachePolicy(cfg_interval=2, warmup=2, tail=2)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    # 8 steps: 2 warmup + 2 tail full; offsets 0..3 -> full,cond,full,cond
    assert pipe.last_cache_stats == {"full": 6, "cond": 2, "reuse": 0}
    assert np.isfinite(out).all()
    # stale-uncond steps perturb the trajectory but must stay correlated
    assert latent_psnr(base, out) > 15.0


def test_reuse_counts_and_fidelity(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    pol = StepCachePolicy(reuse_interval=2, warmup=2, tail=2)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    assert pipe.last_cache_stats == {"full": 6, "cond": 0, "reuse": 2}
    assert np.isfinite(out).all()
    assert latent_psnr(base, out) > 10.0


def test_calibration_rejects_cache_policy(tiny, contexts):
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib"))
    with pytest.raises(AssertionError, match="calib"):
        pipe.generate(c, cn, collect_calib=True,
                      cache_policy=StepCachePolicy(cfg_interval=2), **GEN_KW)
