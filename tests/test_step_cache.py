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
from wanq_tpu.pipelines.text2video import (
    AdaptiveCachePolicy,
    StepCachePolicy,
    WanT2V,
)
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


def test_adaptive_zero_threshold_matches_all_full(tiny, contexts):
    """threshold→0 means the drift accumulator can never stay below it,
    so every step evaluates: the trajectory must match the static
    all-'full' cached path bit-for-bit (same split-fn route)."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    all_full = np.asarray(pipe.generate(
        c, cn, cache_policy=StepCachePolicy(cfg_interval=2, warmup=100,
                                            tail=0), **GEN_KW))
    # threshold=0 alone is inactive; cfg_interval=2 + warmup=100 keeps the
    # policy active while forcing every step full
    pol = AdaptiveCachePolicy(threshold=0.0, cfg_interval=2, warmup=100,
                              tail=0)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    assert pipe.last_cache_stats == {"full": 8, "cond": 0, "reuse": 0}
    np.testing.assert_array_equal(all_full, out)

    # tiny positive threshold, no cfg cycle: real trajectories drift more
    # than 1e-9 per step, so still all-full and identical to baseline
    pol2 = AdaptiveCachePolicy(threshold=1e-9, warmup=1, tail=1)
    out2 = np.asarray(pipe.generate(c, cn, cache_policy=pol2, **GEN_KW))
    assert pipe.last_cache_stats == {"full": 8, "cond": 0, "reuse": 0}
    trace = pipe.last_adaptive_trace
    assert trace and all(e["d"] > 1e-9 for e in trace)
    np.testing.assert_array_equal(all_full, out2)


def test_adaptive_huge_threshold_reuses_everything_unprotected(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    pol = AdaptiveCachePolicy(threshold=1e9, warmup=2, tail=2)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    # 8 steps: 2 warmup + 2 tail full, 4 mid steps all reused
    assert pipe.last_cache_stats == {"full": 4, "cond": 0, "reuse": 4}
    assert np.isfinite(out).all()
    # the trace records one decision per unprotected step, monotone acc
    trace = pipe.last_adaptive_trace
    assert [e["act"] for e in trace] == ["reuse"] * 4
    accs = [e["acc"] for e in trace]
    assert accs == sorted(accs)


def test_adaptive_reuse_count_monotone_in_threshold(tiny, contexts):
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    reuses, psnrs = [], []
    for thresh in (0.01, 0.2, 1e9):
        pol = AdaptiveCachePolicy(threshold=thresh, warmup=2, tail=2)
        out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
        reuses.append(pipe.last_cache_stats["reuse"])
        psnrs.append(latent_psnr(base, out))
        assert np.isfinite(out).all()
    assert reuses == sorted(reuses), f"reuse not monotone: {reuses}"
    assert reuses[-1] == 4  # everything unprotected
    # more reuse must not IMPROVE fidelity (ties allowed at 0 reuse)
    assert psnrs[0] >= psnrs[-1]


def test_adaptive_cfg_composition_and_reset(tiny, contexts):
    """On eval steps the cfg cycle applies; after every eval the drift
    accumulator resets (x_ref moves to the evaluated input)."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    pol = AdaptiveCachePolicy(threshold=1e-9, cfg_interval=2, warmup=2,
                              tail=2)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    # every step evaluates (threshold ~0); evals alternate full/cond with
    # the warmup/tail forced full: evals 0,1 warmup; mid evals 2..5 ->
    # full,cond,full,cond; tail full
    assert pipe.last_cache_stats == {"full": 6, "cond": 2, "reuse": 0}
    assert np.isfinite(out).all()
    # accumulator resets after each eval: acc == polyval(d) each decision
    for e in pipe.last_adaptive_trace:
        np.testing.assert_allclose(e["acc"], e["d"], rtol=1e-6)


def test_fit_drift_poly_and_output_space_threshold(tiny, contexts):
    """fit_drift_poly records (input drift d, realized output change o)
    pairs on an all-evaluate pass and least-squares fits o≈polyval(p,d);
    the fitted poly must beat the identity rescaling on its own data and
    make threshold an output-space tolerance."""
    from wanq_tpu.pipelines.text2video import fit_drift_poly

    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    poly = fit_drift_poly(pipe, c, cn, degree=2, **GEN_KW)
    assert len(poly) == 3 and all(np.isfinite(poly))
    # calibration pass evaluated every step and recorded o for each
    # consecutive executed pair (step 0 is the protected reference)
    assert pipe.last_cache_stats["reuse"] == 0
    trace = pipe.last_adaptive_trace
    pts = [(e["d"], e["o"]) for e in trace if "o" in e]
    assert len(pts) == 7  # 8 steps, warmup=1, o from the 2nd exec on
    d = np.array([p[0] for p in pts])
    o = np.array([p[1] for p in pts])
    fit_mse = float(np.mean((np.polyval(poly, d) - o) ** 2))
    id_mse = float(np.mean((d - o) ** 2))
    assert fit_mse <= id_mse + 1e-12
    # installed: estimated-output-change accumulator drives the skips;
    # a generous output tolerance must reuse more than a tight one
    reuses = []
    for tol in (1e-4, 0.5):
        pol = AdaptiveCachePolicy(threshold=tol, warmup=2, tail=2,
                                  poly=poly)
        out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
        assert np.isfinite(out).all()
        reuses.append(pipe.last_cache_stats["reuse"])
    assert reuses[0] <= reuses[1] and reuses[1] == 4


def test_cache_poly_cli_parsing():
    import argparse

    from wanq_tpu.cli.common import cache_policy_from_args

    ns = argparse.Namespace(cache_threshold=0.1, cfg_cache_interval=1,
                            reuse_interval=1, cache_warmup=2, cache_tail=2,
                            cache_poly="2.5,0.5,0.0")
    pol = cache_policy_from_args(ns)
    assert isinstance(pol, AdaptiveCachePolicy)
    assert pol.poly == (2.5, 0.5, 0.0)
    ns.cache_poly = ""
    assert cache_policy_from_args(ns).poly == (1.0, 0.0)


def test_adaptive_policy_active_flag_and_cli_route():
    assert not AdaptiveCachePolicy(threshold=0.0).active
    assert AdaptiveCachePolicy(threshold=0.05).active
    assert AdaptiveCachePolicy(threshold=0.0, cfg_interval=2).active

    import argparse

    from wanq_tpu.cli.common import cache_policy_from_args

    ns = argparse.Namespace(cache_threshold=0.1, cfg_cache_interval=2,
                            reuse_interval=1, cache_warmup=3, cache_tail=5)
    pol = cache_policy_from_args(ns)
    assert isinstance(pol, AdaptiveCachePolicy)
    assert (pol.threshold, pol.cfg_interval, pol.warmup, pol.tail) == \
        (0.1, 2, 3, 5)
    ns2 = argparse.Namespace(cache_threshold=0.0, cfg_cache_interval=1,
                             reuse_interval=2, cache_warmup=4, cache_tail=4)
    pol2 = cache_policy_from_args(ns2)
    assert isinstance(pol2, StepCachePolicy) and pol2.reuse_interval == 2


@pytest.fixture(scope="module")
def i2v_setup():
    from tests.conftest import randomize_head
    from wanq_tpu.pipelines.image2video import WanI2V, i2v_latent_size

    rng = np.random.default_rng(7)
    cfg = tiny_config(model_type="i2v", in_dim=36, clip_dim=32)
    params = randomize_head(init_params(cfg, jax.random.PRNGKey(0)))
    img = jnp.asarray(rng.uniform(-1, 1, size=(3, 32, 32)).astype(np.float32))
    c = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    cn = jnp.asarray(rng.normal(
        size=(1, cfg.text_len, cfg.text_dim)).astype(np.float32))
    lat_h, lat_w = i2v_latent_size(cfg, (32, 32), 32 * 32)
    lat_f = (5 - 1) // 4 + 1
    clip_fea = jnp.asarray(rng.normal(
        size=(1, 257, cfg.clip_dim)).astype(np.float32))
    y = jnp.asarray(rng.normal(
        size=(20, lat_f, lat_h, lat_w)).astype(np.float32))
    pipe = WanI2V(cfg, params)
    kw = dict(max_area=32 * 32, frame_num=5, sampling_steps=8, seed=3,
              clip_fea=clip_fea, y=y)
    return pipe, img, c, cn, kw


def test_i2v_all_full_cache_matches_baseline(i2v_setup):
    """The i2v cached loop (bound-conditioning step fns through
    WanT2V._generate_cached) must reproduce the plain loop bit-for-bit
    when every step is 'full'."""
    pipe, img, c, cn, kw = i2v_setup
    base = np.asarray(pipe.generate(img, c, cn, **kw))
    pol = StepCachePolicy(cfg_interval=2, warmup=100, tail=0)
    out = np.asarray(pipe.generate(img, c, cn, cache_policy=pol, **kw))
    assert pipe.last_cache_stats == {"full": 8, "cond": 0, "reuse": 0}
    assert latent_psnr(base, out) > 60.0
    # sequential route through the same cached loop
    out_s = np.asarray(pipe.generate(img, c, cn, cache_policy=pol,
                                     cfg_mode="sequential", **kw))
    np.testing.assert_allclose(out_s, out, atol=3e-3)


def test_i2v_adaptive_and_static_cache_fidelity(i2v_setup):
    pipe, img, c, cn, kw = i2v_setup
    base = np.asarray(pipe.generate(img, c, cn, **kw))
    pol = StepCachePolicy(cfg_interval=2, reuse_interval=2, warmup=2, tail=2)
    out = np.asarray(pipe.generate(img, c, cn, cache_policy=pol, **kw))
    assert pipe.last_cache_stats["reuse"] > 0
    assert pipe.last_cache_stats["cond"] > 0
    assert np.isfinite(out).all() and latent_psnr(base, out) > 10.0

    apol = AdaptiveCachePolicy(threshold=1e9, warmup=2, tail=2)
    out_a = np.asarray(pipe.generate(img, c, cn, cache_policy=apol, **kw))
    assert pipe.last_cache_stats == {"full": 4, "cond": 0, "reuse": 4}
    assert np.isfinite(out_a).all()


def test_calibration_rejects_cache_policy(tiny, contexts):
    from wanq_tpu.quant.qlinear import QuantCtx

    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params, quant_ctx=QuantCtx(mode="calib"))
    with pytest.raises(AssertionError, match="calib"):
        pipe.generate(c, cn, collect_calib=True,
                      cache_policy=StepCachePolicy(cfg_interval=2), **GEN_KW)


def test_adaptive_drift_is_per_step_not_since_last_eval(tiny, contexts):
    """The accumulator sums PER-STEP drift estimates — the drift reference
    updates every step (TeaCache's previous_modulated_input), so k small
    steps add ~k*poly(d), matching what fit_drift_poly calibrated on
    one-step pairs. Re-measuring against the last EXECUTED forward would
    sum growing totals (~k^2/2) and cross the threshold ~2x early."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    seen = []
    pol = AdaptiveCachePolicy(threshold=1e9, warmup=2, tail=2)
    pipe.generate(c, cn, cache_policy=pol,
                  on_step=lambda i, t, lat: seen.append(np.asarray(lat)),
                  **GEN_KW)
    trace = pipe.last_adaptive_trace
    assert trace and all(e["act"] == "reuse" for e in trace)

    def rel_l1(a, b):
        return float(np.mean(np.abs(a - b)) / (np.mean(np.abs(b)) + 1e-8))

    # step i's model input is the latents AFTER step i-1 (on_step order)
    acc = 0.0
    for e in trace:
        i = e["step"]
        expect = rel_l1(seen[i - 1], seen[i - 2])
        assert np.isclose(e["d"], expect, rtol=2e-3, atol=1e-6), (i, e, expect)
        acc += e["d"]  # identity poly
        assert np.isclose(e["acc"], acc, rtol=2e-3, atol=1e-6)


# -- forecast mode (TaylorSeer-style extrapolation on skipped steps) -------


def _install_poly_step_fns(pipe, cfg, power):
    """Pre-populate the step-fn cache with stubs whose noise prediction is
    exactly t**power / 1000**power (polynomial in the timestep, scaled into
    the solver's working range) — an oracle for the forecast math: Lagrange
    extrapolation of order >= power must reproduce skipped steps exactly."""
    from wanq_tpu.pipelines.text2video import (
        compute_seq_len,
        compute_target_shape,
    )

    ts = compute_target_shape(cfg, GEN_KW["size"], GEN_KW["frame_num"])
    seq_len = compute_seq_len(cfg, ts, 1)

    def cond_fn(params, qctx, latents, tt, context):
        return jnp.ones_like(latents) * (tt[0] / 1000.0) ** power

    def split_fn(params, qctx, latents, tt, context, context_null):
        p = cond_fn(params, qctx, latents, tt, context)
        return p, p  # cond == uncond -> CFG combine == p for any scale

    pipe._step_fn_cache[(seq_len, "cond")] = cond_fn
    pipe._step_fn_cache[(seq_len, "split")] = split_fn


@pytest.mark.parametrize("power,exact_order", [(1, 1), (2, 2)])
def test_forecast_is_exact_on_polynomial_trajectories(tiny, power,
                                                      exact_order):
    """With a noise prediction that is a degree-``power`` polynomial of t,
    order >= power forecasting reproduces the all-evaluate trajectory to
    float precision, while verbatim reuse (order 0) does not."""
    cfg, params = tiny
    pipe = WanT2V(cfg, params)
    _install_poly_step_fns(pipe, cfg, power)
    c = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)

    base = np.asarray(pipe.generate(
        c, c, cache_policy=StepCachePolicy(cfg_interval=2, warmup=100,
                                           tail=0), **GEN_KW))
    pol = lambda o: StepCachePolicy(reuse_interval=3, warmup=exact_order + 1,
                                    tail=1, order=o)
    exact = np.asarray(pipe.generate(c, c, cache_policy=pol(exact_order),
                                     **GEN_KW))
    assert pipe.last_cache_stats["reuse"] > 0
    verbatim = np.asarray(pipe.generate(c, c, cache_policy=pol(0), **GEN_KW))
    err_exact = np.abs(exact - base).max()
    err_verbatim = np.abs(verbatim - base).max()
    assert err_exact < 1e-5, f"order-{exact_order} forecast not exact: " \
        f"{err_exact}"
    assert err_verbatim > 50 * max(err_exact, 1e-9), (
        "verbatim reuse should be visibly worse on a degree-"
        f"{power} trajectory: {err_verbatim} vs {err_exact}")


def test_forecast_order_one_beats_verbatim_on_quadratic(tiny):
    """Order 1 on a quadratic trajectory is inexact but still much closer
    than verbatim reuse (the monotone-improvement property)."""
    cfg, params = tiny
    pipe = WanT2V(cfg, params)
    _install_poly_step_fns(pipe, cfg, 2)
    c = jnp.zeros((1, cfg.text_len, cfg.text_dim), jnp.float32)
    base = np.asarray(pipe.generate(
        c, c, cache_policy=StepCachePolicy(cfg_interval=2, warmup=100,
                                           tail=0), **GEN_KW))
    out = {}
    for o in (0, 1, 2):
        pol = StepCachePolicy(reuse_interval=3, warmup=3, tail=1, order=o)
        out[o] = np.abs(np.asarray(
            pipe.generate(c, c, cache_policy=pol, **GEN_KW)) - base).max()
    assert out[2] < out[1] < out[0]


def test_forecast_on_real_model_adaptive(tiny, contexts):
    """On the real tiny model the forecast must stay finite and the
    adaptive loop's bookkeeping (trace, stats) must be unaffected."""
    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    base = np.asarray(pipe.generate(c, cn, **GEN_KW))
    pol = AdaptiveCachePolicy(threshold=1e9, warmup=2, tail=2, order=1)
    out = np.asarray(pipe.generate(c, cn, cache_policy=pol, **GEN_KW))
    assert pipe.last_cache_stats == {"full": 4, "cond": 0, "reuse": 4}
    assert np.isfinite(out).all()
    assert latent_psnr(base, out) > 10.0


def test_forecast_order_validation_and_cli():
    import argparse

    from wanq_tpu.cli.common import cache_policy_from_args

    with pytest.raises(ValueError, match="order"):
        StepCachePolicy(order=3)
    with pytest.raises(ValueError, match="order"):
        AdaptiveCachePolicy(order=-1)

    ns = argparse.Namespace(cache_threshold=0.1, cfg_cache_interval=1,
                            reuse_interval=1, cache_warmup=2, cache_tail=2,
                            cache_poly="", cache_order=1)
    pol = cache_policy_from_args(ns)
    assert isinstance(pol, AdaptiveCachePolicy) and pol.order == 1
    ns2 = argparse.Namespace(cache_threshold=0.0, cfg_cache_interval=1,
                             reuse_interval=2, cache_warmup=2, cache_tail=2,
                             cache_order=2)
    pol2 = cache_policy_from_args(ns2)
    assert isinstance(pol2, StepCachePolicy) and pol2.order == 2


def test_cache_policy_from_quant_config(tmp_path):
    # scale-tuned cache defaults ride the quant YAML (cache: section);
    # explicit CLI flags win over it
    from types import SimpleNamespace

    import yaml

    from wanq_tpu.cli.common import cache_policy_from_args
    from wanq_tpu.quant import QuantConfig

    raw = {
        "weight": {"n_bits": 8, "sym": False},
        "act": {"n_bits": 8, "sym": True},
        "cache": {"threshold": 0.1, "poly": [0.5, 0.2], "warmup": 2,
                  "tail": 2},
    }
    path = tmp_path / "q.yaml"
    path.write_text(yaml.safe_dump(raw))
    qcfg = QuantConfig.from_yaml(str(path))
    assert qcfg.cache["threshold"] == 0.1

    quiet = SimpleNamespace(cache_threshold=0.0, reuse_interval=1,
                            cfg_cache_interval=1, cache_poly="",
                            cache_warmup=4, cache_tail=4, cache_order=0)
    pol = cache_policy_from_args(quiet, qcfg=qcfg)
    assert isinstance(pol, AdaptiveCachePolicy)
    assert pol.threshold == 0.1 and pol.poly == (0.5, 0.2)
    assert pol.warmup == 2 and pol.tail == 2

    # explicit CLI threshold overrides the config section
    loud = SimpleNamespace(**{**vars(quiet), "cache_threshold": 0.3})
    pol2 = cache_policy_from_args(loud, qcfg=qcfg)
    assert pol2.threshold == 0.3 and pol2.poly == (1.0, 0.0)

    # static section form
    raw["cache"] = {"reuse_interval": 2, "warmup": 1, "tail": 1}
    path.write_text(yaml.safe_dump(raw))
    pol3 = cache_policy_from_args(quiet, qcfg=QuantConfig.from_yaml(str(path)))
    assert isinstance(pol3, StepCachePolicy) and pol3.reuse_interval == 2

    # no section -> None
    del raw["cache"]
    path.write_text(yaml.safe_dump(raw))
    assert cache_policy_from_args(
        quiet, qcfg=QuantConfig.from_yaml(str(path))) is None


def test_simulate_matches_real_loop(tiny, contexts):
    # simulate_adaptive_actions must replay EXACTLY the decisions the
    # real cached loop took, given the trace's drift values — the
    # equivalence that makes scale-tuned threshold pins meaningful
    from wanq_tpu.pipelines.text2video import simulate_adaptive_actions

    cfg, params = tiny
    c, cn = contexts
    pipe = WanT2V(cfg, params)
    for pol in (AdaptiveCachePolicy(threshold=0.15, warmup=1, tail=1),
                AdaptiveCachePolicy(threshold=0.45, warmup=2, tail=1,
                                    cfg_interval=2),
                AdaptiveCachePolicy(threshold=0.15, warmup=1, tail=1,
                                    poly=(0.7, 0.01))):
        pipe.generate(c, cn, cache_policy=pol, **GEN_KW)
        trace = pipe.last_adaptive_trace
        n = GEN_KW["sampling_steps"]
        drifts = [0.0] * n
        real = ["full"] * n
        for e in trace:
            drifts[e["step"]] = e["d"]
            real[e["step"]] = e["act"]
        assert simulate_adaptive_actions(pol, drifts) == real


def test_14b_shipped_cache_policy_skips_on_measured_trajectory():
    # regression pin (round-4 VERDICT #6): the SHIPPED 14B cache config
    # (quant_configs/wan_w8a8_14b.yaml) must actually admit skips on the
    # kind of trajectory it was tuned on. Drift values span the range
    # MEASURED on the 14B 720p all-evaluate pass (d 0.092-0.243,
    # BENCH_NOTES northstar) — the fitted poly maps them to ~0.37-0.52
    # estimated output change per step, so tol 0.5 alternates
    # full/reuse-ish; the 1.3B raw-threshold policy admits nothing here
    # (the measured scale-transfer failure this config exists to fix).
    import os

    import yaml

    from wanq_tpu.cli.common import cache_policy_from_config
    from wanq_tpu.pipelines.text2video import simulate_adaptive_actions
    from wanq_tpu.quant import QuantConfig

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "quant_configs", "wan_w8a8_14b.yaml")
    qcfg = QuantConfig(yaml.safe_load(open(path)))
    pol = cache_policy_from_config(qcfg)
    assert isinstance(pol, AdaptiveCachePolicy)
    assert pol.threshold == 0.5 and len(pol.poly) == 5

    rng = np.random.default_rng(0)
    drifts = list(rng.uniform(0.092, 0.243, size=30))
    acts = simulate_adaptive_actions(pol, drifts)
    n_reuse = acts.count("reuse")
    assert n_reuse >= 8, acts  # skips at least ~1/3 of the 30 steps
    # warmup/tail protection intact
    assert acts[:2] == ["full", "full"] and acts[-2:] == ["full", "full"]
    # the untuned 1.3B policy (raw threshold 0.10, identity poly)
    # declines MOST skips on this trajectory (round-4 measured it at
    # 0.73 full / 0.27 reuse on the real 14B run) — the tuned config
    # must skip strictly more
    old = AdaptiveCachePolicy(threshold=0.10, warmup=2, tail=2)
    n_old = simulate_adaptive_actions(old, drifts).count("reuse")
    assert n_old <= n_reuse // 2, (n_old, n_reuse)
