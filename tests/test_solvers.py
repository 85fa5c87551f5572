"""Flow-matching solver tests.

No diffusers in this environment, so parity is checked two ways:
(1) schedule arrays vs inline transliterations of the reference formulas
    (fm_solvers_unipc.py:107-225, fm_solvers.py:22-26,:226-290);
(2) exactness on analytically solvable flows: with a model whose
    x0-prediction is a constant, the flow trajectory is linear and every
    multistep order must land on x0 exactly at sigma=0."""

import numpy as np
import pytest

from wanq_tpu.solvers.unipc import FlowUniPCMultistepScheduler
from wanq_tpu.solvers.dpm import (
    FlowDPMSolverMultistepScheduler,
    get_sampling_sigmas,
    retrieve_timesteps,
)


def _ref_unipc_schedule(num_train, steps, shift):
    alphas = np.linspace(1, 1 / num_train, num_train)[::-1].copy()
    sigmas = 1.0 - alphas
    sigma_max, sigma_min = sigmas[0], sigmas[-1]
    s = np.linspace(sigma_max, sigma_min, steps + 1).copy()[:-1]
    s = shift * s / (1 + (shift - 1) * s)
    timesteps = (s * num_train).astype(np.int64)
    return np.concatenate([s, [0.0]]), timesteps


def test_unipc_schedule_matches_reference_formula():
    sch = FlowUniPCMultistepScheduler(num_train_timesteps=1000, shift=1.0)
    sch.set_timesteps(30, shift=5.0)
    sig_ref, ts_ref = _ref_unipc_schedule(1000, 30, 5.0)
    np.testing.assert_allclose(sch.sigmas, sig_ref, atol=1e-12)
    np.testing.assert_array_equal(sch.timesteps, ts_ref)
    assert len(sch.timesteps) == 30 and sch.sigmas[-1] == 0.0


def test_get_sampling_sigmas_formula():
    got = get_sampling_sigmas(10, 5.0)
    sigma = np.linspace(1, 0, 11)[:10]
    want = 5.0 * sigma / (1 + 4.0 * sigma)
    np.testing.assert_allclose(got, want)


@pytest.mark.parametrize("steps", [1, 2, 5, 30])
@pytest.mark.parametrize("order", [1, 2, 3])
def test_unipc_exact_on_constant_x0_flow(rng, steps, order):
    """v(x, t) = (x - x0)/sigma_t has x0-prediction ≡ x0; all orders must
    integrate the linear flow exactly to x0 at sigma=0."""
    x0 = rng.normal(size=(2, 3, 4)).astype(np.float64)
    noise = rng.normal(size=(2, 3, 4)).astype(np.float64)
    sch = FlowUniPCMultistepScheduler(solver_order=order)
    sch.set_timesteps(steps, shift=5.0)
    x = noise.copy()
    for i, t in enumerate(sch.timesteps):
        sigma = sch.sigmas[i]
        v = (x - x0) / sigma
        x = sch.step(v, t, x)
    np.testing.assert_allclose(x, x0, atol=1e-8)


@pytest.mark.parametrize("steps", [1, 2, 5, 30])
@pytest.mark.parametrize("order", [1, 2])
def test_dpm_exact_on_constant_x0_flow(rng, steps, order):
    x0 = rng.normal(size=(2, 8)).astype(np.float64)
    noise = rng.normal(size=(2, 8)).astype(np.float64)
    sch = FlowDPMSolverMultistepScheduler(solver_order=order)
    sampling_sigmas = get_sampling_sigmas(steps, 5.0)
    timesteps, n = retrieve_timesteps(sch, sigmas=sampling_sigmas)
    assert n == steps
    x = noise.copy()
    for i, t in enumerate(timesteps):
        sigma = sch.sigmas[i]
        v = (x - x0) / sigma
        x = sch.step(v, t, x)
    np.testing.assert_allclose(x, x0, atol=1e-8)


def test_unipc_corrector_changes_result(rng):
    """The UniC corrector must actually engage on nonlinear fields."""
    x0 = rng.normal(size=(4,))
    noise = rng.normal(size=(4,))

    def run(disable_corrector):
        sch = FlowUniPCMultistepScheduler(
            solver_order=2, disable_corrector=disable_corrector
        )
        sch.set_timesteps(8, shift=3.0)
        x = noise.copy()
        for i, t in enumerate(sch.timesteps):
            sigma = sch.sigmas[i]
            # nonlinear, state-dependent velocity field (the final
            # lower-order step returns the x0-prediction itself, so the
            # field must depend on x for the corrector to be observable)
            v = (x - x0 * (1 + 0.1 * np.tanh(x))) / sigma
            x = sch.step(v, t, x)
        return x

    with_c = run(())
    without_c = run(tuple(range(10)))
    assert np.abs(with_c - without_c).max() > 1e-6


def test_unipc_timesteps_descending():
    sch = FlowUniPCMultistepScheduler()
    sch.set_timesteps(30, shift=5.0)
    assert np.all(np.diff(sch.timesteps) < 0)
    assert sch.timesteps[0] > 990
