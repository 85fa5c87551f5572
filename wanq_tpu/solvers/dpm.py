"""Flow-matching DPM-Solver++ multistep scheduler.

TPU-native rebuild of ``FlowDPMSolverMultistepScheduler`` and the
``get_sampling_sigmas``/``retrieve_timesteps`` helpers
(ref: wan/utils/fm_solvers.py:22-857). Implements the dpmsolver++
algorithm (orders 1-3, midpoint/heun second order) with flow-matching
alpha_t = 1 - sigma, x0-prediction conversion, and the diffusers
lower-order-final/euler-at-final step logic.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import numpy as np


def get_sampling_sigmas(sampling_steps: int, shift: float) -> np.ndarray:
    """ref fm_solvers.py:22-26."""
    sigma = np.linspace(1, 0, sampling_steps + 1)[:sampling_steps]
    return shift * sigma / (1 + (shift - 1) * sigma)


def retrieve_timesteps(scheduler, num_inference_steps=None, sigmas=None, **kw):
    """ref fm_solvers.py:29-67 (simplified to the used paths)."""
    if sigmas is not None:
        scheduler.set_timesteps(sigmas=sigmas, **kw)
    else:
        scheduler.set_timesteps(num_inference_steps, **kw)
    return scheduler.timesteps, len(scheduler.timesteps)


def _alpha_sigma(sigma: float) -> Tuple[float, float]:
    return 1.0 - sigma, sigma


def _lambda(sigma: float) -> float:
    # clamp both ends: sigma=1 (alpha=0) and sigma=0 otherwise hit log(0)
    alpha, s = _alpha_sigma(sigma)
    alpha = max(alpha, 1e-12)
    s = max(s, 1e-12)
    return float(np.log(alpha) - np.log(s))


@dataclasses.dataclass
class FlowDPMSolverMultistepScheduler:
    """ref class (fm_solvers.py:69), dpmsolver++ paths only."""

    num_train_timesteps: int = 1000
    solver_order: int = 2
    shift: float = 1.0
    use_dynamic_shifting: bool = False
    algorithm_type: str = "dpmsolver++"
    solver_type: str = "midpoint"
    lower_order_final: bool = True
    euler_at_final: bool = False
    final_sigmas_type: str = "zero"

    def __post_init__(self):
        assert self.algorithm_type == "dpmsolver++", "only ++ is used by Wan"
        assert self.solver_type in ("midpoint", "heun")
        alphas = np.linspace(1, 1 / self.num_train_timesteps,
                             self.num_train_timesteps)[::-1].copy()
        sigmas = 1.0 - alphas
        if not self.use_dynamic_shifting:
            sigmas = self.shift * sigmas / (1 + (self.shift - 1) * sigmas)
        self.sigma_min = float(sigmas[-1])
        self.sigma_max = float(sigmas[0])
        self.sigmas = sigmas
        self.timesteps = sigmas * self.num_train_timesteps
        self._reset_state()

    def _reset_state(self):
        self.model_outputs: List[Optional[object]] = [None] * self.solver_order
        self.lower_order_nums = 0
        self._step_index: Optional[int] = None
        self.num_inference_steps: Optional[int] = None

    def set_timesteps(
        self,
        num_inference_steps: Optional[int] = None,
        sigmas: Optional[np.ndarray] = None,
        shift: Optional[float] = None,
        mu: Optional[float] = None,
    ):
        """ref set_timesteps (fm_solvers.py:226-290)."""
        if sigmas is None:
            sigmas = np.linspace(self.sigma_max, self.sigma_min,
                                 num_inference_steps + 1).copy()[:-1]
            if self.use_dynamic_shifting:
                sigmas = np.exp(mu) / (np.exp(mu) + (1 / sigmas - 1) ** 1.0)
            else:
                if shift is None:
                    shift = self.shift
                sigmas = shift * sigmas / (1 + (shift - 1) * sigmas)
        sigma_last = 0.0 if self.final_sigmas_type == "zero" else self.sigma_min
        timesteps = sigmas * self.num_train_timesteps
        self.sigmas = np.concatenate([sigmas, [sigma_last]]).astype(np.float64)
        self.timesteps = np.asarray(timesteps).astype(np.int64)
        self._reset_state()
        self.num_inference_steps = len(timesteps)

    @property
    def step_index(self):
        return self._step_index

    def _convert_model_output(self, model_output, sample):
        """x0 = sample - sigma_t * model_output (ref :341-396, ++ path)."""
        sigma_t = float(self.sigmas[self._step_index])
        return sample - sigma_t * model_output

    def _first_order(self, m0, sample):
        """ref dpm_solver_first_order_update (:415-470, ++ path)."""
        sigma_t = float(self.sigmas[self._step_index + 1])
        sigma_s = float(self.sigmas[self._step_index])
        alpha_t, sig_t = _alpha_sigma(sigma_t)
        alpha_s, sig_s = _alpha_sigma(sigma_s)
        h = _lambda(sigma_t) - _lambda(sigma_s)
        return (sig_t / sig_s) * sample - (alpha_t * (np.exp(-h) - 1.0)) * m0

    def _second_order(self, sample):
        """ref multistep_dpm_solver_second_order_update (:486-585, ++ path)."""
        sigma_t = float(self.sigmas[self._step_index + 1])
        sigma_s0 = float(self.sigmas[self._step_index])
        sigma_s1 = float(self.sigmas[self._step_index - 1])
        alpha_t, sig_t = _alpha_sigma(sigma_t)
        _, sig_s0 = _alpha_sigma(sigma_s0)
        h = _lambda(sigma_t) - _lambda(sigma_s0)
        h_0 = _lambda(sigma_s0) - _lambda(sigma_s1)
        r0 = h_0 / h
        m0, m1 = self.model_outputs[-1], self.model_outputs[-2]
        D0 = m0
        D1 = (1.0 / r0) * (m0 - m1)
        if self.solver_type == "midpoint":
            return ((sig_t / sig_s0) * sample
                    - (alpha_t * (np.exp(-h) - 1.0)) * D0
                    - 0.5 * (alpha_t * (np.exp(-h) - 1.0)) * D1)
        return ((sig_t / sig_s0) * sample
                - (alpha_t * (np.exp(-h) - 1.0)) * D0
                + (alpha_t * ((np.exp(-h) - 1.0) / h + 1.0)) * D1)

    def _third_order(self, sample):
        """ref multistep_dpm_solver_third_order_update (:593-680, ++ path)."""
        sigma_t = float(self.sigmas[self._step_index + 1])
        sigma_s0 = float(self.sigmas[self._step_index])
        sigma_s1 = float(self.sigmas[self._step_index - 1])
        sigma_s2 = float(self.sigmas[self._step_index - 2])
        alpha_t, sig_t = _alpha_sigma(sigma_t)
        _, sig_s0 = _alpha_sigma(sigma_s0)
        h = _lambda(sigma_t) - _lambda(sigma_s0)
        h_0 = _lambda(sigma_s0) - _lambda(sigma_s1)
        h_1 = _lambda(sigma_s1) - _lambda(sigma_s2)
        r0, r1 = h_0 / h, h_1 / h
        m0, m1, m2 = (self.model_outputs[-1], self.model_outputs[-2],
                      self.model_outputs[-3])
        D0 = m0
        D1_0, D1_1 = (1.0 / r0) * (m0 - m1), (1.0 / r1) * (m1 - m2)
        D1 = D1_0 + (r0 / (r0 + r1)) * (D1_0 - D1_1)
        D2 = (1.0 / (r0 + r1)) * (D1_0 - D1_1)
        return ((sig_t / sig_s0) * sample
                - (alpha_t * (np.exp(-h) - 1.0)) * D0
                + (alpha_t * ((np.exp(-h) - 1.0) / h + 1.0)) * D1
                - (alpha_t * ((np.exp(-h) - 1.0 + h) / h**2 - 0.5)) * D2)

    def step(self, model_output, timestep, sample):
        """ref step (fm_solvers.py:705-790). Returns prev_sample."""
        assert self.num_inference_steps is not None, "call set_timesteps first"
        if self._step_index is None:
            idx = np.nonzero(self.timesteps == int(timestep))[0]
            self._step_index = int(idx[0]) if len(idx) else 0

        n = len(self.timesteps)
        lof = (self._step_index == n - 1) and (
            self.euler_at_final
            or (self.lower_order_final and n < 15)
            or self.final_sigmas_type == "zero"
        )
        los = (self._step_index == n - 2) and self.lower_order_final and n < 15

        m = self._convert_model_output(model_output, sample)
        for i in range(self.solver_order - 1):
            self.model_outputs[i] = self.model_outputs[i + 1]
        self.model_outputs[-1] = m

        if self.solver_order == 1 or self.lower_order_nums < 1 or lof:
            prev = self._first_order(m, sample)
        elif self.solver_order == 2 or self.lower_order_nums < 2 or los:
            prev = self._second_order(sample)
        else:
            prev = self._third_order(sample)

        if self.lower_order_nums < self.solver_order:
            self.lower_order_nums += 1
        self._step_index += 1
        return prev
