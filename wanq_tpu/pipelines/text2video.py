"""Text-to-video generation pipeline.

TPU-native rebuild of ``WanT2V`` / ``WanT2VQuantInfer``
(ref: wan/text2video.py:28-610). Differences by design:

* The denoise step (two DiT forwards + CFG combine) is one jitted function
  with the cond/uncond pair **batched** along the batch axis — one B=2 MXU
  pass instead of the reference's two sequential calls
  (text2video.py:255-261). The scheduler runs host-side between steps
  (its cost is negligible; the reference does the same).
* One pipeline class serves FP, calibration, simulated-quant and int8
  inference via QuantCtx modes — the reference needs a separate
  WanT2VQuantInfer class (text2video.py:320).
* Deterministic seeding through jax.random keys (the reference broadcasts
  torch generator seeds over NCCL, fp_generate.py:285-286 — unnecessary in
  a single-controller JAX program).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from wanq_tpu.configs import WanConfig
from wanq_tpu.models.dit import dit_forward
from wanq_tpu.quant.qlinear import QuantCtx
from wanq_tpu.solvers.dpm import (
    FlowDPMSolverMultistepScheduler,
    get_sampling_sigmas,
    retrieve_timesteps,
)
from wanq_tpu.solvers.unipc import FlowUniPCMultistepScheduler


def compute_target_shape(
    cfg: WanConfig, size: Tuple[int, int], frame_num: int
) -> Tuple[int, int, int, int]:
    """Latent shape (C, F, H, W) (ref text2video.py:165-169)."""
    w, h = size
    return (
        cfg.z_dim,
        (frame_num - 1) // cfg.vae_stride[0] + 1,
        h // cfg.vae_stride[1],
        w // cfg.vae_stride[2],
    )


def compute_seq_len(
    cfg: WanConfig, target_shape, sp_size: int = 1, align: Optional[int] = None
) -> int:
    """Token count rounded up to the sequence-parallel degree
    (ref text2video.py:170-172) and — for long sequences — to the flash
    block size (512), so attention kernels get block-aligned operands
    without a pad+slice round trip per block (the DiT already pads and
    masks tokens past the valid length)."""
    _, f, h, w = target_shape
    tokens = (h // cfg.patch_size[1]) * (w // cfg.patch_size[2]) * f
    if align is None:
        align = 512 if tokens >= 4096 else 1
    m = math.lcm(sp_size, align)
    return int(math.ceil(tokens / m)) * m


@dataclasses.dataclass(frozen=True)
class StepCachePolicy:
    """Step-level redundancy elimination across the denoise trajectory
    (beyond-reference: the reference always runs 2 full DiT forwards per
    step, text2video.py:255-261).

    Two orthogonal mechanisms, both on a STATIC schedule (the denoise
    loop is host-driven, so no data-dependent control flow enters jit):

    * ``cfg_interval`` K — the uncond branch is refreshed every K-th
      step; in between, only the cond branch runs (a B-sized forward
      instead of the 2B CFG pair) and combines with the cached uncond.
      Exploits the slow drift of the unconditional prediction relative
      to the conditional one (the observation behind adaptive-guidance /
      CFG-cache methods).
    * ``reuse_interval`` R — the full model runs every R-th step; skipped
      steps reuse the previous noise prediction verbatim (zero forwards,
      FORA-style static feature reuse at the coarsest granularity).

    ``warmup``/``tail`` steps at the trajectory ends always run the full
    CFG pair — the high-noise start sets global structure and the final
    steps set fine detail; both are the known failure modes of caching
    schedules. Fidelity is gated by measurement (tools/cache_probe.py
    PSNR/FVD vs the uncached trajectory), not assumed.
    """

    cfg_interval: int = 1
    reuse_interval: int = 1
    warmup: int = 4
    tail: int = 4
    # forecast order for skipped steps (TaylorSeer-style, arXiv:2503.06923):
    # 0 = reuse the last prediction verbatim; 1/2 = extrapolate the noise
    # prediction to the current timestep by Lagrange interpolation through
    # the last order+1 EXECUTED predictions, at zero forward cost (one
    # latents-sized axpy per skipped step). ``max_horizon`` caps the
    # order-1 extrapolation coefficient c = (t-t1)/(t1-t0): long skip runs
    # otherwise extrapolate many node-spacings out, where linear overshoot
    # amplifies the executed-pair difference by c (measured: uncapped o1
    # LOSES to verbatim reuse on the adaptive schedule's long runs —
    # BENCH_NOTES 'forecast'); 0 = uncapped.
    order: int = 0
    max_horizon: float = 0.0

    def __post_init__(self):
        if self.order not in (0, 1, 2):
            raise ValueError(f"order must be 0, 1 or 2, got {self.order}")

    def plan(self, n_steps: int) -> List[str]:
        """Per-step actions: 'full' | 'cond' | 'reuse'. The cfg cycle
        counts MODEL-EVAL steps (non-reuse), so the two mechanisms
        compose: reuse_interval=2 + cfg_interval=2 alternates
        full/reuse/cond/reuse... instead of collapsing onto the same
        offsets."""
        acts = []
        n_eval = 0
        for i in range(n_steps):
            if i < self.warmup or i >= n_steps - self.tail:
                acts.append("full")
                n_eval += 1
                continue
            j = i - self.warmup
            if self.reuse_interval > 1 and j % self.reuse_interval:
                acts.append("reuse")
                continue
            if self.cfg_interval > 1 and n_eval % self.cfg_interval:
                acts.append("cond")
            else:
                acts.append("full")
            n_eval += 1
        return acts

    @property
    def active(self) -> bool:
        return self.cfg_interval > 1 or self.reuse_interval > 1


@dataclasses.dataclass(frozen=True)
class AdaptiveCachePolicy:
    """Input-adaptive step reuse (TeaCache-style; beyond-reference).

    Where :class:`StepCachePolicy` skips on a STATIC schedule, this policy
    decides per step from the trajectory itself: the per-step relative L1
    drift of the model input,

        d_i = mean|x_i − x_{i−1}| / mean|x_{i−1}|,

    optionally rescaled by a fitted polynomial (``poly``, ``np.polyval``
    coefficients — TeaCache fits one per model family to map input drift
    to output change; identity by default), accumulates the per-step
    estimates since the last executed forward (the reference point for
    the drift updates EVERY step, like TeaCache's
    previous_modulated_input — so k small steps add ~k·poly(δ), not the
    quadratic sum that re-measuring against a frozen reference would
    give); while the accumulator stays below ``threshold`` the previous
    noise prediction is reused verbatim, and when it crosses, the model
    runs and the accumulator resets. Unlike a static ``reuse_interval``
    the skip pattern concentrates where the trajectory actually idles
    (measured: mid-trajectory on Wan's unipc schedule) instead of
    uniformly, buying a better fidelity/speed frontier at the same eval
    count (tools/cache_probe.py --adaptive table in BENCH_NOTES).

    ``cfg_interval`` composes exactly as in StepCachePolicy: on steps the
    model DOES run, every K-th eval refreshes the uncond branch and the
    ones between run cond-only. ``warmup``/``tail`` force full CFG steps
    at the trajectory ends — same failure-mode guard as the static
    policy. The decision costs two jitted reductions + one scalar fetch
    per step (~ms on a relayed link, against multi-second steps).
    """

    threshold: float = 0.08
    warmup: int = 4
    tail: int = 4
    cfg_interval: int = 1
    poly: Tuple[float, ...] = (1.0, 0.0)
    # forecast order / horizon cap on skipped steps (see StepCachePolicy)
    order: int = 0
    max_horizon: float = 0.0

    def __post_init__(self):
        if self.order not in (0, 1, 2):
            raise ValueError(f"order must be 0, 1 or 2, got {self.order}")

    @property
    def active(self) -> bool:
        return self.threshold > 0.0 or self.cfg_interval > 1


@jax.jit
def _forecast2(p0, p1, w0, w1):
    return w0 * p0 + w1 * p1


@jax.jit
def _forecast3(p0, p1, p2, w0, w1, w2):
    return w0 * p0 + w1 * p1 + w2 * p2


def _lagrange_weights(ts: List[float], t: float) -> List[float]:
    """Extrapolation weights at ``t`` for nodes ``ts`` (all distinct —
    denoise timesteps are strictly decreasing)."""
    return [
        math.prod((t - tj) / (ti - tj) for tj in ts if tj != ti)
        for ti in ts
    ]


def fit_drift_poly(pipe, context, context_null, degree: int = 4,
                   **gen_kw) -> Tuple[float, ...]:
    """Fit the AdaptiveCachePolicy rescaling polynomial (TeaCache's
    per-model calibration step) on one full trajectory.

    Runs an all-evaluate adaptive pass (threshold ≈ 0 keeps the drift
    accumulator above it on every real trajectory) so the trace records,
    for each consecutive pair of executed forwards, the model-INPUT
    relative-L1 drift ``d`` and the realized model-OUTPUT relative-L1
    change ``o``, then least-squares fits ``o ≈ polyval(poly, d)``.

    With the fitted poly installed, the policy's accumulator estimates
    OUTPUT change, so ``threshold`` becomes an output-space tolerance
    (e.g. 0.1 = skip while the estimated accumulated change of the noise
    prediction stays under 10%) — transferable across schedules and step
    counts in a way the raw input-drift threshold is not. TeaCache ships
    one fitted polynomial per model family; this fits it in-repo from
    any prompt/seed (one uncached-trajectory cost).
    """
    pol = AdaptiveCachePolicy(threshold=1e-12, warmup=1, tail=0)
    pipe.generate(context, context_null, cache_policy=pol, **gen_kw)
    pts = [(e["d"], e["o"]) for e in (pipe.last_adaptive_trace or [])
           if "o" in e]
    if len(pts) < 2:
        raise ValueError(
            f"need >=2 executed-step pairs to fit, got {len(pts)} "
            "(too few sampling_steps?)")
    d = np.asarray([p[0] for p in pts])
    o = np.asarray([p[1] for p in pts])
    deg = min(degree, len(pts) - 1)
    return tuple(float(c) for c in np.polyfit(d, o, deg))


def simulate_adaptive_actions(policy: AdaptiveCachePolicy,
                              drifts: List[float]) -> List[str]:
    """Replay the adaptive policy's decisions for a known per-step input
    drift sequence — the regression surface for scale-tuned thresholds
    (e.g. pinning that the shipped 14B poly+tolerance actually skips on
    the measured 14B trajectory). ``drifts[i]`` is the relative-L1 drift
    of step i's input vs step i-1's (index 0 is ignored: the first step
    has no reference point and always evaluates). Mirrors
    _generate_cached's accumulator arithmetic exactly; the equivalence
    against a real cached run is pinned by
    tests/test_step_cache.py::test_simulate_matches_real_loop."""
    n = len(drifts)
    acc, n_eval = 0.0, 0
    acts: List[str] = []
    for i in range(n):
        protected = i < policy.warmup or i >= n - policy.tail
        if protected or i == 0:
            act = "full"
        else:
            acc += float(np.polyval(policy.poly, drifts[i]))
            if acc < policy.threshold:
                act = "reuse"
            elif policy.cfg_interval > 1 and n_eval % policy.cfg_interval:
                act = "cond"
            else:
                act = "full"
        if act != "reuse":
            acc = 0.0
            n_eval += 1
        acts.append(act)
    return acts


@dataclasses.dataclass
class WanT2V:
    """Latent-space pipeline; text encoding / VAE decode are pluggable
    stages (wired in cli/) so the denoise core is testable standalone."""

    config: WanConfig
    params: Dict[str, Any]
    quant_ctx: Optional[QuantCtx] = None
    sp_size: int = 1
    mesh: Optional[Any] = None  # jax.sharding.Mesh for multi-chip runs
    shardings: Optional[Any] = None  # parallel.ShardingPlan
    # timestep-aware mixed precision (BASELINE.md config #4): descending
    # [(t_threshold, ctx), ...] — the ctx of the first entry with
    # t >= t_threshold is used for that denoise step (e.g. W8 early /
    # W4 late). Falls back to quant_ctx when None or no entry matches.
    quant_ctx_schedule: Optional[List[Tuple[float, Optional[QuantCtx]]]] = None

    def __post_init__(self):
        self._step_fn_cache: Dict[Tuple, Callable] = {}
        self.last_cache_stats: Optional[Dict[str, int]] = None
        self.last_adaptive_trace: Optional[List[Dict[str, float]]] = None
        if self.quant_ctx_schedule:
            threshs = [t for t, _ in self.quant_ctx_schedule]
            if threshs != sorted(threshs, reverse=True):
                raise ValueError(
                    "quant_ctx_schedule thresholds must be strictly "
                    f"descending (first-match semantics); got {threshs}"
                )

    def _ctx_for_timestep(self, t: float) -> Optional[QuantCtx]:
        if self.quant_ctx_schedule:
            for thresh, ctx in self.quant_ctx_schedule:
                if t >= thresh:
                    return ctx
        return self.quant_ctx

    # -- jitted CFG denoise step ------------------------------------------

    def _build_step_fn(self, seq_len: int, mode: str):
        cfg = self.config
        closure_ctx = self.quant_ctx if mode == "calib" else None

        def step(params, qctx, latents, t, context, context_null, guide_scale):
            # batch cond + uncond in one forward: [2B, ...]
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            c2 = jnp.concatenate([context, context_null], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            # sim/int8 quant state rides as a pytree ARGUMENT (closing over
            # it would embed GBs of int8 weights as HLO literals); the
            # calibration ctx passes by closure because it mutates collect
            # during tracing
            use_ctx = qctx if qctx is not None else closure_ctx
            out = dit_forward(
                params, cfg, x2, t2, c2, seq_len, ctx=use_ctx,
                plan=self.shardings,
            )
            cond, uncond = out[:b], out[b:]
            noise_pred = uncond + guide_scale * (cond - uncond)
            if use_ctx is not None and use_ctx.mode == "calib":
                stats = dict(use_ctx.collect)
                use_ctx.collect.clear()
                return noise_pred, stats
            return noise_pred

        return jax.jit(step)

    def _build_split_step_fn(self, seq_len: int):
        """CFG pair forward returning (cond, uncond) separately — the
        caching loop needs the raw uncond to hold across steps."""
        cfg = self.config

        def step(params, qctx, latents, t, context, context_null):
            b = latents.shape[0]
            x2 = jnp.concatenate([latents, latents], axis=0)
            c2 = jnp.concatenate([context, context_null], axis=0)
            t2 = jnp.concatenate([t, t], axis=0)
            out = dit_forward(
                params, cfg, x2, t2, c2, seq_len, ctx=qctx,
                plan=self.shardings,
            )
            return out[:b], out[b:]

        return jax.jit(step)

    def _build_cond_step_fn(self, seq_len: int):
        """Single-branch forward (B, not 2B) — the cached-uncond steps'
        entire saving: half the tokens through the model."""
        cfg = self.config

        def step(params, qctx, latents, t, context):
            return dit_forward(
                params, cfg, latents, t, context, seq_len, ctx=qctx,
                plan=self.shardings,
            )

        return jax.jit(step)

    def _step_fn(self, seq_len: int, mode: str):
        key = (seq_len, mode)
        if key not in self._step_fn_cache:
            if mode == "split":
                fn = self._build_split_step_fn(seq_len)
            elif mode == "cond":
                fn = self._build_cond_step_fn(seq_len)
            else:
                fn = self._build_step_fn(seq_len, mode)
            self._step_fn_cache[key] = fn
        return self._step_fn_cache[key]

    def _make_scheduler(self, sample_solver: str, sampling_steps: int, shift: float):
        cfg = self.config
        if sample_solver == "unipc":
            sch = FlowUniPCMultistepScheduler(
                num_train_timesteps=cfg.num_train_timesteps, shift=1.0
            )
            sch.set_timesteps(sampling_steps, shift=shift)
            timesteps = sch.timesteps
        elif sample_solver == "dpm++":
            sch = FlowDPMSolverMultistepScheduler(
                num_train_timesteps=cfg.num_train_timesteps, shift=1.0
            )
            sigmas = get_sampling_sigmas(sampling_steps, shift)
            timesteps, _ = retrieve_timesteps(sch, sigmas=sigmas)
        else:
            raise NotImplementedError(f"unsupported solver {sample_solver}")
        return sch, timesteps

    # -- generation ---------------------------------------------------------

    def generate(
        self,
        context: jax.Array,
        context_null: jax.Array,
        size: Tuple[int, int] = (832, 480),
        frame_num: int = 81,
        shift: float = 5.0,
        sample_solver: str = "unipc",
        sampling_steps: int = 50,
        guide_scale: float = 5.0,
        seed: int = -1,
        collect_calib: bool = False,
        cache_policy: Optional[StepCachePolicy] = None,
        cfg_mode: str = "batched",
        on_step: Optional[Callable[[int, float, jax.Array], None]] = None,
    ):
        """Denoise loop (ref WanT2V.generate, text2video.py:120-318).

        context / context_null: [B, text_len, text_dim] encoder states
        (already padded to text_len). Returns latents [B, C, F, h, w], and
        the calibration stats dict when ``collect_calib``.

        cfg_mode: 'batched' runs the CFG pair as one [2B] forward (best MXU
        utilization when activations fit — the default); 'sequential' runs
        cond and uncond as two [B] forwards through the SAME compiled
        function (this is the reference's own schedule,
        text2video.py:255-261). Same math either way (identical latents);
        sequential halves peak activation memory, which is what lets the
        14B model denoise at 720p x 81f (seq 75776) next to its weight
        state on a single 16 GB chip — the batched pair OOMs there
        (BENCH_NOTES '14B 720p REAL CFG').

        on_step: optional callback ``(i, t, latents)`` after each solver
        step — progress reporting / per-step timing (the analog of the
        reference's tqdm loop, text2video.py:245). The denoise loop
        dispatches asynchronously; a callback that reads ``latents``
        (e.g. ``jnp.sum``) synchronizes each step.
        """
        cfg = self.config
        target_shape = compute_target_shape(cfg, size, frame_num)
        seq_len = compute_seq_len(cfg, target_shape, self.sp_size)
        b = context.shape[0]

        seed = seed if seed >= 0 else np.random.randint(0, 2**31)
        key = jax.random.PRNGKey(seed)
        latents = jax.random.normal(
            key, (b, *target_shape), dtype=jnp.float32
        )

        sch, timesteps = self._make_scheduler(sample_solver, sampling_steps, shift)

        if cfg_mode not in ("batched", "sequential"):
            raise ValueError(f"unknown cfg_mode {cfg_mode!r}")
        sequential = cfg_mode == "sequential"
        mode = "calib" if collect_calib else (
            self.quant_ctx.mode if self.quant_ctx is not None else "fp"
        )
        if sequential and collect_calib:
            raise ValueError(
                "calibration sweeps observe the cond/uncond pair in one "
                "batched forward; run calibration with cfg_mode='batched'"
            )
        step_fn = (self._step_fn(seq_len, "cond") if sequential
                   else self._step_fn(seq_len, mode))
        if collect_calib:
            assert self.quant_ctx is not None and self.quant_ctx.mode == "calib"
        arg_ctx = (
            self.quant_ctx
            if (self.quant_ctx is not None
                and (mode in ("sim", "int8")
                     # fp-mode ctx still matters when it carries the
                     # sliding temporal-window spec (--attn_window on an
                     # unquantized deployment)
                     or self.quant_ctx.attn_window is not None))
            else None
        )

        gs = jnp.float32(guide_scale)

        if cache_policy is not None and cache_policy.active:
            assert not collect_calib, (
                "calibration sweeps must observe every site every step; "
                "run calibration without a cache_policy"
            )
            return self._generate_cached(
                cache_policy, sch, timesteps, latents, arg_ctx,
                context, context_null, gs, seq_len, b,
                sequential=sequential, on_step=on_step,
            )

        all_stats: Dict[str, List[np.ndarray]] = {}
        hess_acc: Dict[str, jax.Array] = {}  # device-resident running sums
        for i, t in enumerate(timesteps):
            tt = jnp.full((b,), float(t), dtype=jnp.float32)
            step_ctx = arg_ctx
            if self.quant_ctx_schedule and not collect_calib:
                sched = self._ctx_for_timestep(float(t))
                step_ctx = sched if (sched is not None and sched.mode in ("sim", "int8")) else None
            if sequential:
                cond = step_fn(self.params, step_ctx, latents, tt, context)
                uncond = step_fn(self.params, step_ctx, latents, tt,
                                 context_null)
                out = uncond + gs * (cond - uncond)
            else:
                out = step_fn(self.params, step_ctx, latents, tt, context,
                              context_null, gs)
            if collect_calib:
                noise_pred, stats = out
                for k, v in stats.items():
                    if k.endswith(".hess"):
                        # GPTQ input Hessians sum over the sweep — a
                        # DEVICE-side running accumulator instead of a
                        # [T, C, C] stack: ffn Hessians are hundreds of MB
                        # each and per-step host pulls would crawl on a
                        # relayed TPU; one transfer at the end instead
                        prev = hess_acc.get(k)
                        hess_acc[k] = v if prev is None else prev + v
                    else:
                        all_stats.setdefault(k, []).append(np.asarray(v))
            else:
                noise_pred = out
            latents = sch.step(noise_pred, int(t), latents)
            if on_step is not None:
                on_step(i, float(t), latents)

        if collect_calib:
            stacked = {k: np.stack(v, axis=0) for k, v in all_stats.items()}
            # .hess entries stay DEVICE-resident (jax arrays): multi-round
            # accumulation and the GPTQ solve both run on device, and a
            # [ffn_dim, ffn_dim] pull over a relayed link costs minutes.
            # np.savez/np.asarray convert transparently where needed.
            stacked.update(hess_acc)
            return latents, stacked
        return latents

    def _generate_cached(
        self, policy, sch, timesteps, latents, arg_ctx,
        context, context_null, gs, seq_len, b,
        sequential: bool = False,
        on_step: Optional[Callable[[int, float, jax.Array], None]] = None,
        cond_fn: Optional[Callable] = None,
        split_fn: Optional[Callable] = None,
    ):
        """Denoise loop under a StepCachePolicy or AdaptiveCachePolicy.
        Per-step forward cost: 'full' = 2B tokens, 'cond' = B tokens,
        'reuse' = 0. Static schedules are planned up front; the adaptive
        policy decides each step from the measured input drift (see
        AdaptiveCachePolicy). Each action's step function compiles once.
        Under ``sequential`` (see generate cfg_mode) the 'full' action
        runs the pair as two B-sized forwards through the cond fn — same
        math, half the peak activation memory, and only ONE compiled
        variant serves every action. ``cond_fn``/``split_fn`` may be
        passed pre-bound (WanI2V binds its y/clip_fea conditioning) —
        both take (params, qctx, latents, tt, context[, context_null])."""
        if cond_fn is None:
            cond_fn = self._step_fn(seq_len, "cond")
        if split_fn is None:
            if sequential:
                def split_fn(params, qctx, latents, tt, context,
                             context_null):
                    return (cond_fn(params, qctx, latents, tt, context),
                            cond_fn(params, qctx, latents, tt, context_null))
            else:
                split_fn = self._step_fn(seq_len, "split")
        n_steps = len(timesteps)
        adaptive = isinstance(policy, AdaptiveCachePolicy)
        if adaptive:
            # per-step rel-L1 drift of the model input (reference point
            # updates every step, TeaCache-style); one jitted program,
            # one scalar fetch per step
            dist_fn = jax.jit(
                lambda a, r: jnp.mean(jnp.abs(a - r))
                / (jnp.mean(jnp.abs(r)) + 1e-8)
            )
            acc = 0.0
            x_prev = None
            n_eval = 0
            prev_exec_pred = None
            trace: List[Dict[str, float]] = []
        else:
            actions = policy.plan(n_steps)
        stats = {"full": 0, "cond": 0, "reuse": 0}
        last_uncond = None
        last_pred = None
        order = getattr(policy, "order", 0)
        # last order+1 EXECUTED (t, noise_pred) pairs — the forecast basis;
        # forecasted predictions never enter it (extrapolating from
        # extrapolations compounds error, so the basis is model output only)
        exec_hist: List[Tuple[float, jax.Array]] = []
        for i, t in enumerate(timesteps):
            if adaptive:
                protected = i < policy.warmup or i >= n_steps - policy.tail
                if protected or last_pred is None or x_prev is None:
                    act = "full" if (protected or last_uncond is None) else (
                        "cond" if policy.cfg_interval > 1
                        and n_eval % policy.cfg_interval else "full")
                    d = None
                else:
                    d = float(dist_fn(latents, x_prev))
                    acc += float(np.polyval(policy.poly, d))
                    if acc < policy.threshold:
                        act = "reuse"
                    elif (policy.cfg_interval > 1
                          and n_eval % policy.cfg_interval):
                        act = "cond"
                    else:
                        act = "full"
                if d is not None:
                    trace.append({"step": i, "d": d, "acc": acc,
                                  "act": act})
            else:
                act = actions[i]
            tt = jnp.full((b,), float(t), dtype=jnp.float32)
            step_ctx = arg_ctx
            if self.quant_ctx_schedule:
                sched = self._ctx_for_timestep(float(t))
                step_ctx = sched if (
                    sched is not None and sched.mode in ("sim", "int8")
                ) else None
            if act == "reuse" and last_pred is not None:
                if order and len(exec_hist) >= 2:
                    pts = exec_hist[-(order + 1):]
                    if len(pts) == 2:
                        (t0_, p0), (t1_, p1) = pts
                        c = (float(t) - t1_) / (t1_ - t0_)
                        hz = getattr(policy, "max_horizon", 0.0)
                        if hz > 0.0:
                            c = min(c, hz)
                        noise_pred = _forecast2(
                            p0, p1, jnp.float32(-c), jnp.float32(1.0 + c))
                    else:
                        ws = _lagrange_weights([p[0] for p in pts], float(t))
                        wj = [jnp.float32(w) for w in ws]
                        noise_pred = _forecast3(
                            pts[0][1], pts[1][1], pts[2][1], *wj)
                else:
                    noise_pred = last_pred
            elif act == "cond" and last_uncond is not None:
                cond = cond_fn(self.params, step_ctx, latents, tt, context)
                noise_pred = last_uncond + gs * (cond - last_uncond)
            else:
                act = "full"
                cond, uncond = split_fn(
                    self.params, step_ctx, latents, tt, context, context_null
                )
                last_uncond = uncond
                noise_pred = uncond + gs * (cond - uncond)
            if adaptive and act != "reuse":
                # record the realized output change between consecutive
                # executed forwards — the regression target fit_drift_poly
                # pairs with the input drift d (TeaCache's calibration)
                if (trace and trace[-1]["step"] == i
                        and prev_exec_pred is not None):
                    trace[-1]["o"] = float(dist_fn(noise_pred,
                                                   prev_exec_pred))
                prev_exec_pred = noise_pred
                acc = 0.0
                n_eval += 1
            if order and act != "reuse":
                exec_hist.append((float(t), noise_pred))
                del exec_hist[:-(order + 1)]
            stats[act] += 1
            last_pred = noise_pred
            if adaptive:
                x_prev = latents
            latents = sch.step(noise_pred, int(t), latents)
            if on_step is not None:
                on_step(i, float(t), latents)
        self.last_cache_stats = stats
        self.last_adaptive_trace = trace if adaptive else None
        return latents

    # -- quantized-deployment attention-map capture --------------------------

    def capture_attn_maps(
        self,
        context: jax.Array,
        size: Tuple[int, int] = (832, 480),
        frame_num: int = 81,
        pool: int = 256,
        reduce: str = "mean",
        t: float = 500.0,
        seed: int = 0,
        latents: Optional[jax.Array] = None,
    ) -> Dict[str, np.ndarray]:
        """One forward through the DEPLOYED (possibly quantized) model
        returning {block.self_attn: [H, S/pool, S/pool]} mean-pooled
        post-softmax self-attention maps — the calibration input to
        quant.attn.select_temporal_windows when no FP copy of the model
        exists to run a calib sweep through (the streamed 14B single-chip
        deployment). Runs DENSE regardless of the ctx's attn_window.

        The quant state rides as a jit ARGUMENT (pytree); the fresh
        collect dict is created INSIDE the traced function and its traced
        entries returned as outputs — no multi-GB closure literals."""
        cfg = self.config
        target_shape = compute_target_shape(cfg, size, frame_num)
        seq_len = compute_seq_len(cfg, target_shape, self.sp_size)
        b = context.shape[0]
        if latents is None:
            latents = jax.random.normal(
                jax.random.PRNGKey(seed), (b, *target_shape), jnp.float32
            )
        tt = jnp.full((b,), float(t), dtype=jnp.float32)

        def step(params, qctx, latents, tt, context):
            cctx = (qctx if qctx is not None else QuantCtx(mode="fp"))
            cctx = cctx.replace(collect={}, attn_map_pool=pool,
                                attn_map_reduce=reduce, attn_window=None)
            dit_forward(params, cfg, latents, tt, context, seq_len,
                        ctx=cctx, plan=self.shardings)
            return {k: v for k, v in cctx.collect.items()
                    if k.endswith(".attn_map")}

        maps = jax.jit(step)(self.params, self.quant_ctx, latents, tt,
                             context)
        if not maps:
            raise RuntimeError(
                "no attention maps captured — the model forward never hit "
                "the pooled-map hook (models/dit.py _self_attention)")
        return {k[: -len(".attn_map")]: np.asarray(v)
                for k, v in maps.items()}

    # -- calibration sweep (ref get_calib_data_wanx.py:278-473) -------------

    def collect_calibration(
        self,
        context: jax.Array,
        context_null: jax.Array,
        sampling_steps: int = 30,
        **kw,
    ) -> Dict[str, np.ndarray]:
        """FP denoise sweep that returns {layer: [T, C] absmax} — one row per
        jitted step (the batched CFG pair reduces the reference's 2 hook
        fires per step into one max, an equivalent upper bound)."""
        assert self.quant_ctx is not None and self.quant_ctx.mode == "calib"
        _, stats = self.generate(
            context,
            context_null,
            sampling_steps=sampling_steps,
            collect_calib=True,
            **kw,
        )
        return stats


def make_calib_ctx(cfg: WanConfig) -> QuantCtx:
    return QuantCtx(mode="calib")


def make_quant_ctx(
    mode: str,
    policies,
    state,
    rotations,
) -> QuantCtx:
    assert mode in ("sim", "int8")
    return QuantCtx(mode=mode, policies=policies, state=state, rotations=rotations)
