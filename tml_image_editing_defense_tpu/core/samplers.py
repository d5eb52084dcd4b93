"""Denoising samplers as static-shape, `lax.scan`-friendly step tables.

Design (TPU-first, no reference analog): the reference drives stateful
diffusers scheduler objects from a Python loop (``main.py:229-243``,
``pipelines/pipeline_stable_diffusion_img2img.py:1081-1124``).  Here every
sampler is compiled to a :class:`DenoisePlan` — a host-precomputed table of
per-step scalars (timesteps, alpha-bars, sigmas, multistep coefficients) — and
a pure ``step`` function, so the whole K-step denoising chain is a single
``lax.scan`` with static shapes: one XLA program, rematerializable, and
differentiable end-to-end.

Samplers implemented (semantics match the diffusers schedulers the reference
uses; cited where consumed):

- :class:`DDIMSampler` — DDIM with eta (the reference passes ``eta=0.9`` when
  the scheduler accepts it, ``main.py:219-220``).
- :class:`LCMSampler` — latent-consistency sampling, the reference's training
  scheduler when ``use_lcm=True`` (``main.py:292-295, 305-308``).
- :class:`PLMSSampler` — PNDM with ``skip_prk_steps=True``, SD-1.5's stock
  scheduler, used by the reference's 50-step evaluation edits
  (``main.py:484-500``).
- :class:`EulerSampler` — Euler discrete, SDXL base's stock scheduler.

Timestep-plan features required by the reference:

- *strength* clipping for img2img/SDEdit (``pipeline_stable_diffusion_img2img
  .py:711-720``): drop the first ``K - int(K * strength)`` steps.
- *limit_timesteps*: drop steps with ``t >= 700`` during the attack
  (``main.py:198-199``).  Both are applied host-side so jitted shapes stay
  static ("mask, don't filter" is unnecessary — the plan itself shrinks at
  trace time).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tml_image_editing_defense_tpu.core.schedule import NoiseSchedule


@flax.struct.dataclass
class DenoisePlan:
    """Per-step scalar table for one denoising run.  All ``[K]`` arrays."""

    t_eval: jnp.ndarray          # int32 — timestep fed to the UNet
    alpha_prod: jnp.ndarray      # float32 — alpha-bar at the step's t_cur
    alpha_prod_prev: jnp.ndarray  # float32 — alpha-bar at the step's t_prev
    sigma: jnp.ndarray           # float32 — Euler sigma_i (zeros otherwise)
    sigma_next: jnp.ndarray      # float32 — Euler sigma_{i+1}
    ab_a: jnp.ndarray            # float32 — PLMS coefficient of the fresh eps
    ab_w: jnp.ndarray            # float32 [K,4] — PLMS weights over the ets buffer
    push: jnp.ndarray            # bool — PLMS: push fresh eps into the buffer
    use_orig: jnp.ndarray        # bool — PLMS: step from the saved original sample
    is_last: jnp.ndarray         # bool — last step flag (LCM noise gating)
    init_timestep: jnp.ndarray   # int32 scalar — add-noise timestep (t_eval[0])
    init_sigma: jnp.ndarray      # float32 scalar — Euler add-noise sigma
    num_steps: int = flax.struct.field(pytree_node=False, default=0)
    kind: str = flax.struct.field(pytree_node=False, default="ddim")


def _leading_timesteps(num_train: int, k: int, steps_offset: int) -> np.ndarray:
    """'leading' timestep spacing (diffusers default for SD configs)."""
    ratio = num_train // k
    return (np.arange(0, k) * ratio).round()[::-1].astype(np.int64) + steps_offset


def _apply_strength(ts: np.ndarray, k: int, strength: Optional[float]) -> np.ndarray:
    """img2img strength clipping (pipeline_stable_diffusion_img2img.py:711-720)."""
    if strength is None:
        return ts
    init_timestep = min(int(k * strength), k)
    t_start = max(k - init_timestep, 0)
    return ts[t_start:]


def _abar(schedule: NoiseSchedule, t: np.ndarray) -> np.ndarray:
    """Host-side alpha-bar lookup with t<0 → final_alpha_cumprod."""
    table = np.asarray(schedule.alphas_cumprod)
    final = float(np.asarray(schedule.final_alpha_cumprod))
    t = np.asarray(t)
    out = np.where(t >= 0, table[np.clip(t, 0, len(table) - 1)], final)
    return out.astype(np.float32)


def _pack(
    kind: str,
    schedule: NoiseSchedule,
    t_eval: np.ndarray,
    t_cur: np.ndarray,
    t_prev: np.ndarray,
    sigma: Optional[np.ndarray] = None,
    sigma_next: Optional[np.ndarray] = None,
    ab_a: Optional[np.ndarray] = None,
    ab_w: Optional[np.ndarray] = None,
    push: Optional[np.ndarray] = None,
    use_orig: Optional[np.ndarray] = None,
    init_sigma: float = 0.0,
) -> DenoisePlan:
    k = len(t_eval)
    z = np.zeros(k, np.float32)
    is_last = np.zeros(k, bool)
    if k:
        is_last[-1] = True
    return DenoisePlan(
        t_eval=jnp.asarray(t_eval, jnp.int32),
        alpha_prod=jnp.asarray(_abar(schedule, t_cur)),
        alpha_prod_prev=jnp.asarray(_abar(schedule, t_prev)),
        sigma=jnp.asarray(z if sigma is None else sigma.astype(np.float32)),
        sigma_next=jnp.asarray(z if sigma_next is None else sigma_next.astype(np.float32)),
        ab_a=jnp.asarray(np.ones(k, np.float32) if ab_a is None else ab_a.astype(np.float32)),
        ab_w=jnp.asarray(np.zeros((k, 4), np.float32) if ab_w is None else ab_w.astype(np.float32)),
        push=jnp.asarray(np.ones(k, bool) if push is None else push),
        use_orig=jnp.asarray(np.zeros(k, bool) if use_orig is None else use_orig),
        is_last=jnp.asarray(is_last),
        init_timestep=jnp.asarray(t_eval[0] if k else 0, jnp.int32),
        init_sigma=jnp.asarray(init_sigma, jnp.float32),
        num_steps=k,
        kind=kind,
    )


class BaseSampler:
    """Common sampler interface.

    ``plan`` runs on the host at trace/setup time; ``add_noise``,
    ``scale_model_input`` and ``step`` are pure jax functions safe inside jit.
    """

    kind = "base"
    #: UNet calls per plan row (PNDM "order" used by strength clipping).
    order = 1

    def __init__(self, schedule: NoiseSchedule, steps_offset: int = 1):
        self.schedule = schedule
        self.steps_offset = steps_offset

    # -- host side -------------------------------------------------------

    def plan(
        self,
        num_inference_steps: int,
        strength: Optional[float] = None,
        limit_t: Optional[int] = None,
        min_t: Optional[int] = None,
    ) -> DenoisePlan:
        """``limit_t`` drops steps with t >= limit_t (the reference's
        training filter, main.py:198-199, and SDXL ``denoising_start``);
        ``min_t`` drops steps with t < min_t (SDXL ``denoising_end``
        windowing, sdxl_img2img_pipeline.py:392-412)."""
        raise NotImplementedError

    # -- device side -------------------------------------------------------

    def init_carry(self, shape: Tuple[int, ...], dtype) -> tuple:
        """Scan carry beyond the latent itself (PLMS history; else empty)."""
        return ()

    def add_noise(self, plan: DenoisePlan, x0: jnp.ndarray, noise: jnp.ndarray) -> jnp.ndarray:
        """Noise the clean latent to the plan's first timestep (main.py:216)."""
        return self.schedule.add_noise(x0, noise, plan.init_timestep)

    def scale_model_input(self, plan: DenoisePlan, i, x: jnp.ndarray) -> jnp.ndarray:
        return x

    def step(self, plan, i, carry, model_output, sample, key):
        raise NotImplementedError


class DDIMSampler(BaseSampler):
    """DDIM with eta (Song et al.); diffusers-DDIMScheduler semantics with
    ``clip_sample=False``, ``set_alpha_to_one=False``, leading spacing."""

    kind = "ddim"

    def __init__(self, schedule: NoiseSchedule, eta: float = 0.0, steps_offset: int = 1):
        super().__init__(schedule, steps_offset)
        self.eta = eta

    def plan(self, num_inference_steps, strength=None, limit_t=None, min_t=None) -> DenoisePlan:
        k = num_inference_steps
        ratio = self.schedule.num_train_timesteps // k
        ts = _leading_timesteps(self.schedule.num_train_timesteps, k, self.steps_offset)
        ts = _apply_strength(ts, k, strength)
        if limit_t is not None:
            ts = ts[ts < limit_t]
        if min_t is not None:
            ts = ts[ts >= min_t]
        return _pack(self.kind, self.schedule, ts, ts, ts - ratio)

    def step(self, plan, i, carry, model_output, sample, key):
        dt = sample.dtype
        a_t = plan.alpha_prod[i].astype(dt)
        a_prev = plan.alpha_prod_prev[i].astype(dt)
        sqrt_one_minus = jnp.sqrt(1.0 - a_t)
        x0 = (sample - sqrt_one_minus * model_output) / jnp.sqrt(a_t)
        variance = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        std = self.eta * jnp.sqrt(variance)
        direction = jnp.sqrt(1.0 - a_prev - std**2) * model_output
        prev = jnp.sqrt(a_prev) * x0 + direction
        if self.eta > 0:
            prev = prev + std * jax.random.normal(key, sample.shape, dt)
        return prev, carry


class LCMSampler(BaseSampler):
    """Latent-consistency sampling (diffusers LCMScheduler semantics:
    ``original_inference_steps=50``, ``timestep_scaling=10``, sigma_data=0.5).

    The reference swaps this in for 4-step training chains
    (``main.py:292-295, 305-308``; K=4 via ``configs.py:101``)."""

    kind = "lcm"

    def __init__(
        self,
        schedule: NoiseSchedule,
        original_inference_steps: int = 50,
        timestep_scaling: float = 10.0,
        sigma_data: float = 0.5,
    ):
        super().__init__(schedule)
        self.original_inference_steps = original_inference_steps
        self.timestep_scaling = timestep_scaling
        self.sigma_data = sigma_data

    def plan(self, num_inference_steps, strength=None, limit_t=None, min_t=None) -> DenoisePlan:
        t_train = self.schedule.num_train_timesteps
        c = t_train // self.original_inference_steps
        origin = np.arange(1, self.original_inference_steps + 1) * c - 1  # ascending
        origin = origin[::-1].copy()
        if len(origin) < num_inference_steps:
            # mirrors diffusers LCMScheduler.set_timesteps' explicit error
            # (otherwise origin[::0] raises a cryptic zero-step slice)
            raise ValueError(
                f"num_inference_steps={num_inference_steps} exceeds the "
                f"{len(origin)} origin timesteps available"
                f" (original_inference_steps={self.original_inference_steps})"
            )
        skipping = len(origin) // num_inference_steps
        ts = origin[::skipping][:num_inference_steps].astype(np.int64)
        # Strength clips the *built* K-step schedule, exactly like every other
        # sampler: the reference's vendored pipeline applies strength by
        # slicing ``scheduler.timesteps[t_start:]`` AFTER ``set_timesteps(K)``
        # for any scheduler incl. LCM (pipeline_stable_diffusion_img2img.py:
        # 711-720, 1042-1046; strength never reaches set_timesteps).  LCM-4 at
        # strength 0.6 therefore runs 2 steps [519, 279] — not a re-derived
        # 4-step schedule from an origin clipped at 599 (which is newer
        # diffusers' LCMScheduler.set_timesteps(strength=...) semantics, a
        # path the reference never exercises).
        ts = _apply_strength(ts, num_inference_steps, strength)
        if limit_t is not None:
            ts = ts[ts < limit_t]
        if min_t is not None:
            ts = ts[ts >= min_t]
        t_prev = np.concatenate([ts[1:], ts[-1:]]) if len(ts) else ts
        return _pack(self.kind, self.schedule, ts, ts, t_prev)

    def step(self, plan, i, carry, model_output, sample, key):
        dt = sample.dtype
        a_t = plan.alpha_prod[i].astype(dt)
        a_prev = plan.alpha_prod_prev[i].astype(dt)
        x0 = (sample - jnp.sqrt(1.0 - a_t) * model_output) / jnp.sqrt(a_t)
        s = plan.t_eval[i].astype(dt) * self.timestep_scaling
        sd2 = self.sigma_data**2
        c_skip = sd2 / (s**2 + sd2)
        c_out = s / jnp.sqrt(s**2 + sd2)
        denoised = c_out * x0 + c_skip * sample
        noise = jax.random.normal(key, sample.shape, dt)
        noised = jnp.sqrt(a_prev) * denoised + jnp.sqrt(1.0 - a_prev) * noise
        prev = jnp.where(plan.is_last[i], denoised, noised)
        return prev, carry


class PLMSSampler(BaseSampler):
    """PNDM with ``skip_prk_steps=True`` (PLMS / linear multistep) — SD-1.5's
    stock scheduler, driving the reference's 50-step evaluation edits.

    The diffusers implementation is stateful (an ``ets`` history list plus a
    warmup counter).  Here the warmup and the Adams–Bashforth coefficient
    switching are *precompiled into the plan*: per row we store the
    coefficient of the fresh eps (``ab_a``), weights over a 4-slot
    most-recent-first history buffer (``ab_w``), whether to push into the
    buffer, and whether to step from the saved original sample — so the scan
    body is branch-free.
    """

    kind = "plms"

    def plan(self, num_inference_steps, strength=None, limit_t=None, min_t=None) -> DenoisePlan:
        k = num_inference_steps
        t_train = self.schedule.num_train_timesteps
        ratio = t_train // k
        asc = (np.arange(0, k) * ratio).round().astype(np.int64) + self.steps_offset
        # PNDM skip_prk list: duplicate the second-to-last ascending entry,
        # then reverse → [t_max, t_max-r, t_max-r, t_max-2r, ...].
        ts = np.concatenate([asc[:-1], asc[-2:-1], asc[-1:]])[::-1].copy()
        ts = _apply_strength(ts, k, strength)
        if limit_t is not None:
            ts = ts[ts < limit_t]
        if min_t is not None:
            ts = ts[ts >= min_t]
        m = len(ts)
        t_cur = ts.copy()
        t_prev = ts - ratio
        ab_a = np.ones(m, np.float32)
        ab_w = np.zeros((m, 4), np.float32)
        push = np.ones(m, bool)
        use_orig = np.zeros(m, bool)
        for i in range(m):
            if i == 0:
                ab_a[i] = 1.0
            elif i == 1:
                # warmup: Heun-like corrector re-stepping from the original
                # sample at the *first* timestep pair.
                t_cur[i] = ts[i] + ratio
                t_prev[i] = ts[i]
                ab_a[i] = 0.5
                ab_w[i, 0] = 0.5
                push[i] = False
                use_orig[i] = True
            elif i == 2:
                ab_a[i] = 1.5
                ab_w[i, 0] = -0.5
            elif i == 3:
                ab_a[i] = 23.0 / 12.0
                ab_w[i, 0] = -16.0 / 12.0
                ab_w[i, 1] = 5.0 / 12.0
            else:
                ab_a[i] = 55.0 / 24.0
                ab_w[i, 0] = -59.0 / 24.0
                ab_w[i, 1] = 37.0 / 24.0
                ab_w[i, 2] = -9.0 / 24.0
        return _pack(
            self.kind, self.schedule, ts, t_cur, t_prev,
            ab_a=ab_a, ab_w=ab_w, push=push, use_orig=use_orig,
        )

    def init_carry(self, shape, dtype):
        return (
            jnp.zeros((4,) + tuple(shape), dtype),  # ets ring (most recent first)
            jnp.zeros(shape, dtype),                # saved original sample
        )

    def step(self, plan, i, carry, model_output, sample, key):
        ets, orig = carry
        dt = sample.dtype
        # Save the original sample on the first row (row 0 always pushes and
        # never uses orig — safe to overwrite there).
        orig = jnp.where(jnp.equal(i, 0), sample, orig)
        base = jnp.where(plan.use_orig[i], orig, sample)
        combo = plan.ab_a[i].astype(dt) * model_output + jnp.tensordot(
            plan.ab_w[i].astype(dt), ets, axes=1
        )
        a_t = plan.alpha_prod[i].astype(dt)
        a_prev = plan.alpha_prod_prev[i].astype(dt)
        sample_coeff = jnp.sqrt(a_prev / a_t)
        denom = a_t * jnp.sqrt(1.0 - a_prev) + jnp.sqrt(a_t * (1.0 - a_t) * a_prev)
        prev = sample_coeff * base - (a_prev - a_t) * combo / denom
        pushed = jnp.concatenate([model_output[None], ets[:3]], axis=0)
        ets = jnp.where(plan.push[i], pushed, ets)
        return prev, (ets, orig)


class EulerSampler(BaseSampler):
    """Euler discrete (SDXL base's stock scheduler), epsilon prediction.

    img2img initial noising happens in sigma space (``x0 + sigma*eps``) and
    model inputs are normalized by ``1/sqrt(sigma^2+1)``.
    """

    kind = "euler"

    def plan(self, num_inference_steps, strength=None, limit_t=None, min_t=None) -> DenoisePlan:
        k = num_inference_steps
        ts = _leading_timesteps(self.schedule.num_train_timesteps, k, self.steps_offset)
        ts = _apply_strength(ts, k, strength)
        if limit_t is not None:
            ts = ts[ts < limit_t]
        if min_t is not None:
            ts = ts[ts >= min_t]
        abar_full = np.asarray(self.schedule.alphas_cumprod)
        sig_full = np.sqrt((1.0 - abar_full) / abar_full)
        sig = np.interp(ts.astype(np.float64), np.arange(len(sig_full)), sig_full)
        sig_next = np.concatenate([sig[1:], [0.0]])
        ratio = self.schedule.num_train_timesteps // k
        return _pack(
            self.kind, self.schedule, ts, ts, ts - ratio,
            sigma=sig, sigma_next=sig_next,
            init_sigma=float(sig[0]) if len(sig) else 0.0,
        )

    def add_noise(self, plan, x0, noise):
        return x0 + plan.init_sigma.astype(x0.dtype) * noise

    def scale_model_input(self, plan, i, x):
        s = plan.sigma[i].astype(x.dtype)
        return x / jnp.sqrt(s**2 + 1.0)

    def step(self, plan, i, carry, model_output, sample, key):
        dt = sample.dtype
        sigma = plan.sigma[i].astype(dt)
        # epsilon prediction: x0_hat = sample - sigma * eps
        derivative = model_output
        prev = sample + (plan.sigma_next[i].astype(dt) - sigma) * derivative
        return prev, carry


_SAMPLERS = {
    "ddim": DDIMSampler,
    "lcm": LCMSampler,
    "plms": PLMSSampler,
    "pndm": PLMSSampler,
    "euler": EulerSampler,
}


def make_sampler(kind: str, schedule: NoiseSchedule, **kwargs) -> BaseSampler:
    try:
        cls = _SAMPLERS[kind]
    except KeyError:
        raise ValueError(f"unknown sampler kind {kind!r}; have {sorted(_SAMPLERS)}")
    return cls(schedule, **kwargs)
