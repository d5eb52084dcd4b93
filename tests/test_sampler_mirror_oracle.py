"""Independent *stateful* mirror oracle for the sampler math.

VERDICT r2 established the pattern (external/second-implementation oracles for
every network: torch mirrors for UNet/VAE/tiny-VAE, real transformers for
CLIP); the samplers were the one component still verified only by golden
regression values — a wrong coefficient baked into a golden is
indistinguishable from an intended one.

This module re-implements the four diffusers schedulers the reference drives
(PNDM/PLMS: ``main.py:484-500`` eval edits; LCM: ``main.py:292-308``; DDIM;
EulerDiscrete: SDXL stock) **in diffusers' own style** — stateful objects with
``set_timesteps`` mutating internal counters/history and a Python loop calling
``step`` — i.e. a genuinely different decomposition from our host-precompiled
:class:`DenoisePlan` tables + branch-free scan bodies.  Both sides are driven
by a bit-identical pseudo-UNet, so any trajectory divergence is sampler math.

Strength handling mirrors the reference's *vendored pipeline*, which slices
``scheduler.timesteps[t_start * order:]`` after ``set_timesteps(K)`` for any
scheduler (``pipeline_stable_diffusion_img2img.py:711-720, 1042-1046``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tml_image_editing_defense_tpu.core import (
    DDIMSampler,
    EulerSampler,
    LCMSampler,
    PLMSSampler,
    make_noise_schedule,
)

# ---------------------------------------------------------------------------
# mirrors (numpy f32, stateful, loop-driven)
# ---------------------------------------------------------------------------


class _MirrorBase:
    """SD config: 1000 train steps, scaled_linear betas, steps_offset=1,
    set_alpha_to_one=False (final_alpha_cumprod = alphas_cumprod[0])."""

    def __init__(self, acp: np.ndarray, steps_offset: int = 1):
        self.acp = acp.astype(np.float32)
        self.final_alpha_cumprod = np.float32(acp[0])
        self.steps_offset = steps_offset
        self.num_train = len(acp)

    def _leading(self, k: int) -> np.ndarray:
        ratio = self.num_train // k
        return (np.arange(0, k) * ratio).round()[::-1].astype(np.int64) + self.steps_offset

    def _abar(self, t: int) -> np.float32:
        return self.acp[t] if t >= 0 else self.final_alpha_cumprod

    def add_noise(self, x0, noise, t):
        a = self._abar(int(t))
        return np.sqrt(a) * x0 + np.sqrt(1.0 - a) * noise

    def scale_model_input(self, sample, t):
        return sample


class MirrorDDIM(_MirrorBase):
    """DDIMScheduler semantics (clip_sample=False), eta=0 (deterministic)."""

    def set_timesteps(self, k: int):
        self.num_inference_steps = k
        self.timesteps = self._leading(k)

    def step(self, model_output, t, sample):
        prev_t = t - self.num_train // self.num_inference_steps
        a_t = self._abar(t)
        a_prev = self._abar(prev_t)
        x0 = (sample - np.sqrt(1.0 - a_t) * model_output) / np.sqrt(a_t)
        direction = np.sqrt(1.0 - a_prev) * model_output
        return np.sqrt(a_prev) * x0 + direction


class MirrorPNDM(_MirrorBase):
    """PNDMScheduler with skip_prk_steps=True: the stateful counter + ets
    history + cur_sample warmup logic, verbatim in structure."""

    def set_timesteps(self, k: int):
        self.num_inference_steps = k
        self.ratio = self.num_train // k
        base = (np.arange(0, k) * self.ratio).round().astype(np.int64) + self.steps_offset
        self.timesteps = np.concatenate([base[:-1], base[-2:-1], base[-1:]])[::-1]
        self.ets = []
        self.counter = 0
        self.cur_sample = None

    def step(self, model_output, t, sample):
        prev_t = t - self.ratio
        if self.counter != 1:
            self.ets = self.ets[-3:]
            self.ets.append(model_output)
        else:
            prev_t = t
            t = t + self.ratio
        if len(self.ets) == 1 and self.counter == 0:
            mo = model_output
            self.cur_sample = sample
        elif len(self.ets) == 1 and self.counter == 1:
            mo = (model_output + self.ets[-1]) / 2
            sample = self.cur_sample
            self.cur_sample = None
        elif len(self.ets) == 2:
            mo = (3 * self.ets[-1] - self.ets[-2]) / 2
        elif len(self.ets) == 3:
            mo = (23 * self.ets[-1] - 16 * self.ets[-2] + 5 * self.ets[-3]) / 12
        else:
            mo = (55 * self.ets[-1] - 59 * self.ets[-2] + 37 * self.ets[-3]
                  - 9 * self.ets[-4]) / 24
        self.counter += 1
        return self._prev_sample(sample, t, prev_t, mo)

    def _prev_sample(self, sample, t, prev_t, model_output):
        a_t = self._abar(t)
        a_prev = self._abar(prev_t)
        b_t = 1.0 - a_t
        b_prev = 1.0 - a_prev
        coeff = np.sqrt(a_prev / a_t)
        denom = a_t * np.sqrt(b_prev) + np.sqrt(a_t * b_t * a_prev)
        return coeff * sample - (a_prev - a_t) * model_output / denom


class MirrorLCM(_MirrorBase):
    """LCMScheduler semantics: original_inference_steps=50,
    timestep_scaling=10, sigma_data=0.5; noise injected at non-final steps."""

    original_inference_steps = 50
    timestep_scaling = 10.0
    sigma_data = 0.5

    def set_timesteps(self, k: int):
        c = self.num_train // self.original_inference_steps
        origin = np.arange(1, self.original_inference_steps + 1) * c - 1
        skipping = self.original_inference_steps // k
        self.timesteps = origin[::-1][::skipping][:k].astype(np.int64)
        self.step_index = 0

    def slice_for_strength(self, t_start: int):
        """The vendored pipeline's get_timesteps slicing (order=1)."""
        self.timesteps = self.timesteps[t_start:]
        self.step_index = 0

    def step(self, model_output, t, sample, noise):
        i = self.step_index
        a_t = self._abar(t)
        x0 = (sample - np.sqrt(1.0 - a_t) * model_output) / np.sqrt(a_t)
        s = np.float32(t) * np.float32(self.timestep_scaling)
        sd2 = np.float32(self.sigma_data**2)
        c_skip = sd2 / (s**2 + sd2)
        c_out = s / np.sqrt(s**2 + sd2)
        denoised = c_out * x0 + c_skip * sample
        self.step_index += 1
        if i == len(self.timesteps) - 1:
            return denoised
        a_prev = self._abar(int(self.timesteps[i + 1]))
        return np.sqrt(a_prev) * denoised + np.sqrt(1.0 - a_prev) * noise


class MirrorEuler(_MirrorBase):
    """EulerDiscreteScheduler (epsilon prediction, no churn)."""

    def set_timesteps(self, k: int):
        ts = self._leading(k)
        sig_full = np.sqrt((1.0 - self.acp) / self.acp)
        sig = np.interp(ts.astype(np.float64), np.arange(self.num_train),
                        sig_full).astype(np.float32)
        self.timesteps = ts
        self.sigmas = np.concatenate([sig, [np.float32(0.0)]])
        self.step_index = 0

    def add_noise(self, x0, noise, t=None):
        return x0 + self.sigmas[self.step_index] * noise

    def scale_model_input(self, sample, t):
        s = self.sigmas[self.step_index]
        return sample / np.sqrt(s**2 + 1.0)

    def step(self, model_output, t, sample):
        i = self.step_index
        sigma = self.sigmas[i]
        pred_x0 = sample - sigma * model_output
        derivative = (sample - pred_x0) / sigma
        self.step_index += 1
        return sample + derivative * (self.sigmas[i + 1] - sigma)


# ---------------------------------------------------------------------------
# the shared pseudo-UNet and the two drivers
# ---------------------------------------------------------------------------

SHAPE = (1, 3, 4, 4)


def fake_eps(sample: np.ndarray, t) -> np.ndarray:
    """Deterministic pseudo-UNet, bit-identical on both sides (numpy f32)."""
    x = np.asarray(sample, np.float32)
    t = np.float32(t)
    return (np.tanh(1.3 * x + 0.1 * np.cos(t / 37.0))
            * (0.8 + 0.2 * np.sin(t / 11.0))).astype(np.float32)


def run_ours(sampler, plan, x0, noise, step_noises=None):
    """Drive our plan-table sampler exactly as denoise_chain does."""
    x = sampler.add_noise(plan, jnp.asarray(x0), jnp.asarray(noise))
    carry = sampler.init_carry(SHAPE, jnp.float32)
    t_eval = np.asarray(plan.t_eval)
    traj = []
    for i in range(plan.num_steps):
        x_in = sampler.scale_model_input(plan, i, x)
        eps = jnp.asarray(fake_eps(np.asarray(x_in), t_eval[i]))
        key = jax.random.key(0)
        if step_noises is not None:
            # inject the recorded noise by monkey-free substitution: LCM's
            # step draws normal(key); we instead pass a key and rely on the
            # mirror consuming the SAME draw (computed below from this key)
            key = jax.random.fold_in(jax.random.key(7), i)
        x, carry = sampler.step(plan, i, carry, eps, x, key)
        traj.append(np.asarray(x))
    return traj


def run_mirror(mirror, timesteps, x0, noise, lcm_keys=None):
    x = mirror.add_noise(np.asarray(x0, np.float32), np.asarray(noise, np.float32),
                         int(timesteps[0]) if len(timesteps) else 0)
    traj = []
    for i, t in enumerate(timesteps):
        x_in = mirror.scale_model_input(x, t)
        eps = fake_eps(x_in, t)
        if lcm_keys is not None:
            step_noise = np.asarray(
                jax.random.normal(lcm_keys[i], SHAPE, jnp.float32))
            x = mirror.step(eps, int(t), x, step_noise)
        else:
            x = mirror.step(eps, int(t), x)
        traj.append(np.asarray(x, np.float32))
    return traj


def _assert_traj_close(ours, theirs, atol=3e-5):
    assert len(ours) == len(theirs)
    for i, (a, b) in enumerate(zip(ours, theirs)):
        np.testing.assert_allclose(a, b, atol=atol, rtol=3e-5,
                                   err_msg=f"step {i} diverged")


@pytest.fixture(scope="module")
def schedule():
    return make_noise_schedule()


@pytest.fixture(scope="module")
def acp(schedule):
    return np.asarray(schedule.alphas_cumprod, np.float32)


@pytest.fixture(scope="module")
def inputs():
    rng = np.random.default_rng(3)
    x0 = rng.normal(0, 0.6, SHAPE).astype(np.float32)
    noise = rng.normal(0, 1.0, SHAPE).astype(np.float32)
    return x0, noise


@pytest.mark.parametrize("k,strength", [(50, None), (50, 0.6), (4, None)])
def test_plms_matches_stateful_mirror(schedule, acp, inputs, k, strength):
    """PLMS/PNDM (the reference's 50-step eval sampler) vs the stateful
    counter+ets mirror, incl. the warmup corrector and strength slicing."""
    x0, noise = inputs
    ours = PLMSSampler(schedule)
    plan = ours.plan(k, strength=strength)

    mirror = MirrorPNDM(acp)
    mirror.set_timesteps(k)
    ts = mirror.timesteps
    if strength is not None:
        t_start = max(k - min(int(k * strength), k), 0)
        ts = ts[t_start:]
    np.testing.assert_array_equal(np.asarray(plan.t_eval), ts)

    _assert_traj_close(run_ours(ours, plan, x0, noise),
                       run_mirror(mirror, ts, x0, noise))


@pytest.mark.parametrize("k", [4, 10])
def test_ddim_matches_stateful_mirror(schedule, acp, inputs, k):
    x0, noise = inputs
    ours = DDIMSampler(schedule, eta=0.0)
    plan = ours.plan(k)
    mirror = MirrorDDIM(acp)
    mirror.set_timesteps(k)
    np.testing.assert_array_equal(np.asarray(plan.t_eval), mirror.timesteps)
    _assert_traj_close(run_ours(ours, plan, x0, noise),
                       run_mirror(mirror, mirror.timesteps, x0, noise))


@pytest.mark.parametrize("k,strength", [(4, None), (4, 0.6), (8, None)])
def test_lcm_matches_stateful_mirror(schedule, acp, inputs, k, strength):
    """LCM (the reference's training scheduler when use_lcm=True) incl. the
    per-step noise injection — the mirror consumes the exact draws our step
    makes from its per-step key — and pipeline-style strength slicing."""
    x0, noise = inputs
    ours = LCMSampler(schedule)
    plan = ours.plan(k, strength=strength)

    mirror = MirrorLCM(acp)
    mirror.set_timesteps(k)
    if strength is not None:
        mirror.slice_for_strength(max(k - min(int(k * strength), k), 0))
    np.testing.assert_array_equal(np.asarray(plan.t_eval), mirror.timesteps)

    keys = [jax.random.fold_in(jax.random.key(7), i)
            for i in range(plan.num_steps)]
    _assert_traj_close(
        run_ours(ours, plan, x0, noise, step_noises=True),
        run_mirror(mirror, mirror.timesteps, x0, noise, lcm_keys=keys))


@pytest.mark.parametrize("k", [4, 25])
def test_euler_matches_stateful_mirror(schedule, acp, inputs, k):
    """Euler discrete (SDXL stock): sigma-space add_noise, input scaling,
    and the sigma-difference update."""
    x0, noise = inputs
    ours = EulerSampler(schedule)
    plan = ours.plan(k)
    mirror = MirrorEuler(acp)
    mirror.set_timesteps(k)
    np.testing.assert_array_equal(np.asarray(plan.t_eval), mirror.timesteps)
    assert np.isclose(float(plan.init_sigma), mirror.sigmas[0], rtol=1e-6)
    _assert_traj_close(run_ours(ours, plan, x0, noise),
                       run_mirror(mirror, mirror.timesteps, x0, noise))
