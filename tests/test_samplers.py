"""Scheduler/sampler numerics.

The reference has no tests (SURVEY.md §4); these pin our sampler math to the
diffusers semantics the reference depends on: timestep plans (incl. strength
clipping, pipeline_stable_diffusion_img2img.py:711-720, and the t<700 filter,
main.py:198-199), add_noise, and per-step update rules.
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
    make_sampler,
)


@pytest.fixture(scope="module")
def schedule():
    return make_noise_schedule()


def test_schedule_table(schedule):
    a = np.asarray(schedule.alphas_cumprod)
    assert a.shape == (1000,)
    # scaled_linear endpoints
    assert np.isclose(a[0], 1.0 - 0.00085, atol=1e-6)
    assert np.all(np.diff(a) < 0)
    assert 0.0 < a[-1] < 0.01
    assert np.isclose(np.asarray(schedule.final_alpha_cumprod), a[0])


def test_add_noise_limits(schedule):
    x = jnp.ones((1, 4, 8, 8))
    eps = jnp.full((1, 4, 8, 8), 2.0)
    # early timestep ≈ passthrough
    y0 = schedule.add_noise(x, eps, jnp.asarray(0))
    assert np.allclose(y0, np.sqrt(1 - 0.00085) * 1.0 + np.sqrt(0.00085) * 2.0, atol=1e-5)
    # late timestep ≈ pure noise
    y999 = schedule.add_noise(x, eps, jnp.asarray(999))
    assert np.allclose(y999, 2.0, atol=0.25)


def test_ddim_plan_leading_spacing(schedule):
    s = DDIMSampler(schedule)
    p = s.plan(4)
    assert p.num_steps == 4
    np.testing.assert_array_equal(np.asarray(p.t_eval), [751, 501, 251, 1])
    # strength clipping: 50 steps, strength .6 → keep last 30
    p2 = s.plan(50, strength=0.6)
    assert p2.num_steps == 30
    assert int(np.asarray(p2.t_eval)[0]) == 581
    assert int(np.asarray(p2.t_eval)[-1]) == 1


def test_lcm_plan_and_t700_filter(schedule):
    s = LCMSampler(schedule)
    p = s.plan(4)
    np.testing.assert_array_equal(np.asarray(p.t_eval), [999, 759, 519, 279])
    # the reference's limit_timesteps drops t >= 700 (main.py:198-199)
    p2 = s.plan(4, limit_t=700)
    np.testing.assert_array_equal(np.asarray(p2.t_eval), [519, 279])
    assert bool(np.asarray(p2.is_last)[-1])


def test_lcm_strength_slices_built_schedule(schedule):
    """Strength clips the BUILT K-step LCM schedule by slicing, matching the
    reference's vendored pipeline (get_timesteps at
    pipeline_stable_diffusion_img2img.py:711-720 slices
    ``scheduler.timesteps[t_start:]`` for any scheduler; strength never
    reaches set_timesteps).  The sweep's LCM-4 eval at strength 0.6
    (run_all.py:59, inference_strength=0.6) must run 2 steps [519, 279] —
    previously this re-derived a 4-step schedule from an origin clipped at
    599 (newer-diffusers set_timesteps(strength=...) semantics, never
    exercised by the reference)."""
    s = LCMSampler(schedule)
    p = s.plan(4, strength=0.6)
    np.testing.assert_array_equal(np.asarray(p.t_eval), [519, 279])
    assert int(np.asarray(p.init_timestep)) == 519     # add-noise timestep
    assert bool(np.asarray(p.is_last)[-1])
    # strength 1.0 keeps the full schedule
    np.testing.assert_array_equal(
        np.asarray(s.plan(4, strength=1.0).t_eval), [999, 759, 519, 279])


def test_ddim_step_eta0_deterministic_roundtrip(schedule):
    """eta=0 DDIM applied to exact q(x_t|x0) with the true eps recovers the
    x_{t_prev} consistency: stepping with the true eps must land on
    sqrt(abar_prev)x0 + sqrt(1-abar_prev)eps."""
    s = DDIMSampler(schedule, eta=0.0)
    p = s.plan(4)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.key(1), x0.shape)
    i = 0
    xt = schedule.add_noise(x0, eps, p.t_eval[i])
    prev, _ = s.step(p, i, (), eps, xt, key)
    a_prev = np.asarray(p.alpha_prod_prev)[i]
    expect = np.sqrt(a_prev) * np.asarray(x0) + np.sqrt(1 - a_prev) * np.asarray(eps)
    np.testing.assert_allclose(np.asarray(prev), expect, atol=1e-5)


def test_ddim_eta_adds_variance(schedule):
    s = DDIMSampler(schedule, eta=0.9)
    p = s.plan(4)
    x = jax.random.normal(jax.random.key(2), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.key(3), x.shape)
    a, _ = s.step(p, 0, (), eps, x, jax.random.key(10))
    b, _ = s.step(p, 0, (), eps, x, jax.random.key(11))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_lcm_last_step_deterministic(schedule):
    s = LCMSampler(schedule)
    p = s.plan(4)
    x = jax.random.normal(jax.random.key(4), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.key(5), x.shape)
    last = p.num_steps - 1
    a, _ = s.step(p, last, (), eps, x, jax.random.key(20))
    b, _ = s.step(p, last, (), eps, x, jax.random.key(21))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # non-last steps inject fresh noise
    a2, _ = s.step(p, 0, (), eps, x, jax.random.key(20))
    b2, _ = s.step(p, 0, (), eps, x, jax.random.key(21))
    assert not np.allclose(np.asarray(a2), np.asarray(b2))


def test_lcm_boundary_conditions(schedule):
    """c_skip + scaled c_out behaviour: at t=0 the step returns ~x0."""
    s = LCMSampler(schedule)
    p = s.plan(4)
    # analytic check of the scalings at the plan's last timestep
    t = float(np.asarray(p.t_eval)[-1])
    scaled = t * 10.0
    c_skip = 0.25 / (scaled**2 + 0.25)
    c_out = scaled / np.sqrt(scaled**2 + 0.25)
    assert 0 < c_skip < 1e-4  # tiny for t=279
    assert 0.9999 < c_out <= 1.0


def test_plms_plan_structure(schedule):
    s = PLMSSampler(schedule)
    p = s.plan(50)
    te = np.asarray(p.t_eval)
    assert p.num_steps == 51  # duplicated warmup row
    assert te[0] == 981 and te[1] == 961 and te[2] == 961 and te[3] == 941
    # warmup row 1: steps from the original sample over the (981, 961) pair
    assert bool(np.asarray(p.use_orig)[1]) and not bool(np.asarray(p.push)[1])
    np.testing.assert_allclose(np.asarray(p.ab_a)[:5], [1, 0.5, 1.5, 23 / 12, 55 / 24])
    # strength-cut variant drops the duplicate
    p2 = s.plan(50, strength=0.6)
    te2 = np.asarray(p2.t_eval)
    assert te2[0] == 601 and len(te2) == 31  # 51-entry plms list cut by 20


def test_plms_scan_runs_and_reduces_noise(schedule):
    """Full PLMS chain with the *true* eps as model output must walk x_t
    toward x0."""
    s = PLMSSampler(schedule)
    p = s.plan(10)
    x0 = jax.random.normal(jax.random.key(6), (1, 4, 8, 8))
    eps = jax.random.normal(jax.random.key(7), x0.shape)
    x = schedule.add_noise(x0, eps, p.t_eval[0])
    carry = s.init_carry(x.shape, x.dtype)

    def body(state, i):
        x, carry = state
        prev, carry = s.step(p, i, carry, eps, x, jax.random.key(0))
        return (prev, carry), None

    (xf, _), _ = jax.lax.scan(body, (x, carry), jnp.arange(p.num_steps))
    err_start = float(jnp.mean((x - x0) ** 2))
    err_end = float(jnp.mean((xf - x0) ** 2))
    assert err_end < err_start * 0.05


def test_euler_sigma_space(schedule):
    s = EulerSampler(schedule)
    p = s.plan(4)
    x0 = jnp.zeros((1, 4, 8, 8))
    eps = jnp.ones_like(x0)
    noised = s.add_noise(p, x0, eps)
    assert np.allclose(np.asarray(noised), float(np.asarray(p.init_sigma)))
    # scale_model_input normalizes to unit-ish variance
    scaled = s.scale_model_input(p, 0, noised)
    sig = float(np.asarray(p.sigma)[0])
    assert np.allclose(np.asarray(scaled), sig / np.sqrt(sig**2 + 1))
    # full chain with true eps ends at x0
    x = noised
    for i in range(p.num_steps):
        x, _ = s.step(p, i, (), eps, x, jax.random.key(0))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_make_sampler_registry(schedule):
    for kind in ["ddim", "lcm", "plms", "pndm", "euler"]:
        assert make_sampler(kind, schedule) is not None
    with pytest.raises(ValueError):
        make_sampler("nope", schedule)


def test_min_t_windowing_all_samplers(schedule):
    """SDXL denoising_end ⇒ drop steps with t < min_t (sdxl_img2img_pipeline
    .py:392-412); must hold across sampler families."""
    from tml_image_editing_defense_tpu.core import make_sampler

    for kind in ["ddim", "lcm", "plms", "euler"]:
        s = make_sampler(kind, schedule)
        full = s.plan(8)
        cut = s.plan(8, min_t=500)
        te = np.asarray(cut.t_eval)
        assert (te >= 500).all(), (kind, te)
        assert cut.num_steps < full.num_steps


def test_run_context_archival(tmp_path):
    from tml_image_editing_defense_tpu.utils.logging import MetricsLogger
    import json as _json

    lg = MetricsLogger(name="t", config={"a": 1}, output_dir=tmp_path, use_wandb=False)
    lg.log({"x": 1.0})
    lg.finish()
    ctx = _json.loads((tmp_path / "run_context.json").read_text())
    assert ctx["config"]["a"] == 1 and len(ctx["git_rev"]) >= 7
