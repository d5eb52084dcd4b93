"""Golden regression values for the sampler math.

These pin the *current, verified* numerics (round 1: validated against
diffusers semantics by construction and against torch for the surrounding
ops) so future refactors can't silently shift the attack's denoising
arithmetic.  Inputs are fixed closed-form arrays; goldens were generated on
CPU f32 and are platform-stable to ~1e-5.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tml_image_editing_defense_tpu.core import make_noise_schedule, make_sampler


@pytest.fixture(scope="module")
def fixed():
    sched = make_noise_schedule()
    x = jnp.asarray(np.linspace(-1, 1, 16).reshape(1, 2, 2, 4).astype(np.float32))
    eps = jnp.asarray(np.cos(np.arange(16)).reshape(1, 2, 2, 4).astype(np.float32))
    return sched, x, eps


GOLDENS = {
    "ddim": [-3.52892923, -2.63173676, -1.0851202, -0.03869677],
    "lcm": [-6.71429873, -4.25052071, -0.77708018, 1.44716585],
    "plms": [-3.52892971, -2.63173652, -1.08512032, -0.03869689],
    "euler": [-3.49300432, -2.2136426, 0.30412257, 1.86805546],
}


@pytest.mark.parametrize("kind", sorted(GOLDENS))
def test_sampler_step_golden(fixed, kind):
    sched, x, eps = fixed
    kwargs = {"eta": 0.0} if kind == "ddim" else {}
    s = make_sampler(kind, sched, **kwargs)
    p = s.plan(4)
    out, _ = s.step(p, 0, s.init_carry(x.shape, x.dtype), eps, x, jax.random.key(42))
    got = np.asarray(out).reshape(-1)[:4]
    np.testing.assert_allclose(got, GOLDENS[kind], rtol=1e-5, atol=1e-6)


def test_add_noise_golden(fixed):
    sched, x, eps = fixed
    out = sched.add_noise(x, eps, jnp.asarray(519))
    got = np.asarray(out).reshape(-1)[:4]
    np.testing.assert_allclose(
        got, [0.3635388, 0.03272453, -0.72783631, -1.15740156], rtol=1e-5, atol=1e-6
    )
