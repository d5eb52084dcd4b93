"""Pallas kernels vs their jnp oracles (interpret mode on CPU; the same
kernels compile natively on TPU — exercised by bench.py / TID_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np

from tml_image_editing_defense_tpu.attack.pgd import (
    l2_perturbation_step,
    linf_perturbation_step,
)
from tml_image_editing_defense_tpu.attack.pgd import perturbation_step
from tml_image_editing_defense_tpu.ops import (
    fused_perturbation_step,
    pgd_l2_update,
    pgd_linf_update,
)

SHAPE = (1, 32, 32, 3)


def _rand(key, shape=SHAPE, scale=1.0):
    return jax.random.normal(jax.random.key(key), shape) * scale


def test_linf_kernel_matches_oracle():
    x_adv, grad, src = _rand(0, scale=0.3), _rand(1), jnp.clip(_rand(2, scale=0.4), -1, 1)
    want = linf_perturbation_step(x_adv, grad, src, 0.006, 0.1, -1.0, 1.0)
    got = pgd_linf_update(x_adv, grad, src, 0.006, 0.1, -1.0, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)


def test_l2_kernel_matches_oracle():
    x_adv, grad, src = _rand(3, scale=0.3), _rand(4), jnp.clip(_rand(5, scale=0.4), -1, 1)
    want = l2_perturbation_step(x_adv, grad, src, 7.5, 0.4, -1.0, 1.0)
    got = pgd_l2_update(x_adv, grad, src, 7.5, 0.4, -1.0, 1.0, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_l2_kernel_masked_matches_oracle():
    x_adv, grad, src = _rand(6, scale=0.3), _rand(7), jnp.clip(_rand(8, scale=0.4), -1, 1)
    mask = (jax.random.uniform(jax.random.key(9), (1, 32, 32, 1)) > 0.5).astype(jnp.float32)
    want = l2_perturbation_step(x_adv, grad, src, 7.5, 0.4, -1.0, 1.0, mask)
    got = pgd_l2_update(x_adv, grad, src, 7.5, 0.4, -1.0, 1.0, mask=mask, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_linf_mask_semantics_identical_across_backends():
    """norm_type='linf' + mask must behave the same through the jnp
    dispatcher and the Pallas dispatcher: the mask is ignored on the L∞
    branch, matching the reference (main.py:260-261 masks L2 only)."""
    x_adv, grad, src = _rand(30, scale=0.3), _rand(31), jnp.clip(_rand(32, scale=0.4), -1, 1)
    mask = (jax.random.uniform(jax.random.key(33), (1, 32, 32, 1)) > 0.5).astype(jnp.float32)
    kw = dict(x_adv=x_adv, grad=grad, x_src=src, step_size=0.006, eps=0.1,
              min_value=-1.0, max_value=1.0)
    jnp_masked = perturbation_step("linf", mask=mask, **kw)
    jnp_unmasked = perturbation_step("linf", **kw)
    fused_masked = fused_perturbation_step("linf", mask=mask, **kw)
    np.testing.assert_array_equal(np.asarray(jnp_masked), np.asarray(jnp_unmasked))
    np.testing.assert_allclose(np.asarray(fused_masked), np.asarray(jnp_masked),
                               rtol=1e-6, atol=1e-7)


def test_kernels_jit_and_grad_safe():
    """Kernels must be usable inside jit (interpret mode under jit on CPU)."""
    x_adv, grad, src = _rand(12, scale=0.3), _rand(13), jnp.clip(_rand(14, scale=0.4), -1, 1)

    @jax.jit
    def f(a, g, s):
        return pgd_linf_update(a, g, s, 0.006, 0.1, -1.0, 1.0, interpret=True)

    out = f(x_adv, grad, src)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_kernels_under_vmap():
    """The batched sweep vmaps the PGD step over images — the kernels must
    batch correctly (interpret mode exercises the pallas batching rule)."""
    B = 3
    x_adv = jax.random.normal(jax.random.key(20), (B, 1, 16, 16, 3)) * 0.2
    grad = jax.random.normal(jax.random.key(21), (B, 1, 16, 16, 3))
    src = jnp.clip(jax.random.normal(jax.random.key(22), (B, 1, 16, 16, 3)) * 0.3, -1, 1)

    def one(a, g, s):
        return pgd_linf_update(a, g, s, 0.006, 0.1, -1.0, 1.0, interpret=True)

    got = jax.vmap(one)(x_adv, grad, src)
    want = jnp.stack([
        linf_perturbation_step(x_adv[i], grad[i], src[i], 0.006, 0.1, -1.0, 1.0)
        for i in range(B)
    ])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-7)

    def one_l2(a, g, s):
        return pgd_l2_update(a, g, s, 2.0, 0.5, -1.0, 1.0, interpret=True)

    got2 = jax.vmap(one_l2)(x_adv, grad, src)
    want2 = jnp.stack([
        l2_perturbation_step(x_adv[i], grad[i], src[i], 2.0, 0.5, -1.0, 1.0)
        for i in range(B)
    ])
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=1e-5, atol=1e-6)
