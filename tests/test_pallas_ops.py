"""Pallas kernels vs their jnp oracles (interpret mode on CPU; the same
kernels compile natively on TPU — exercised by bench.py / TID_TEST_TPU=1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_flash_attention_matches_chunked_on_tpu():
    """The Pallas flash-attention alternative (`layers.LONG_ATTENTION_IMPL=
    "flash"`) must agree with the chunked online-softmax path — forward and
    input-grads.  TPU-only (the bundled kernel has no CPU lowering); run with
    TID_TEST_TPU=1 on a chip."""
    if jax.default_backend() != "tpu":
        pytest.skip("pallas TPU flash-attention kernel needs a TPU backend")
    from tml_image_editing_defense_tpu.models.layers import (
        _chunked_attention,
        _flash_attention,
    )

    for d in (40, 64):                      # SD-1.5 head dim 40 is unaligned
        k1, k2, k3 = jax.random.split(jax.random.key(d), 3)
        q = jax.random.normal(k1, (2, 2048, 4, d), jnp.bfloat16)
        k = jax.random.normal(k2, (2, 2048, 4, d), jnp.bfloat16)
        v = jax.random.normal(k3, (2, 2048, 4, d), jnp.bfloat16)

        def loss_c(q, k, v):
            return jnp.sum(_chunked_attention(q, k, v, 512) ** 2)

        def loss_f(q, k, v):
            return jnp.sum(_flash_attention(q, k, v) ** 2)

        oc = _chunked_attention(q, k, v, 512)
        of = _flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(oc, np.float32),
                                   np.asarray(of, np.float32),
                                   rtol=5e-2, atol=5e-2)
        gc = jax.grad(loss_c, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_f, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gf):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-1, atol=1e-1)


# ---------------------------------------------------------------------------
# custom Pallas flash attention (ops/flash_attention.py) — CPU interpret mode
# ---------------------------------------------------------------------------


def _ref_attention(q, k, v):
    import math

    scale = 1.0 / math.sqrt(q.shape[-1])
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))


def _f32_tol():
    """f32 comparison tolerances for kernel-vs-oracle tests.

    On CPU (interpret mode) both sides are exact f32 → tight.  On a real TPU
    the MXU runs f32 matmuls at default precision (bf16 multi-pass) on BOTH
    sides with different accumulation orders, so ~1e-3 absolute wobble is
    expected and correct (measured max 1.1e-3 on v5e)."""
    if jax.default_backend() == "tpu":
        return dict(rtol=2e-2, atol=5e-3)
    return dict(rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("shape", [(2, 512, 8, 40), (1, 256, 4, 80),
                                   (2, 512, 2, 128)])
def test_custom_flash_attention_matches_reference(shape):
    """ops.flash_attention fwd + all three input-grads vs plain softmax
    attention in f32 (interpret mode; same kernel compiles on TPU)."""
    from tml_image_editing_defense_tpu.ops.flash_attention import (
        flash_attention,
        supports,
    )

    b, t, h, d = shape
    assert supports(shape, t, False)
    k1, k2, k3, k4 = jax.random.split(jax.random.key(d + t), 4)
    q = jax.random.normal(k1, shape, jnp.float32)
    k = jax.random.normal(k2, shape, jnp.float32)
    v = jax.random.normal(k3, shape, jnp.float32)
    g = jax.random.normal(k4, shape, jnp.float32)
    tol = _f32_tol()
    np.testing.assert_allclose(np.asarray(flash_attention(q, k, v)),
                               np.asarray(_ref_attention(q, k, v)), **tol)
    gf = jax.grad(lambda *a: jnp.vdot(flash_attention(*a), g),
                  argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(lambda *a: jnp.vdot(_ref_attention(*a), g),
                  argnums=(0, 1, 2))(q, k, v)
    gtol = tol if jax.default_backend() == "tpu" else dict(rtol=1e-4, atol=1e-4)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), **gtol)


def test_custom_flash_attention_bf16_close_to_f32_reference():
    shape = (1, 512, 4, 40)
    from tml_image_editing_defense_tpu.ops.flash_attention import flash_attention

    k1, k2, k3 = jax.random.split(jax.random.key(7), 3)
    q = jax.random.normal(k1, shape, jnp.bfloat16)
    k = jax.random.normal(k2, shape, jnp.bfloat16)
    v = jax.random.normal(k3, shape, jnp.bfloat16)
    got = np.asarray(flash_attention(q, k, v), np.float32)
    want = np.asarray(
        _ref_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                       v.astype(jnp.float32)))
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-2)


def test_custom_flash_dispatch_and_fallback():
    """LONG_ATTENTION_IMPL='pallas' routes supported self-attention through
    the custom kernel and falls back to chunked for unsupported shapes
    (cross-attention S != T) with identical results either way."""
    import tml_image_editing_defense_tpu.models.layers as L

    k1, k2, k3 = jax.random.split(jax.random.key(11), 3)
    q = jax.random.normal(k1, (1, 512, 4, 40), jnp.float32)
    kv = jax.random.normal(k2, (1, 512, 4, 40), jnp.float32)
    ctx = jax.random.normal(k3, (1, 77, 4, 40), jnp.float32)
    old_impl, old_min = L.LONG_ATTENTION_IMPL, L.MIN_CHUNKED_SEQ
    try:
        L.MIN_CHUNKED_SEQ = 256
        L.LONG_ATTENTION_IMPL = "chunked"
        want_self = L.scaled_attention(q, kv, kv, kv_chunk=128)
        want_cross = L.scaled_attention(q, ctx, ctx, kv_chunk=128)
        L.LONG_ATTENTION_IMPL = "pallas"
        got_self = L.scaled_attention(q, kv, kv, kv_chunk=128)
        got_cross = L.scaled_attention(q, ctx, ctx, kv_chunk=128)
    finally:
        L.LONG_ATTENTION_IMPL, L.MIN_CHUNKED_SEQ = old_impl, old_min
    np.testing.assert_allclose(np.asarray(got_self), np.asarray(want_self),
                               **_f32_tol())
    np.testing.assert_array_equal(np.asarray(got_cross), np.asarray(want_cross))


def test_unknown_attention_impl_raises():
    """A typo'd TID_ATTN_IMPL must error, not silently run a different
    implementation — the knob exists for perf measurements."""
    import tml_image_editing_defense_tpu.models.layers as L

    q = jnp.ones((1, 4096, 2, 8), jnp.float32)
    old_impl = L.LONG_ATTENTION_IMPL
    try:
        L.LONG_ATTENTION_IMPL = "flash2"
        with pytest.raises(ValueError, match="TID_ATTN_IMPL"):
            L.scaled_attention(q, q, q, kv_chunk=512)
    finally:
        L.LONG_ATTENTION_IMPL = old_impl


def test_custom_flash_attention_matches_chunked_on_tpu():
    """Compiled (non-interpret) custom kernel vs the chunked scan in bf16 at
    a real SD shape — fwd + input-grads.  Run with TID_TEST_TPU=1 on chip."""
    if jax.default_backend() != "tpu":
        pytest.skip("compiled Pallas kernel needs a TPU backend")
    from tml_image_editing_defense_tpu.models.layers import _chunked_attention
    from tml_image_editing_defense_tpu.ops.flash_attention import flash_attention

    for shape in [(2, 2048, 4, 40), (1, 1024, 1, 512)]:
        k1, k2, k3 = jax.random.split(jax.random.key(shape[-1]), 3)
        q = jax.random.normal(k1, shape, jnp.bfloat16)
        k = jax.random.normal(k2, shape, jnp.bfloat16)
        v = jax.random.normal(k3, shape, jnp.bfloat16)
        oc = _chunked_attention(q, k, v, 512)
        of = flash_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(oc, np.float32),
                                   np.asarray(of, np.float32),
                                   rtol=5e-2, atol=5e-2)
        gc = jax.grad(lambda *a: jnp.sum(_chunked_attention(*a, 512) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(lambda *a: jnp.sum(flash_attention(*a) ** 2),
                      argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(gc, gf):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32),
                                       rtol=1e-1, atol=1e-1)
