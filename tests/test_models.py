"""Model-zoo structural tests: shapes, jit, gradient flow, CFG batching."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.models.vae import AutoencoderKL


@pytest.fixture(scope="module")
def tiny():
    return build_model("tiny", key=jax.random.key(0))


@pytest.fixture(scope="module")
def tiny_sdxl():
    return build_model("tiny-sdxl", key=jax.random.key(1))


def test_vae_roundtrip_shapes(tiny):
    img = jax.random.normal(jax.random.key(2), (1, 32, 32, 3)) * 0.1
    z = tiny.encode_image(tiny.params["vae"], img, key=jax.random.key(3))
    assert z.shape == tiny.latent_shape
    out = tiny.decode_latent(tiny.params["vae"], z)
    assert out.shape == img.shape
    # deterministic encode = posterior mean
    z1 = tiny.encode_image(tiny.params["vae"], img)
    z2 = tiny.encode_image(tiny.params["vae"], img)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


def test_unet_cfg_batch(tiny):
    """CFG batching: [uncond; cond] duplicated latents through the UNet."""
    z = jax.random.normal(jax.random.key(4), (2,) + tiny.latent_shape[1:])
    bank = tiny.embed_prompt_bank(["a cat", "a dog"])
    ctx = jnp.stack([bank.uncond, bank.embeds[0]])
    out = tiny.apply_unet(tiny.params["unet"], z, jnp.asarray(500), ctx)
    assert out.shape == z.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_unet_grad_flows_to_sample(tiny):
    z = jax.random.normal(jax.random.key(5), tiny.latent_shape)
    bank = tiny.embed_prompt_bank(["x"])
    ctx = bank.embeds[:1]

    def loss(z):
        return jnp.sum(tiny.apply_unet(tiny.params["unet"], z, jnp.asarray(10), ctx) ** 2)

    g = jax.grad(loss)(z)
    assert float(jnp.linalg.norm(g)) > 0
    assert bool(jnp.all(jnp.isfinite(g)))


def test_sdxl_additional_embeddings(tiny_sdxl):
    m = tiny_sdxl
    z = jax.random.normal(jax.random.key(6), m.latent_shape)
    bank = m.embed_prompt_bank(["hello world"])
    assert bank.pooled is not None
    # SDXL context = concat of both encoders' penultimate states
    assert bank.embeds.shape[-1] == m.unet.config.cross_attention_dim
    time_ids = jnp.asarray([[512, 512, 0, 0, 512, 512]], jnp.float32)
    out = m.apply_unet(
        m.params["unet"], z, jnp.asarray(500), bank.embeds[:1],
        text_embeds=bank.pooled[:1], time_ids=time_ids,
    )
    assert out.shape == z.shape
    # micro-conditioning must matter
    out2 = m.apply_unet(
        m.params["unet"], z, jnp.asarray(500), bank.embeds[:1],
        text_embeds=bank.pooled[:1], time_ids=time_ids * 0 + 7.0,
    )
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_prompt_bank_gather_equals_single(tiny):
    """Bank row == individually encoded prompt (the gather optimization is
    semantics-preserving)."""
    bank = tiny.embed_prompt_bank(["melting", "origami", "on mars"])
    cond, uncond, _, _ = tiny.encode_prompt("origami")
    np.testing.assert_allclose(np.asarray(bank.embeds[1]), np.asarray(cond), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(bank.uncond), np.asarray(uncond), rtol=1e-5, atol=1e-6)


def test_vae_posterior_sampling_stochastic(tiny):
    img = jax.random.normal(jax.random.key(7), (1, 32, 32, 3)) * 0.1
    z1 = tiny.encode_image(tiny.params["vae"], img, key=jax.random.key(1))
    z2 = tiny.encode_image(tiny.params["vae"], img, key=jax.random.key(2))
    assert not np.allclose(np.asarray(z1), np.asarray(z2))


def test_sd15_configs_importable():
    """Full-size configs must at least build modules + eval_shape without
    allocating real weights."""
    from tml_image_editing_defense_tpu.models.unet import SD15_UNET, SDXL_UNET, UNet2DCondition

    unet = UNet2DCondition(SD15_UNET)
    z = jax.ShapeDtypeStruct((2, 64, 64, 4), jnp.float32)
    t = jax.ShapeDtypeStruct((), jnp.int32)
    ctx = jax.ShapeDtypeStruct((2, 77, 768), jnp.float32)
    shapes = jax.eval_shape(lambda z, t, c: unet.init(jax.random.key(0), z, t, c), z, t, ctx)
    n_params = sum(np.prod(s.shape) for s in jax.tree.leaves(shapes))
    # SD-1.5 UNet ≈ 860M params
    assert 8.0e8 < n_params < 9.2e8, n_params

    xl = UNet2DCondition(SDXL_UNET)
    ctx = jax.ShapeDtypeStruct((2, 77, 2048), jnp.float32)
    shapes = jax.eval_shape(
        lambda z, t, c: xl.init(
            jax.random.key(0), z, t, c,
            text_embeds=jnp.zeros((2, 1280)), time_ids=jnp.zeros((2, 6)),
        ),
        z, t, ctx,
    )
    n_params = sum(np.prod(s.shape) for s in jax.tree.leaves(shapes))
    # SDXL UNet ≈ 2.57B params
    assert 2.4e9 < n_params < 2.75e9, n_params


def test_chunked_attention_matches_fused():
    """KV-chunked online-softmax attention (the 1024² HBM enabler) must
    reproduce the fused kernel's values AND gradients, including ragged
    last chunks and bf16 inputs."""
    from tml_image_editing_defense_tpu.models.layers import (
        _chunked_attention,
        _remat_attention,
    )

    key = jax.random.key(0)
    for b, t, s, h, d, chunk, dt in [
        (2, 64, 64, 4, 16, 16, jnp.float32),
        (1, 100, 100, 1, 32, 24, jnp.float32),   # 100 % 24 != 0: pad path
        (2, 64, 77, 4, 16, 32, jnp.bfloat16),
    ]:
        kq, kk, kv = jax.random.split(key, 3)
        q = jax.random.normal(kq, (b, t, h, d), dt)
        k = jax.random.normal(kk, (b, s, h, d), dt)
        v = jax.random.normal(kv, (b, s, h, d), dt)
        ref = _remat_attention(q, k, v, None)
        out = _chunked_attention(q, k, v, chunk)
        tol = 2e-2 if dt == jnp.bfloat16 else 2e-5
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            rtol=tol, atol=tol)
        gr = jax.grad(
            lambda q_: _remat_attention(q_, k, v, None).astype(jnp.float32).sum())(q)
        gc = jax.grad(
            lambda q_: _chunked_attention(q_, k, v, chunk).astype(jnp.float32).sum())(q)
        np.testing.assert_allclose(
            np.asarray(gc, np.float32), np.asarray(gr, np.float32),
            rtol=tol * 5, atol=tol * 5)


def test_chunked_attention_cv_matches_autodiff():
    """The flash-2 custom-VJP variant must reproduce _chunked_attention's
    forward bit-for-bit (same scan) and its autodiff gradients for all
    three inputs — exact in f32, bf16-rounding-close in bf16 — including
    the ragged-last-chunk pad path."""
    from tml_image_editing_defense_tpu.models.layers import (
        _chunked_attention,
        _chunked_attention_cv,
    )

    key = jax.random.key(3)
    for b, t, s, h, d, chunk, dt in [
        (2, 64, 64, 4, 16, 16, jnp.float32),
        (1, 100, 100, 1, 32, 24, jnp.float32),   # pad path
        (2, 64, 77, 4, 16, 32, jnp.float32),     # cross-shaped S != T
        (2, 64, 64, 4, 16, 16, jnp.bfloat16),
    ]:
        kq, kk, kv, kg = jax.random.split(jax.random.fold_in(key, d + s), 4)
        q = jax.random.normal(kq, (b, t, h, d), dt)
        k = jax.random.normal(kk, (b, s, h, d), dt)
        v = jax.random.normal(kv, (b, s, h, d), dt)
        g = jax.random.normal(kg, (b, t, h, d), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(_chunked_attention_cv(q, k, v, chunk)),
            np.asarray(_chunked_attention(q, k, v, chunk)))
        ga = jax.grad(
            lambda *a: jnp.vdot(
                _chunked_attention(*a, chunk).astype(jnp.float32), g),
            argnums=(0, 1, 2))(q, k, v)
        gc = jax.grad(
            lambda *a: jnp.vdot(
                _chunked_attention_cv(*a, chunk).astype(jnp.float32), g),
            argnums=(0, 1, 2))(q, k, v)
        tol = 2e-2 if dt == jnp.bfloat16 else 1e-5
        for a_, c_ in zip(ga, gc):
            np.testing.assert_allclose(
                np.asarray(c_, np.float32), np.asarray(a_, np.float32),
                rtol=tol, atol=tol)


def test_attn_kv_chunk_builds_equivalent_model(monkeypatch):
    """A model built with attn_kv_chunk set computes the same UNet output
    (the chunked path is a pure implementation detail).  The dispatch floor
    is lowered so the tiny model's 64-token self-attention actually takes
    the chunked path."""
    from tml_image_editing_defense_tpu.models import layers

    monkeypatch.setattr(layers, "MIN_CHUNKED_SEQ", 16)
    m1 = build_model("tiny", key=jax.random.key(0))
    m2 = build_model("tiny", key=jax.random.key(0), attn_kv_chunk=8)
    lat = jax.random.normal(jax.random.key(2), (2,) + m1.latent_shape[1:])
    ctx = jax.random.normal(jax.random.key(3), (2, 77, 32))
    t = jnp.asarray(5, jnp.int32)
    o1 = m1.apply_unet(m1.params["unet"], lat, t, ctx)
    o2 = m2.apply_unet(m1.params["unet"], lat, t, ctx)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=2e-5, atol=2e-5)
    # sanity: the chunked path was actually taken (different jaxpr)
    import jax as _jax
    j1 = str(_jax.make_jaxpr(
        lambda p, l: m1.apply_unet(p, l, t, ctx))(m1.params["unet"], lat))
    j2 = str(_jax.make_jaxpr(
        lambda p, l: m2.apply_unet(p, l, t, ctx))(m1.params["unet"], lat))
    assert ("scan" in j2) and (j1 != j2)


def test_fast_init_uniform_dtype_bf16():
    """fast_init trees must be UNIFORMLY the requested dtype.  Regression:
    the on-device generator scaled draws with strong-typed np.float32
    scalars, promoting bf16 kernels/embeddings to f32 — silently doubling
    the param footprint (SDXL bf16 would materialize 10.2 GB and OOM the
    16 GB chip) and diverging from the uniform-dtype trees convert.py
    produces."""
    m = build_model("tiny", key=jax.random.key(0), dtype=jnp.bfloat16,
                    fast_init=True)
    bad = [
        "/".join(p)
        for p, leaf in jax.tree_util.tree_leaves_with_path(m.params)
        for p in [tuple(getattr(k, "key", getattr(k, "idx", k)) for k in p)]
        if leaf.dtype != jnp.bfloat16
    ]
    assert not bad, f"non-bf16 leaves: {bad[:8]} (+{max(len(bad)-8,0)} more)"
    # vae_dtype override stays independent
    m2 = build_model("tiny", key=jax.random.key(0), dtype=jnp.bfloat16,
                     vae_dtype=jnp.float32, fast_init=True)
    vae_dts = {leaf.dtype for leaf in jax.tree_util.tree_leaves(m2.params["vae"])}
    assert vae_dts == {jnp.dtype(jnp.float32)}


def test_full_init_honors_requested_dtype():
    """Full flax init must obey the same uniform-dtype contract as
    fast_init.  Regression: ``module.init`` materializes f32 params
    regardless of the module's compute dtype, silently doubling the param
    footprint (SDXL bf16: 4.95G of step arguments became 9.90G, a
    compile-time HBM OOM through ``api.immunize`` — round-5 rehearsal)."""
    m = build_model("tiny", key=jax.random.key(0), dtype=jnp.bfloat16,
                    fast_init=False)
    dts = {leaf.dtype for leaf in jax.tree_util.tree_leaves(m.params)
           if jnp.issubdtype(leaf.dtype, jnp.floating)}
    assert dts == {jnp.dtype(jnp.bfloat16)}, dts
    # vae_dtype override stays independent of the UNet/text dtype
    m2 = build_model("tiny", key=jax.random.key(0), dtype=jnp.bfloat16,
                     vae_dtype=jnp.float32, fast_init=False)
    vae_dts = {leaf.dtype for leaf in jax.tree_util.tree_leaves(m2.params["vae"])
               if jnp.issubdtype(leaf.dtype, jnp.floating)}
    assert vae_dts == {jnp.dtype(jnp.float32)}
    # the f32 default path is untouched (no cast program, same values):
    # goldens and torch-oracle tests rely on byte-stable full-init weights
    m3 = build_model("tiny", key=jax.random.key(0), fast_init=False)
    f32 = {leaf.dtype for leaf in jax.tree_util.tree_leaves(m3.params)
           if jnp.issubdtype(leaf.dtype, jnp.floating)}
    assert f32 == {jnp.dtype(jnp.float32)}
