"""PGD numerics: torch parity for the perturbation steps (torch-cpu is in the
test env, so we check against the *actual* ops the reference uses), plus
end-to-end attack behaviour on the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tml_image_editing_defense_tpu.attack import (
    l2_perturbation_step,
    linf_perturbation_step,
    make_attack_data,
    make_pgd_loop,
    make_pgd_step,
    renorm_l2,
)
from tml_image_editing_defense_tpu.attack.losses import (
    cosine_similarity_loss,
    lp_distance,
    lp_norm,
    perturbation_loss,
)
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.rng import make_noise_pool
from tml_image_editing_defense_tpu.core.samplers import LCMSampler
from tml_image_editing_defense_tpu.models import build_model


def test_renorm_matches_torch():
    rng = np.random.default_rng(0)
    for shape, maxnorm in [((1, 8, 8, 3), 0.5), ((4, 5, 6, 2), 1.3), ((2, 100), 0.01)]:
        x = rng.normal(size=shape).astype(np.float32) * 2
        ours = np.asarray(renorm_l2(jnp.asarray(x), maxnorm, axis=0))
        theirs = torch.renorm(torch.from_numpy(x), p=2, dim=0, maxnorm=maxnorm).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def _torch_l2_step(X_adv, grad, X, step_size, eps, mn, mx, mask=None):
    """Literal transcription of reference main.py:254-268 for oracle testing."""
    X_adv, grad, X = map(torch.from_numpy, (X_adv, grad, X))
    l = len(X.shape) - 1
    grad_norm = torch.norm(grad.reshape(grad.shape[0], -1), dim=1).view(-1, *([1] * l))
    gn = grad / (grad_norm + 1e-10)
    if mask is not None:
        gn = gn * torch.from_numpy(mask)
    X_adv = X_adv - gn * step_size
    d_x = X_adv - X
    d_x = torch.renorm(d_x, p=2, dim=0, maxnorm=eps)
    return torch.clamp(X + d_x, mn, mx).numpy()


def _torch_linf_step(X_adv, grad, X, step_size, eps, mn, mx):
    """Literal transcription of reference main.py:270-274."""
    X_adv, grad, X = map(torch.from_numpy, (X_adv, grad, X))
    X_adv = X_adv - grad.sign() * step_size
    X_adv = torch.minimum(torch.maximum(X_adv, X - eps), X + eps)
    return torch.clamp(X_adv, mn, mx).numpy()


def test_l2_step_matches_reference_semantics():
    rng = np.random.default_rng(1)
    X = rng.uniform(-1, 1, (1, 6, 6, 3)).astype(np.float32)
    X_adv = X + rng.normal(size=X.shape).astype(np.float32) * 0.1
    grad = rng.normal(size=X.shape).astype(np.float32)
    ours = np.asarray(
        l2_perturbation_step(jnp.asarray(X_adv), jnp.asarray(grad), jnp.asarray(X),
                             step_size=7.5, eps=0.3, min_value=-1, max_value=1)
    )
    theirs = _torch_l2_step(X_adv, grad, X, 7.5, 0.3, -1, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
    # with mask
    mask = (rng.uniform(size=(1, 6, 6, 1)) > 0.5).astype(np.float32)
    ours_m = np.asarray(
        l2_perturbation_step(jnp.asarray(X_adv), jnp.asarray(grad), jnp.asarray(X),
                             step_size=7.5, eps=0.3, min_value=-1, max_value=1,
                             mask=jnp.asarray(mask))
    )
    theirs_m = _torch_l2_step(X_adv, grad, X, 7.5, 0.3, -1, 1, mask=mask)
    np.testing.assert_allclose(ours_m, theirs_m, rtol=1e-5, atol=1e-6)


def test_linf_step_matches_reference_semantics():
    rng = np.random.default_rng(2)
    X = rng.uniform(-1, 1, (1, 6, 6, 3)).astype(np.float32)
    X_adv = X.copy()
    grad = rng.normal(size=X.shape).astype(np.float32)
    ours = np.asarray(
        linf_perturbation_step(jnp.asarray(X_adv), jnp.asarray(grad), jnp.asarray(X),
                               step_size=0.006, eps=0.1, min_value=-1, max_value=1)
    )
    theirs = _torch_linf_step(X_adv, grad, X, 0.006, 0.1, -1, 1)
    np.testing.assert_allclose(ours, theirs, rtol=1e-6, atol=1e-7)


def test_losses_match_torch():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    y = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    tx, ty = torch.from_numpy(x), torch.from_numpy(y)
    np.testing.assert_allclose(
        float(lp_distance(jnp.asarray(x), jnp.asarray(y), 2)),
        float(torch.norm(tx - ty, p=2)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(lp_norm(jnp.asarray(x), 1)), float(torch.norm(tx, p=1)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(perturbation_loss(jnp.asarray(x), jnp.asarray(y))),
        float(torch.nn.functional.mse_loss(tx, ty)), rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(cosine_similarity_loss(jnp.asarray(x), jnp.asarray(y))),
        float((torch.nn.functional.cosine_similarity(tx, ty) + 1).mean()), rtol=1e-5,
    )


# ---------------------------------------------------------------------------
# End-to-end attack on the tiny model
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_setup():
    model = build_model("tiny", key=jax.random.key(0))
    cfg = TrainConfig(
        norm_type="linf",
        n_optimization_steps=6,
        n_denoising_steps_per_iteration=2,
        limit_timesteps=False,
        grad_reps=2,
        derive_norm_hyperparams=False,
        eps=0.1,
        step_size=0.02,
        apply_loss_on_images=False,
        apply_loss_on_latents=True,
        perturbation_loss_lambda=0.0,
        guidance_scale=2.0,
        image_size=32,
        eot_mode="scan",
        remat_policy="none",
        prompts=["a", "b c"],
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(cfg.n_denoising_steps_per_iteration)
    key = jax.random.key(5)
    source = jnp.clip(jax.random.normal(key, (1, 32, 32, 3)) * 0.3, -1, 1)
    target = jnp.zeros_like(source)
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(6), cfg.n_noise, model.latent_shape)
    data = make_attack_data(model, cfg, source, target, bank, pool)
    return model, cfg, sampler, plan, data, source


def test_pgd_step_respects_linf_ball(tiny_setup):
    model, cfg, sampler, plan, data, source = tiny_setup
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    x = source
    key = jax.random.key(7)
    for _ in range(3):
        key, sub = jax.random.split(key)
        x, aux = step(model.params, x, data, sub)
    d = np.asarray(x - source)
    assert np.max(np.abs(d)) <= cfg.eps + 1e-6
    assert np.asarray(x).min() >= -1 - 1e-6 and np.asarray(x).max() <= 1 + 1e-6
    assert np.isfinite(float(aux["avg_loss"]))
    assert np.max(np.abs(d)) > 1e-5  # something actually happened


def test_pgd_vmap_and_scan_agree(tiny_setup):
    """EOT modes are numerically equivalent (same keys → same mean grad)."""
    import dataclasses

    model, cfg, sampler, plan, data, source = tiny_setup
    cfg_v = dataclasses.replace(cfg, eot_mode="vmap")
    s1 = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    s2 = jax.jit(make_pgd_step(model, sampler, plan, cfg_v))
    k = jax.random.key(8)
    x1, a1 = s1(model.params, source, data, k)
    x2, a2 = s2(model.params, source, data, k)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(a1["avg_loss"]), float(a2["avg_loss"]), rtol=2e-4)


def test_pgd_eot_chunked_matches_sequential(tiny_setup):
    """eot_chunk>1 (vmapped rep chunks inside the scan) must reproduce the
    sequential per-rep mean gradient — same keys, same EOT distribution, only
    the conv batch size changes."""
    import dataclasses

    model, cfg, sampler, plan, data, source = tiny_setup
    cfg4 = dataclasses.replace(cfg, grad_reps=4)
    s_seq = jax.jit(make_pgd_step(model, sampler, plan, cfg4))
    s_chk = jax.jit(make_pgd_step(
        model, sampler, plan, dataclasses.replace(cfg4, eot_chunk=2)))
    k = jax.random.key(21)
    x1, a1 = s_seq(model.params, source, data, k)
    x2, a2 = s_chk(model.params, source, data, k)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=2e-4, atol=2e-6)
    np.testing.assert_allclose(float(a1["avg_loss"]), float(a2["avg_loss"]), rtol=2e-4)

    with pytest.raises(ValueError):
        make_pgd_step(model, sampler, plan,
                      dataclasses.replace(cfg4, eot_chunk=3))(
            model.params, source, data, k)


def test_remat_policies_equivalent(tiny_setup):
    """All remat policies recompute-vs-save schedules of the SAME backward:
    gradients (and thus the PGD iterate) must match bitwise-ish across
    "none"/"full"/"dots"/"conv_dots"; unknown names must raise."""
    import dataclasses

    model, cfg, sampler, plan, data, source = tiny_setup
    k = jax.random.key(31)
    ref, a_ref = jax.jit(make_pgd_step(model, sampler, plan, cfg))(
        model.params, source, data, k)
    for policy in ("full", "dots", "conv_dots"):
        cfg_p = dataclasses.replace(cfg, remat_policy=policy)
        x, a = jax.jit(make_pgd_step(model, sampler, plan, cfg_p))(
            model.params, source, data, k)
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(ref), rtol=2e-4, atol=2e-6, err_msg=policy)
        np.testing.assert_allclose(
            float(a["avg_loss"]), float(a_ref["avg_loss"]), rtol=2e-4)

    # remat_vae checkpoints the shared VAE encode + per-rep decode: same
    # backward, different recompute schedule → identical results
    cfg_rv = dataclasses.replace(cfg, remat_vae=True)
    x, a = jax.jit(make_pgd_step(model, sampler, plan, cfg_rv))(
        model.params, source, data, k)
    np.testing.assert_allclose(
        np.asarray(x), np.asarray(ref), rtol=2e-4, atol=2e-6, err_msg="remat_vae")

    from tml_image_editing_defense_tpu.attack.forward import apply_remat
    with pytest.raises(ValueError, match="remat_policy"):
        apply_remat(lambda s, x: (s, None), "bogus")


def test_pgd_loop_scan_matches_python_loop(tiny_setup):
    model, cfg, sampler, plan, data, source = tiny_setup
    loop = jax.jit(make_pgd_loop(model, sampler, plan, cfg, n_steps=3))
    xf, hist = loop(model.params, source, data, jax.random.key(9))
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    x = source
    keys = jax.random.split(jax.random.key(9), 3)
    for k in keys:
        x, _ = step(model.params, x, data, k)
    np.testing.assert_allclose(np.asarray(xf), np.asarray(x), rtol=1e-5, atol=1e-6)
    assert hist["avg_loss"].shape == (3,)


def test_decode_vis_false_matches_and_skips_decode(tiny_setup):
    """The no-vis hot-path step (decode_vis=False, VERDICT r4 item 1a) is the
    SAME program minus the vis decode: identical iterate and scalars, aux
    carries the output latent whose on-demand decode equals the vis image."""
    model, cfg, sampler, plan, data, source = tiny_setup
    k = jax.random.key(41)
    x_vis, a_vis = jax.jit(make_pgd_step(model, sampler, plan, cfg))(
        model.params, source, data, k)
    x_hot, a_hot = jax.jit(
        make_pgd_step(model, sampler, plan, cfg, decode_vis=False))(
        model.params, source, data, k)
    np.testing.assert_array_equal(np.asarray(x_vis), np.asarray(x_hot))
    np.testing.assert_array_equal(
        np.asarray(a_vis["avg_loss"]), np.asarray(a_hot["avg_loss"]))
    assert "output_image" not in a_hot and "output_latent" in a_hot
    assert "output_latent" not in a_vis
    decoded = model.decode_latent(
        model.params["vae"], a_hot["output_latent"], scaled=False)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(a_vis["output_image"]),
        rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("block_size", [None, 2])
def test_run_pgd_lazy_vis_decode(tiny_setup, block_size):
    """run_pgd drives the image-free step but vis callbacks still receive a
    decoded output_image (materialized lazily, only at vis iterations)."""
    import dataclasses

    from tml_image_editing_defense_tpu.attack.pgd import run_pgd

    model, cfg, sampler, plan, data, source = tiny_setup
    cfg_run = dataclasses.replace(
        cfg, n_optimization_steps=4, image_visualization_interval=2)
    seen = []

    def cb(it, x_adv, aux):
        assert "output_image" in aux
        assert aux["output_image"].shape == source.shape
        seen.append(it)

    x, history = run_pgd(model, sampler, plan, cfg_run, data,
                         jax.random.key(13), vis_callback=cb,
                         block_size=block_size)
    assert seen == [0, 2, 3]
    assert len(history) == 4
    # same iterate as the serial no-vis loop (the decode is off the hot path)
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg_run, decode_vis=False))
    x_ref = source
    for i in range(4):
        x_ref, _ = step(model.params, x_ref, data,
                        jax.random.fold_in(jax.random.key(13), i))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-6)


def test_attack_reduces_loss_toward_target(tiny_setup):
    """The adversarial image should steer the edit toward the target more
    than the clean image does: expected loss under *fixed evaluation keys*
    must drop after the attack (per-iteration losses are too noisy to
    compare directly — every rep redraws prompt/noise/VAE samples)."""
    import dataclasses

    from tml_image_editing_defense_tpu.attack import make_eot_grad

    model, cfg, sampler, plan, data, source = tiny_setup
    cfg_run = dataclasses.replace(cfg, n_optimization_steps=20, step_size=0.02)
    loop = jax.jit(make_pgd_loop(model, sampler, plan, cfg_run))
    x_final, _ = loop(model.params, source, data, jax.random.key(11))

    eot = jax.jit(make_eot_grad(model, sampler, plan, cfg))
    eval_keys = jax.random.split(jax.random.key(123), 8)

    def mean_loss(x):
        return np.mean([float(eot(model.params, x, data, k)[1]["avg_loss"]) for k in eval_keys])

    before, after = mean_loss(source), mean_loss(x_final)
    assert after < before, (before, after)
