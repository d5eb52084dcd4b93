"""Encoder attack, legacy super loops, universal perturbation, dataset, CLI."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from tml_image_editing_defense_tpu.attack import make_attack_data
from tml_image_editing_defense_tpu.attack.encoder_attack import (
    make_encoder_attack_loop,
    make_encoder_attack_step,
    super_l2,
    super_linf,
)
from tml_image_editing_defense_tpu.attack.universal import (
    UniversalConfig,
    train_universal_perturbation,
)
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.rng import make_noise_pool
from tml_image_editing_defense_tpu.core.samplers import LCMSampler
from tml_image_editing_defense_tpu.models import build_model


@pytest.fixture(scope="module")
def tiny():
    return build_model("tiny", key=jax.random.key(0))


@pytest.fixture(scope="module")
def src():
    return jnp.clip(jax.random.normal(jax.random.key(1), (1, 32, 32, 3)) * 0.3, -1, 1)


def test_encoder_attack_reduces_latent_distance(tiny, src):
    """PGD against the encoder must move E(x) toward the target latent."""
    target = jnp.zeros_like(src)
    target_latent = tiny.encode_image(tiny.params["vae"], target)
    loop = jax.jit(make_encoder_attack_loop(
        tiny, n_steps=30, norm_type="linf", step_size=0.01, eps=0.15,
        stochastic_encode=False,
    ))
    x_adv, losses = loop(tiny.params, src, target_latent, jax.random.key(2))
    losses = np.asarray(losses)
    assert losses[-1] < losses[0] * 0.9
    d = np.abs(np.asarray(x_adv - src))
    assert d.max() <= 0.15 + 1e-6 and d.max() > 1e-4


def test_encoder_attack_l2_ball(tiny, src):
    step = jax.jit(make_encoder_attack_step(tiny, norm_type="l2", step_size=2.0, eps=3.0))
    tl = tiny.encode_image(tiny.params["vae"], jnp.zeros_like(src))
    x = src
    for i in range(4):
        x, loss = step(tiny.params, x, src, tl, jax.random.key(i))
    d = np.asarray(x - src)
    assert np.sqrt((d**2).sum()) <= 3.0 + 1e-4


def _setup_diffusion(tiny):
    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False, eps=4.0, step_size=1.0,
        n_optimization_steps=3, n_denoising_steps_per_iteration=2,
        limit_timesteps=False, grad_reps=2, apply_loss_on_latents=True,
        apply_loss_on_images=False, perturbation_loss_lambda=0.0,
        guidance_scale=2.0, image_size=32, eot_mode="scan", remat_policy="none",
        prompts=["a", "b"],
    )
    sampler = LCMSampler(tiny.schedule)
    plan = sampler.plan(2)
    src = jnp.clip(jax.random.normal(jax.random.key(5), (1, 32, 32, 3)) * 0.3, -1, 1)
    bank = tiny.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(6), 1, tiny.latent_shape)
    data = make_attack_data(tiny, cfg, src, jnp.zeros_like(src), bank, pool)
    return cfg, sampler, plan, data


def test_super_loops_run_and_project(tiny):
    cfg, sampler, plan, data = _setup_diffusion(tiny)
    x2, losses2 = super_l2(tiny, sampler, plan, cfg, data, jax.random.key(7), iters=2)
    d = np.asarray(x2 - data.source)
    assert np.sqrt((d**2).sum()) <= cfg.eps + 1e-4
    assert losses2.shape == (2,) and np.isfinite(np.asarray(losses2)).all()
    xi, lossesi = super_linf(tiny, sampler, plan, cfg, data, jax.random.key(8), iters=2)
    di = np.abs(np.asarray(xi - data.source))
    assert di.max() <= cfg.eps + 1e-6


def test_universal_perturbation(tiny):
    cfg = UniversalConfig(
        eps=0.08, step_size=0.02, grad_reps=2, epochs=2, max_steps=6,
        timestep_range=(300, 800), guidance_scale=1.0,
        edit_prompts=("a sketch", "a photo"), image_size=32,
    )
    imgs = [
        np.asarray(jnp.clip(jax.random.normal(jax.random.key(10 + i), (1, 32, 32, 3)) * 0.3, -1, 1))
        for i in range(3)
    ]
    pert, losses = train_universal_perturbation(tiny, imgs, cfg, jax.random.key(11))
    assert pert.shape == imgs[0].shape
    assert np.abs(np.asarray(pert)).max() <= cfg.eps + 1e-6
    assert len(losses) == 6 and np.isfinite(losses).all()
    assert np.abs(np.asarray(pert)).max() > 1e-5


def test_universal_remat_matches_none(tiny):
    """``UniversalConfig.remat_policy`` must be a pure memory/time trade:
    the remat'd gradient body computes the same update as plain autodiff
    (needed to trust the 1024² SDXL fit strategy, which requires "full")."""
    from tml_image_editing_defense_tpu.attack.universal import make_universal_step

    src = jnp.clip(
        jax.random.normal(jax.random.key(21), (1, 32, 32, 3)) * 0.3, -1, 1
    )
    pert0 = jnp.zeros_like(src)
    perts = {}
    for policy in ("none", "full"):
        cfg = UniversalConfig(grad_reps=2, image_size=32,
                              edit_prompts=("a photo",), remat_policy=policy)
        bank = tiny.embed_prompt_bank(["a photo"])
        step = jax.jit(make_universal_step(tiny, cfg, bank))
        pert, loss = step(tiny.params, pert0, src, jax.random.key(22))
        assert np.isfinite(float(loss))
        perts[policy] = np.asarray(pert)
    np.testing.assert_allclose(perts["full"], perts["none"], atol=1e-6)


def test_dataset(tmp_path):
    from tml_image_editing_defense_tpu.data import ImagePromptDataset

    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray(rng.integers(0, 255, (40, 56, 3), dtype=np.uint8).astype(np.uint8)).save(
            tmp_path / f"im{i}.jpg"
        )
    ds = ImagePromptDataset(str(tmp_path), default_prompt="a photo", size=32)
    assert len(ds) == 3
    img, prompt = ds[0]
    assert img.shape == (3, 32, 32) and prompt == "a photo"
    assert -1.0 <= img.min() and img.max() <= 1.0
    batches = list(ds.batches(2))
    assert batches[0][0].shape == (2, 3, 32, 32)
    assert batches[1][0].shape == (1, 3, 32, 32)


def test_cli_help_and_parsing(capsys):
    from tml_image_editing_defense_tpu.cli import main

    with pytest.raises(SystemExit):
        main(["--help"])
    out = capsys.readouterr().out
    assert "immunize" in out and "evaluate" in out and "sweep" in out
    with pytest.raises(SystemExit):
        main(["immunize", "--help"])
    out = capsys.readouterr().out
    assert "--n-optimization-steps" in out and "--norm-type" in out


def test_dp_eot_2d_step(tiny):
    from tml_image_editing_defense_tpu.parallel import batch_attack_data, make_mesh
    from tml_image_editing_defense_tpu.parallel.dp_eot import make_dp_eot_pgd_step
    from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, REPS_AXIS

    cfg, sampler, plan, data0 = _setup_diffusion(tiny)
    datas = [data0] * 4
    batched = batch_attack_data(datas)
    mesh = make_mesh({DATA_AXIS: 4, REPS_AXIS: 2})
    step = make_dp_eot_pgd_step(tiny, sampler, plan, cfg, batched, mesh)
    keys = jax.random.split(jax.random.key(12), 4)
    x0 = jnp.stack([data0.source] * 4)
    with jax.sharding.set_mesh(mesh):
        jstep = jax.jit(step)
        x1, aux = jstep(tiny.params, x0, batched, keys)
        x1b, _ = jstep(tiny.params, x0, batched, keys)
    assert np.isfinite(np.asarray(x1)).all()
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x1b))  # deterministic
    # identical images but different keys → different prompts/noise → differ
    assert not np.allclose(np.asarray(x1[0]), np.asarray(x1[1]))


def test_inpaint_attack(tmp_path):
    """Legacy inpainting attack (old/yuval_playground.py): 9-channel UNet,
    fresh-noise latents, grad through masked-image latents only."""
    from tml_image_editing_defense_tpu.attack.inpaint import (
        inpaint_attack_forward,
        run_inpaint_attack,
    )
    from tml_image_editing_defense_tpu.attack.forward import CondInputs
    from tml_image_editing_defense_tpu.attack import make_attack_data

    model = build_model("tiny-inpaint", key=jax.random.key(0))
    assert model.unet.config.in_channels == 9
    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False, eps=4.0, step_size=1.0,
        n_optimization_steps=2, n_denoising_steps_per_iteration=3,
        limit_timesteps=False, grad_reps=2, apply_loss_on_latents=True,
        apply_loss_on_images=False, perturbation_loss_lambda=0.0,
        guidance_scale=7.5, image_size=32, eot_mode="scan", remat_policy="none",
        prompts=["a", "b"],
    )
    sampler = LCMSampler(model.schedule)
    # the legacy window: 100 < t < 800 (old/yuval_playground.py:106)
    plan = sampler.plan(4, limit_t=800, min_t=101)
    assert (np.asarray(plan.t_eval) > 100).all() and (np.asarray(plan.t_eval) < 800).all()
    src = jnp.clip(jax.random.normal(jax.random.key(1), (1, 32, 32, 3)) * 0.3, -1, 1)
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(2), 1, model.latent_shape)
    data = make_attack_data(model, cfg, src, jnp.zeros_like(src), bank, pool)

    # forward produces a latent; gradient reaches the image
    cond = CondInputs(ctx=jnp.stack([bank.uncond, bank.embeds[0]]))
    def loss(img):
        out = inpaint_attack_forward(model, sampler, plan, model.params, img,
                                     cond, 7.5, jax.random.key(3), "none")
        return jnp.sum(out ** 2)
    g = jax.grad(loss)(src)
    assert float(jnp.linalg.norm(g)) > 0 and np.isfinite(np.asarray(g)).all()

    x_adv, losses = run_inpaint_attack(model, sampler, plan, cfg, data,
                                       jax.random.key(4), iters=2)
    d = np.asarray(x_adv - src)
    assert np.sqrt((d**2).sum()) <= cfg.eps + 1e-4
    assert np.isfinite(np.asarray(losses)).all()
