"""Distributed tests on the 8-device virtual CPU mesh (SURVEY.md §4):
sharded EOT pmean == single-device EOT; data-parallel batched PGD ==
per-image sequential PGD."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tml_image_editing_defense_tpu.attack import make_attack_data, make_pgd_step
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.rng import make_noise_pool
from tml_image_editing_defense_tpu.core.samplers import LCMSampler
from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.parallel import (
    batch_attack_data,
    make_batched_pgd_step,
    make_mesh,
    make_sharded_eot_pgd_step,
    shard_along,
)
from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, REPS_AXIS


@pytest.fixture(scope="module")
def setup():
    model = build_model("tiny", key=jax.random.key(0))
    cfg = TrainConfig(
        norm_type="linf", n_optimization_steps=2, n_denoising_steps_per_iteration=2,
        limit_timesteps=False, grad_reps=4, derive_norm_hyperparams=False,
        eps=0.1, step_size=0.02, apply_loss_on_latents=True, apply_loss_on_images=False,
        perturbation_loss_lambda=0.0, guidance_scale=2.0, image_size=32,
        eot_mode="scan", remat_policy="none", prompts=["a", "b"],
    )
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(2)
    bank = model.embed_prompt_bank(cfg.prompts)
    return model, cfg, sampler, plan, bank


def _one_data(model, cfg, bank, seed):
    src = jnp.clip(jax.random.normal(jax.random.key(seed), (1, 32, 32, 3)) * 0.3, -1, 1)
    tgt = jnp.zeros_like(src)
    pool = make_noise_pool(jax.random.key(seed + 100), cfg.n_noise, model.latent_shape)
    return make_attack_data(model, cfg, src, tgt, bank, pool), src


def test_mesh_construction():
    assert len(jax.devices()) == 8, "conftest must provide 8 virtual devices"
    mesh = make_mesh({DATA_AXIS: 4, REPS_AXIS: 2})
    assert mesh.shape == {DATA_AXIS: 4, REPS_AXIS: 2}
    mesh2 = make_mesh({DATA_AXIS: -1})
    assert mesh2.shape[DATA_AXIS] == 8
    with pytest.raises(ValueError):
        make_mesh({DATA_AXIS: 3})


def test_sharded_eot_matches_single_device(setup):
    """pmean over the reps axis must reproduce the single-device EOT mean
    gradient bit-for-bit (same keys, same order)."""
    model, cfg, sampler, plan, bank = setup
    data, src = _one_data(model, cfg, bank, 1)
    mesh = make_mesh({REPS_AXIS: 4})
    sh_step = jax.jit(make_sharded_eot_pgd_step(model, sampler, plan, cfg, mesh))
    ref_step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    key = jax.random.key(7)
    with jax.sharding.set_mesh(mesh):
        x_sh, aux_sh = sh_step(model.params, src, data, key)
    x_ref, aux_ref = ref_step(model.params, src, data, key)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        float(aux_sh["avg_loss"]), float(aux_ref["avg_loss"]), rtol=1e-5
    )


def test_sharded_eot_honors_remat_vae(setup):
    """remat_vae must change only memory scheduling, never the math: the
    sharded step with the checkpointed VAE encode still matches the serial
    step (regression: the sharded path used to silently drop the knob, so
    1024² configs that fit under the serial step could OOM multi-chip)."""
    model, cfg, sampler, plan, bank = setup
    cfg = dataclasses.replace(cfg, remat_vae=True)
    data, src = _one_data(model, cfg, bank, 5)
    mesh = make_mesh({REPS_AXIS: 4})
    sh_step = jax.jit(make_sharded_eot_pgd_step(model, sampler, plan, cfg, mesh))
    ref_step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    key = jax.random.key(13)
    with jax.sharding.set_mesh(mesh):
        x_sh, aux_sh = sh_step(model.params, src, data, key)
    x_ref, aux_ref = ref_step(model.params, src, data, key)
    np.testing.assert_allclose(np.asarray(x_sh), np.asarray(x_ref), rtol=1e-5, atol=1e-6)


def test_batched_pgd_matches_sequential(setup):
    model, cfg, sampler, plan, bank = setup
    datas, srcs = zip(*[_one_data(model, cfg, bank, s) for s in range(4)])
    batched = batch_attack_data(datas)
    assert batched.source.shape[0] == 4
    mesh = make_mesh({DATA_AXIS: 4})
    bstep = make_batched_pgd_step(model, sampler, plan, cfg, batched, mesh=mesh)
    keys = jax.random.split(jax.random.key(3), 4)
    x0 = jnp.stack(srcs)
    x1, aux = bstep(model.params, x0, batched, keys)
    assert x1.shape == (4, 1, 32, 32, 3)
    # sequential reference
    step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    for i in range(4):
        xi, auxi = step(model.params, srcs[i], datas[i], keys[i])
        np.testing.assert_allclose(np.asarray(x1[i]), np.asarray(xi), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            float(aux["avg_loss"][i]), float(auxi["avg_loss"]), rtol=1e-5
        )


def test_dp_eot_matches_serial_step(setup):
    """The 2-D (data × reps) step's oracle (VERDICT r2 item 5): its per-image
    rep-key stream is the global ``split(k_reps, grad_reps)`` block-sharded
    over the reps axis, so every image must reproduce the serial
    ``make_pgd_step`` result for the same image key."""
    from tml_image_editing_defense_tpu.parallel.dp_eot import make_dp_eot_pgd_step

    model, cfg, sampler, plan, bank = setup
    datas, srcs = zip(*[_one_data(model, cfg, bank, 20 + s) for s in range(2)])
    batched = batch_attack_data(datas)
    mesh = make_mesh({DATA_AXIS: 2, REPS_AXIS: 4})
    dstep = make_dp_eot_pgd_step(model, sampler, plan, cfg, batched, mesh)
    keys = jax.random.split(jax.random.key(11), 2)
    with jax.sharding.set_mesh(mesh):
        x2, aux2 = jax.jit(dstep)(model.params, jnp.stack(srcs), batched, keys)
        x2, aux2 = jax.device_get((x2, aux2))
    ref_step = jax.jit(make_pgd_step(model, sampler, plan, cfg))
    for i in range(2):
        xi, auxi = ref_step(model.params, srcs[i], datas[i], keys[i])
        np.testing.assert_allclose(np.asarray(x2[i]), np.asarray(xi),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(float(aux2["avg_loss"][i]),
                                   float(auxi["avg_loss"]), rtol=1e-5)


def test_batched_step_is_actually_sharded(setup):
    model, cfg, sampler, plan, bank = setup
    datas, srcs = zip(*[_one_data(model, cfg, bank, 10 + s) for s in range(8)])
    batched = batch_attack_data(datas)
    mesh = make_mesh({DATA_AXIS: 8})
    bstep = make_batched_pgd_step(model, sampler, plan, cfg, batched, mesh=mesh)
    keys = jax.random.split(jax.random.key(4), 8)
    x0 = shard_along(mesh, jnp.stack(srcs), DATA_AXIS)
    x1, _ = bstep(model.params, x0, batched, keys)
    shards = x1.sharding.device_set
    assert len(shards) == 8          # output lives on all 8 devices


def test_sharded_universal_matches_single_device(setup):
    """Universal-trainer EOT reps sharded over the mesh must reproduce the
    serial step (reference loop old/train_noise.py:130-166; sharding =
    parallel/eot.py::make_sharded_universal_step): same global rep-key
    stream block-sharded, pmean'd mean gradient, same update/projections."""
    from tml_image_editing_defense_tpu.attack.universal import (
        UniversalConfig,
        make_universal_step,
        train_universal_perturbation,
    )
    from tml_image_editing_defense_tpu.parallel.eot import (
        make_sharded_universal_step,
    )

    model, *_ = setup
    ucfg = UniversalConfig(grad_reps=4, image_size=32,
                           edit_prompts=("a photo", "a sketch"))
    bank = model.embed_prompt_bank(list(ucfg.edit_prompts))
    src = jnp.clip(
        jax.random.normal(jax.random.key(31), (1, 32, 32, 3)) * 0.3, -1, 1
    )
    pert0 = jnp.zeros_like(src)
    key = jax.random.key(33)
    mesh = make_mesh({REPS_AXIS: 4})
    sh_step = jax.jit(make_sharded_universal_step(model, ucfg, bank, mesh))
    ref_step = jax.jit(make_universal_step(model, ucfg, bank))
    with jax.sharding.set_mesh(mesh):
        p_sh, l_sh = sh_step(model.params, pert0, src, key)
    p_ref, l_ref = ref_step(model.params, pert0, src, key)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(l_sh), float(l_ref), rtol=1e-5)

    # the product loop routes through the same step when given a mesh
    imgs = [np.asarray(src)]
    ucfg2 = dataclasses.replace(ucfg, max_steps=2)
    pert_m, losses_m = train_universal_perturbation(
        model, imgs, ucfg2, jax.random.key(40), mesh=mesh)
    pert_s, losses_s = train_universal_perturbation(
        model, imgs, ucfg2, jax.random.key(40))
    np.testing.assert_allclose(np.asarray(pert_m), np.asarray(pert_s),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(losses_m, losses_s, rtol=1e-5)
