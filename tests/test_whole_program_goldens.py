"""Committed goldens for the whole-program compositions (VERDICT r4 item 6).

``test_whole_program_oracle.py`` pins our composed programs against literal
torch transcriptions of the reference loops — but that statement only holds
where torch is installed and only for the torch version present.  This
module freezes the *jax-side outputs* of the same compositions (tiny
family, fixed keys, CPU f32) as committed arrays, so

- regressions are caught even in torch-free environments, and
- the oracle-verified numbers survive torch-version drift: the goldens were
  generated from a tree that passed the torch oracle, so matching them
  transitively re-asserts reference parity.

Compositions pinned (same reference anchors as the oracle module):

1. ``attack_forward`` — Trainer.attack_forward (main.py:179-246), LCM chain.
2. One full PGD iteration — compute_grad EOT + perturbation_step
   (main.py:88-102, 144-177, 248-276) via ``make_pgd_step`` (both the vis
   and the hot-path decode_vis=False variants must agree).
3. One img2img ``__call__`` with caller-fixed noise — the vendored
   pipeline's flow (pipeline_stable_diffusion_img2img.py:1042-1129).
4. The SDXL micro-conditioning branch of attack_forward
   (main.py:202-208, 362-408) on the tiny-sdxl family.
5. The inpainting attack's forward — 9-channel UNet, ``100 < t < 800``
   window (old/yuval_playground.py:46-160) on the tiny-inpaint family.

Regenerate (only after re-validating against the torch oracle):
    TID_REGEN_GOLDENS=1 python -m pytest tests/test_whole_program_goldens.py -q
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.attack.forward import (
    CondInputs,
    attack_forward,
    make_time_ids,
)
from tml_image_editing_defense_tpu.attack.pgd import make_attack_data, make_pgd_step
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.rng import make_noise_pool
from tml_image_editing_defense_tpu.core.samplers import LCMSampler
from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.pipelines import Img2ImgPipeline

GOLDEN_PATH = Path(__file__).parent / "goldens" / "whole_program.npz"
SIZE = 32
GS = 3.0


def _rand(seed, shape, scale=1.0):
    return jax.random.normal(jax.random.key(seed), shape, jnp.float32) * scale


def _compute() -> dict:
    """Deterministic outputs of the five compositions (fixed keys, tiny
    families built from key(0), CPU f32)."""
    out = {}
    model = build_model("tiny", key=jax.random.key(0), image_size=SIZE)
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(2)
    image = jnp.clip(_rand(1, (1, SIZE, SIZE, 3), 0.4), -1, 1)
    ctx = _rand(2, (2, 77, model.embed_prompt_bank(["a"]).embeds.shape[-1]))

    # 1. attack_forward (LCM, K=2)
    noise = _rand(3, (1,) + model.latent_shape[1:])
    lat = attack_forward(
        model, sampler, plan, model.params, image, CondInputs(ctx=ctx),
        noise, GS, jax.random.key(4), "none",
    )
    out["attack_forward_latent"] = np.asarray(lat, np.float32)

    # 2. one full PGD iteration (L2: normalized step + renorm + clamp)
    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False, eps=8.0, step_size=1.0,
        n_denoising_steps_per_iteration=2, limit_timesteps=False, grad_reps=2,
        guidance_scale=GS, image_size=SIZE, apply_loss_on_images=True,
        apply_loss_on_latents=False, perturbation_loss_lambda=1.0,
        eot_mode="scan", remat_policy="none", prompts=["a", "b"],
        use_pallas_update=False,      # platform-independent jnp update path
    )
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(5), 2, model.latent_shape)
    data = make_attack_data(model, cfg, image, jnp.zeros_like(image), bank,
                            pool, target_latent_key=jax.random.key(6))
    x1, aux = jax.jit(make_pgd_step(model, sampler, plan, cfg))(
        model.params, image, data, jax.random.key(7))
    out["pgd_x_adv"] = np.asarray(x1, np.float32)
    out["pgd_avg_loss"] = np.asarray(aux["avg_loss"], np.float32)

    # 3. img2img __call__ with caller-fixed noise (PLMS, 4 steps, strength .6)
    pipe = Img2ImgPipeline(model, sampler="plms")
    img_arr = pipe(
        prompt="a painting", image=image, num_inference_steps=4,
        guidance_scale=GS, strength=0.6,
        noise=_rand(8, (1,) + model.latent_shape[1:]),
        key=jax.random.key(9), output_type="array",
    )
    out["img2img_image"] = np.asarray(img_arr, np.float32)

    # 4. SDXL micro-conditioning branch
    xl = build_model("tiny-sdxl", key=jax.random.key(0), image_size=SIZE)
    xbank = xl.embed_prompt_bank(["a", "b"])
    xctx = _rand(10, (2, 77, xbank.embeds.shape[-1]))
    xpool_emb = _rand(11, (2, xbank.pooled.shape[-1]))
    cond = CondInputs(ctx=xctx, text_embeds=xpool_emb,
                      time_ids=make_time_ids(SIZE, jnp.float32))
    xsampler = LCMSampler(xl.schedule)
    xlat = attack_forward(
        xl, xsampler, xsampler.plan(2), xl.params, image, cond,
        _rand(12, (1,) + xl.latent_shape[1:]), GS, jax.random.key(13), "none",
    )
    out["sdxl_attack_forward_latent"] = np.asarray(xlat, np.float32)

    # 5. inpainting attack_forward (9-channel UNet, 100 < t < 800 window —
    #    old/yuval_playground.py:46-160; oracle leg:
    #    test_whole_program_oracle.py::
    #    test_inpaint_attack_forward_matches_reference_composition)
    from tml_image_editing_defense_tpu.attack.inpaint import (
        inpaint_attack_forward,
    )

    ip = build_model("tiny-inpaint", key=jax.random.key(0), image_size=SIZE)
    ip_sampler = LCMSampler(ip.schedule)
    ip_plan = ip_sampler.plan(4, limit_t=800, min_t=101)
    ip_ctx = _rand(14, (2, 7, ip.unet.config.cross_attention_dim))
    ip_lat = inpaint_attack_forward(
        ip, ip_sampler, ip_plan, ip.params, image, CondInputs(ctx=ip_ctx),
        GS, jax.random.key(15), remat_policy="none",
    )
    out["inpaint_attack_forward_latent"] = np.asarray(ip_lat, np.float32)
    return out


def test_whole_program_goldens():
    got = _compute()
    if os.environ.get("TID_REGEN_GOLDENS") == "1":
        GOLDEN_PATH.parent.mkdir(parents=True, exist_ok=True)
        np.savez_compressed(GOLDEN_PATH, **got)
        pytest.skip(f"goldens regenerated -> {GOLDEN_PATH}")
    assert GOLDEN_PATH.exists(), (
        "goldens missing; generate with TID_REGEN_GOLDENS=1 after validating "
        "against the torch oracle (test_whole_program_oracle.py)"
    )
    ref = np.load(GOLDEN_PATH)
    assert set(ref.files) == set(got), (sorted(ref.files), sorted(got))
    for k in ref.files:
        np.testing.assert_allclose(
            got[k], ref[k], rtol=2e-5, atol=2e-6,
            err_msg=f"golden drift in {k!r} — if intentional, re-validate vs "
                    "the torch oracle, then regenerate with TID_REGEN_GOLDENS=1",
        )


def test_hot_path_step_matches_golden_iterate():
    """The decode_vis=False hot path reproduces the SAME golden iterate —
    the bench-measured program is pinned to the oracle-verified numbers."""
    if not GOLDEN_PATH.exists():
        pytest.skip("goldens not generated yet")
    model = build_model("tiny", key=jax.random.key(0), image_size=SIZE)
    sampler = LCMSampler(model.schedule)
    plan = sampler.plan(2)
    image = jnp.clip(_rand(1, (1, SIZE, SIZE, 3), 0.4), -1, 1)
    cfg = TrainConfig(
        norm_type="l2", derive_norm_hyperparams=False, eps=8.0, step_size=1.0,
        n_denoising_steps_per_iteration=2, limit_timesteps=False, grad_reps=2,
        guidance_scale=GS, image_size=SIZE, apply_loss_on_images=True,
        apply_loss_on_latents=False, perturbation_loss_lambda=1.0,
        eot_mode="scan", remat_policy="none", prompts=["a", "b"],
        use_pallas_update=False,
    )
    bank = model.embed_prompt_bank(cfg.prompts)
    pool = make_noise_pool(jax.random.key(5), 2, model.latent_shape)
    data = make_attack_data(model, cfg, image, jnp.zeros_like(image), bank,
                            pool, target_latent_key=jax.random.key(6))
    x1, _ = jax.jit(make_pgd_step(model, sampler, plan, cfg, decode_vis=False))(
        model.params, image, data, jax.random.key(7))
    ref = np.load(GOLDEN_PATH)
    np.testing.assert_allclose(np.asarray(x1), ref["pgd_x_adv"],
                               rtol=2e-5, atol=2e-6)
