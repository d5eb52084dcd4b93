"""Inpainting-attack forward (legacy C17 variant, ``old/yuval_playground.py``).

PhotoGuard's inpainting attack drives a 9-channel inpaint UNet: per step the
model input is ``concat([noisy_latents, mask, masked_image_latents])`` along
channels (``old/yuval_playground.py:92-97, 139``), with

- ``latents`` initialized from *fresh* noise at ``init_noise_sigma``
  (txt2img-style; the gradient enters only through the masked-image latents,
  ``:90-93``),
- an all-ones mask (full-image inpaint as the editing proxy, ``:96, 389-390``),
- the wider timestep window ``100 < t < 800`` (``:106``),
- output ``latents / 0.18215`` (``:160``).

The PGD loops around it reuse the legacy ``super_l2``/``super_linf``
projections with per-rep prompt sampling.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.attack.forward import CondInputs, select_cond
from tml_image_editing_defense_tpu.attack.losses import lp_distance, perturbation_loss
from tml_image_editing_defense_tpu.attack.pgd import AttackData, perturbation_step
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel


def inpaint_attack_forward(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    params,
    image: jnp.ndarray,                   # [1,H,W,3] in [-1,1]
    cond: CondInputs,
    guidance_scale: float,
    key: jax.Array,
    remat_policy: str = "full",
    mask_latent: Optional[jnp.ndarray] = None,   # [1,h,w,1]; None ⇒ all ones
    unroll: "bool | None" = None,
) -> jnp.ndarray:
    """image → unscaled output latent through the inpaint denoising chain."""
    k_lat, k_vae, k_chain = jax.random.split(key, 3)
    lat_shape = (1,) + model.latent_shape[1:]
    latents = jax.random.normal(k_lat, lat_shape, image.dtype)
    if plan.kind == "euler":
        latents = latents * plan.init_sigma.astype(latents.dtype)
    masked_image_latents = model.encode_image(params["vae"], image, key=k_vae)
    if mask_latent is None:
        mask_latent = jnp.ones(lat_shape[:-1] + (1,), image.dtype)
    # CFG duplication of the conditioning channels (done once, :94-97)
    mil2 = jnp.concatenate([masked_image_latents] * 2, axis=0)
    mask2 = jnp.concatenate([mask_latent] * 2, axis=0)

    step_keys = jax.random.split(k_chain, max(plan.num_steps, 1))

    def body(state, xs):
        x, carry = state
        i, k = xs
        latent_in = jnp.concatenate([x, x], axis=0)
        latent_in = sampler.scale_model_input(plan, i, latent_in)
        latent_in = jnp.concatenate([latent_in, mask2, mil2], axis=-1)  # 9ch
        eps = model.apply_unet(
            params["unet"], latent_in, plan.t_eval[i], cond.ctx,
            text_embeds=cond.text_embeds, time_ids=cond.time_ids,
        )
        eps_u, eps_c = eps[:1], eps[1:]
        guided = eps_u + guidance_scale * (eps_c - eps_u)
        x, carry = sampler.step(plan, i, carry, guided, x, k)
        return (x, carry), None

    from tml_image_editing_defense_tpu.attack.forward import apply_remat

    body = apply_remat(body, remat_policy)
    carry0 = sampler.init_carry(latents.shape, latents.dtype)
    # Same unroll policy as denoise_chain (attack/forward.py): short chains
    # unroll, and cfg.unroll_denoise=False keeps huge-program configs rolled
    # (ADVICE r2: the inpaint path previously could not opt out).
    if unroll is None:
        unroll = plan.num_steps <= 4
    (x, _), _ = jax.lax.scan(
        body, (latents, carry0), (jnp.arange(plan.num_steps), step_keys),
        unroll=unroll,
    )
    return x / model.vae_scaling


def make_inpaint_eot_grad(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
) -> Callable:
    """Legacy-style EOT over the inpaint forward (prompt per rep)."""

    def rep_loss(x_adv, params, data: AttackData, prompt_idx, key):
        cond = select_cond(
            data.bank_embeds, data.bank_uncond, prompt_idx,
            data.bank_pooled, data.bank_uncond_pooled, data.time_ids,
        )
        out_latent = inpaint_attack_forward(
            model, sampler, plan, params, x_adv, cond,
            cfg.guidance_scale, key, cfg.remat_policy, mask_latent=None,
            unroll=getattr(cfg, "unroll_denoise", None),
        )
        # decode only when a loss term needs pixels (same trade as the
        # diffusion step: the vis image is reconstructed from the carried
        # latent at vis iterations, attack/pgd.py::run_pgd)
        need_pixels = cfg.apply_loss_on_images or cfg.perturbation_loss_lambda > 0
        out_image = (
            model.decode_latent(params["vae"], out_latent, scaled=False)
            if need_pixels else None
        )
        if cfg.apply_loss_on_images:
            rec = lp_distance(out_image, data.target, 2)
        else:
            rec = lp_distance(out_latent, data.target_latent, 2)
        loss = cfg.rec_loss_lambda * rec
        if cfg.perturbation_loss_lambda > 0:
            pert = perturbation_loss(out_image, data.source)
            loss = loss + cfg.perturbation_loss_lambda * pert
        else:
            pert = jnp.zeros((), rec.dtype)
        return loss, (rec, pert, out_latent)

    grad_fn = jax.value_and_grad(rep_loss, argnums=0, has_aux=True)

    def eot(params, x_adv, data: AttackData, key):
        rep_keys = jax.random.split(key, cfg.grad_reps)
        lat_zero = jnp.zeros((1,) + model.latent_shape[1:], x_adv.dtype)
        aux0 = (jnp.zeros(()), jnp.zeros(()), lat_zero, jnp.zeros((), jnp.int32))

        def body(acc, k):
            k_p, k_r = jax.random.split(k)
            prompt_idx = jax.random.randint(k_p, (), 0, data.bank_embeds.shape[0])
            (loss, (rec, pert, out_lat)), g = grad_fn(
                x_adv, params, data, prompt_idx, k_r
            )
            aux_c = (rec.astype(jnp.float32), pert.astype(jnp.float32),
                     out_lat, prompt_idx)
            return (acc[0] + g, acc[1] + loss, aux_c), None

        (gsum, lsum, (rec, pert, out_lat, prompt_idx)), _ = jax.lax.scan(
            body, (jnp.zeros_like(x_adv), jnp.zeros(()), aux0), rep_keys
        )
        aux = {
            "avg_loss": lsum / cfg.grad_reps,
            "rec_loss": rec,                   # last rep's, like the serial step
            "pert_loss": pert,
            "output_latent": out_lat,
            "prompt_idx": prompt_idx,          # last rep's (prompt is per-rep here)
        }
        return gsum / cfg.grad_reps, aux

    return eot


def make_inpaint_pgd_step(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
) -> Callable:
    """One inpaint-attack PGD iteration with the product step contract
    (``step(params, x_adv, data, key) -> (x_adv', aux)``) so ``api.immunize``
    can drive it through run_pgd — vis grids, history, checkpoint/resume and
    artifacts all work unchanged.  The reference's version is only runnable
    as a script (old/yuval_playground.py:345-366); this is its product route.

    Projection parity with the legacy loops: ``super_l2``/``super_linf``
    never mask the perturbation (old/yuval_playground.py:211-316), so
    ``data.mask`` is deliberately ignored here."""
    from tml_image_editing_defense_tpu.attack.pgd import (
        select_perturbation_update,
    )

    eot = make_inpaint_eot_grad(model, sampler, plan, cfg)
    update = select_perturbation_update(cfg)

    def step(params, x_adv, data: AttackData, key):
        grad, aux = eot(params, x_adv, data, key)
        x_adv = update(
            cfg.norm_type,
            x_adv=x_adv,
            grad=grad,
            x_src=data.source,
            step_size=cfg.step_size,
            eps=cfg.eps,
            min_value=cfg.min_value,
            max_value=cfg.max_value,
            mask=None,
        )
        return x_adv, aux

    return step


def run_inpaint_attack(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    data: AttackData,
    key: jax.Array,
    iters: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """PGD against the inpainting chain (super_l2/linf projections)."""
    eot = make_inpaint_eot_grad(model, sampler, plan, cfg)
    n = iters or cfg.n_optimization_steps

    def step(x, k):
        grad, aux = eot(model.params, x, data, k)
        x = perturbation_step(
            cfg.norm_type,
            x_adv=x, grad=grad, x_src=data.source,
            step_size=cfg.step_size, eps=cfg.eps,
            min_value=cfg.min_value, max_value=cfg.max_value, mask=None,
        )
        return x, aux["avg_loss"]

    keys = jax.random.split(key, n)
    return jax.jit(lambda x0: jax.lax.scan(step, x0, keys))(data.source)
