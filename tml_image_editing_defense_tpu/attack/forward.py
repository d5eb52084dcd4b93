"""The differentiable editing chain — ``attack_forward`` as a pure function.

Re-designs reference ``Trainer.attack_forward`` (``main.py:179-246``) the TPU
way: VAE encode → scheduler noise-add → a ``lax.scan`` over K CFG UNet steps
→ (optional) VAE decode, all in one traced program that ``jax.grad``
differentiates end-to-end with rematerialization on the scan body (the
reference instead holds the whole K-step autograd graph in memory,
``main.py:176``).

Inputs that were host-side Python in the reference become traced values:
the prompt row is a gather from the precomputed bank, the noise-pool entry a
gather from the stacked pool, and all stochasticity (VAE posterior draw,
LCM/DDIM step noise) flows from one key.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel


@flax.struct.dataclass
class CondInputs:
    """CFG-ready conditioning for one forward: stacked [uncond; cond]."""

    ctx: jnp.ndarray                       # [2, S, D]
    text_embeds: Optional[jnp.ndarray] = None   # SDXL pooled, [2, P]
    time_ids: Optional[jnp.ndarray] = None      # SDXL, [2, 6]


def make_time_ids(
    image_size: int = 512,
    dtype=jnp.float32,
    aesthetic_score: Optional[float] = None,
    negative_aesthetic_score: Optional[float] = None,
) -> jnp.ndarray:
    """SDXL micro-conditioning ids (original/crop/target = 512², reference
    ``main.py:368-383``), duplicated for CFG as [neg; pos].

    With ``aesthetic_score`` set, produces the refiner-style 5-tuple
    (original + crop + score) instead of the 6-tuple — the
    ``requires_aesthetics_score`` branch of the reference's vendored SDXL
    pipeline (``sdxl_img2img_pipeline.py:344-378``).
    """
    base = [image_size, image_size, 0, 0]
    if aesthetic_score is not None:
        neg = negative_aesthetic_score if negative_aesthetic_score is not None else 2.5
        pos_row = jnp.asarray(base + [aesthetic_score], dtype)
        neg_row = jnp.asarray(base + [neg], dtype)
        return jnp.stack([neg_row, pos_row])
    row = jnp.asarray(base + [image_size, image_size], dtype)
    return jnp.stack([row, row])


def select_cond(bank_embeds, bank_uncond, prompt_idx, bank_pooled=None,
                bank_uncond_pooled=None, time_ids=None) -> CondInputs:
    """Gather prompt row ``prompt_idx`` from the bank and stack CFG pairs."""
    cond = jax.lax.dynamic_index_in_dim(bank_embeds, prompt_idx, 0, keepdims=False)
    ctx = jnp.stack([bank_uncond, cond])
    te = None
    if bank_pooled is not None:
        pooled = jax.lax.dynamic_index_in_dim(bank_pooled, prompt_idx, 0, keepdims=False)
        te = jnp.stack([bank_uncond_pooled, pooled])
    return CondInputs(ctx=ctx, text_embeds=te, time_ids=time_ids)


def _convs_saveable(prim, *_, **__) -> bool:
    """Checkpoint-policy predicate: save convolution outputs.

    ``checkpoint_dots_with_no_batch_dims`` saves only ``dot_general`` results;
    convolutions are a *different* primitive, so under the "dots" policy every
    conv in the UNet/VAE — ~75% of step time per the round-1 profile — is
    recomputed during the backward pass.  Saving conv outputs trades HBM for
    that recompute.
    """
    return prim is not None and getattr(prim, "name", "") == "conv_general_dilated"


_REMAT_POLICIES = {
    # recompute everything inside the step body (lowest memory)
    "full": lambda body: jax.checkpoint(body),
    # save unbatched matmul outputs (time-embed / attention projections)
    "dots": lambda body: jax.checkpoint(
        body, policy=jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims
    ),
    # save conv outputs too — the conv-dominated models recompute far less
    "conv_dots": lambda body: jax.checkpoint(
        body,
        policy=jax.checkpoint_policies.save_from_both_policies(
            jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
            _convs_saveable,
        ),
    ),
    # no checkpoint: autodiff saves whatever it needs (highest memory)
    "none": lambda body: body,
}


def apply_remat(body, remat_policy: str):
    """Wrap a scan body according to ``cfg.remat_policy``."""
    try:
        return _REMAT_POLICIES[remat_policy](body)
    except KeyError:
        raise ValueError(
            f"unknown remat_policy {remat_policy!r}; have {sorted(_REMAT_POLICIES)}"
        ) from None


def denoise_chain(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    params,
    latents: jnp.ndarray,              # [1, h, w, 4] — already noised to t0
    cond: CondInputs,
    guidance_scale: float,
    key: jax.Array,
    remat_policy: str = "full",
    unroll: "bool | None" = None,
) -> jnp.ndarray:
    """K CFG denoising steps as one scan (reference loop ``main.py:229-243``)."""
    if plan.num_steps == 0:
        return latents
    step_keys = jax.random.split(key, plan.num_steps)

    b = latents.shape[0]

    def body(state, xs):
        x, carry = state
        i, k = xs
        latent_in = jnp.concatenate([x, x], axis=0)
        latent_in = sampler.scale_model_input(plan, i, latent_in)
        t = plan.t_eval[i]
        eps = model.apply_unet(
            params["unet"], latent_in, t, cond.ctx,
            text_embeds=cond.text_embeds, time_ids=cond.time_ids,
        )
        eps_uncond, eps_text = eps[:b], eps[b:]
        guided = eps_uncond + guidance_scale * (eps_text - eps_uncond)
        x, carry = sampler.step(plan, i, carry, guided, x, k)
        return (x, carry), None

    body = apply_remat(body, remat_policy)
    carry0 = sampler.init_carry(latents.shape, latents.dtype)
    # Short training chains (LCM K≤4) unroll: kills the while-loop overhead
    # and the stacked scan residuals; measured ~1.4% faster on v5e @512².
    # Long evaluation chains (PLMS-50) stay rolled to bound program size;
    # ``unroll=False`` (cfg.unroll_denoise) also keeps huge-program configs
    # (SDXL 1024² fwd+bwd) within the compiler's reach.
    if unroll is None:
        unroll = plan.num_steps <= 4
    (x, _), _ = jax.lax.scan(
        body, (latents, carry0), (jnp.arange(plan.num_steps), step_keys),
        unroll=unroll,
    )
    return x


def attack_forward_from_latent(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    params,
    z_scaled: jnp.ndarray,             # [1, h, w, 4] — scaled VAE latent
    cond: CondInputs,
    init_noise: jnp.ndarray,           # [1, h, w, 4] — selected pool entry
    guidance_scale: float,
    key: jax.Array,
    remat_policy: str = "full",
    unroll: "bool | None" = None,
) -> jnp.ndarray:
    """Post-encode tail of the editing chain: noise-add → K-step denoise →
    unscale (reference main.py:194-245).  Split out so the EOT loop can share
    one VAE-encoder forward/VJP across reps (the encode is loop-invariant,
    main.py:191 recomputes it every rep)."""
    x = sampler.add_noise(plan, z_scaled, init_noise)         # main.py:216
    x = denoise_chain(
        model, sampler, plan, params, x, cond, guidance_scale, key, remat_policy,
        unroll=unroll,
    )
    return x / model.vae_scaling                              # main.py:245


def attack_forward(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    params,
    image: jnp.ndarray,                # [1, H, W, 3] in [-1, 1]
    cond: CondInputs,
    init_noise: jnp.ndarray,           # [1, h, w, 4] — selected pool entry
    guidance_scale: float,
    key: jax.Array,
    remat_policy: str = "full",
    unroll: "bool | None" = None,
) -> jnp.ndarray:
    """image → *unscaled* output latent (reference main.py:179-246, which
    returns ``latents / 0.18215`` at :245)."""
    k_vae, k_chain = jax.random.split(key)
    z = model.encode_image(params["vae"], image, key=k_vae)   # scaled (main.py:191)
    return attack_forward_from_latent(
        model, sampler, plan, params, z, cond, init_noise,
        guidance_scale, k_chain, remat_policy, unroll=unroll,
    )
