"""Universal-perturbation trainer (reference C16, ``old/train_noise.py``).

One perturbation tensor trained over a dataset so that *any* covered image,
once perturbed, resists 1-step LCM editing: per batch/rep the perturbed image
is VAE-encoded, noised to a random timestep t ∈ [300, 800), denoised in a
single LCM step under a random edit prompt, decoded, and pushed to stay close
to the clean image (L2 + L∞ image losses, ``old/train_noise.py:141-158``);
the normalized mean gradient updates the perturbation with an ε-box clamp
(``:166-185``).

Deviations from the reference (deliberate bug fixes, flagged in SURVEY.md §3.5):
- the decoded preview no longer *overwrites* the source/target variable
  (reference ``:151`` corrupts its own optimization target);
- the constructed-but-never-stepped Adam optimizer (``:96``) is not silently
  dropped: the default update rule is the reference's *actual* one (the
  normalized-gradient step), and ``UniversalConfig(optimizer="adam", lr=…)``
  opts into a working optax Adam followed by the same projections.

Because the timestep is drawn *inside* the step, the 1-step denoise uses a
traced-t LCM update (:func:`lcm_denoise_single_step`) instead of a host-built
plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tml_image_editing_defense_tpu.attack.forward import (
    CondInputs,
    apply_remat,
    make_time_ids,
    select_cond,
)
from tml_image_editing_defense_tpu.attack.losses import lp_distance
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel, PromptBank
from tml_image_editing_defense_tpu.models.tiny_vae import TinyAutoencoder


@dataclass
class UniversalConfig:
    """Mirrors ``old/train_noise.py:20-48``."""

    eps: float = 0.1
    step_size: float = 0.006
    grad_reps: int = 4
    epochs: int = 1
    max_steps: int = 100
    timestep_range: Tuple[int, int] = (300, 800)
    guidance_scale: float = 1.0            # LCM editing runs guidance-free
    edit_prompts: Tuple[str, ...] = ("a photo", "an oil painting", "a sketch")
    default_prompt: str = ""
    l2_image_coeff: float = 1.0
    l_inf_image_coeff: float = 0.0
    apply_image_perturbation: bool = True  # re-anchor so source+pert stays in [-1,1]
    image_size: int = 512
    #: ``None`` → the reference's *actual* update rule (normalized-gradient
    #: step, ``old/train_noise.py:173-177``); ``"adam"`` → the Adam the
    #: reference constructed with ``lr`` but never stepped (``:96``, ``:39``)
    #: — here it really steps, followed by the same ε-clamp / re-anchor
    #: projections (``:180-185``).
    optimizer: Optional[str] = None
    lr: float = 1e-2
    #: rematerialization for the per-rep gradient body (same policy names as
    #: ``TrainConfig.remat_policy``, attack/forward.py ``_REMAT_POLICIES``).
    #: "none" is fastest and fits SD-1.5 @512²; the reference's native
    #: universal config — SDXL at 1024² (``old/train_noise.py:94``) — needs
    #: "full" on a 16 GB chip (the reference sidesteps this on an A100-80GB).
    remat_policy: str = "none"


def lcm_denoise_single_step(
    model: DiffusionModel,
    params,
    noisy_latents: jnp.ndarray,
    t: jnp.ndarray,                       # traced scalar int
    cond: CondInputs,
    guidance_scale: float,
    timestep_scaling: float = 10.0,
    sigma_data: float = 0.5,
) -> jnp.ndarray:
    """One LCM consistency step at a traced timestep (the ``num_inference_steps=1,
    timesteps=[t]`` call of ``old/train_noise.py:143-149``)."""
    b = noisy_latents.shape[0]
    latent_in = jnp.concatenate([noisy_latents, noisy_latents], axis=0)
    eps = model.apply_unet(
        params["unet"], latent_in, t, cond.ctx,
        text_embeds=cond.text_embeds, time_ids=cond.time_ids,
    )
    eps_u, eps_c = eps[:b], eps[b:]
    guided = eps_u + guidance_scale * (eps_c - eps_u)
    abar = model.schedule.alphas_cumprod[t].astype(noisy_latents.dtype)
    x0 = (noisy_latents - jnp.sqrt(1.0 - abar) * guided) / jnp.sqrt(abar)
    s = t.astype(noisy_latents.dtype) * timestep_scaling
    sd2 = sigma_data**2
    c_skip = sd2 / (s**2 + sd2)
    c_out = s / jnp.sqrt(s**2 + sd2)
    return c_out * x0 + c_skip * noisy_latents    # single step ⇒ denoised output


def _universal_rep_loss(
    model: DiffusionModel,
    cfg: UniversalConfig,
    bank: PromptBank,
    preview: Optional[TinyAutoencoder] = None,
):
    """Per-rep loss closure ``rep_loss(pert, params, source, key) -> loss``
    shared by the serial step below and the reps-sharded step
    (``parallel/eot.py::make_sharded_universal_step``)."""

    # Stage-wise remat: checkpoint encode / denoise / decode SEPARATELY so
    # the backward's peak residency is max(stage), not sum(stages).  One
    # checkpoint around the whole rep body measured 16.93 GB at the
    # reference's native SDXL@1024² config (compile-time HBM OOM on the
    # 16 GB chip — the VAE decode transpose held next to the encode/UNet
    # residuals); partitioning is the same fit strategy attack/pgd.py uses
    # (per-step chain remat + a separate ``remat_vae`` checkpoint).
    if cfg.remat_policy == "none":
        def wrap(f):
            return f
    else:
        def wrap(f):
            return apply_remat(f, cfg.remat_policy)

    def rep_loss(pert, params, source, key):
        k_enc, k_noise, k_t, k_p = jax.random.split(key, 4)
        perturbed = source + pert
        z = wrap(
            lambda img: model.encode_image(params["vae"], img, key=k_enc)
        )(perturbed)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        t = jax.random.randint(k_t, (), cfg.timestep_range[0], cfg.timestep_range[1])
        noisy = model.schedule.add_noise(z, noise, t)
        pidx = jax.random.randint(k_p, (), 0, bank.embeds.shape[0])
        time_ids = None
        if bank.pooled is not None:
            time_ids = make_time_ids(cfg.image_size, source.dtype)
        cond = select_cond(bank.embeds, bank.uncond, pidx, bank.pooled,
                           bank.uncond_pooled, time_ids)
        out_latents = wrap(
            lambda nz: lcm_denoise_single_step(
                model, params, nz, t, cond, cfg.guidance_scale
            )
        )(noisy)
        if preview is not None:
            # TAESD consumes the UNet's *scaled* latents directly
            # (scaling_factor 1.0; the reference's divide at
            # old/train_noise.py:151 is a no-op)
            decode = lambda zl: preview.decode(params["preview_vae"], zl)  # noqa: E731
        else:
            decode = lambda zl: model.decode_latent(params["vae"], zl, scaled=True)  # noqa: E731
        out_image = wrap(decode)(out_latents)
        loss = jnp.zeros((), out_image.dtype)
        if cfg.l2_image_coeff:
            loss = loss + cfg.l2_image_coeff * lp_distance(out_image, source, 2)
        if cfg.l_inf_image_coeff:
            loss = loss + cfg.l_inf_image_coeff * lp_distance(out_image, source, jnp.inf)
        return loss

    return rep_loss


def make_universal_step(
    model: DiffusionModel,
    cfg: UniversalConfig,
    bank: PromptBank,
    preview: Optional[TinyAutoencoder] = None,
    mean_grad=None,
):
    """One optimization step over one source image:
    ``step(params, pert, source[1,H,W,3], key) -> (pert', avg_loss)``.

    ``preview``: a :class:`TinyAutoencoder` whose params live at
    ``params["preview_vae"]``.  When given, the loss-side decode runs through
    the tiny decoder exactly as the reference does (``old/train_noise.py:82``
    builds taesdxl, ``:151`` decodes the edited latents with it inside the
    gradient path) — ~40× cheaper than the full VAE decoder, per EOT rep.
    Without it we fall back to the full VAE decode (same loss semantics,
    higher fidelity/cost).

    ``mean_grad``: optional override of the EOT mean-gradient inner loop,
    ``mean_grad(params, pert, source, key) -> (grad, avg_loss)`` — the hook
    ``parallel/eot.py::make_sharded_universal_step`` uses to shard the reps
    over the mesh.  Default: a serial ``lax.scan`` over ``cfg.grad_reps``.
    """
    tx = None
    if cfg.optimizer is not None:
        if cfg.optimizer != "adam":
            raise ValueError(f"unknown optimizer {cfg.optimizer!r}; have: adam")
        import optax

        tx = optax.adam(cfg.lr)

    def _project(pert, source):
        pert = jnp.clip(pert, -cfg.eps, cfg.eps)    # old/train_noise.py:180
        if cfg.apply_image_perturbation:
            # re-anchor so the perturbed image is representable (:183-185)
            pert = jnp.clip(source + pert, -1.0, 1.0) - source
        return pert

    if mean_grad is None:
        grad_fn = jax.value_and_grad(
            _universal_rep_loss(model, cfg, bank, preview), argnums=0
        )

        def mean_grad(params, pert, source, key):
            rep_keys = jax.random.split(key, cfg.grad_reps)

            def body(acc, k):
                loss, g = grad_fn(pert, params, source, k)
                return (acc[0] + g, acc[1] + loss), None

            (gsum, lsum), _ = jax.lax.scan(
                body, (jnp.zeros_like(pert), jnp.zeros(())), rep_keys
            )
            return gsum / cfg.grad_reps, lsum / cfg.grad_reps
    _mean_grad = mean_grad

    if tx is None:
        def step(params, pert, source, key):
            grad, avg_loss = _mean_grad(params, pert, source, key)
            # normalized-gradient update (old/train_noise.py:173-177)
            axes = tuple(range(1, grad.ndim))
            gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=axes, keepdims=True))
            pert = pert - grad / (gnorm + 1e-10) * cfg.step_size
            return _project(pert, source), avg_loss

        return step

    import optax

    def opt_step(params, pert, opt_state, source, key):
        grad, avg_loss = _mean_grad(params, pert, source, key)
        updates, opt_state = tx.update(grad, opt_state, pert)
        pert = optax.apply_updates(pert, updates)
        return _project(pert, source), opt_state, avg_loss

    opt_step.init = tx.init
    return opt_step


def make_universal_validation(model: DiffusionModel, cfg: UniversalConfig,
                              bank: PromptBank):
    """Validation edit for the periodic collage (``old/train_noise.py:196-205``):
    the same encode → noise(t) → 1-step LCM denoise as the training rep, but
    decoded through the FULL VAE (the reference's validation runs the whole
    pipe, not the preview decoder).  Returns
    ``validate(params, pert, source, key) -> image NHWC in [-1,1]``."""

    def validate(params, pert, source, key):
        k_enc, k_noise, k_t, k_p = jax.random.split(key, 4)
        perturbed = source + pert
        z = model.encode_image(params["vae"], perturbed, key=k_enc)
        noise = jax.random.normal(k_noise, z.shape, z.dtype)
        t = jax.random.randint(k_t, (), cfg.timestep_range[0], cfg.timestep_range[1])
        noisy = model.schedule.add_noise(z, noise, t)
        pidx = jax.random.randint(k_p, (), 0, bank.embeds.shape[0])
        time_ids = None
        if bank.pooled is not None:
            time_ids = make_time_ids(cfg.image_size, source.dtype)
        cond = select_cond(bank.embeds, bank.uncond, pidx, bank.pooled,
                           bank.uncond_pooled, time_ids)
        out_latents = lcm_denoise_single_step(
            model, params, noisy, t, cond, cfg.guidance_scale
        )
        return model.decode_latent(params["vae"], out_latents, scaled=True)

    return validate


def _universal_collage(source: np.ndarray, pert: np.ndarray,
                       validation: np.ndarray, step: int) -> np.ndarray:
    """HWC uint8 hstack [perturbed source | source | validation edit] with a
    caption strip (the reference's wandb collage, ``old/train_noise.py:206-214``
    — its cv2 text overlay becomes our caption strip)."""
    from tml_image_editing_defense_tpu.utils.vis import add_text_to_image

    def u8(x):
        x = np.asarray(x, np.float32)[0]        # [H,W,3] in [-1,1]
        return (np.clip(x / 2 + 0.5, 0, 1) * 255).astype(np.uint8)

    strip = np.hstack([u8(np.clip(source + pert, -1, 1)), u8(source),
                       u8(validation)])
    return add_text_to_image(strip, f"universal step {step}", add_below=False)


def train_universal_perturbation(
    model: DiffusionModel,
    images: Sequence[np.ndarray],          # each [1,H,W,3] NHWC in [-1,1]
    cfg: UniversalConfig,
    key: jax.Array,
    pert_init: Optional[jnp.ndarray] = None,
    log_fn=None,
    preview: Optional[TinyAutoencoder] = None,
    vis_every: Optional[int] = None,
    vis_fn=None,
    mesh=None,
) -> Tuple[jnp.ndarray, List[float]]:
    """Dataset loop (``old/train_noise.py:115-185``): shuffled single-image
    batches until ``max_steps`` or ``epochs`` exhausted.

    ``preview``: tiny preview autoencoder for the loss-side decode (the
    reference's taesdxl, ``old/train_noise.py:82, 151``); see
    :func:`make_universal_step`.

    ``vis_every``/``vis_fn``: every k steps run a no-grad validation edit on
    the current batch image and hand ``vis_fn(step, collage)`` an HWC uint8
    [perturbed | source | validation] collage — the reference's
    ``validate_every_k_steps`` wandb logging (``old/train_noise.py:196-214``),
    host-callback only, off the jitted hot path.

    ``mesh``: a ``jax.sharding.Mesh`` with a reps axis — the EOT gradient
    samples shard over it (``parallel/eot.py::make_sharded_universal_step``),
    dividing the step wall-clock by the axis size on multi-chip hosts."""
    prompts = [
        (cfg.default_prompt + " " + e).strip() for e in cfg.edit_prompts
    ]
    bank = model.embed_prompt_bank(prompts)
    if mesh is not None:
        from tml_image_editing_defense_tpu.parallel.eot import (
            make_sharded_universal_step,
        )
        from tml_image_editing_defense_tpu.parallel.mesh import REPS_AXIS

        if mesh.shape.get(REPS_AXIS, 1) > 1:
            raw_step = make_sharded_universal_step(model, cfg, bank, mesh,
                                                   preview=preview)
        else:
            raw_step = make_universal_step(model, cfg, bank, preview=preview)
    else:
        raw_step = make_universal_step(model, cfg, bank, preview=preview)
    step = jax.jit(raw_step)
    opt_init = getattr(raw_step, "init", None)
    validate = None
    if vis_every is not None and vis_fn is not None:
        validate = jax.jit(make_universal_validation(model, cfg, bank))
    run_params = model.params
    if preview is not None:
        run_params = dict(run_params, preview_vae=preview.params)
    shape = images[0].shape
    pert = jnp.zeros(shape, images[0].dtype) if pert_init is None else pert_init
    opt_state = None if opt_init is None else opt_init(pert)
    losses: List[float] = []
    count = 0
    import contextlib

    ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
           else contextlib.nullcontext())
    with ctx:
        for _ in range(cfg.epochs):
            key, kperm = jax.random.split(key)
            order = jax.random.permutation(kperm, len(images))
            for idx in np.asarray(order):
                if count >= cfg.max_steps:
                    return pert, losses
                key, sub = jax.random.split(key)
                img = jnp.asarray(images[int(idx)])
                if opt_init is None:
                    pert, loss = step(run_params, pert, img, sub)
                else:
                    pert, opt_state, loss = step(run_params, pert, opt_state,
                                                 img, sub)
                losses.append(float(loss))
                if log_fn is not None:
                    log_fn(count, losses[-1])
                if validate is not None and count % vis_every == 0:
                    key, kv = jax.random.split(key)
                    val = validate(run_params, pert, img, kv)
                    vis_fn(count, _universal_collage(
                        np.asarray(img), np.asarray(pert), np.asarray(val),
                        count))
                count += 1
    return pert, losses
