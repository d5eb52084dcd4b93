"""Encoder attack (PhotoGuard-style) and the legacy ``super_l2``/``super_linf``
loops.

Two capabilities from the reference's legacy layer (SURVEY.md C17,
``old/yuval_playground.py:211-316`` / ``_backup.py:207-311``):

1. **Encoder attack** — PGD directly against the VAE encoder:
   ``loss = ||E(x) - E(target)||₂`` (the latent-space loss of
   ``old/yuval_playground_backup.py:190`` with the denoising chain reduced
   to the encoder).  This is the cheapest immunization (BASELINE.md target:
   200 steps < 5 s/image/chip) and its entire N-step loop compiles to one
   ``lax.scan``.

2. **Legacy EOT loops** — ``super_l2``/``super_linf`` semantics: identical
   PGD projections to the live ``Trainer.perturbation_step``, but the prompt
   is re-sampled *per gradient rep* (``_backup.py:229-231``) instead of per
   iteration (``main.py:85``).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.attack.losses import lp_distance
from tml_image_editing_defense_tpu.attack.pgd import (
    AttackData,
    _rep_loss_fn,
    perturbation_step,
)
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel


# ---------------------------------------------------------------------------
# 1. Pure encoder attack
# ---------------------------------------------------------------------------


def make_encoder_attack_step(
    model: DiffusionModel,
    norm_type: str = "linf",
    step_size: float = 0.006,
    eps: float = 0.1,
    min_value: float = -1.0,
    max_value: float = 1.0,
    stochastic_encode: bool = True,
) -> Callable:
    """One PGD step against ``||E(x) - target_latent||₂`` (scaled latents).

    ``step(params, x_adv, x_src, target_latent, key) -> (x_adv', loss)``.
    """

    def loss_fn(x, params, target_latent, key):
        z = model.encode_image(params["vae"], x, key=key if stochastic_encode else None)
        return lp_distance(z, target_latent, 2)

    grad_fn = jax.value_and_grad(loss_fn, argnums=0)

    def step(params, x_adv, x_src, target_latent, key):
        loss, grad = grad_fn(x_adv, params, target_latent, key)
        x_adv = perturbation_step(
            norm_type,
            x_adv=x_adv, grad=grad, x_src=x_src,
            step_size=step_size, eps=eps,
            min_value=min_value, max_value=max_value, mask=None,
        )
        return x_adv, loss

    return step


def make_encoder_attack_loop(model: DiffusionModel, n_steps: int, **kw) -> Callable:
    """The full N-step encoder attack fused into one ``lax.scan`` —
    ``loop(params, x_src, target_latent, key) -> (x_adv, losses[N])``."""
    step = make_encoder_attack_step(model, **kw)

    def loop(params, x_src, target_latent, key):
        keys = jax.random.split(key, n_steps)

        def body(x, k):
            x, loss = step(params, x, x_src, target_latent, k)
            return x, loss

        return jax.lax.scan(body, x_src, keys)

    return loop


# ---------------------------------------------------------------------------
# 2. Legacy super_l2 / super_linf (per-rep prompt sampling)
# ---------------------------------------------------------------------------


def make_legacy_eot_grad(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
) -> Callable:
    """EOT gradient with the prompt re-drawn per rep
    (``old/yuval_playground_backup.py:229-231``)."""
    loss_fn = _rep_loss_fn(model, sampler, plan, cfg)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)

    def eot(params, x_adv, data: AttackData, key):
        rep_keys = jax.random.split(key, cfg.grad_reps)

        def body(acc, k):
            k_p, k_r = jax.random.split(k)
            prompt_idx = jax.random.randint(k_p, (), 0, data.bank_embeds.shape[0])
            (loss, _), g = grad_fn(x_adv, params, data, prompt_idx, k_r)
            return (acc[0] + g, acc[1] + loss), None

        (gsum, lsum), _ = jax.lax.scan(
            body, (jnp.zeros_like(x_adv), jnp.zeros(())), rep_keys
        )
        return gsum / cfg.grad_reps, lsum / cfg.grad_reps

    return eot


def _super_loop(norm_type: str):
    def runner(
        model: DiffusionModel,
        sampler: BaseSampler,
        plan: DenoisePlan,
        cfg: TrainConfig,
        data: AttackData,
        key: jax.Array,
        iters: Optional[int] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (X_adv, losses[iters])."""
        eot = make_legacy_eot_grad(model, sampler, plan, cfg)
        n = iters or cfg.n_optimization_steps

        def step(x, k):
            grad, loss = eot(model.params, x, data, k)
            x = perturbation_step(
                norm_type,
                x_adv=x, grad=grad, x_src=data.source,
                step_size=cfg.step_size, eps=cfg.eps,
                min_value=cfg.min_value, max_value=cfg.max_value, mask=None,
            )
            return x, loss

        keys = jax.random.split(key, n)
        return jax.jit(lambda x0: jax.lax.scan(step, x0, keys))(data.source)

    return runner


#: super_l2 (``old/yuval_playground_backup.py:207-260``)
super_l2 = _super_loop("l2")
#: super_linf (``old/yuval_playground_backup.py:261-311``)
super_linf = _super_loop("linf")
