"""EOT gradient sharding over the mesh ``reps`` axis.

The reference's EOT loop is K sequential gradient samples on one GPU
(``main.py:88-102``).  Here each chip evaluates ``grad_reps / n_reps_shards``
samples and the mean gradient is one ``pmean`` over ICI — the direct TPU
translation SURVEY.md §2 calls for (replacing
``torch.stack(all_grads).mean(0)``, main.py:102).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.5 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tml_image_editing_defense_tpu.attack.pgd import (
    _rep_loss_from_dist,
    select_perturbation_update,
)
from tml_image_editing_defense_tpu.models.vae import AutoencoderKL
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel
from tml_image_editing_defense_tpu.parallel.mesh import REPS_AXIS


def make_sharded_eot_pgd_step(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    mesh: Mesh,
    decode_vis: bool = True,
):
    """PGD step with EOT reps sharded over ``mesh[REPS_AXIS]``.

    Returns ``step(params, x_adv, data, key) -> (x_adv', aux)`` — jit it with
    the mesh active.  ``cfg.grad_reps`` must divide evenly by the axis size.

    ``decode_vis=False`` matches the serial step's hot-path contract
    (attack/pgd.py::make_eot_grad): aux carries ``output_latent`` and the
    program skips the per-step vis decode — run_pgd decodes lazily at vis
    iterations.
    """
    n_shards = mesh.shape[REPS_AXIS]
    if cfg.grad_reps % n_shards:
        raise ValueError(
            f"grad_reps={cfg.grad_reps} not divisible by reps-axis size {n_shards}"
        )
    local_reps = cfg.grad_reps // n_shards
    loss_fn = _rep_loss_from_dist(model, sampler, plan, cfg)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)

    def local_eot(params, x_adv, data, prompt_idx, rep_keys_local):
        # one shared VAE-encoder forward/VJP per shard; the pmean runs on the
        # small posterior gradients, the VJP to image space happens once
        def encode(x):
            return model.vae.apply(
                {"params": params["vae"]}, x, method=AutoencoderKL.encode
            )

        if getattr(cfg, "remat_vae", False):
            # same memory semantics as the serial step (attack/pgd.py):
            # recompute the encoder forward in the backward instead of saving
            # its conv activations (258 MB each at 1024²)
            encode = jax.checkpoint(encode)
        dist, vjp_fn = jax.vjp(encode, x_adv)
        zero = jax.tree.map(jnp.zeros_like, dist)
        aux0 = (jnp.zeros(()), jnp.zeros(()),
                jnp.zeros((1,) + model.latent_shape[1:], x_adv.dtype))

        def body(acc, k):
            (loss, aux), g = grad_fn(dist, params, data, prompt_idx, k)
            rec, pert, out_lat = aux
            aux_c = (rec.astype(jnp.float32), pert.astype(jnp.float32), out_lat)
            return (jax.tree.map(jnp.add, acc[0], g), acc[1] + loss, aux_c), None

        (gsum, lsum, last_aux), _ = jax.lax.scan(
            body, (zero, jnp.zeros(()), aux0), rep_keys_local
        )
        gdist = jax.lax.pmean(
            jax.tree.map(lambda g: g / local_reps, gsum), REPS_AXIS
        )
        avg_loss = jax.lax.pmean(lsum / local_reps, REPS_AXIS)
        (grad,) = vjp_fn(gdist)
        # serial-aux parity: the single-device step reports the LAST rep's
        # (rec, pert, out_latent) — globally that is the last shard's last
        # rep, selected with an indicator-psum over the reps axis.
        is_last = (jax.lax.axis_index(REPS_AXIS) == n_shards - 1).astype(jnp.float32)
        rec, pert, out_lat = jax.tree.map(
            lambda a: jax.lax.psum(a * is_last.astype(a.dtype), REPS_AXIS), last_aux
        )
        return grad, avg_loss, rec, pert, out_lat

    sharded = shard_map(
        local_eot,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(REPS_AXIS)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )

    update = select_perturbation_update(cfg)

    def step(params, x_adv, data, key):
        k_prompt, k_reps = jax.random.split(key)
        prompt_idx = jax.random.randint(k_prompt, (), 0, data.bank_embeds.shape[0])
        rep_keys = jax.random.split(k_reps, cfg.grad_reps)
        grad, avg_loss, rec, pert, out_lat = sharded(
            params, x_adv, data, prompt_idx, rep_keys
        )
        x_adv = update(
            cfg.norm_type,
            x_adv=x_adv,
            grad=grad,
            x_src=data.source,
            step_size=cfg.step_size,
            eps=cfg.eps,
            min_value=cfg.min_value,
            max_value=cfg.max_value,
            mask=data.mask,
        )
        aux = {
            "avg_loss": avg_loss,
            "rec_loss": rec,
            "pert_loss": pert,
            "prompt_idx": prompt_idx,
        }
        if decode_vis:
            aux["output_image"] = model.decode_latent(
                params["vae"], out_lat, scaled=False
            )
        else:
            aux["output_latent"] = out_lat
        return x_adv, aux

    return step


def make_sharded_universal_step(
    model: DiffusionModel,
    cfg,                                   # UniversalConfig
    bank,
    mesh: Mesh,
    preview=None,
):
    """Universal-perturbation step (``attack/universal.py``) with its EOT
    reps sharded over ``mesh[REPS_AXIS]``.

    The reference's universal trainer averages ``grad_reps`` independent
    gradient samples sequentially (``old/train_noise.py:130-166``); here each
    chip evaluates ``grad_reps / n_shards`` of them and the mean is one
    ``pmean`` over ICI — at the reference's native SDXL@1024² config the step
    is 7.77 s on one v5e (docs/PERF.md), all of it in the reps loop, so the
    sharding divides wall-clock linearly.  Same update rule / projections as
    the serial step (the mean gradient is handed back to
    ``make_universal_step`` through its ``mean_grad`` hook); rep keys are the
    global serial stream block-sharded, so the EOT distribution is unchanged.
    """
    from tml_image_editing_defense_tpu.attack.universal import (
        _universal_rep_loss,
        make_universal_step,
    )

    n_shards = mesh.shape[REPS_AXIS]
    if cfg.grad_reps % n_shards:
        raise ValueError(
            f"grad_reps={cfg.grad_reps} not divisible by reps-axis size {n_shards}"
        )
    local_reps = cfg.grad_reps // n_shards
    grad_fn = jax.value_and_grad(
        _universal_rep_loss(model, cfg, bank, preview), argnums=0
    )

    def local_mean(params, pert, source, rep_keys_local):
        def body(acc, k):
            loss, g = grad_fn(pert, params, source, k)
            return (acc[0] + g, acc[1] + loss), None

        (gsum, lsum), _ = jax.lax.scan(
            body, (jnp.zeros_like(pert), jnp.zeros(())), rep_keys_local
        )
        grad = jax.lax.pmean(gsum / local_reps, REPS_AXIS)
        avg_loss = jax.lax.pmean(lsum / local_reps, REPS_AXIS)
        return grad, avg_loss

    sharded = shard_map(
        local_mean,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(REPS_AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def mean_grad(params, pert, source, key):
        rep_keys = jax.random.split(key, cfg.grad_reps)
        return sharded(params, pert, source, rep_keys)

    return make_universal_step(model, cfg, bank, preview=preview,
                               mean_grad=mean_grad)
