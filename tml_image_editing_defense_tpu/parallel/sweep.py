"""Data-parallel (image-parallel) PGD over the mesh ``data`` axis.

The reference fakes data parallelism by slicing the image list in half and
pinning ``CUDA_VISIBLE_DEVICES`` per manual run (``run_all.py:16-21``).  Here
a *batch* of independent immunization problems is vmapped into one program
and the batch axis is sharded over ICI — each chip immunizes different
images, zero collectives, perfectly parallel (exactly what the reference's
hand-split simulates).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tml_image_editing_defense_tpu.attack.pgd import AttackData, make_pgd_loop, make_pgd_step
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel
from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS


def batch_attack_data(datas: Sequence[AttackData]) -> AttackData:
    """Stack per-image fields along a new leading batch axis; the prompt bank
    (shared across images) stays unbatched."""
    d0 = datas[0]

    def stack(field):
        vals = [getattr(d, field) for d in datas]
        if vals[0] is None:
            return None
        return jnp.stack(vals)

    return AttackData(
        source=stack("source"),
        target=stack("target"),
        target_latent=stack("target_latent"),
        bank_embeds=d0.bank_embeds,
        bank_uncond=d0.bank_uncond,
        noise_pool=stack("noise_pool"),
        bank_pooled=d0.bank_pooled,
        bank_uncond_pooled=d0.bank_uncond_pooled,
        time_ids=d0.time_ids,
        mask=stack("mask"),
    )


def _data_in_axes(batched: AttackData) -> AttackData:
    """vmap in_axes pytree: 0 for batched per-image fields, None for shared."""
    return AttackData(
        source=0,
        target=0,
        target_latent=0,
        bank_embeds=None,
        bank_uncond=None,
        noise_pool=0,
        bank_pooled=None,
        bank_uncond_pooled=None,
        time_ids=None,
        mask=None if batched.mask is None else 0,
    )


def _shard_specs(mesh: Mesh, batched: AttackData):
    batched_spec = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return AttackData(
        source=batched_spec,
        target=batched_spec,
        target_latent=batched_spec,
        bank_embeds=repl,
        bank_uncond=repl,
        noise_pool=batched_spec,
        bank_pooled=None if batched.bank_pooled is None else repl,
        bank_uncond_pooled=None if batched.bank_uncond_pooled is None else repl,
        time_ids=None if batched.time_ids is None else repl,
        mask=None if batched.mask is None else batched_spec,
    )


def make_batched_pgd_step(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    batched: AttackData,
    mesh: Optional[Mesh] = None,
):
    """``step(params, x_advs[B,…], batched_data, keys[B]) -> (x_advs', aux[B])``
    with the image axis sharded over ``mesh[DATA_AXIS]`` when given."""
    step = make_pgd_step(model, sampler, plan, cfg)
    vstep = jax.vmap(step, in_axes=(None, 0, _data_in_axes(batched), 0))
    if mesh is None:
        return jax.jit(vstep)
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        vstep,
        in_shardings=(
            jax.tree.map(lambda _: repl, model.params),
            bspec,
            _shard_specs(mesh, batched),
            bspec,
        ),
    )


def make_batched_pgd_loop(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    batched: AttackData,
    mesh: Optional[Mesh] = None,
    n_steps: Optional[int] = None,
):
    """Whole multi-image immunization as one program:
    ``loop(params, x_advs[B], data, keys[B]) -> (x_advs_final, losses[B, N])``."""
    loop = make_pgd_loop(model, sampler, plan, cfg, n_steps=n_steps)
    vloop = jax.vmap(loop, in_axes=(None, 0, _data_in_axes(batched), 0))
    if mesh is None:
        return jax.jit(vloop)
    bspec = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    return jax.jit(
        vloop,
        in_shardings=(
            jax.tree.map(lambda _: repl, model.params),
            bspec,
            _shard_specs(mesh, batched),
            bspec,
        ),
    )
