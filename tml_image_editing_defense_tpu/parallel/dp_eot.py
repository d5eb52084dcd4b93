"""2-D sharded training step: images × EOT reps over a (data, reps) mesh.

The full multi-chip immunization step this framework scales with:
- the ``data`` axis shards independent images (the reference's hand-split
  sweep, ``run_all.py:16-21``, done properly over ICI);
- the ``reps`` axis shards the EOT gradient samples of *each* image
  (``main.py:88-102``), reduced with a ``pmean`` over the ``reps`` axis only.

Per-image RNG: the prompt draw comes from the image key (identical across
reps shards, matching the reference's one-prompt-per-iteration semantics,
``main.py:85``), and rep keys are the image's GLOBAL ``split(k_reps,
grad_reps)`` stream with each shard taking its contiguous block — exactly
the stream the serial step (``attack/pgd.py::make_eot_grad``) and the 1-D
sharded step (``parallel/eot.py``) consume, so a (data=1, reps=N) mesh
reproduces ``make_pgd_step`` and the EOT distribution is pinned to the
reference semantics (VERDICT r2 item 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from tml_image_editing_defense_tpu.attack.pgd import (
    AttackData,
    _rep_loss_from_dist,
    perturbation_step,
)
from tml_image_editing_defense_tpu.models.vae import AutoencoderKL
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel
from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, REPS_AXIS
from tml_image_editing_defense_tpu.parallel.sweep import _shard_specs


def make_dp_eot_pgd_step(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    batched: AttackData,
    mesh: Mesh,
):
    """``step(params, x_advs[B,…], batched_data, img_keys[B]) ->
    (x_advs', {"avg_loss": [B]})`` over a mesh with ``data`` and ``reps``
    axes.  ``B`` must divide by the data-axis size and ``cfg.grad_reps`` by
    the reps-axis size."""
    n_reps_shards = mesh.shape[REPS_AXIS]
    if cfg.grad_reps % n_reps_shards:
        raise ValueError(
            f"grad_reps={cfg.grad_reps} not divisible by reps axis {n_reps_shards}"
        )
    local_reps = cfg.grad_reps // n_reps_shards
    loss_fn = _rep_loss_from_dist(model, sampler, plan, cfg)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)

    def per_image(params, x_adv, data, img_key):
        rep_shard = jax.lax.axis_index(REPS_AXIS)
        k_prompt, k_reps = jax.random.split(img_key)
        prompt_idx = jax.random.randint(k_prompt, (), 0, data.bank_embeds.shape[0])
        # serial-oracle key stream: global split, contiguous block per shard
        rep_keys_all = jax.random.split(k_reps, cfg.grad_reps)
        rep_keys = jax.lax.dynamic_slice_in_dim(
            rep_keys_all, rep_shard * local_reps, local_reps, axis=0
        )

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

        def body(acc, k):
            (loss, _), g = grad_fn(dist, params, data, prompt_idx, k)
            return (jax.tree.map(jnp.add, acc[0], g), acc[1] + loss), None

        (gsum, lsum), _ = jax.lax.scan(body, (zero, jnp.zeros(())), rep_keys)
        gdist = jax.lax.pmean(
            jax.tree.map(lambda g: g / local_reps, gsum), REPS_AXIS
        )
        avg_loss = jax.lax.pmean(lsum / local_reps, REPS_AXIS)
        (grad,) = vjp_fn(gdist)
        # jnp update (not the Pallas kernel): per_image runs under vmap, where
        # a Pallas call would be serialized per batch element; the jnp path is
        # bit-equal to the kernel (tests/test_pallas_ops.py) and XLA fuses it.
        x_adv = perturbation_step(
            cfg.norm_type,
            x_adv=x_adv, grad=grad, x_src=data.source,
            step_size=cfg.step_size, eps=cfg.eps,
            min_value=cfg.min_value, max_value=cfg.max_value, mask=data.mask,
        )
        return x_adv, avg_loss

    def local(params, x_advs, data, img_keys):
        # vmap over this shard's slice of the image batch
        in_axes_data = jax.tree.map(lambda _: 0, data)
        in_axes_data = in_axes_data.replace(
            bank_embeds=None, bank_uncond=None,
            bank_pooled=None if data.bank_pooled is None else None,
            bank_uncond_pooled=None, time_ids=None,
        )
        x, losses = jax.vmap(
            lambda x, d, k: per_image(params, x, d, k),
            in_axes=(0, in_axes_data, 0),
        )(x_advs, data, img_keys)
        return x, losses

    batched_p, repl_p = P(DATA_AXIS), P()
    data_specs = AttackData(
        source=batched_p,
        target=batched_p,
        target_latent=batched_p,
        bank_embeds=repl_p,
        bank_uncond=repl_p,
        noise_pool=batched_p,
        bank_pooled=None if batched.bank_pooled is None else repl_p,
        bank_uncond_pooled=None if batched.bank_uncond_pooled is None else repl_p,
        time_ids=None if batched.time_ids is None else repl_p,
        mask=None if batched.mask is None else batched_p,
    )
    sharded = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), data_specs, P(DATA_AXIS)),
        out_specs=(P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )

    def step(params, x_advs, data, img_keys):
        x, losses = sharded(params, x_advs, data, img_keys)
        return x, {"avg_loss": losses}

    return step


def make_dp_eot_pgd_loop(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    batched: AttackData,
    mesh: Mesh,
    n_steps=None,
):
    """Whole multi-image immunization over the 2-D (data × reps) mesh as ONE
    program: ``loop(params, x_advs[B], data, keys[B]) -> (x_final,
    {"avg_loss": [B, N]})``.

    Per-image iteration keys are ``fold_in(key_b, i)`` — the stream
    :func:`~tml_image_editing_defense_tpu.attack.pgd.make_pgd_loop` and
    ``run_pgd`` consume — and the per-step rep stream is the serial oracle
    (module docstring), so each image reproduces its serial ``immunize`` run
    up to gradient-sum association when the reps axis is >1.  This is the
    loop :func:`api.immunize_batch` dispatches when ``cfg.eot_shards > 1``.
    """
    from jax.sharding import NamedSharding

    n = n_steps or cfg.n_optimization_steps
    step = make_dp_eot_pgd_step(model, sampler, plan, cfg, batched, mesh)

    def loop(params, x_advs, data, keys):
        # [N, B] per-iteration keys: fold_in by iteration index per image
        iter_keys = jax.vmap(
            lambda i: jax.vmap(lambda k: jax.random.fold_in(k, i))(keys)
        )(jnp.arange(n))

        def body(x, ks):
            x, aux = step(params, x, data, ks)
            return x, aux["avg_loss"]

        x_final, losses = jax.lax.scan(body, x_advs, iter_keys)   # losses [N, B]
        return x_final, {"avg_loss": jnp.swapaxes(losses, 0, 1)}

    bspec = NamedSharding(mesh, P(DATA_AXIS))
    repl = NamedSharding(mesh, P())
    dspecs = _shard_specs(mesh, batched)
    return jax.jit(
        loop,
        in_shardings=(
            jax.tree.map(lambda _: repl, model.params),
            bspec,
            dspecs,
            bspec,
        ),
    )
