"""PGD immunization engine: perturbation steps, EOT gradients, jitted loop.

Rebuilds reference ``Trainer`` internals (``main.py:47-276``) as pure jax:

- :func:`perturbation_step` — exact semantics of ``main.py:248-276``
  including ``torch.renorm`` slice-wise L2 projection (``main.py:267``).
- :func:`make_eot_grad` — the ``grad_reps`` expectation-over-transformation
  loop (``main.py:88-102``) as a ``lax.scan``/``vmap`` over keys, with the
  prompt sampled once per outer iteration (``main.py:85``) and the noise-pool
  entry per rep (``main.py:215``).
- :func:`make_pgd_step` — one full outer iteration as a single jitted
  program; :func:`run_pgd` drives it with optional host visualization, and
  :func:`make_pgd_loop` fuses N iterations into one ``lax.scan`` dispatch.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from tml_image_editing_defense_tpu.attack.forward import (
    CondInputs,
    attack_forward,
    make_time_ids,
    select_cond,
)
from tml_image_editing_defense_tpu.attack.losses import lp_distance, perturbation_loss
from tml_image_editing_defense_tpu.configs import TrainConfig
from tml_image_editing_defense_tpu.core.samplers import BaseSampler, DenoisePlan
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel, PromptBank


# ---------------------------------------------------------------------------
# Perturbation steps (reference main.py:248-276)
# ---------------------------------------------------------------------------


def renorm_l2(x: jnp.ndarray, maxnorm: float, axis: int = 0) -> jnp.ndarray:
    """``torch.renorm(x, p=2, dim=axis, maxnorm)`` parity: every slice along
    ``axis`` whose L2 norm exceeds ``maxnorm`` is rescaled by
    ``maxnorm / (norm + 1e-7)`` (main.py:267)."""
    axes = tuple(i for i in range(x.ndim) if i != axis)
    norms = jnp.sqrt(jnp.sum(x * x, axis=axes, keepdims=True))
    factor = jnp.where(norms > maxnorm, maxnorm / (norms + 1e-7), 1.0)
    return x * factor


def l2_perturbation_step(
    x_adv: jnp.ndarray,
    grad: jnp.ndarray,
    x_src: jnp.ndarray,
    step_size: float,
    eps: float,
    min_value: float,
    max_value: float,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """L2 PGD: normalized-gradient step + renorm ε-ball projection + clamp
    (main.py:254-268).  ``mask`` (NHWC [B,H,W,1]) restricts the step to
    salient regions (main.py:260-261)."""
    axes = tuple(range(1, grad.ndim))
    gnorm = jnp.sqrt(jnp.sum(grad * grad, axis=axes, keepdims=True))
    gn = grad / (gnorm + 1e-10)
    if mask is not None:
        gn = gn * mask
    x_adv = x_adv - gn * step_size
    d_x = x_adv - x_src
    d_x = renorm_l2(d_x, eps, axis=0)
    return jnp.clip(x_src + d_x, min_value, max_value)


def linf_perturbation_step(
    x_adv: jnp.ndarray,
    grad: jnp.ndarray,
    x_src: jnp.ndarray,
    step_size: float,
    eps: float,
    min_value: float,
    max_value: float,
) -> jnp.ndarray:
    """L∞ PGD: sign step + box projection + clamp (main.py:270-274).

    The segmentation mask deliberately does NOT apply here: the reference
    masks only the L2 branch (main.py:260-261); the L∞ branch ignores it
    (main.py:270-274).  Both the jnp and Pallas dispatchers enforce this, so
    TPU and CPU results are identical for every config.
    """
    x_adv = x_adv - jnp.sign(grad) * step_size
    x_adv = jnp.minimum(jnp.maximum(x_adv, x_src - eps), x_src + eps)
    return jnp.clip(x_adv, min_value, max_value)


def perturbation_step(norm_type: str, **kw) -> jnp.ndarray:
    """Dispatcher with reference mask semantics: mask on L2 only."""
    if norm_type == "l2":
        return l2_perturbation_step(**kw)
    if norm_type == "linf":
        kw.pop("mask", None)
        return linf_perturbation_step(**kw)
    raise ValueError(f"unknown norm_type {norm_type!r}")


# ---------------------------------------------------------------------------
# Attack data + EOT gradient
# ---------------------------------------------------------------------------


@flax.struct.dataclass
class AttackData:
    """Device-resident inputs of one immunization run (all NHWC)."""

    source: jnp.ndarray                 # [1,H,W,3] in [-1,1]
    target: jnp.ndarray                 # [1,H,W,3]
    target_latent: jnp.ndarray          # [1,h,w,4] raw/unscaled (main.py:75)
    bank_embeds: jnp.ndarray            # [P,S,D]
    bank_uncond: jnp.ndarray            # [S,D]
    noise_pool: jnp.ndarray             # [N,1,h,w,4]
    bank_pooled: Optional[jnp.ndarray] = None          # SDXL [P,Dp]
    bank_uncond_pooled: Optional[jnp.ndarray] = None   # SDXL [Dp]
    time_ids: Optional[jnp.ndarray] = None             # SDXL [2,6]
    mask: Optional[jnp.ndarray] = None                 # [1,H,W,1]


def make_attack_data(
    model: DiffusionModel,
    cfg: TrainConfig,
    source: jnp.ndarray,
    target: jnp.ndarray,
    bank: PromptBank,
    noise_pool: jnp.ndarray,
    target_latent_key: Optional[jax.Array] = None,
    mask: Optional[jnp.ndarray] = None,
) -> AttackData:
    """Assemble device-side attack inputs (mirrors Trainer.run setup,
    main.py:61-75)."""
    target_latent = model.encode_image_raw(
        model.params["vae"], target, key=target_latent_key
    )
    time_ids = None
    if bank.pooled is not None:
        time_ids = make_time_ids(cfg.image_size, dtype=source.dtype)
    return AttackData(
        source=source,
        target=target,
        target_latent=target_latent,
        bank_embeds=bank.embeds,
        bank_uncond=bank.uncond,
        noise_pool=noise_pool,
        bank_pooled=bank.pooled,
        bank_uncond_pooled=bank.uncond_pooled,
        time_ids=time_ids,
        mask=mask if cfg.use_segmentation_mask else None,
    )


def _rep_loss_fn(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
):
    """Single EOT gradient sample: loss(params, x_adv, data, prompt_idx, key)
    (reference compute_grad, main.py:144-177)."""

    def loss_fn(x_adv, params, data: AttackData, prompt_idx, key):
        k_noise, k_fwd = jax.random.split(key)
        if cfg.use_fixed_noise:
            idx = jax.random.randint(k_noise, (), 0, data.noise_pool.shape[0])
            noise = jax.lax.dynamic_index_in_dim(data.noise_pool, idx, 0, keepdims=False)
        else:
            noise = jax.random.normal(
                k_noise, data.noise_pool.shape[1:], data.noise_pool.dtype
            )
        cond = select_cond(
            data.bank_embeds, data.bank_uncond, prompt_idx,
            data.bank_pooled, data.bank_uncond_pooled, data.time_ids,
        )
        out_latent = attack_forward(
            model, sampler, plan, params, x_adv, cond, noise,
            cfg.guidance_scale, k_fwd, cfg.remat_policy,
            unroll=getattr(cfg, "unroll_denoise", None),
        )

        def decode(z):
            return model.decode_latent(params["vae"], z, scaled=False)

        if getattr(cfg, "remat_vae", False):
            decode = jax.checkpoint(decode)
        output_image = decode(out_latent)
        if cfg.apply_loss_on_images:
            rec = lp_distance(output_image, data.target, 2)
        elif cfg.apply_loss_on_latents:
            rec = lp_distance(out_latent, data.target_latent, 2)
        else:
            raise ValueError("set apply_loss_on_images or apply_loss_on_latents")
        if cfg.perturbation_loss_lambda > 0:
            pert = perturbation_loss(output_image, data.source)
            loss = cfg.rec_loss_lambda * rec + cfg.perturbation_loss_lambda * pert
        else:
            pert = jnp.zeros((), rec.dtype)
            loss = cfg.rec_loss_lambda * rec
        return loss, (rec, pert, output_image)

    return loss_fn


def _rep_loss_from_dist(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
):
    """Per-rep loss as a function of the VAE posterior (mean, logvar) instead
    of the image.  Key-stream layout is identical to :func:`_rep_loss_fn`
    (k_noise / k_vae / k_chain), so results are bitwise-equal."""
    from tml_image_editing_defense_tpu.attack.forward import attack_forward_from_latent
    from tml_image_editing_defense_tpu.models.vae import sample_latent

    def loss_fn(dist, params, data: AttackData, prompt_idx, key):
        mean, logvar = dist
        k_noise, k_fwd = jax.random.split(key)
        if cfg.use_fixed_noise:
            idx = jax.random.randint(k_noise, (), 0, data.noise_pool.shape[0])
            noise = jax.lax.dynamic_index_in_dim(data.noise_pool, idx, 0, keepdims=False)
        else:
            noise = jax.random.normal(
                k_noise, data.noise_pool.shape[1:], data.noise_pool.dtype
            )
        cond = select_cond(
            data.bank_embeds, data.bank_uncond, prompt_idx,
            data.bank_pooled, data.bank_uncond_pooled, data.time_ids,
        )
        k_vae, k_chain = jax.random.split(k_fwd)
        z = sample_latent(k_vae, mean, logvar) * model.vae_scaling   # main.py:191
        out_latent = attack_forward_from_latent(
            model, sampler, plan, params, z, cond, noise,
            cfg.guidance_scale, k_chain, cfg.remat_policy,
            unroll=getattr(cfg, "unroll_denoise", None),
        )
        # decode only when a loss term needs pixels; the visualization image
        # is reconstructed from the (small) carried latent after the rep loop
        need_pixels = cfg.apply_loss_on_images or cfg.perturbation_loss_lambda > 0

        def decode(z):
            return model.decode_latent(params["vae"], z, scaled=False)

        if getattr(cfg, "remat_vae", False):
            decode = jax.checkpoint(decode)
        output_image = decode(out_latent) if need_pixels else None
        if cfg.apply_loss_on_images:
            rec = lp_distance(output_image, data.target, 2)
        elif cfg.apply_loss_on_latents:
            rec = lp_distance(out_latent, data.target_latent, 2)
        else:
            raise ValueError("set apply_loss_on_images or apply_loss_on_latents")
        if cfg.perturbation_loss_lambda > 0:
            pert = perturbation_loss(output_image, data.source)
            loss = cfg.rec_loss_lambda * rec + cfg.perturbation_loss_lambda * pert
        else:
            pert = jnp.zeros((), rec.dtype)
            loss = cfg.rec_loss_lambda * rec
        return loss, (rec, pert, out_latent)

    return loss_fn


def make_eot_grad(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    decode_vis: bool = True,
):
    """EOT gradient: mean over ``grad_reps`` independent samples
    (main.py:88-102), prompt drawn once per call (main.py:85-87).

    TPU optimization over the reference: the VAE-encoder forward and backward
    are loop-invariant across reps (the reference re-encodes every rep,
    main.py:191), so the encode runs once and its VJP is applied once to the
    rep-accumulated posterior gradient — identical math, ~2 fewer VAE passes
    per rep.

    ``decode_vis``: with True (default) the aux carries ``output_image`` — a
    full VAE decode of the last rep's latent for the reference's vis grid
    (main.py:124).  With False the aux carries the raw ``output_latent``
    instead (48× smaller at 512²) and the step program pays NO decode; the
    caller decodes on demand at vis iterations only (run_pgd does this),
    which is the right trade when the vis interval is 25 (configs.py:146) —
    24 of every 25 steps were paying a decode nobody looked at.
    """
    from tml_image_editing_defense_tpu.models.vae import AutoencoderKL

    loss_fn = _rep_loss_from_dist(model, sampler, plan, cfg)
    grad_fn = jax.value_and_grad(loss_fn, argnums=0, has_aux=True)

    def eot(params, x_adv, data: AttackData, key):
        k_prompt, k_reps = jax.random.split(key)
        prompt_idx = jax.random.randint(k_prompt, (), 0, data.bank_embeds.shape[0])
        rep_keys = jax.random.split(k_reps, cfg.grad_reps)

        def encode(x):
            return model.vae.apply(
                {"params": params["vae"]}, x, method=AutoencoderKL.encode
            )

        if getattr(cfg, "remat_vae", False):
            # recompute the encoder forward in the backward pass instead of
            # saving its conv activations (258 MB each at 1024²)
            encode = jax.checkpoint(encode)
        dist, vjp_fn = jax.vjp(encode, x_adv)

        if cfg.eot_mode == "vmap":
            (losses, auxes), gdists = jax.vmap(
                lambda k: grad_fn(dist, params, data, prompt_idx, k)
            )(rep_keys)
            gdist = jax.tree.map(lambda g: jnp.mean(g, axis=0), gdists)
            avg_loss = jnp.mean(losses)
            rec, pert, out_lat = jax.tree.map(lambda a: a[-1], auxes)
        else:  # "scan" — sequential chunks of `eot_chunk` vmapped reps
            chunk = max(int(getattr(cfg, "eot_chunk", 1)), 1)
            if cfg.grad_reps % chunk:
                raise ValueError(
                    f"eot_chunk={chunk} must divide grad_reps={cfg.grad_reps}"
                )
            zero = jax.tree.map(jnp.zeros_like, dist)

            if chunk == 1:
                def body(acc, k):
                    (loss, aux), g = grad_fn(dist, params, data, prompt_idx, k)
                    gacc = jax.tree.map(jnp.add, acc[0], g)
                    return (gacc, acc[1] + loss), aux
            else:
                # vmap a chunk of reps through the chain together: conv
                # batches go from 2 (CFG) to 2×chunk — much better MXU
                # utilization at ×chunk activation memory.
                chunk_grad = jax.vmap(
                    lambda k: grad_fn(dist, params, data, prompt_idx, k)
                )
                rep_keys = rep_keys.reshape((cfg.grad_reps // chunk, chunk))

                def body(acc, ks):
                    (losses, auxes), gs = chunk_grad(ks)
                    gacc = jax.tree.map(
                        lambda a, g: a + jnp.sum(g, axis=0), acc[0], gs
                    )
                    aux = jax.tree.map(lambda a: a[-1], auxes)
                    return (gacc, acc[1] + jnp.sum(losses)), aux

            (gsum, lsum), auxes = jax.lax.scan(body, (zero, jnp.zeros(())), rep_keys)
            gdist = jax.tree.map(lambda g: g / cfg.grad_reps, gsum)
            avg_loss = lsum / cfg.grad_reps
            rec, pert, out_lat = jax.tree.map(lambda a: a[-1], auxes)

        (grad,) = vjp_fn(gdist)
        aux = {
            "avg_loss": avg_loss,
            "rec_loss": rec,
            "pert_loss": pert,
            "prompt_idx": prompt_idx,
        }
        if decode_vis:
            # one decode of the last rep's latent for visualization (main.py:124)
            aux["output_image"] = model.decode_latent(
                params["vae"], out_lat, scaled=False
            )
        else:
            aux["output_latent"] = out_lat
        return grad, aux

    return eot


# ---------------------------------------------------------------------------
# Full PGD step / loop
# ---------------------------------------------------------------------------


def select_perturbation_update(cfg: TrainConfig) -> Callable:
    """Resolve the perturbation-update impl for a config: the fused Pallas
    TPU kernel (single dispatch; falls back to the jnp path off-TPU or when
    operands exceed its VMEM budget) unless ``cfg.use_pallas_update`` is
    False.  Single source of truth shared by the serial step and the
    reps-sharded step (parallel/eot.py) so both stay on the same update path
    and the serial-oracle bit-parity tests keep meaning something."""
    if getattr(cfg, "use_pallas_update", True):
        from tml_image_editing_defense_tpu.ops.pgd_kernels import (
            fused_perturbation_step,
        )

        return fused_perturbation_step
    return perturbation_step


def make_pgd_step(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    decode_vis: bool = True,
) -> Callable:
    """One outer PGD iteration as a pure function
    ``step(params, x_adv, data, key) -> (x_adv', aux)`` — jit it once and the
    whole reference iteration (main.py:79-115) is a single XLA dispatch.
    ``decode_vis=False`` drops the per-step vis decode from the program (aux
    carries ``output_latent`` instead of ``output_image``; see
    :func:`make_eot_grad`)."""
    eot = make_eot_grad(model, sampler, plan, cfg, decode_vis=decode_vis)
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
            mask=data.mask,
        )
        return x_adv, aux

    return step


def make_pgd_loop(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    n_steps: Optional[int] = None,
) -> Callable:
    """N PGD iterations fused into one ``lax.scan`` —
    ``loop(params, x_adv, data, key) -> (x_adv_final, per_step_losses)``.
    Use when visualization is off: zero host round-trips for the entire
    immunization."""
    n = n_steps or cfg.n_optimization_steps
    # the fused loop only surfaces scalar losses — never pay the vis decode
    step = make_pgd_step(model, sampler, plan, cfg, decode_vis=False)

    def loop(params, x_adv, data: AttackData, key):
        # Positional per-iteration keys (fold_in by iteration index) — the
        # same stream run_pgd consumes, so fused and host-driven loops are
        # interchangeable and checkpoint-resume continues the stream exactly.
        keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(n))

        def body(x, k):
            x, aux = step(params, x, data, k)
            return x, (aux["avg_loss"], aux["rec_loss"], aux["pert_loss"])

        x_final, (losses, recs, perts) = jax.lax.scan(body, x_adv, keys)
        return x_final, {"avg_loss": losses, "rec_loss": recs, "pert_loss": perts}

    return loop


def run_pgd(
    model: DiffusionModel,
    sampler: BaseSampler,
    plan: DenoisePlan,
    cfg: TrainConfig,
    data: AttackData,
    key: jax.Array,
    x_init: Optional[jnp.ndarray] = None,
    vis_callback: Optional[Callable] = None,
    start_iteration: int = 0,
    stop_flag=None,
    step_fn: Optional[Callable] = None,
    mesh=None,
    block_size: Optional[int] = None,
    ckpt_callback: Optional[Callable] = None,
    ckpt_interval: int = 0,
    vis_needs_image: bool = True,
) -> Tuple[jnp.ndarray, list]:
    """Host-driven PGD loop with optional visualization callbacks at
    ``cfg.image_visualization_interval`` (reference main.py:117-135).  The
    step itself is jitted once; callbacks only sync at vis iterations.

    ``stop_flag``: truthy-checkable object (see utils/preemption.py) polled
    between dispatches; on preemption the loop returns early with the
    current iterate.

    ``step_fn``/``mesh``: an alternative step function (same signature as
    :func:`make_pgd_step`'s result — e.g. the reps-sharded step from
    parallel/eot.py) and the mesh to activate while driving it.

    ``block_size``: fuse up to this many iterations into ONE dispatch (a
    ``lax.scan`` over the same step).  Identical math and RNG stream; vis
    callbacks still fire at exactly the same iterations (blocks are cut so
    their last step lands on each vis boundary), so only the preemption
    poll granularity coarsens to a block.  This exists for remote-dispatch
    deployments: per-dispatch latency on a tunneled chip measured ~0.8 s
    under load — +46% on the 200-step sd15 rehearsal (docs/ROUND4.md) —
    while on directly-attached chips it is ~µs and ``None`` (one dispatch
    per iteration, the default) is fine.  Cost: one extra resident copy of
    the step aux in the scan carry (small — the hot-path aux carries the
    [1,h,w,4] output latent, not a decoded image).

    ``ckpt_callback``/``ckpt_interval``: independent state-checkpoint
    schedule — ``ckpt_callback(it, x_adv)`` fires at every iteration
    ``it % ckpt_interval == 0`` (except 0), whether or not it coincides
    with a vis boundary (blocks are cut at BOTH kinds of boundary).
    Keeping it out of ``vis_callback`` means ``--checkpoint-interval 10``
    actually saves every 10 steps rather than every lcm(10, vis) steps.

    ``vis_needs_image``: False skips materializing ``aux["output_image"]``
    for callbacks that only log scalars (no decode program, no per-interval
    VAE decode).

    Per-iteration keys are derived positionally (``fold_in(key, it)``), so a
    run resumed at iteration k from a checkpoint continues the *same* RNG
    stream an uninterrupted run would have consumed — no repeated EOT
    samples (sequential split-and-advance replayed the stream from 0).

    The returned history has one ``{avg_loss, rec_loss, pert_loss}`` entry
    per executed iteration — matching the reference's every-iteration
    ``wandb.log`` (main.py:105-107).  Loss scalars are held as device arrays
    while the loop runs (async dispatch, zero extra syncs on the hot path)
    and fetched once at the end.
    """
    import contextlib

    # hot path: image-free aux (output_latent) — the vis image is decoded on
    # demand below, only at the iterations a callback actually looks at it
    raw_step = step_fn or make_pgd_step(model, sampler, plan, cfg, decode_vis=False)
    step = jax.jit(raw_step)
    _decode_cache: dict = {}

    def _with_vis_image(aux):
        """Materialize aux["output_image"] from the carried latent (no-op for
        steps built with decode_vis=True, e.g. externally supplied step_fn)."""
        if "output_image" in aux or "output_latent" not in aux:
            return aux
        if "fn" not in _decode_cache:
            _decode_cache["fn"] = jax.jit(
                lambda vae, z: model.decode_latent(vae, z, scaled=False)
            )
        out = dict(aux)
        out["output_image"] = _decode_cache["fn"](
            model.params["vae"], aux["output_latent"]
        )
        return out
    ctx = (jax.sharding.set_mesh(mesh) if mesh is not None
           else contextlib.nullcontext())
    x_adv = data.source if x_init is None else x_init
    scalar_keys = ("avg_loss", "rec_loss", "pert_loss")
    pending = []   # device scalars only — never the (large) output_image
    preempted = None
    n = cfg.n_optimization_steps
    interval = cfg.image_visualization_interval
    block_size = max(1, int(block_size or 1))

    block_cache: dict = {}

    def get_block(length: int):
        """Jitted scan of ``length`` steps: one program per distinct length
        (≤3 in practice: a 1-step vis opener, the full block, a tail)."""
        if length not in block_cache:
            # abstract aux structure, computed once outside the trace — the
            # aux carry keeps ONE resident copy of the last step's aux (vs
            # stacking `length` decoded images as scan ys)
            if "aux_sd" not in block_cache:
                block_cache["aux_sd"] = jax.eval_shape(
                    raw_step, model.params, x_adv, data,
                    jax.random.fold_in(key, 0),
                )[1]
            aux_sd = block_cache["aux_sd"]

            def blk(params, x, data_, key_, start):
                keys = jax.vmap(
                    lambda i: jax.random.fold_in(key_, start + i)
                )(jnp.arange(length))
                aux0 = jax.tree.map(
                    lambda s: jnp.zeros(s.shape, s.dtype), aux_sd
                )

                def body(carry, kk):
                    xc, _ = carry
                    x2, aux = raw_step(params, xc, data_, kk)
                    return (x2, aux), tuple(aux[k] for k in scalar_keys)

                (x_out, last_aux), ys = jax.lax.scan(body, (x, aux0), keys)
                return x_out, last_aux, ys

            block_cache[length] = jax.jit(blk)
        return block_cache[length]

    def next_len(it: int) -> int:
        """Longest block from ``it`` that ends on the next callback
        boundary — vis OR checkpoint (``ckpt_interval`` need not divide the
        vis interval; each cuts its own boundaries)."""
        bounds = []
        if vis_callback is not None:
            s = it if it % interval == 0 else ((it // interval) + 1) * interval
            bounds.append(min(s, n - 1))       # the loop also syncs at n-1
        if ckpt_callback is not None and ckpt_interval:
            # iteration 0 is never checkpointed (nothing to resume past)
            base = max(it, 1)
            c = (base if base % ckpt_interval == 0
                 else ((base // ckpt_interval) + 1) * ckpt_interval)
            if c <= n - 1:
                bounds.append(c)
        if not bounds:
            return min(block_size, n - it)
        return min(block_size, min(bounds) - it + 1, n - it)

    with ctx:
        it = start_iteration
        while it < n:
            if stop_flag:
                preempted = {"preempted_at": it}
                break
            length = next_len(it)
            if length == 1:
                sub = jax.random.fold_in(key, it)
                x_adv, aux = step(model.params, x_adv, data, sub)
                pending.append({k: aux[k] for k in scalar_keys})
            else:
                x_adv, aux, ys = get_block(length)(
                    model.params, x_adv, data, key, it
                )
                pending.append(dict(zip(scalar_keys, ys)))
            last_it = it + length - 1
            if vis_callback is not None and (
                last_it % interval == 0 or last_it == n - 1
            ):
                # decode the carried latent only when the callback will
                # actually render it (vis off = scalar-only logging; skip
                # the extra decode program + per-interval VAE decode)
                vis_callback(last_it, x_adv,
                             _with_vis_image(aux) if vis_needs_image else aux)
            if (ckpt_callback is not None and ckpt_interval
                    and last_it and last_it % ckpt_interval == 0):
                ckpt_callback(last_it, x_adv)
            it += length
    history = []
    for e in pending:
        first = np.asarray(e[scalar_keys[0]])
        if first.ndim == 0:
            history.append({k: float(e[k]) for k in scalar_keys})
        else:
            cols = {k: np.asarray(e[k]) for k in scalar_keys}
            history.extend(
                {k: float(cols[k][j]) for k in scalar_keys}
                for j in range(first.shape[0])
            )
    if preempted is not None:
        history.append(preempted)
    return x_adv, history
