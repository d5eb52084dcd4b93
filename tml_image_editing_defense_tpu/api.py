"""Top-level API: ``immunize`` / ``evaluate`` / ``sweep``.

Functional equivalents of the reference's three entry points:

- :func:`immunize`  ⇔ ``Trainer.run``            (main.py:47-142)
- :func:`evaluate`  ⇔ ``Inference.run_inference`` (main.py:431-589)
- :func:`sweep`     ⇔ ``run_all.py``              (run_all.py:23-93)

plus :func:`transfer_perturbation` (main.py:413-429) and the PNG +
noise-pool artifact contract (main.py:618-622 — the uint8 round-trip is part
of the measured defense and is preserved here).

Known reference bug *not* replicated: the inference prompt loop re-appends
the caption prefix and ", detailed" suffix once per noise index
(main.py:481-482 mutate the loop variable), so with n_noise>1 prompts grow
like "frozen, detailed, detailed".  We format once per prompt.
"""

from __future__ import annotations

import dataclasses
import random as _pyrandom
from dataclasses import dataclass
from pathlib import Path
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tml_image_editing_defense_tpu.attack import make_attack_data, run_pgd
from tml_image_editing_defense_tpu.configs import (
    INFERENCE_PROMPTS,
    PROMPTS_LIST,
    InferenceConfig,
    SweepConfig,
    TrainConfig,
    format_prompt,
)
from tml_image_editing_defense_tpu.core import image_ops
from tml_image_editing_defense_tpu.core.rng import (
    KeyStream,
    load_noise_pool,
    make_noise_pool,
    save_noise_pool,
)
from tml_image_editing_defense_tpu.core.samplers import make_sampler
from tml_image_editing_defense_tpu.models import DiffusionModel, build_model
from tml_image_editing_defense_tpu.pipelines import Img2ImgPipeline
from tml_image_editing_defense_tpu.utils.checkpoint import load_attack_state, save_attack_state
from tml_image_editing_defense_tpu.utils.logging import MetricsLogger
from tml_image_editing_defense_tpu.utils.vis import create_table_plot


def training_sampler_kind(family: str, use_lcm: bool) -> str:
    """Scheduler selection parity with ``Trainer.load_models``
    (main.py:278-309): LCM when fused, else the family's stock scheduler
    (PNDM/PLMS for SD-1.5, Euler for SDXL)."""
    if use_lcm:
        return "lcm"
    return "plms" if family == "sd15" else "euler"


def _nchw(x: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))     # NCHW → NHWC


@dataclass
class ImmunizeResult:
    adversarial_image: Image.Image
    x_adv: jnp.ndarray                 # NHWC [-1,1], pre-quantization
    noise_pool: Optional[jnp.ndarray]
    history: list
    model: DiffusionModel


def _default_family(cfg) -> str:
    if getattr(cfg, "model_family", None):
        return cfg.model_family
    if getattr(cfg, "attack_mode", "diffusion") == "inpaint":
        # PhotoGuard's complex attack targets the 9-channel SD-1.5 inpaint
        # UNet (old/yuval_playground.py:331-340); no SDXL inpaint exists.
        if cfg.use_sdxl:
            raise ValueError(
                "attack_mode='inpaint' has no SDXL variant (the reference's "
                "inpaint attack is SD-1.5 only, old/yuval_playground.py:331); "
                "unset use_sdxl or pick model_family explicitly"
            )
        return "sd15-inpaint"
    return "sdxl" if cfg.use_sdxl else "sd15"


def _train_attn_chunk(image_size: int) -> "int | None":
    """Attention impl for TRAINING model builds: KV-chunked (512) from 512²
    up — the attack differentiates through the chain, and the chunked path
    is what makes the backward bandwidth/HBM-viable (docs/PERF.md).
    Inference builds keep build_model's "auto" (fused below 1024²)."""
    return 512 if image_size >= 512 else None


def _cfg_model(cfg, dtype, attn_kv_chunk="auto") -> DiffusionModel:
    """Build the model a config describes.

    With ``cfg.params_path`` set (a converted checkpoint from
    ``scripts/prepare_real_weights.py``) the bundle loads real weights — the
    offline analog of the reference's runtime ``from_pretrained``
    (main.py:278-309).  Otherwise random weights (identical compute graph)."""
    family = _default_family(cfg)
    tok_paths = getattr(cfg, "tokenizer_paths", None)
    if isinstance(tok_paths, (str, Path)):     # CLI passes a single string
        tok_paths = [tok_paths]
    params_path = getattr(cfg, "params_path", None)
    # Always fast_init: random weights here are placeholders (real ones are
    # loaded over the template below), and the on-device fast generator is
    # both the only init that finishes in reasonable time for SDXL's 2.57 B
    # params on a tunneled chip and the one that honors cfg.dtype uniformly.
    # (fast_init=False ran full flax init — f32 params despite
    # dtype=bfloat16, 9.90G of arguments instead of 4.95G, which OOM'd the
    # SDXL@512 immunize-step compile at 19.26G/15.75G in the round-5
    # rehearsal.)
    model = build_model(
        family, key=jax.random.key(cfg.seed), image_size=cfg.image_size,
        dtype=dtype, attn_kv_chunk=attn_kv_chunk,
        tokenizer_paths=tok_paths, fast_init=True,
    )
    if params_path is not None:
        from tml_image_editing_defense_tpu.models.checkpoint_io import load_params

        params = load_params(Path(params_path), jax.device_get(model.params),
                             dtype=dtype)
        model = dataclasses.replace(model, params=params)
    return model


def _reps_sharding(cfg: TrainConfig, mesh):
    """Resolve the EOT reps-axis sharding for :func:`immunize`.

    Returns ``(mesh, n_shards)``; ``n_shards == 1`` means the serial step.
    Auto (``cfg.eot_shards=None``): the largest divisor of ``grad_reps`` that
    fits the local device count — on a single chip this is 1 and nothing
    changes; on a multi-chip host the flagship single-image attack spreads
    its gradient samples over the slice (VERDICT r2 item 2).
    """
    from tml_image_editing_defense_tpu.parallel.mesh import REPS_AXIS, make_mesh

    if mesh is not None:
        if REPS_AXIS not in mesh.shape:
            raise ValueError(
                f"immunize() needs a mesh with a '{REPS_AXIS}' axis "
                f"(got axes {tuple(mesh.shape)}); data-axis meshes belong to "
                "immunize_batch()"
            )
        return mesh, mesh.shape[REPS_AXIS]
    want = cfg.eot_shards
    local = jax.local_devices()
    if want is None:
        want = max(
            (d for d in range(1, min(len(local), cfg.grad_reps) + 1)
             if cfg.grad_reps % d == 0),
            default=1,
        )
    if want <= 1:
        return None, 1
    if cfg.grad_reps % want:
        raise ValueError(
            f"eot_shards={want} must divide grad_reps={cfg.grad_reps}"
        )
    if want > len(local):
        raise ValueError(
            f"eot_shards={want} exceeds local device count {len(local)}"
        )
    return make_mesh({REPS_AXIS: want}, devices=local[:want]), want


def immunize(
    cfg: TrainConfig,
    model: Optional[DiffusionModel] = None,
    logger: Optional[MetricsLogger] = None,
    resume_from: Optional[Path] = None,
    mesh=None,
) -> ImmunizeResult:
    """PGD immunization of one image (reference Trainer.run, main.py:47-142).

    On a multi-chip host the EOT gradient samples are sharded over the mesh
    ``reps`` axis automatically (``cfg.eot_shards``; parallel/eot.py — one
    pmean over ICI replaces the reference's sequential grad_reps loop,
    main.py:88-102).  Pass ``mesh`` to supply an explicit reps mesh.

    ``cfg.attack_mode="inpaint"`` drives PhotoGuard's complex attack against
    the 9-channel inpaint UNet instead (attack/inpaint.py; reference
    old/yuval_playground.py:345-366 — script-only there) with the same
    artifacts, vis grids, history, and checkpoint/resume plumbing."""
    attack_mode = getattr(cfg, "attack_mode", "diffusion")
    if attack_mode not in ("diffusion", "inpaint"):
        raise ValueError(f"unknown attack_mode {attack_mode!r}")
    dtype = jnp.dtype(cfg.dtype)
    if model is None:
        model = _cfg_model(cfg, dtype,
                           attn_kv_chunk=_train_attn_chunk(cfg.image_size))
    if logger is None:
        logger = MetricsLogger(name=cfg.experiment_name, config=cfg.asdict(),
                               output_dir=cfg.output_path)
    ks = KeyStream(cfg.seed)

    source = _nchw(image_ops.load_image(cfg.source_image_path, cfg.image_size)).astype(dtype)
    target = _nchw(image_ops.load_image(cfg.target_image_path, cfg.image_size)).astype(dtype)

    # optional caption prefix (main.py:64-72)
    caption = ""
    if cfg.default_source_image_caption:
        caption = cfg.default_source_image_caption
    elif cfg.add_image_caption_to_prompts:
        from tml_image_editing_defense_tpu.aux_models.caption import get_image_caption

        caption = get_image_caption(Image.open(cfg.source_image_path).convert("RGB"),
                                    model_path=cfg.caption_model_path)
    if caption:
        print(f"Running with prefix: {caption}")

    # optional salient-region mask (main.py:311-322)
    mask = None
    if cfg.use_segmentation_mask:
        from tml_image_editing_defense_tpu.aux_models.segment import get_salient_mask

        m = get_salient_mask(cfg.source_image_path, cfg.image_size,
                             model_path=cfg.segmentation_model_path)    # [H,W] {0,1}
        mask = jnp.asarray(m, dtype)[None, :, :, None]

    bank = model.embed_prompt_bank(
        [format_prompt(p, caption) for p in cfg.prompts], cfg.negative_prompt
    )

    lat_shape = model.latent_shape
    noise_pool = make_noise_pool(ks.next(), max(cfg.n_noise, 1), lat_shape, dtype)

    # cfg.eta is consumed only by samplers whose step takes it (main.py:219-220);
    # PLMS/LCM/Euler — the live training schedulers — do not.
    kind = training_sampler_kind(model.family, cfg.use_lcm)
    _eta_default = type(cfg).__dataclass_fields__["eta"].default
    if cfg.eta and cfg.eta != _eta_default and kind != "ddim":
        # default eta (reference configs.py:110) stays silent — the
        # reference's LCM/PNDM ignore it too; only an explicit override
        # that will do nothing deserves a warning.
        import warnings

        warnings.warn(
            f"cfg.eta={cfg.eta} has no effect with the {kind!r} sampler "
            "(only DDIM consumes eta — same as the reference's LCM/PNDM)",
            stacklevel=2,
        )
    sampler = make_sampler(kind, model.schedule)
    is_inpaint = attack_mode == "inpaint"
    in_ch = model.unet.config.in_channels
    if is_inpaint and in_ch != 9:
        raise ValueError(
            f"attack_mode='inpaint' needs a 9-channel inpaint UNet family "
            f"(sd15-inpaint / tiny-inpaint); model_family={model.family!r} "
            f"has in_channels={in_ch}"
        )
    if not is_inpaint and in_ch == 9:
        raise ValueError(
            f"model_family={model.family!r} is an inpaint UNet; set "
            "attack_mode='inpaint' to drive it"
        )
    if is_inpaint:
        # legacy window 100 < t < 800, unconditional (yuval_playground.py:106)
        plan = sampler.plan(
            cfg.n_denoising_steps_per_iteration, limit_t=800, min_t=101
        )
    else:
        plan = sampler.plan(
            cfg.n_denoising_steps_per_iteration,
            limit_t=700 if cfg.limit_timesteps else None,
        )
    if plan.num_steps == 0:
        raise ValueError(
            "empty denoising plan: limit_timesteps filtered out every step "
            f"(K={cfg.n_denoising_steps_per_iteration})"
        )

    data = make_attack_data(model, cfg, source, target, bank, noise_pool,
                            target_latent_key=ks.next(), mask=mask)

    x_init, start_it, loop_key = None, 0, ks.next()
    if resume_from is not None and Path(resume_from).exists():
        x_init, start_it, loop_key, pool = load_attack_state(resume_from)
        if pool is not None:
            data = dataclasses.replace(data, noise_pool=pool.astype(dtype))
            noise_pool = data.noise_pool

    ckpt_path = Path(cfg.output_path) / "attack_state.npz"
    it_holder = {"it": start_it}

    logged_steps = set()

    def vis_callback(it, x_adv, aux):
        logs = {k: aux[k] for k in ("avg_loss", "rec_loss", "pert_loss")}
        it_holder["it"] = it
        logged_steps.add(it)
        images = None
        if cfg.enable_visualization:
            adv = image_ops.to_pil(np.asarray(x_adv).transpose(0, 3, 1, 2))
            diff = image_ops.to_pil(np.asarray(source - x_adv).transpose(0, 3, 1, 2))
            out = image_ops.to_pil(np.asarray(aux["output_image"]).transpose(0, 3, 1, 2))
            grid = create_table_plot(
                images=[adv, diff, out],
                captions=["Current Adversarial Image", "Difference Image", "Edited Image"],
            )
            images = {"train_images": grid}
        logger.log(logs, step=it, images=images)

    def ckpt_callback(it, x_adv):
        # independent of the vis schedule — run_pgd cuts blocks at both
        # boundary kinds, so checkpoint_interval=10 really saves every 10
        # steps (it used to live inside vis_callback and only fired at
        # lcm(N, vis interval) iterations)
        it_holder["it"] = it
        save_attack_state(ckpt_path, x_adv, it + 1, loop_key, noise_pool)

    step_fn = None
    if is_inpaint:
        from tml_image_editing_defense_tpu.attack.inpaint import (
            make_inpaint_pgd_step,
        )

        if cfg.eot_shards and cfg.eot_shards > 1:
            raise ValueError(
                "attack_mode='inpaint' has no reps-sharded step yet; "
                "set eot_shards to 1/None"
            )
        reps_mesh = None
        step_fn = make_inpaint_pgd_step(model, sampler, plan, cfg)
    else:
        reps_mesh, n_shards = _reps_sharding(cfg, mesh)
        if n_shards > 1:
            from tml_image_editing_defense_tpu.parallel.eot import (
                make_sharded_eot_pgd_step,
            )

            step_fn = make_sharded_eot_pgd_step(
                model, sampler, plan, cfg, reps_mesh, decode_vis=False
            )

    from tml_image_editing_defense_tpu.utils.preemption import preemption_guard

    with preemption_guard() as preempted:
        x_adv, history = run_pgd(
            model, sampler, plan, cfg, data, loop_key,
            x_init=x_init, vis_callback=vis_callback, start_iteration=start_it,
            stop_flag=preempted, step_fn=step_fn, mesh=reps_mesh,
            block_size=cfg.dispatch_block,
            ckpt_callback=ckpt_callback if cfg.checkpoint_interval else None,
            ckpt_interval=cfg.checkpoint_interval,
            vis_needs_image=cfg.enable_visualization,
        )
    if preempted:
        # checkpoint so a relaunch resumes (the handling the reference's
        # SLURM --signal=USR1@120 never got, tml_project.slurm:7)
        last_it = history[-1].get("preempted_at", it_holder["it"]) if history else 0
        save_attack_state(ckpt_path, x_adv, last_it, loop_key, noise_pool)
        print(f"[immunize] preempted at iteration {last_it}; state -> {ckpt_path}")
    # every-iteration scalar record (reference parity: main.py:105-107);
    # steps already written live by the vis callback are skipped
    logger.log_history(history, start_step=start_it, skip=logged_steps)

    adv_pil = image_ops.to_pil(np.asarray(x_adv).transpose(0, 3, 1, 2))
    out_dir = Path(cfg.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    adv_pil.save(out_dir / "adversarial_image.png")       # uint8 round-trip artifact
    pool_to_save = noise_pool if cfg.use_fixed_noise else None
    if pool_to_save is not None:
        save_noise_pool(out_dir / "noise.npz", pool_to_save)
    logger.log_image("final_adversarial_image", adv_pil)
    return ImmunizeResult(adv_pil, x_adv, pool_to_save, history, model)


def immunize_batch(
    cfg: TrainConfig,
    image_paths: Sequence[Path],
    model: Optional[DiffusionModel] = None,
    mesh=None,
    logger: Optional[MetricsLogger] = None,
    targets: Optional[Sequence[Path]] = None,
    seeds: Optional[Sequence[int]] = None,
    out_dirs: Optional[Sequence[Path]] = None,
    debug_out: Optional[dict] = None,
) -> List[ImmunizeResult]:
    """Immunize many images as ONE fused data-parallel program.

    The TPU-native replacement for the reference's hand-split two-GPU sweep
    (``run_all.py:16-21``): every image is an independent PGD problem; the
    batch axis is sharded over the mesh ``data`` axis (one or more images per
    chip), and the whole N-step × B-image optimization is a single
    ``lax.scan`` dispatch.  With ``cfg.eot_shards > 1`` the mesh gains a
    ``reps`` axis and each image's EOT gradient samples additionally spread
    over that many chips (the 2-D ``parallel/dp_eot.py`` loop — the right
    shape when chips outnumber images; serial-oracle rep streams, artifacts
    byte-identical to serial runs).  Visualization callbacks are off in this
    mode (zero host round-trips); per-step loss curves are returned.

    ``seeds``: per-image seeds replaying :func:`immunize`'s exact KeyStream
    order (noise pool → target latent → loop key), so each batched image is
    bit-identical to a serial ``immunize`` run with that seed — this is what
    lets :func:`sweep` fuse cells without changing results.
    ``out_dirs``: per-image artifact directories (default
    ``cfg.output_path/<stem>``).  ``debug_out``: if given, filled with the
    mesh and the on-device output sharding for introspection/tests.
    """
    from tml_image_editing_defense_tpu.core.rng import KeyStream as _KS
    from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, make_mesh
    from tml_image_editing_defense_tpu.parallel.sweep import (
        batch_attack_data,
        make_batched_pgd_loop,
    )

    dtype = jnp.dtype(cfg.dtype)
    if model is None:
        model = _cfg_model(cfg, dtype,
                           attn_kv_chunk=_train_attn_chunk(cfg.image_size))
    if logger is None:
        logger = MetricsLogger(name=f"{cfg.experiment_name}_batch",
                               config=cfg.asdict(), output_dir=cfg.output_path)
    # Auto-mesh over LOCAL devices: in the multi-host sweep tier the image
    # list is host-sharded (scripts/launch_tpu_pod.sh), so each process runs
    # its own local-mesh program — no tensor traffic crosses DCN.  When the
    # image count doesn't divide the device count the batch axis is PADDED
    # with dummy problems (outputs dropped) instead of shrinking the mesh:
    # 3 images on an 8-chip host run one step-time, not three (VERDICT r2
    # item 9).
    #
    # cfg.eot_shards > 1 opts into the 2-D (data × reps) mesh: each image's
    # EOT gradient samples additionally spread over `eot_shards` chips
    # (parallel/dp_eot.py, serial-oracle rep streams) — the right shape when
    # there are more chips than images.
    from tml_image_editing_defense_tpu.parallel.mesh import REPS_AXIS

    local = jax.local_devices()
    eot_shards = cfg.eot_shards or 1
    if mesh is None and len(local) > 1:
        if eot_shards > 1:
            if len(local) % eot_shards:
                raise ValueError(
                    f"eot_shards={eot_shards} must divide the local device "
                    f"count {len(local)} for the 2-D batch mesh"
                )
            if cfg.grad_reps % eot_shards:
                raise ValueError(
                    f"eot_shards={eot_shards} must divide grad_reps={cfg.grad_reps}"
                )
            mesh = make_mesh(
                {DATA_AXIS: len(local) // eot_shards, REPS_AXIS: eot_shards},
                devices=local,
            )
        else:
            mesh = make_mesh({DATA_AXIS: len(local)}, devices=local)
    use_2d = (
        mesh is not None
        and REPS_AXIS in mesh.shape
        and mesh.shape[REPS_AXIS] > 1
    )

    ks = _KS(cfg.seed)
    sampler = make_sampler(
        training_sampler_kind(model.family, cfg.use_lcm), model.schedule
    )
    plan = sampler.plan(
        cfg.n_denoising_steps_per_iteration,
        limit_t=700 if cfg.limit_timesteps else None,
    )
    bank = model.embed_prompt_bank(
        [format_prompt(p) for p in cfg.prompts], cfg.negative_prompt
    )
    # per-image targets; default = the image itself (sweep semantics,
    # run_all.py:45-46 passes target_image_path=image_path)
    if targets is None:
        targets = list(image_paths)

    from tml_image_editing_defense_tpu.attack import make_attack_data as _mad

    per_image_ks = None
    if seeds is not None:
        per_image_ks = [_KS(s) for s in seeds]

    datas, sources, pools, loop_keys = [], [], [], []
    for i, (p, tp) in enumerate(zip(image_paths, targets)):
        iks = per_image_ks[i] if per_image_ks is not None else ks
        source = _nchw(image_ops.load_image(p, cfg.image_size)).astype(dtype)
        target = _nchw(image_ops.load_image(tp, cfg.image_size)).astype(dtype)
        pool = make_noise_pool(iks.next(), max(cfg.n_noise, 1), model.latent_shape, dtype)
        datas.append(_mad(model, cfg, source, target, bank, pool,
                          target_latent_key=iks.next()))
        sources.append(source)
        pools.append(pool)
        if per_image_ks is not None:
            loop_keys.append(iks.next())
    if per_image_ks is None:
        loop_keys = [ks.next() for _ in image_paths]

    # pad the batch axis to a multiple of the data-axis size; padded rows
    # replay the last image (their outputs are discarded below)
    n_pad = 0
    if mesh is not None:
        n_pad = (-len(image_paths)) % mesh.shape[DATA_AXIS]
    for _ in range(n_pad):
        datas.append(datas[-1])
        sources.append(sources[-1])
        loop_keys.append(loop_keys[-1])
    batched = batch_attack_data(datas)

    if use_2d:
        from tml_image_editing_defense_tpu.parallel.dp_eot import (
            make_dp_eot_pgd_loop,
        )

        loop = make_dp_eot_pgd_loop(model, sampler, plan, cfg, batched, mesh)
    else:
        loop = make_batched_pgd_loop(model, sampler, plan, cfg, batched, mesh=mesh)
    keys = jnp.stack(loop_keys)
    x_advs, hist = loop(model.params, jnp.stack(sources), batched, keys)
    if debug_out is not None:
        debug_out["mesh"] = mesh
        debug_out["sharding"] = x_advs.sharding
    x_advs = jax.device_get(x_advs)

    results = []
    out_root = Path(cfg.output_path)
    for i, p in enumerate(image_paths):
        out_dir = Path(out_dirs[i]) if out_dirs is not None else out_root / Path(p).stem
        out_dir.mkdir(parents=True, exist_ok=True)
        adv_pil = image_ops.to_pil(np.asarray(x_advs[i]).transpose(0, 3, 1, 2))
        adv_pil.save(out_dir / "adversarial_image.png")
        pool = pools[i] if cfg.use_fixed_noise else None
        if pool is not None:
            save_noise_pool(out_dir / "noise.npz", pool)
        losses = np.asarray(hist["avg_loss"][i])
        logger.log({"final_avg_loss": float(losses[-1])}, step=i)
        results.append(ImmunizeResult(adv_pil, jnp.asarray(x_advs[i]), pool,
                                      [{"avg_loss": float(l)} for l in losses],
                                      model))
    return results


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------


def transfer_perturbation(
    original_perturbation: np.ndarray,
    original_image: np.ndarray,
    new_image: np.ndarray,
    max_perturbation_value: float = 20.0,
) -> np.ndarray:
    """σ-ratio-scaled perturbation transfer to an unseen image
    (main.py:413-429).  NOTE: the reference *subtracts* the scaled
    perturbation (main.py:426) and clips it to ±20 uint8 levels."""
    std_ratio = float(np.std(new_image)) / float(np.std(original_image))
    scale = min(1.0, std_ratio)
    scaled = np.clip(original_perturbation * scale, -max_perturbation_value, max_perturbation_value)
    out = np.clip(new_image - scaled, 0, 255)
    return out.astype(np.uint8)


def evaluate(
    cfg: InferenceConfig,
    adversarial_image: Image.Image,
    inference_prompts: Optional[Sequence[str]] = None,
    model: Optional[DiffusionModel] = None,
    noises: Optional[jnp.ndarray] = None,
    training_prompts: Optional[Sequence[str]] = None,
    logger: Optional[MetricsLogger] = None,
    batch_edits: Optional[bool] = None,
    eval_batch_size: int = 2,
) -> List[Image.Image]:
    """Clean-vs-adversarial edit comparison (Inference.run_inference,
    main.py:431-589): per (prompt × noise) a 5-image grid on the train image,
    then transfer to validation images with 4-image grids.

    ``batch_edits`` runs the (prompt × noise) double-edits of
    an image in vmapped dispatches of ``eval_batch_size`` pairs — identical
    per-cell keys/outputs to the sequential path (the reference runs
    19 × n_noise sequential pipeline pairs).  Default (``None``) resolves
    by measured dispatch economics: batched below 1024² (2.6× at 512²
    LCM-4), sequential at ≥1024² where the pair program loses 28% and B≥2
    OOMs one v5e at compile (scripts/probe_eval_1024.py; docs/PERF.md
    "Evaluation at SDXL-native 1024²").  ``eval_batch_size`` bounds
    HBM — each pair is 4 UNet images (2 images × CFG), and fused attention
    transiently materializes f32 score tensors per self-attn layer, so big
    batches OOM one v5e at 512² f32 (all 19 pairs: 20 GB, measured);
    chunks are padded to a fixed size so exactly one program is compiled.
    Measured dispatch economics are in docs/PERF.md.

    On a multi-chip host the cell axis is additionally sharded over the mesh
    ``data`` axis (``cfg.eval_shards``; cells are independent — zero
    collectives), so each dispatch covers ``eval_batch_size × n_shards``
    cells with ``eval_batch_size`` resident per chip."""
    del training_prompts  # accepted for signature parity; unused (main.py:469)
    if batch_edits is None:
        batch_edits = cfg.image_size < 1024
    dtype = jnp.dtype(cfg.dtype)
    inference_prompts = list(inference_prompts or INFERENCE_PROMPTS)
    if model is None:
        model = _cfg_model(cfg, dtype)
    if logger is None:
        logger = MetricsLogger(name=cfg.experiment_name, config=cfg.asdict(),
                               output_dir=cfg.output_path)
    pipeline = Img2ImgPipeline(
        model, sampler=training_sampler_kind(model.family, cfg.use_lcm), dtype=dtype
    )
    ks = KeyStream(cfg.seed)
    size = cfg.image_size

    source_pil = image_ops.resize_crop_pil(Image.open(cfg.source_image_path).convert("RGB"), size)
    target_pil = image_ops.resize_crop_pil(Image.open(cfg.target_image_path).convert("RGB"), size)
    perturbation = np.asarray(adversarial_image, np.float32) - np.asarray(source_pil, np.float32)

    caption = ""
    if cfg.default_source_image_caption:
        caption = cfg.default_source_image_caption
    elif cfg.add_image_caption_to_prompts:
        from tml_image_editing_defense_tpu.aux_models.caption import get_image_caption

        caption = get_image_caption(source_pil, model_path=cfg.caption_model_path)

    lat_shape = (1,) + model.latent_shape[1:]
    out_dir = Path(cfg.output_path)
    out_dir.mkdir(parents=True, exist_ok=True)
    output_images: List[Image.Image] = []

    def noises_for_prompt():
        if noises is not None:
            return [noises[i] for i in range(noises.shape[0])]
        return [jax.random.normal(ks.next(), lat_shape, dtype) for _ in range(cfg.n_noise)]

    def collect_cells():
        """One cell per (prompt × noise): (prompt, noise_idx, pair_noise,
        key), host RNG drawn in EXACTLY the sequential order (fresh noise,
        then the pipeline key — main.py:469-500), so batched and sequential
        dispatch produce identical images."""
        cells = []
        for raw_prompt in inference_prompts:
            prompt = format_prompt(raw_prompt, caption)
            for noise_idx, noise in enumerate(noises_for_prompt()):
                fresh = jax.random.normal(ks.next(), lat_shape, dtype)
                pinned = jnp.asarray(noise, dtype)
                if pinned.ndim == 3:
                    pinned = pinned[None]
                if pinned.shape[-1] != lat_shape[-1]:
                    pinned = jnp.transpose(pinned, (0, 2, 3, 1))
                cells.append((prompt, noise_idx,
                              jnp.concatenate([fresh, pinned]), ks.next()))
        return cells

    # multi-chip: shard the independent (prompt × noise) cells over the mesh
    # ``data`` axis; per-chip residency stays eval_batch_size (VERDICT r2
    # item 6 — the reference runs these sequentially, main.py:469-521)
    n_shards = cfg.eval_shards
    if n_shards is None:
        n_shards = len(jax.local_devices())
    elif n_shards > len(jax.local_devices()):
        raise ValueError(
            f"eval_shards={n_shards} exceeds local device count "
            f"{len(jax.local_devices())}"
        )
    eval_sharding = None
    if batch_edits and n_shards > 1:
        from jax.sharding import NamedSharding, PartitionSpec
        from tml_image_editing_defense_tpu.parallel.mesh import DATA_AXIS, make_mesh

        eval_mesh = make_mesh({DATA_AXIS: n_shards},
                              devices=jax.local_devices()[:n_shards])
        eval_sharding = NamedSharding(eval_mesh, PartitionSpec(DATA_AXIS))

    def run_cells(cells, clean_img, adv_img):
        """All double-edits for one image: a single vmapped dispatch when
        ``batch_edits`` (P× fewer dispatches than the reference's sequential
        pipeline pairs), else per-cell calls.  Returns [(out_clean_pil,
        out_adv_pil)] in cell order."""
        pair = pipeline._prepare_image([clean_img, adv_img])   # [2,H,W,3]
        sdxl_kw = dict(
            negative_prompt=cfg.negative_prompt,
            denoising_end=cfg.denoising_end,
            aesthetic_score=cfg.aesthetic_score,
            negative_aesthetic_score=cfg.negative_aesthetic_score,
        )
        if batch_edits:
            # chunk to bound HBM (per chip); pad the tail chunk so a single
            # program serves every dispatch
            B = max(1, min(eval_batch_size, len(cells)))
            if eval_sharding is not None:
                B *= n_shards
            chunks = []
            for i in range(0, len(cells), B):
                part = cells[i:i + B]
                n_pad = B - len(part)
                padded = part + [part[-1]] * n_pad
                o = pipeline.edit_pairs(
                    prompts=[c[0] for c in padded],
                    pair_images=jnp.broadcast_to(pair, (B,) + pair.shape),
                    pair_noises=jnp.stack([c[2] for c in padded]),
                    keys=jnp.stack([c[3] for c in padded]),
                    num_inference_steps=cfg.n_steps,
                    guidance_scale=cfg.guidance_scale,
                    strength=cfg.strength,
                    data_sharding=eval_sharding,
                    **sdxl_kw,
                )
                chunks.append(np.asarray(jax.device_get(o))[:len(part)])
            outs = np.concatenate(chunks)                      # [P,2,H,W,3]
            to_pil = lambda a: image_ops.to_pil(
                a[None].transpose(0, 3, 1, 2), denormalize=False)
            return [(to_pil(outs[i, 0]), to_pil(outs[i, 1])) for i in range(len(cells))]
        results = []
        for prompt, _, pair_noise, key in cells:
            out_clean, out_adv = pipeline(
                prompt=prompt, image=[clean_img, adv_img],
                num_inference_steps=cfg.n_steps, guidance_scale=cfg.guidance_scale,
                strength=cfg.strength, noise=pair_noise, key=key, **sdxl_kw,
            )
            results.append((out_clean, out_adv))
        return results

    cells = collect_cells()
    for (prompt, noise_idx, _, _), (out_clean, out_adv) in zip(
            cells, run_cells(cells, source_pil, adversarial_image)):
        grid = create_table_plot(
            images=[source_pil.resize((size, size)), target_pil.resize((size, size)),
                    adversarial_image.resize((size, size)),
                    out_clean.resize((size, size)), out_adv.resize((size, size))],
            captions=["Source Image", "Target Image", "Adversarial Image",
                      f"Edit on Original ({prompt})", f"Edit on Adversarial ({prompt})"],
        )
        save_name = "-".join(prompt[:30].split()) if prompt else "empty_prompt"
        if cfg.save_images:
            grid.save(out_dir / f"{save_name}_noise_{noise_idx}.png")
        logger.log_image("Train Images - Validation Prompts", grid, caption=prompt)
        output_images.append(grid)

    if cfg.validation_images_path is not None and Path(cfg.validation_images_path).exists():
        val_paths = [
            Path(line.strip())
            for line in Path(cfg.validation_images_path).read_text().splitlines()
            if line.strip()
        ]
        for val_path in val_paths:
            val_pil = image_ops.resize_crop_pil(Image.open(val_path).convert("RGB"), size)
            val_adv = Image.fromarray(
                transfer_perturbation(perturbation, np.asarray(source_pil, np.float32),
                                      np.asarray(val_pil, np.float32))
            )
            val_cells = collect_cells()
            for (prompt, noise_idx, _, _), (out_clean, out_adv) in zip(
                    val_cells, run_cells(val_cells, val_pil, val_adv)):
                grid = create_table_plot(
                    images=[val_pil.resize((size, size)), val_adv.resize((size, size)),
                            out_clean.resize((size, size)), out_adv.resize((size, size))],
                    captions=["Val Original Image", "Val Adversarial Image",
                              f"Edit on Original ({prompt})", f"Edit on Adversarial ({prompt})"],
                )
                save_name = "-".join(prompt[:30].split()) if prompt else "empty_prompt"
                if cfg.save_images:
                    grid.save(out_dir / f"val_{val_path.stem}_{save_name}_noise_{noise_idx}.png")
                logger.log_image("Val Images - Validation Prompt", grid, caption=prompt)

    return output_images


# ---------------------------------------------------------------------------
# Sweep
# ---------------------------------------------------------------------------


def _sweep_cells(cfg: SweepConfig, image_paths: Sequence[Path],
                 train_overrides: Optional[dict] = None) -> List[dict]:
    """Enumerate the sweep grid (run_all.py:23-55) into cell descriptors.

    Prompt sampling order matches the reference: prompts are drawn per
    (image, n_prompts) pair in image-major order (run_all.py:28-33)."""
    rng = _pyrandom.Random()
    cells = []
    for image_path in image_paths:
        image_out = Path(cfg.output_root) / image_path.stem
        for n_prompts in cfg.n_prompts_grid:
            if n_prompts is None:
                prompts = list(PROMPTS_LIST)
            elif n_prompts == 1:
                prompts = [""]
            else:
                prompts = [""] + rng.sample(PROMPTS_LIST, n_prompts - 1)
            for n_noises in cfg.n_noises_grid:
                cell_dir = image_out / f"n_noises_{n_noises}" / f"n_prompts_{n_prompts}"
                seed = cfg.seed if cfg.seed is not None else rng.randint(0, 2**32 - 1)
                train_cfg = TrainConfig(
                    experiment_name=f"{image_path.stem}_n_noises_{n_noises}_n_prompts_{n_prompts}",
                    source_image_path=image_path,
                    target_image_path=image_path,
                    output_path=cell_dir,
                    n_optimization_steps=cfg.n_optimization_steps,
                    n_noise=n_noises if n_noises is not None else 1,
                    use_fixed_noise=n_noises is not None,
                    prompts=prompts,
                    seed=seed,
                    guidance_scale=3.0,
                    use_sdxl=cfg.use_sdxl,
                    use_lcm=cfg.use_lcm,
                )
                if train_overrides:
                    train_cfg = dataclasses.replace(train_cfg, **train_overrides)
                cells.append({
                    "image": image_path, "n_prompts": n_prompts, "prompts": prompts,
                    "n_noises": n_noises, "seed": seed, "dir": cell_dir,
                    "train_cfg": train_cfg,
                })
    return cells


def sweep(cfg: SweepConfig, model: Optional[DiffusionModel] = None,
          image_paths: Optional[Sequence[Path]] = None,
          data_parallel: Optional[bool] = None,
          train_overrides: Optional[dict] = None) -> List[dict]:
    """Grid sweep {images} × {n_prompts} × {n_noises} (run_all.py:23-93).

    One model is built once and shared across every cell (the reference
    reloads the full pipeline per cell).

    Multi-chip: with >1 device (or ``data_parallel=True``), cells that share
    a prompt bank and noise-pool size — i.e. the same grid point across
    different images — are fused into ONE data-parallel program via
    :func:`immunize_batch`, the image axis sharded over the mesh ``data``
    axis.  Per-cell seeds replay :func:`immunize`'s key stream, so artifacts
    are identical to the serial path.  This replaces the reference's manual
    two-GPU split (run_all.py:16-21) with real ICI data parallelism.
    """
    if image_paths is None:
        from tml_image_editing_defense_tpu.parallel.hosts import list_sweep_images

        image_paths = list_sweep_images(cfg.images_dir)
    cells = _sweep_cells(cfg, image_paths, train_overrides)
    for cell in cells:
        cell["dir"].mkdir(parents=True, exist_ok=True)

    if data_parallel is None:
        data_parallel = len(jax.local_devices()) > 1

    # Serial-path cells default to eot_shards=1 so sweep artifacts are
    # identical between the serial and data-parallel modes regardless of
    # group size (reps-sharding changes gradient-sum association) — but an
    # explicit train_overrides={'eot_shards': N} wins (it is the documented
    # way to enable reps sharding inside sweeps).
    forced_eot = (
        {} if (train_overrides and "eot_shards" in train_overrides)
        else {"eot_shards": 1}
    )

    if data_parallel:
        # Group fusable cells: same prompt bank + same noise-pool shape
        # (different images).  Groups keep first-appearance order.
        groups: dict = {}
        for cell in cells:
            k = (tuple(cell["prompts"]), cell["n_noises"])
            groups.setdefault(k, []).append(cell)
        for group in groups.values():
            if len(group) == 1:
                cell = group[0]
                res = immunize(
                    dataclasses.replace(cell["train_cfg"], **forced_eot),
                    model=model,
                )
                model = res.model
                continue
            batch_cfg = group[0]["train_cfg"]
            if model is None:
                # _cfg_model honors params_path/tokenizer_paths exactly like
                # the singleton immunize path — a fused group must not train
                # against different weights than a singleton cell
                model = _cfg_model(
                    batch_cfg, jnp.dtype(batch_cfg.dtype),
                    attn_kv_chunk=_train_attn_chunk(batch_cfg.image_size),
                )
            immunize_batch(
                batch_cfg,
                image_paths=[c["image"] for c in group],
                model=model,
                seeds=[c["seed"] for c in group],
                out_dirs=[c["dir"] for c in group],
            )
    else:
        for cell in cells:
            res = immunize(
                dataclasses.replace(cell["train_cfg"], **forced_eot), model=model
            )
            model = res.model      # reuse across cells

    # Evaluation per cell (artifact round-trip, run_all.py:62-66);
    # cfg.run_inference=False stops after training (artifacts remain
    # evaluable later — the uint8 PNG round-trip is the contract)
    results = []
    for cell in cells:
        cell_dir, image_path = cell["dir"], cell["image"]
        n_noises, seed = cell["n_noises"], cell["seed"]
        if not cfg.run_inference:
            results.append({"image": str(image_path),
                            "n_prompts": cell["n_prompts"],
                            "n_noises": n_noises, "seed": seed,
                            "output": str(cell_dir)})
            continue
        adv = Image.open(cell_dir / "adversarial_image.png").convert("RGB")
        noise_file = cell_dir / "noise.npz"
        pool = load_noise_pool(noise_file) if noise_file.exists() else None
        # Mirror the trained-against geometry/family: the reference always
        # evaluates at its fixed 512² (run_all.py:69-93), but here a sweep
        # can train at any size/family via train_overrides, and the eval
        # preprocessing must match the adversarial artifact it loads.
        inf_cfg = InferenceConfig(
            experiment_name=cell["train_cfg"].experiment_name,
            source_image_path=image_path,
            target_image_path=image_path,
            output_path=cell_dir,
            image_size=cell["train_cfg"].image_size,
            model_family=cell["train_cfg"].model_family,
            n_steps=cfg.inference_n_steps,
            guidance_scale=cfg.inference_guidance_scale,
            strength=cfg.inference_strength,
            use_fixed_noise=n_noises is not None,
            n_noise=n_noises if n_noises is not None else 1,
            validation_images_path=None,
            use_sdxl=cfg.use_sdxl,
            use_lcm=cfg.use_lcm,
            seed=seed,
        )
        evaluate(inf_cfg, adv, INFERENCE_PROMPTS, model=model, noises=pool,
                 training_prompts=cell["prompts"])
        results.append({"image": str(image_path), "n_prompts": cell["n_prompts"],
                        "n_noises": n_noises, "seed": seed,
                        "output": str(cell_dir)})
    return results
