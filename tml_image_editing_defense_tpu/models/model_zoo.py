"""Model bundles: SD-1.5, SDXL, and tiny test presets.

Groups the three networks + tokenizer(s) + noise schedule the reference
assembles via ``Trainer.load_models`` (``main.py:278-309``) into one
:class:`DiffusionModel` with pure apply methods.  Weights come from either
random init (tests/bench — architecture-faithful, no downloads) or
:mod:`~tml_image_editing_defense_tpu.models.convert` (local HF checkpoints).

Prompt-bank embedding (:meth:`DiffusionModel.embed_prompt_bank`) is the
TPU-first replacement for the reference's per-iteration ``encode_prompt``
(``main.py:185``): all prompts are embedded once at setup and stacked, and
the jitted attack selects rows with a gather — no text encoder on the hot
path and no recompiles across prompts.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tml_image_editing_defense_tpu.core.schedule import NoiseSchedule, make_noise_schedule
from tml_image_editing_defense_tpu.models.clip_text import (
    CLIPTextModel,
    SD15_TEXT,
    SDXL_TEXT_1,
    SDXL_TEXT_2,
    TINY_TEXT,
    CLIPTextConfig,
)
from tml_image_editing_defense_tpu.models.tokenizer import HashTokenizer, load_tokenizer
from tml_image_editing_defense_tpu.models.unet import (
    SD15_INPAINT_UNET,
    SD15_UNET,
    SDXL_UNET,
    TINY_INPAINT_UNET,
    TINY_SDXL_REFINER_UNET,
    TINY_SDXL_UNET,
    TINY_UNET,
    UNet2DCondition,
    UNetConfig,
)
from tml_image_editing_defense_tpu.models.vae import (
    SD_VAE,
    SDXL_VAE,
    TINY_VAE,
    AutoencoderKL,
    VAEConfig,
    sample_latent,
)


@dataclasses.dataclass
class PromptBank:
    """Stacked CFG-ready prompt embeddings.

    ``embeds``: [P, S, D] conditional rows; ``uncond``: [S, D];
    ``pooled``/``uncond_pooled``: SDXL pooled embeds or None.
    """

    embeds: jnp.ndarray
    uncond: jnp.ndarray
    pooled: Optional[jnp.ndarray] = None
    uncond_pooled: Optional[jnp.ndarray] = None
    prompts: Optional[List[str]] = None


@dataclasses.dataclass
class DiffusionModel:
    family: str
    image_size: int
    unet: UNet2DCondition
    vae: AutoencoderKL
    text_models: Tuple[CLIPTextModel, ...]
    tokenizers: Tuple[Any, ...]
    params: dict                      # {"unet":…, "vae":…, "text": (…, …)}
    schedule: NoiseSchedule

    # -- geometry ---------------------------------------------------------

    @property
    def latent_size(self) -> int:
        return self.latent_shape[1]

    @property
    def latent_shape(self) -> Tuple[int, int, int, int]:
        f = 2 ** (len(self.vae.config.block_out_channels) - 1)
        s = self.image_size // f
        return (1, s, s, self.vae.config.latent_channels)   # NHWC

    @property
    def vae_scaling(self) -> float:
        return self.vae.config.scaling_factor

    # -- pure apply wrappers (safe inside jit) -----------------------------

    def apply_unet(self, params, sample, t, ctx, text_embeds=None, time_ids=None):
        return self.unet.apply({"params": params}, sample, t, ctx,
                               text_embeds=text_embeds, time_ids=time_ids)

    def encode_image(self, params, image, key=None):
        """image NHWC in [-1,1] → *scaled* latent sample (main.py:191).
        Deterministic (posterior mean) when ``key`` is None."""
        mean, logvar = self.vae.apply({"params": params}, image, method=AutoencoderKL.encode)
        z = mean if key is None else sample_latent(key, mean, logvar)
        return z * self.vae_scaling

    def encode_image_raw(self, params, image, key=None):
        """Unscaled latent sample (the reference's target encoding, main.py:75)."""
        mean, logvar = self.vae.apply({"params": params}, image, method=AutoencoderKL.encode)
        return mean if key is None else sample_latent(key, mean, logvar)

    def decode_latent(self, params, z, scaled: bool = True):
        """latent → image NHWC in [-1,1]; divide by the scaling factor iff
        the latent is in scaled space."""
        if scaled:
            z = z / self.vae_scaling
        return self.vae.apply({"params": params}, z, method=AutoencoderKL.decode)

    # -- prompt embedding (setup-time, host loop over the bank) ------------

    def _encode_tokens(self, ids_per_encoder: Sequence[np.ndarray]):
        if self.family in ("sd15", "tiny"):
            final, _, _ = self.text_models[0].apply(
                {"params": self.params["text"][0]}, jnp.asarray(ids_per_encoder[0])
            )
            return final, None
        # SDXL: concat penultimate states of both encoders; pooled from #2.
        _, pen1, _ = self.text_models[0].apply(
            {"params": self.params["text"][0]}, jnp.asarray(ids_per_encoder[0])
        )
        _, pen2, pooled2 = self.text_models[1].apply(
            {"params": self.params["text"][1]}, jnp.asarray(ids_per_encoder[1])
        )
        return jnp.concatenate([pen1, pen2], axis=-1), pooled2

    def encode_prompt(self, prompt: str, negative_prompt: str = ""):
        """One prompt → (cond, uncond, pooled, uncond_pooled). Mirrors
        ``Trainer._encode_prompt`` (main.py:334-360)."""
        bank = self.embed_prompt_bank([prompt], negative_prompt)
        pooled = None if bank.pooled is None else bank.pooled[0]
        return bank.embeds[0], bank.uncond, pooled, bank.uncond_pooled

    def embed_prompt_bank(self, prompts: Sequence[str], negative_prompt: str = "") -> PromptBank:
        texts = list(prompts) + [negative_prompt]
        ids = [tok(texts) for tok in self.tokenizers]
        embeds, pooled = self._encode_tokens(ids)
        return PromptBank(
            embeds=embeds[:-1],
            uncond=embeds[-1],
            pooled=None if pooled is None else pooled[:-1],
            uncond_pooled=None if pooled is None else pooled[-1],
            prompts=list(prompts),
        )


_FAMILIES = {
    # family: (unet_cfg, vae_cfg, text_cfgs, image_size)
    "sd15": (SD15_UNET, SD_VAE, (SD15_TEXT,), 512),
    "sd15-inpaint": (SD15_INPAINT_UNET, SD_VAE, (SD15_TEXT,), 512),
    "sdxl": (SDXL_UNET, SDXL_VAE, (SDXL_TEXT_1, SDXL_TEXT_2), 1024),
    "tiny": (TINY_UNET, TINY_VAE, (TINY_TEXT,), 32),
    "tiny-inpaint": (TINY_INPAINT_UNET, TINY_VAE, (TINY_TEXT,), 32),
    "tiny-sdxl": (TINY_SDXL_UNET, TINY_VAE, (TINY_TEXT, TINY_TEXT), 32),
    "tiny-sdxl-refiner": (TINY_SDXL_REFINER_UNET, TINY_VAE, (TINY_TEXT, TINY_TEXT), 32),
}


def _fast_random_params(shapes_tree, key: jax.Array, dtype) -> dict:
    """ON-DEVICE random init from an ``eval_shape`` tree: fan-in-scaled
    normals for kernels, zeros/ones for biases/norm scales, one jitted
    program for the whole tree.  Weight statistics are good enough for
    benchmarking and tests; real runs load converted checkpoints
    (models/convert.py).

    Why on-device (measured over the TPU tunnel, docs/PERF.md round 4):
    flax's real ``init`` compiles the full forward (~10 min); host numpy +
    per-leaf ``jnp.asarray(arr, bf16)`` compiles a convert op per fresh
    shape through the remote helper (338 s cold / 144 s warm for SD-1.5);
    host numpy + one whole-tree ``device_put`` degrades in the axon plugin
    on 1130-leaf transfers (365 s); host generation itself is ~40-100 s for
    the billion-param bundles.  Generating inside one jit costs zero
    host↔device bytes and one persistently-cached program.

    The program draws flat normal pools and carves per-leaf static slices
    from them: a per-leaf ``fold_in`` + ``normal`` variant compiled a
    threefry subgraph per leaf, which at SDXL scale (~1700 leaves) took the
    remote helper 650+ s to compile cold; a handful of threefry ops + ~1700
    slice/reshape/scale ops compiles in seconds.  Pools are bounded at
    64 M elements each so the transient (pool + finished leaves) stays a
    few % over the final parameter footprint — one whole-tree pool would
    peak at 2× params (20 GB for SDXL f32, an OOM on the 16 GB chip)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(shapes_tree)
    POOL_CAP = 64 * 1024 * 1024
    # assign each drawn leaf a (pool index, offset) ahead of trace
    assign = {}
    pool_sizes = []
    fill = POOL_CAP  # force a new pool on first drawn leaf
    for path, leaf in flat.items():
        if path[-1] in ("bias", "scale", "running_mean", "running_var"):
            continue
        n = int(np.prod(tuple(leaf.shape)))
        if fill + n > POOL_CAP and fill > 0:
            pool_sizes.append(0)
            fill = 0
        assign[path] = (len(pool_sizes) - 1, fill)
        pool_sizes[-1] += n
        fill += n

    def gen(key):
        pools = [
            jax.random.normal(jax.random.fold_in(key, g), (sz,), dtype)
            for g, sz in enumerate(pool_sizes)
        ]
        out = {}
        for path, leaf in flat.items():
            name, shape = path[-1], tuple(leaf.shape)
            if name in ("bias", "running_mean"):
                out[path] = jnp.zeros(shape, dtype)
            elif name in ("scale", "running_var"):
                # running_var MUST be positive: a normal draw here fed
                # rsqrt(var+eps) NaNs through every ISNet InferenceBatchNorm
                # (isnet.py:78-92), zeroing the fast_init saliency mask
                out[path] = jnp.ones(shape, dtype)
            else:
                g, off = assign[path]
                n = int(np.prod(shape))
                draw = jax.lax.slice(pools[g], (off,), (off + n,)).reshape(shape)
                # weak-typed python-float scales keep the draw's dtype: a
                # strong-typed np.float32 scalar would promote bf16 draws to
                # f32, silently doubling the param footprint (SDXL bf16 would
                # materialize 10.2 GB and OOM the 16 GB chip)
                if name == "kernel":
                    fan_in = int(np.prod(shape[:-1]))
                    out[path] = draw * float(1.0 / np.sqrt(max(fan_in, 1)))
                else:  # embeddings
                    out[path] = draw * 0.02
        return traverse_util.unflatten_dict(out)

    return jax.jit(gen)(key)


def param_shapes(family: str, image_size: Optional[int] = None) -> dict:
    """Full-size parameter SHAPE trees (``jax.ShapeDtypeStruct``) for a
    family, via ``eval_shape`` — no weight materialization, runs in seconds
    even for SDXL.  Used by the real-checkpoint manifest tests."""
    if family not in _FAMILIES:
        raise ValueError(f"unknown family {family!r}; have {sorted(_FAMILIES)}")
    unet_cfg, vae_cfg, text_cfgs, native = _FAMILIES[family]
    image_size = image_size or native
    unet = UNet2DCondition(unet_cfg)
    vae = AutoencoderKL(vae_cfg)
    texts = tuple(CLIPTextModel(c) for c in text_cfgs)
    f = 2 ** (len(vae_cfg.block_out_channels) - 1)
    lat = image_size // f
    sample = jnp.zeros((1, lat, lat, unet_cfg.in_channels))
    ctx = jnp.zeros((1, text_cfgs[0].max_length, unet_cfg.cross_attention_dim))
    kwargs = {}
    if unet_cfg.addition_embed_type == "text_time":
        pooled_dim = (
            unet_cfg.projection_class_embeddings_input_dim
            - 6 * unet_cfg.addition_time_embed_dim
        )
        kwargs = {
            "text_embeds": jnp.zeros((1, pooled_dim)),
            "time_ids": jnp.zeros((1, 6)),
        }
    img = jnp.zeros((1, image_size, image_size, vae_cfg.in_channels))
    return {
        "unet": jax.eval_shape(
            lambda: unet.init(jax.random.key(0), sample, jnp.zeros((), jnp.int32), ctx, **kwargs)
        )["params"],
        "vae": jax.eval_shape(lambda: vae.init(jax.random.key(0), img, jax.random.key(0)))["params"],
        "text": tuple(
            jax.eval_shape(
                lambda tm=tm, c=c: tm.init(jax.random.key(0), jnp.zeros((1, c.max_length), jnp.int32))
            )["params"]
            for tm, c in zip(texts, text_cfgs)
        ),
    }


def build_model(
    family: str = "sd15",
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
    image_size: Optional[int] = None,
    params: Optional[dict] = None,
    tokenizer_paths: Optional[Sequence] = None,
    fast_init: bool = False,
    vae_dtype=None,
    attn_kv_chunk: "int | str | None" = "auto",
) -> DiffusionModel:
    """Construct a model bundle; random-init params unless given.

    ``image_size`` defaults to the family's native size, but the reference
    always trains SDXL at 512 too (its dataset transform is fixed at 512,
    ``data/dataset.py:20-21``) — pass ``image_size=512`` for that.

    ``vae_dtype`` lets the VAE run at a higher precision than the UNet — the
    TPU analog of the reference's fp32 VAE upcast for SDXL
    (``sdxl_img2img_pipeline.py:490-515``): UNet bf16 on the MXU, VAE f32.

    ``attn_kv_chunk``: KV-chunked online-softmax attention (layers.py
    ``_chunked_attention``).  Long-sequence attention *backward* is
    bandwidth-bound on its materialized score matrices — 53% of the 512²
    PGD step (2.42 → 1.74 s/step with chunk 512), and at 1024² the 0.5-1 GB
    tensors push fwd+bwd out of single-chip HBM entirely.  Forward-only
    inference at 512² is the opposite: the fused kernel wins (chunking
    measured a ~25% eval-edit regression), so "auto" chunks only at
    image_size ≥ 1024 where even inference gains (VAE's 16384-token mid
    attention; eval edit 8.79 → 7.46 s).  **Training callers at 512² pass
    ``attn_kv_chunk=512`` explicitly** (api.immunize does this).  ``None``
    forces fused attention everywhere; an int forces that chunk size.
    """
    if family not in _FAMILIES:
        raise ValueError(f"unknown family {family!r}; have {sorted(_FAMILIES)}")
    unet_cfg, vae_cfg, text_cfgs, native = _FAMILIES[family]
    image_size = image_size or native
    if attn_kv_chunk == "auto":
        attn_kv_chunk = 512 if image_size >= 1024 else None
    if attn_kv_chunk != unet_cfg.attn_kv_chunk:
        unet_cfg = dataclasses.replace(unet_cfg, attn_kv_chunk=attn_kv_chunk)
    if attn_kv_chunk != vae_cfg.attn_kv_chunk:
        vae_cfg = dataclasses.replace(vae_cfg, attn_kv_chunk=attn_kv_chunk)
    if "sdxl" in family:
        base_family = "sdxl"
    elif family.startswith("sd15"):
        base_family = "sd15"
    else:
        base_family = "tiny"

    vae_dtype = dtype if vae_dtype is None else vae_dtype
    unet = UNet2DCondition(unet_cfg, dtype=dtype)
    vae = AutoencoderKL(vae_cfg, dtype=vae_dtype)
    texts = tuple(CLIPTextModel(c, dtype=dtype) for c in text_cfgs)

    if tokenizer_paths is None:
        tokenizer_paths = []
    # pad with None (hash fallback) when fewer paths than text encoders are
    # given — e.g. one local CLIP-L tokenizer dir for SDXL's dual encoders
    tokenizer_paths = (
        list(tokenizer_paths) + [None] * (len(text_cfgs) - len(tokenizer_paths))
    )
    toks = tuple(
        load_tokenizer(p, vocab_size=c.vocab_size, max_length=c.max_length)
        for p, c in zip(tokenizer_paths, text_cfgs)
    )

    if params is None:
        if key is None:
            key = jax.random.key(0)
        k_unet, k_vae, *k_txt = jax.random.split(key, 2 + len(text_cfgs))
        f = 2 ** (len(vae_cfg.block_out_channels) - 1)
        lat = image_size // f
        sample = jnp.zeros((1, lat, lat, unet_cfg.in_channels), dtype)
        ctx = jnp.zeros((1, text_cfgs[0].max_length, unet_cfg.cross_attention_dim), dtype)
        kwargs = {}
        if unet_cfg.addition_embed_type == "text_time":
            pooled_dim = (
                unet_cfg.projection_class_embeddings_input_dim
                - 6 * unet_cfg.addition_time_embed_dim
            )
            kwargs = {
                "text_embeds": jnp.zeros((1, pooled_dim), dtype),
                "time_ids": jnp.zeros((1, 6), dtype),
            }
        img = jnp.zeros((1, image_size, image_size, vae_cfg.in_channels), dtype)
        ids = jnp.zeros((1, text_cfgs[0].max_length), jnp.int32)
        if fast_init:
            u_shapes = jax.eval_shape(
                lambda: unet.init(jax.random.key(0), sample, jnp.zeros((), jnp.int32), ctx, **kwargs)
            )["params"]
            v_shapes = jax.eval_shape(lambda: vae.init(jax.random.key(0), img, jax.random.key(0)))["params"]
            t_shapes = [
                jax.eval_shape(lambda tm=tm, c=c: tm.init(jax.random.key(0), jnp.zeros((1, c.max_length), jnp.int32)))["params"]
                for tm, c in zip(texts, text_cfgs)
            ]
            params = {
                "unet": _fast_random_params(u_shapes, jax.random.fold_in(key, 0), dtype),
                "vae": _fast_random_params(v_shapes, jax.random.fold_in(key, 1), vae_dtype),
                "text": tuple(
                    _fast_random_params(s, jax.random.fold_in(key, 2 + i), dtype)
                    for i, s in enumerate(t_shapes)
                ),
            }
        else:
            def _honor_dtype(tree, dt):
                """flax ``init`` materializes f32 params regardless of the
                module's compute dtype; cast so full init obeys the same
                uniform-dtype contract as fast_init (a silent f32 tree
                doubles SDXL's argument HBM — 4.95G bf16 → 9.90G, a
                compile-time OOM on a 16 GB chip).  One jitted whole-tree
                cast — per-leaf ``jnp.asarray`` would compile one convert
                per distinct shape.  No-op (tree returned untouched) when
                every float leaf already matches."""
                leaves = jax.tree_util.tree_leaves(tree)
                if all(
                    (not jnp.issubdtype(leaf.dtype, jnp.floating))
                    or leaf.dtype == jnp.dtype(dt)
                    for leaf in leaves
                ):
                    return tree
                return jax.jit(lambda t: jax.tree_util.tree_map(
                    lambda x: x.astype(dt)
                    if jnp.issubdtype(x.dtype, jnp.floating) else x, t))(tree)

            unet_params = _honor_dtype(
                unet.init(k_unet, sample, jnp.zeros((), jnp.int32), ctx, **kwargs)["params"],
                dtype,
            )
            vae_params = _honor_dtype(
                vae.init(k_vae, img, jax.random.key(0))["params"], vae_dtype
            )
            text_params = tuple(
                _honor_dtype(tm.init(k, ids)["params"], dtype)
                for tm, c, k in zip(texts, text_cfgs, k_txt)
            )
            params = {"unet": unet_params, "vae": vae_params, "text": text_params}

    return DiffusionModel(
        family=base_family,
        image_size=image_size,
        unet=unet,
        vae=vae,
        text_models=texts,
        tokenizers=toks,
        params=params,
        schedule=make_noise_schedule(),
    )
