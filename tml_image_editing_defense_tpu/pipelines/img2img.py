"""Editing pipelines: img2img (SDEdit) and txt2img, jit-compiled.

TPU-native rebuild of the reference's vendored diffusers pipelines:

- SD-1.5 img2img with the **fixed-noise extension** — the reference's one
  real pipeline modification threads a caller-supplied ``noise`` tensor into
  ``prepare_latents``/``add_noise`` so evaluation reuses the exact latent
  noise the attack was trained against
  (``pipelines/pipeline_stable_diffusion_img2img.py:722, 779-783, 848-875,
  1057``).  Here ``noise`` is simply an argument of the jitted program.
- SDXL img2img / txt2img (``pipelines/sdxl_img2img_pipeline.py``,
  ``sdxl_pipeline.py``).  The reference subclasses exist only to re-declare
  ``__call__`` *without* ``@torch.no_grad`` so gradients flow; in JAX every
  pipeline is a pure function and therefore differentiable by construction —
  no special grad-enabled variant is needed.

The generation core is one jitted program per (steps, strength, shape)
bucket, cached on the pipeline object; prompts enter as precomputed
embeddings so new prompt strings never trigger recompiles.

Precision note: evaluation defaults to float32, matching the reference
(``Trainer.load_models(dtype=torch.float32)`` for inference, main.py:446).
Long multistep chains (PLMS-50) at high guidance can overflow in bfloat16;
measured cost of f32 eval is ~1.1 s per 50-step 512² edit on v5e, so there
is no reason to drop precision here (the *attack* runs bf16 fine — its
chains are 2-4 LCM steps).
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from tml_image_editing_defense_tpu.attack.forward import CondInputs, denoise_chain, make_time_ids
from tml_image_editing_defense_tpu.core import image_ops
from tml_image_editing_defense_tpu.core.samplers import make_sampler
from tml_image_editing_defense_tpu.models.model_zoo import DiffusionModel


class Img2ImgPipeline:
    """SDEdit-style image editing (reference ``__call__`` semantics at
    ``pipeline_stable_diffusion_img2img.py:846-1148``)."""

    def __init__(
        self,
        model: DiffusionModel,
        sampler: str = "plms",
        eta: float = 0.0,
        dtype=jnp.float32,
    ):
        self.model = model
        self.dtype = dtype
        kwargs = {"eta": eta} if sampler == "ddim" else {}
        self.sampler = make_sampler(sampler, model.schedule, **kwargs)
        self._jitted = {}

    # -- jitted core -------------------------------------------------------

    def _core(self, plan_key):
        if plan_key in self._jitted:
            return self._jitted[plan_key]
        num_steps, strength, d_start, d_end, from_latents = plan_key
        # SDXL denoising windowing (sdxl_img2img_pipeline.py:306-320, 392-412):
        # denoising_start drops the head (t >= T(1-start)); denoising_end
        # drops the tail (t < T(1-end)).
        T = self.model.schedule.num_train_timesteps
        limit_t = None if d_start is None else int(round(T * (1.0 - d_start)))
        min_t = None if d_end is None else int(round(T * (1.0 - d_end)))
        plan = self.sampler.plan(
            num_steps,
            strength=None if d_start is not None else strength,
            limit_t=limit_t,
            min_t=min_t,
        )

        @jax.jit
        def generate(params, image_or_latents, ctx, text_embeds, time_ids, noise, key, guidance_scale):
            k_vae, k_chain = jax.random.split(key)
            if from_latents:
                x = image_or_latents          # already noised (denoising_start)
            else:
                z = self.model.encode_image(params["vae"], image_or_latents, key=k_vae)
                x = self.sampler.add_noise(plan, z, noise)
            cond = CondInputs(ctx=ctx, text_embeds=text_embeds, time_ids=time_ids)
            x = denoise_chain(
                self.model, self.sampler, plan, params, x, cond,
                guidance_scale, k_chain, remat_policy="none",
            )
            out = self.model.decode_latent(params["vae"], x, scaled=True)
            return image_ops.denormalize(out)           # [0,1] NHWC

        self._jitted[plan_key] = (generate, plan)
        return self._jitted[plan_key]

    # -- host orchestration ------------------------------------------------

    def _prepare_image(self, image) -> jnp.ndarray:
        if isinstance(image, (list, tuple)):
            return jnp.concatenate([self._prepare_image(im) for im in image], axis=0)
        if isinstance(image, Image.Image):
            arr = image_ops.preprocess_pil(image, self.model.image_size)
            return jnp.asarray(arr.transpose(0, 2, 3, 1), self.dtype)  # NCHW→NHWC
        image = jnp.asarray(image, self.dtype)
        if image.ndim == 3:
            image = image[None]
        return image

    def _prepare_cond(self, prompt: str, negative_prompt: str,
                      aesthetic_score=None, negative_aesthetic_score=None):
        cond, uncond, pooled, uncond_pooled = self.model.encode_prompt(prompt, negative_prompt)
        ctx = jnp.stack([uncond, cond]).astype(self.dtype)
        te, tids = None, None
        if pooled is not None:
            te = jnp.stack([uncond_pooled, pooled]).astype(self.dtype)
            tids = make_time_ids(
                self.model.image_size, self.dtype,
                aesthetic_score=aesthetic_score,
                negative_aesthetic_score=negative_aesthetic_score,
            )
        return ctx, te, tids

    def __call__(
        self,
        prompt: str,
        image,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        strength: float = 0.6,
        noise: Optional[jnp.ndarray] = None,
        negative_prompt: str = "",
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
        latents: Optional[jnp.ndarray] = None,
        denoising_start: Optional[float] = None,
        denoising_end: Optional[float] = None,
        aesthetic_score: Optional[float] = None,
        negative_aesthetic_score: Optional[float] = None,
    ):
        """Edit ``image`` with ``prompt``.  ``noise`` (NHWC latent, or NCHW —
        auto-transposed) pins the initial latent noise exactly like the
        reference's ``noise=`` parameter.  ``latents`` + ``denoising_start``
        continue a partially-denoised latent (SDXL base→refiner handoff);
        ``denoising_end`` stops early and returns the decode of the
        intermediate latent."""
        key = jax.random.key(0) if key is None else key
        from_latents = latents is not None
        ctx, te, tids = self._prepare_cond(
            prompt, negative_prompt, aesthetic_score, negative_aesthetic_score
        )
        generate, plan = self._core(
            (num_inference_steps, float(strength), denoising_start, denoising_end,
             from_latents)
        )
        if from_latents:
            img = jnp.asarray(latents, self.dtype)
            if img.ndim == 4 and img.shape[-1] != self.model.latent_shape[-1]:
                img = jnp.transpose(img, (0, 2, 3, 1))
            b = img.shape[0]
            noise = jnp.zeros((b,) + self.model.latent_shape[1:], self.dtype)
        else:
            img = self._prepare_image(image)   # [B,H,W,3]; lists/batches allowed
            b = img.shape[0]
            lat_shape = (b,) + self.model.latent_shape[1:]
            if noise is None:
                key, sub = jax.random.split(key)
                noise = jax.random.normal(sub, lat_shape, self.dtype)
            else:
                noise = jnp.asarray(noise, self.dtype)
                if noise.ndim == 3:
                    noise = noise[None]
                if noise.shape[-1] != lat_shape[-1] and noise.ndim == 4:
                    noise = jnp.transpose(noise, (0, 2, 3, 1))   # NCHW → NHWC
                if noise.shape[0] != b:
                    noise = jnp.broadcast_to(noise, lat_shape)
        if b > 1:  # CFG blocks: [uncond×B ; cond×B]
            ctx = jnp.repeat(ctx, b, axis=0)
            te = None if te is None else jnp.repeat(te, b, axis=0)
            tids = None if tids is None else jnp.repeat(tids, b, axis=0)
        out = generate(self.model.params, img, ctx, te, tids, noise, key,
                       jnp.asarray(guidance_scale, self.dtype))
        if output_type == "pil":
            outs = [
                image_ops.to_pil(np.asarray(out[i: i + 1]).transpose(0, 3, 1, 2),
                                 denormalize=False)
                for i in range(b)
            ]
            return outs[0] if b == 1 else outs
        return out


    # -- batched evaluation core --------------------------------------------

    def _pairs_core(self, plan_key):
        """vmap of the single-pair program over P (prompt × noise) cells —
        the whole evaluation sweep as ONE dispatch.  Each cell keeps its own
        RNG key and CFG pair, so per-cell results equal the sequential path
        (reference runs 19 prompts × n_noise sequential double-edits,
        main.py:469-521)."""
        ck = ("pairs",) + plan_key
        if ck in self._jitted:
            return self._jitted[ck]
        generate, plan = self._core(plan_key)
        # in_axes: params shared; per-cell image pair, ctx, (te, tids), noise,
        # key; guidance shared.
        vgen = jax.jit(jax.vmap(
            generate.__wrapped__,
            in_axes=(None, 0, 0, 0, 0, 0, 0, None),
        ))
        self._jitted[ck] = (vgen, plan)
        return self._jitted[ck]

    def edit_pairs(
        self,
        prompts: Sequence[str],
        pair_images: jnp.ndarray,            # [P, 2, H, W, 3] (clean, adv)
        pair_noises: jnp.ndarray,            # [P, 2, h, w, 4]
        keys: jax.Array,                     # [P]
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        strength: float = 0.6,
        negative_prompt: str = "",
        denoising_end: Optional[float] = None,
        aesthetic_score: Optional[float] = None,
        negative_aesthetic_score: Optional[float] = None,
        data_sharding=None,
    ) -> jnp.ndarray:
        """Batched (clean, adv) double-edits: one jitted dispatch for all P
        cells.  Returns [P, 2, H, W, 3] in [0, 1].

        ``data_sharding`` (a ``NamedSharding`` partitioning dim 0): cells are
        independent, so sharding the cell axis over a mesh ``data`` axis
        splits the dispatch across chips with zero collectives — the
        multi-chip tier of the reference's sequential 19 × n_noise eval loop
        (main.py:469-521)."""
        P = len(prompts)
        assert pair_images.shape[0] == P and keys.shape[0] == P
        ctxs, tes, tidss = [], [], []
        for p in prompts:
            ctx, te, tids = self._prepare_cond(
                p, negative_prompt, aesthetic_score, negative_aesthetic_score
            )
            ctxs.append(jnp.repeat(ctx, 2, axis=0))          # [uu cc]
            tes.append(None if te is None else jnp.repeat(te, 2, axis=0))
            tidss.append(None if tids is None else jnp.repeat(tids, 2, axis=0))
        ctx = jnp.stack(ctxs)
        te = None if tes[0] is None else jnp.stack(tes)
        tids = None if tidss[0] is None else jnp.stack(tidss)
        vgen, plan = self._pairs_core(
            (num_inference_steps, float(strength), None, denoising_end, False)
        )
        args = [
            pair_images.astype(self.dtype),
            ctx.astype(self.dtype),
            te,
            tids,
            pair_noises.astype(self.dtype),
            keys,
        ]
        if data_sharding is not None:
            args = [None if a is None else jax.device_put(a, data_sharding)
                    for a in args]
        return vgen(
            self.model.params, *args, jnp.asarray(guidance_scale, self.dtype)
        )


class Txt2ImgPipeline(Img2ImgPipeline):
    """Text-to-image generation (reference ``sdxl_pipeline.py`` capability);
    also accepts precomputed ``latents`` + a custom single-timestep plan the
    way the legacy universal-perturbation trainer uses it
    (``old/train_noise.py:141-149``)."""

    def _txt_core(self, num_steps):
        key_ = ("txt", num_steps)
        if key_ in self._jitted:
            return self._jitted[key_]
        plan = self.sampler.plan(num_steps)

        @jax.jit
        def generate(params, latents, ctx, text_embeds, time_ids, key, guidance_scale):
            cond = CondInputs(ctx=ctx, text_embeds=text_embeds, time_ids=time_ids)
            x = denoise_chain(
                self.model, self.sampler, plan, params, latents, cond,
                guidance_scale, key, remat_policy="none",
            )
            out = self.model.decode_latent(params["vae"], x, scaled=True)
            return image_ops.denormalize(out)

        self._jitted[key_] = (generate, plan)
        return self._jitted[key_]

    def __call__(
        self,
        prompt: str,
        num_inference_steps: int = 50,
        guidance_scale: float = 7.5,
        latents: Optional[jnp.ndarray] = None,
        negative_prompt: str = "",
        key: Optional[jax.Array] = None,
        output_type: str = "pil",
    ):
        key = jax.random.key(0) if key is None else key
        ctx, te, tids = self._prepare_cond(prompt, negative_prompt)
        generate, plan = self._txt_core(num_inference_steps)
        lat_shape = (1,) + self.model.latent_shape[1:]
        if latents is None:
            key, sub = jax.random.split(key)
            latents = jax.random.normal(sub, lat_shape, self.dtype)
            if plan.kind == "euler":
                latents = latents * plan.init_sigma
        else:
            latents = jnp.asarray(latents, self.dtype)
            if latents.shape != lat_shape and latents.ndim == 4:
                latents = jnp.transpose(latents, (0, 2, 3, 1))
        out = generate(self.model.params, latents, ctx, te, tids, key,
                       jnp.asarray(guidance_scale, self.dtype))
        if output_type == "pil":
            return image_ops.to_pil(np.asarray(out).transpose(0, 3, 1, 2), denormalize=False)
        return out
