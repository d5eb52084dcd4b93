"""UNet2DCondition — the denoiser for SD-1.5 and SDXL, from scratch in linen.

Covers everything the reference exercises through diffusers'
``UNet2DConditionModel`` (``main.py:233-238``): cross-attention conditioning
on CLIP text states, classifier-free-guidance batching, and SDXL's
``text_time`` additional embeddings (pooled text embeds + micro-conditioning
time-ids, reference ``main.py:362-408``).

Static config → static graph: the whole forward is trace-friendly, NHWC,
bf16-able, and is called inside the attack's ``lax.scan`` denoising chain
with rematerialization.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.layers import (
    Downsample,
    ResnetBlock,
    TimestepEmbedding,
    Transformer2D,
    Upsample,
    timestep_embedding,
)


@dataclass(frozen=True)
class UNetConfig:
    """Architecture config (field semantics follow diffusers' UNet configs;
    note diffusers' SD ``attention_head_dim`` historically means *number of
    heads* — here the field is named honestly)."""

    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # True at index i ⇒ down block i is a CrossAttnDownBlock.
    cross_attention_blocks: Tuple[bool, ...] = (True, True, True, False)
    transformer_layers_per_block: Tuple[int, ...] = (1, 1, 1, 1)
    num_attention_heads: Tuple[int, ...] = (8, 8, 8, 8)
    cross_attention_dim: int = 768
    use_linear_projection: bool = False
    # SDXL: "text_time" — pooled text embeds + sinusoidal time_ids.
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    projection_class_embeddings_input_dim: int = 2816
    #: KV-chunked online-softmax attention when set (see layers.py
    #: ``_chunked_attention``) — required to fit 1024² fwd+bwd in v5e HBM;
    #: ``None`` keeps XLA's fused attention (faster at small resolutions).
    attn_kv_chunk: Optional[int] = None

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


SD15_UNET = UNetConfig()

#: SD-1.5 inpainting UNet: 9 input channels — noisy latents(4) + mask(1) +
#: masked-image latents(4) (runwayml/stable-diffusion-inpainting layout;
#: consumed by the legacy inpaint attack, old/yuval_playground.py:139).
SD15_INPAINT_UNET = UNetConfig(in_channels=9)

SDXL_UNET = UNetConfig(
    sample_size=128,
    block_out_channels=(320, 640, 1280),
    cross_attention_blocks=(False, True, True),
    transformer_layers_per_block=(0, 2, 10),
    num_attention_heads=(5, 10, 20),
    cross_attention_dim=2048,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=256,
    projection_class_embeddings_input_dim=2816,
)

#: Tiny preset for tests: runs the full code path in milliseconds on CPU.
TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_blocks=(True, False),
    transformer_layers_per_block=(1, 0),
    num_attention_heads=(2, 2),
    cross_attention_dim=32,
)

#: Tiny 9-channel inpaint preset.
TINY_INPAINT_UNET = UNetConfig(
    sample_size=8,
    in_channels=9,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_blocks=(True, False),
    transformer_layers_per_block=(1, 0),
    num_attention_heads=(2, 2),
    cross_attention_dim=32,
)

#: Tiny SDXL-flavoured preset (text_time additional embeddings).
TINY_SDXL_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_blocks=(False, True),
    transformer_layers_per_block=(0, 2),
    num_attention_heads=(2, 2),
    cross_attention_dim=64,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=8 * 6 + 32,  # 6 time_ids + pooled dim 32
)

#: Tiny refiner-shaped preset: ``requires_aesthetics_score`` models condition
#: on a 5-tuple (original + crop + aesthetic score) instead of the base
#: 6-tuple (sdxl_img2img_pipeline.py:344-378) — the projection input dim
#: shrinks by one time-id embed accordingly.
TINY_SDXL_REFINER_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    cross_attention_blocks=(False, True),
    transformer_layers_per_block=(0, 2),
    num_attention_heads=(2, 2),
    cross_attention_dim=64,
    use_linear_projection=True,
    addition_embed_type="text_time",
    addition_time_embed_dim=8,
    projection_class_embeddings_input_dim=8 * 5 + 32,  # 5 time_ids + pooled dim 32
)


class UNet2DCondition(nn.Module):
    config: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                    # [B, H, W, C] latent
        timesteps: jnp.ndarray,                 # [] or [B]
        encoder_hidden_states: jnp.ndarray,     # [B, S, cross_dim]
        text_embeds: Optional[jnp.ndarray] = None,  # SDXL pooled [B, P]
        time_ids: Optional[jnp.ndarray] = None,     # SDXL [B, 6]
    ) -> jnp.ndarray:
        cfg = self.config
        b = sample.shape[0]
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (b,))

        # --- time (+ additional) embedding ---
        t_emb = timestep_embedding(timesteps, cfg.block_out_channels[0], dtype=self.dtype)
        emb = TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="time_embedding")(t_emb)
        if cfg.addition_embed_type == "text_time":
            assert text_embeds is not None and time_ids is not None, (
                "SDXL UNet needs text_embeds and time_ids (reference main.py:362-408)"
            )
            tid = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim, dtype=self.dtype
            ).reshape(b, -1)
            add = jnp.concatenate([text_embeds.astype(self.dtype), tid], axis=-1)
            emb = emb + TimestepEmbedding(cfg.time_embed_dim, dtype=self.dtype, name="add_embedding")(add)

        ctx = encoder_hidden_states.astype(self.dtype)
        sample = sample.astype(self.dtype)

        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(sample)

        # --- down ---
        skips = [h]
        n_blocks = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            heads = cfg.num_attention_heads[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"down_blocks_{i}_resnets_{j}")(h, emb)
                if cfg.cross_attention_blocks[i]:
                    h = Transformer2D(
                        heads, out_ch // heads, cfg.cross_attention_dim,
                        depth=cfg.transformer_layers_per_block[i],
                        use_linear_projection=cfg.use_linear_projection,
                        kv_chunk=cfg.attn_kv_chunk,
                        dtype=self.dtype, name=f"down_blocks_{i}_attentions_{j}",
                    )(h, ctx)
                skips.append(h)
            if i < n_blocks - 1:
                h = Downsample(out_ch, dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)

        # --- mid ---
        mid_ch = cfg.block_out_channels[-1]
        mid_heads = cfg.num_attention_heads[-1]
        h = ResnetBlock(mid_ch, dtype=self.dtype, name="mid_block_resnets_0")(h, emb)
        if cfg.transformer_layers_per_block[-1] > 0:
            h = Transformer2D(
                mid_heads, mid_ch // mid_heads, cfg.cross_attention_dim,
                depth=cfg.transformer_layers_per_block[-1],
                use_linear_projection=cfg.use_linear_projection,
                kv_chunk=cfg.attn_kv_chunk,
                dtype=self.dtype, name="mid_block_attentions_0",
            )(h, ctx)
        h = ResnetBlock(mid_ch, dtype=self.dtype, name="mid_block_resnets_1")(h, emb)

        # --- up ---
        for i in range(n_blocks):
            level = n_blocks - 1 - i           # mirrored down level
            out_ch = cfg.block_out_channels[level]
            heads = cfg.num_attention_heads[level]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = ResnetBlock(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_resnets_{j}")(h, emb)
                if cfg.cross_attention_blocks[level]:
                    h = Transformer2D(
                        heads, out_ch // heads, cfg.cross_attention_dim,
                        depth=cfg.transformer_layers_per_block[level],
                        use_linear_projection=cfg.use_linear_projection,
                        kv_chunk=cfg.attn_kv_chunk,
                        dtype=self.dtype, name=f"up_blocks_{i}_attentions_{j}",
                    )(h, ctx)
            if i < n_blocks - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)

        h = nn.GroupNorm(32 if h.shape[-1] % 32 == 0 else h.shape[-1] // 4,
                         epsilon=1e-5, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h
