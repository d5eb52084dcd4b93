"""AutoencoderKL — VAE encoder/decoder, from scratch in linen (NHWC).

The reference uses diffusers ``AutoencoderKL`` for both gradient entry
(``vae.encode`` at ``main.py:191``) and loss-side decoding (``vae.decode`` at
``main.py:156``), with swapped fine-tuned weights (sd-vae-ft-mse / sdxl fp16
fix, ``main.py:290, 302``).  Both passes sit inside the differentiated attack
program, so they are plain pure functions here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.layers import ResnetBlock, SelfAttentionBlock, Upsample


@dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_groups: int = 32
    #: latent scaling factor: 0.18215 (SD-1.5, main.py:191) / 0.13025 (SDXL)
    scaling_factor: float = 0.18215
    #: KV-chunked attention for the mid-block (16384 tokens at 1024² — the
    #: full score matrix is 1 GB in f32); ``None`` = XLA fused attention.
    attn_kv_chunk: "int | None" = None


SD_VAE = VAEConfig()
SDXL_VAE = VAEConfig(scaling_factor=0.13025)
TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1, norm_groups=8)


class _VAEDownsample(nn.Module):
    """VAE downsampling conv: asymmetric (0,1) padding, stride 2 — diffusers
    ``Downsample2D(padding=0)`` semantics."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding="VALID",
            dtype=self.dtype, name="conv",
        )(x)


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        g = cfg.norm_groups
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype, name="conv_in")(x)
        for i, out_ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock(out_ch, use_time_emb=False, groups=g, dtype=self.dtype,
                                name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = _VAEDownsample(out_ch, dtype=self.dtype, name=f"down_blocks_{i}_downsamplers_0")(h)
        mid = cfg.block_out_channels[-1]
        h = ResnetBlock(mid, use_time_emb=False, groups=g, dtype=self.dtype, name="mid_block_resnets_0")(h)
        h = SelfAttentionBlock(groups=g, kv_chunk=cfg.attn_kv_chunk, dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock(mid, use_time_emb=False, groups=g, dtype=self.dtype, name="mid_block_resnets_1")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        g = cfg.norm_groups
        mid = cfg.block_out_channels[-1]
        h = nn.Conv(mid, (3, 3), padding=1, dtype=self.dtype, name="conv_in")(z)
        h = ResnetBlock(mid, use_time_emb=False, groups=g, dtype=self.dtype, name="mid_block_resnets_0")(h)
        h = SelfAttentionBlock(groups=g, kv_chunk=cfg.attn_kv_chunk, dtype=self.dtype, name="mid_block_attentions_0")(h)
        h = ResnetBlock(mid, use_time_emb=False, groups=g, dtype=self.dtype, name="mid_block_resnets_1")(h)
        rev = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock(out_ch, use_time_emb=False, groups=g, dtype=self.dtype,
                                name=f"up_blocks_{i}_resnets_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_blocks_{i}_upsamplers_0")(h)
        h = nn.GroupNorm(g, epsilon=1e-6, dtype=self.dtype, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """Full VAE with quant convs and diagonal-Gaussian sampling.

    ``encode`` returns (mean, logvar); use :func:`sample_latent` to draw, or
    take the mean for deterministic encoding.
    """

    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, self.dtype)
        self.decoder = Decoder(self.config, self.dtype)
        self.quant_conv = nn.Conv(2 * self.config.latent_channels, (1, 1), dtype=self.dtype)
        self.post_quant_conv = nn.Conv(self.config.latent_channels, (1, 1), dtype=self.dtype)

    def encode(self, x):
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z):
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x, key):
        mean, logvar = self.encode(x)
        z = sample_latent(key, mean, logvar)
        return self.decode(z), mean, logvar


def sample_latent(key: jax.Array, mean: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """Reparameterized draw from the diagonal Gaussian posterior
    (diffusers ``DiagonalGaussianDistribution.sample``, consumed at
    reference ``main.py:75, 191``)."""
    std = jnp.exp(0.5 * logvar)
    return mean + std * jax.random.normal(key, mean.shape, mean.dtype)
