"""AutoencoderTiny (TAESD / taesdxl) — the reference's fast preview decoder.

The universal-perturbation trainer decodes its 1-step-edited latents through
``AutoencoderTiny.from_pretrained("madebyollin/taesdxl")`` *inside the
gradient path* (reference ``old/train_noise.py:82`` builds it,
``:151`` decodes with it, ``:153-158`` compute the image losses on that
decode) — the tiny decoder is ~40× cheaper than the full ``AutoencoderKL``
decoder, which matters when it runs inside every EOT gradient rep.

This is a from-scratch linen implementation of diffusers'
``AutoencoderTiny``/``EncoderTiny``/``DecoderTiny``/``AutoencoderTinyBlock``
structure (NHWC on device), with module names chosen so that
:mod:`~tml_image_editing_defense_tpu.models.convert` maps mechanically onto
the real ``madebyollin/taesd[xl]`` state dicts (torch ``nn.Sequential``
indices become ``layers_<i>`` / ``conv_<i>`` children here; parameter-free
activation/upsample entries still consume an index, exactly as in torch).

Conventions mirrored from diffusers:

- blocks are ``relu(conv3(x) + skip(x))`` with ``conv3`` = conv-relu-conv-
  relu-conv (Sequential indices 0/2/4) and ``skip`` a bias-free 1×1 conv only
  when channel counts differ (identity otherwise — every real TAESD block);
- the encoder rescales its input from [-1, 1] to TAESD's [0, 1] convention;
  stage-entry convs are stride-2 and bias-free except the very first;
- the decoder clamps incoming latents with ``tanh(x/3)·3``, upsamples with
  parameter-free nearest-neighbor, uses bias-free stage-exit convs except the
  final RGB conv, and rescales its [0, 1] output back to [-1, 1];
- ``scaling_factor`` is 1.0: TAESD consumes/produces latents directly in the
  UNet's *scaled* latent space (the reference divides by it at
  ``old/train_noise.py:151`` — a no-op kept for shape parity here too).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TinyVAEConfig:
    """Mirrors the ``madebyollin/taesd[xl]`` AutoencoderTiny config (taesd and
    taesdxl share the architecture; only the weights differ)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    encoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64)
    decoder_block_out_channels: Tuple[int, ...] = (64, 64, 64, 64)
    num_encoder_blocks: Tuple[int, ...] = (1, 3, 3, 3)
    num_decoder_blocks: Tuple[int, ...] = (3, 3, 3, 1)
    upsampling_factor: int = 2
    #: decoder input clamp half-range: ``tanh(x / m) * m``
    latent_magnitude: float = 3.0
    #: latents are already in the UNet's scaled space (see module docstring)
    scaling_factor: float = 1.0


TAESD = TinyVAEConfig()
#: small preset for CPU tests — same code paths, equal channels per stage
#: (the only configuration the real checkpoints use)
TINY_TAESD = TinyVAEConfig(
    encoder_block_out_channels=(8, 8),
    decoder_block_out_channels=(8, 8),
    num_encoder_blocks=(1, 1),
    num_decoder_blocks=(1, 1),
)


class TinyBlock(nn.Module):
    """``AutoencoderTinyBlock``: relu(conv-relu-conv-relu-conv + skip)."""

    in_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_0")(x)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_2")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_4")(h)
        if self.in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), use_bias=False,
                        dtype=self.dtype, name="skip")(x)
        return nn.relu(h + x)


class TinyEncoder(nn.Module):
    """``EncoderTiny``: [-1,1] → [0,1], conv/block stages with stride-2
    entries, final conv to the latent channels."""

    config: TinyVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        x = (x + 1.0) / 2.0
        idx = 0
        prev = cfg.in_channels
        for i, n_blocks in enumerate(cfg.num_encoder_blocks):
            ch = cfg.encoder_block_out_channels[i]
            if i == 0:
                x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"layers_{idx}")(x)
            else:
                x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1,
                            use_bias=False, dtype=self.dtype,
                            name=f"layers_{idx}")(x)
            idx += 1
            prev = ch
            for _ in range(n_blocks):
                x = TinyBlock(prev, ch, dtype=self.dtype, name=f"layers_{idx}")(x)
                idx += 1
        return nn.Conv(cfg.latent_channels, (3, 3), padding=1,
                       dtype=self.dtype, name=f"layers_{idx}")(x)


class TinyDecoder(nn.Module):
    """``DecoderTiny``: tanh-clamp, conv+relu stem, block/upsample/conv
    stages, [0,1] → [-1,1]."""

    config: TinyVAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        m = cfg.latent_magnitude
        x = jnp.tanh(z / m) * m
        x = nn.Conv(cfg.decoder_block_out_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="layers_0")(x)
        x = nn.relu(x)                      # Sequential index 1 (no params)
        idx = 2
        n_stages = len(cfg.num_decoder_blocks)
        for i, n_blocks in enumerate(cfg.num_decoder_blocks):
            is_final = i == n_stages - 1
            ch = cfg.decoder_block_out_channels[i]
            for _ in range(n_blocks):
                x = TinyBlock(ch, ch, dtype=self.dtype, name=f"layers_{idx}")(x)
                idx += 1
            if not is_final:
                f = cfg.upsampling_factor
                x = jnp.repeat(jnp.repeat(x, f, axis=1), f, axis=2)
                idx += 1                    # nn.Upsample consumes an index
            out_ch = ch if not is_final else cfg.out_channels
            x = nn.Conv(out_ch, (3, 3), padding=1, use_bias=is_final,
                        dtype=self.dtype, name=f"layers_{idx}")(x)
            idx += 1
        return x * 2.0 - 1.0


class AutoencoderTiny(nn.Module):
    """Deterministic tiny autoencoder (no posterior; ``encode`` returns the
    latents directly, matching diffusers ``AutoencoderTiny.encode``)."""

    config: TinyVAEConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = TinyEncoder(self.config, self.dtype)
        self.decoder = TinyDecoder(self.config, self.dtype)

    def encode(self, x):
        return self.encoder(x)

    def decode(self, z):
        return self.decoder(z)

    def __call__(self, x):
        return self.decode(self.encode(x))


@dataclasses.dataclass
class TinyAutoencoder:
    """Bundle (module + params) with pure apply wrappers, jit-safe."""

    module: AutoencoderTiny
    params: dict

    def encode(self, params, image):
        """image NHWC in [-1,1] → latents in the UNet's scaled space."""
        return self.module.apply({"params": params}, image,
                                 method=AutoencoderTiny.encode)

    def decode(self, params, z):
        """scaled-space latents → image NHWC in [-1,1] (the reference's
        preview decode, ``old/train_noise.py:151``)."""
        return self.module.apply({"params": params}, z,
                                 method=AutoencoderTiny.decode)


_PRESETS = {"taesd": TAESD, "taesdxl": TAESD, "tiny": TINY_TAESD}


def build_tiny_autoencoder(
    preset: str = "taesd",
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
    params: Optional[dict] = None,
    fast_init: bool = False,
    image_size: int = 32,
) -> TinyAutoencoder:
    """Construct the preview autoencoder; random init unless ``params`` is
    given (convert real ``madebyollin/taesd[xl]`` weights with
    ``convert.convert_state_dict(template, state_dict, kind="vae")``)."""
    if preset not in _PRESETS:
        raise ValueError(f"unknown tiny-vae preset {preset!r}; have {sorted(_PRESETS)}")
    cfg = _PRESETS[preset]
    module = AutoencoderTiny(cfg, dtype=dtype)
    if params is None:
        if key is None:
            key = jax.random.key(0)
        img = jnp.zeros((1, image_size, image_size, cfg.in_channels), dtype)
        if fast_init:
            from tml_image_editing_defense_tpu.models.model_zoo import _fast_random_params

            shapes = jax.eval_shape(lambda: module.init(jax.random.key(0), img))["params"]
            params = _fast_random_params(shapes, key, dtype)
        else:
            params = module.init(key, img)["params"]
    return TinyAutoencoder(module=module, params=params)


def load_taesd_checkpoint(model_dir, dtype=jnp.float32) -> TinyAutoencoder:
    """Load a real ``madebyollin/taesd[xl]`` diffusers directory (the
    reference's ``AutoencoderTiny.from_pretrained`` at
    ``old/train_noise.py:82``): any ``*.safetensors`` under ``model_dir`` is
    read and mapped through the mechanical converter; every key must land
    (validated offline by ``tests/manifests/taesd_vae.json``)."""
    from pathlib import Path

    from tml_image_editing_defense_tpu.models.convert import (
        convert_state_dict,
        load_safetensors,
    )

    model_dir = Path(model_dir)
    state = {}
    for f in sorted(model_dir.glob("*.safetensors")):
        state.update(load_safetensors(f))
    if not state:
        raise FileNotFoundError(f"no .safetensors under {model_dir}")
    template = build_tiny_autoencoder("taesd", dtype=dtype, fast_init=True)
    params = convert_state_dict(template.params, state, "vae", strict=True)
    return TinyAutoencoder(module=template.module, params=params)


def tiny_vae_param_shapes(preset: str = "taesd") -> dict:
    """Full-size parameter shape tree (``jax.ShapeDtypeStruct``) for the
    real-checkpoint manifest tests — no weight materialization."""
    cfg = _PRESETS[preset]
    module = AutoencoderTiny(cfg)
    img = jnp.zeros((1, 32, 32, cfg.in_channels))
    return jax.eval_shape(lambda: module.init(jax.random.key(0), img))["params"]
