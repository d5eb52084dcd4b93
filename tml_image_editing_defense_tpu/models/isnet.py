"""ISNet (briaai/RMBG-1.4) — TPU-native salient-object segmenter.

The reference gates its masked-PGD variant on RMBG-1.4 run through a torch
``transformers`` pipeline (``main.py:311-322``; mask applied on the L2 branch
at ``main.py:260-261``).  RMBG-1.4 is ``BriaRMBG`` — the ISNet/DIS
architecture (a U²-Net of RSU blocks: nested U-shapes of
conv+batchnorm+relu units with maxpool encoders and bilinear-upsample
decoders, plus six sigmoid side heads; the checkpoint's ``briarmbg.py``
module structure is public).  This is a from-scratch linen implementation
(NHWC on device) with module names chosen so the mechanical converter
(:mod:`~tml_image_editing_defense_tpu.models.convert`) maps the real
``model.safetensors`` state dict directly:

- ``conv_in`` is the stride-2 conv+bn+relu stem (``myrebnconv`` in the
  checkpoint: children ``conv`` / ``bn``);
- encoder stages ``stage1..stage6`` and decoder stages ``stage5d..stage1d``
  are RSU blocks whose children are ``rebnconvin``, ``rebnconv<i>``,
  ``rebnconv<i>d`` — each a ``conv_s1`` + ``bn_s1`` pair;
- ``side1..side6`` are the 3×3 prediction heads.

BatchNorm runs in inference mode: running statistics are ordinary params
(``running_mean``/``running_var``) so conversion is the same mechanical
rename as everywhere else.  Pool layers (``pool_in``, ``pool12``…) are
parameter-free in torch and simply don't exist in the param tree.

The reference's preprocessing (RMBG pipeline): resize to 1024², scale to
[0,1], normalize mean 0.5 / std 1.0; postprocessing: take the FIRST side
output (d1, already sigmoided), min-max normalize, resize back, and the
reference binarizes at 0.5 (``main.py:320-321``).  :func:`salient_mask` does
exactly that.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ISNetConfig:
    """Stage plan.  ``enc_stages``/``dec_stages`` entries are
    ``(kind, mid_ch, out_ch)`` with ``kind`` an int RSU height (7 ⇒ RSU7) or
    ``"F"`` for the dilated, pool-free RSU4F.  ``dec_stages`` runs deepest
    first (stage<N-1>d … stage1d)."""

    in_channels: int = 3
    out_channels: int = 1
    stem_channels: int = 64
    enc_stages: Tuple = (
        (7, 32, 64), (6, 32, 128), (5, 64, 256),
        (4, 128, 512), ("F", 256, 512), ("F", 256, 512),
    )
    dec_stages: Tuple = (
        ("F", 256, 512), (4, 128, 256), (5, 64, 128), (6, 32, 64), (7, 16, 64),
    )
    #: native inference resolution (the RMBG pipeline resizes inputs here)
    image_size: int = 1024


#: briaai/RMBG-1.4 (= ISNetDIS with the DIS defaults)
RMBG_14 = ISNetConfig()

#: CI preset: same code paths/topology (3 stages incl. an RSU4F), tiny
#: channels, 64² native size.
TINY_ISNET = ISNetConfig(
    stem_channels=8,
    enc_stages=((3, 4, 8), (3, 4, 8), ("F", 4, 8)),
    dec_stages=(("F", 4, 8), (3, 4, 8)),
    image_size=64,
)


class InferenceBatchNorm(nn.Module):
    """torch ``BatchNorm2d`` in eval mode: running stats are plain params
    (this model is inference-only here — the defense never trains it)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        mean = self.param("running_mean", nn.initializers.zeros, (c,), jnp.float32)
        var = self.param("running_var", nn.initializers.ones, (c,), jnp.float32)
        inv = jax.lax.rsqrt(var + self.eps) * scale
        return ((x.astype(jnp.float32) - mean) * inv + bias).astype(x.dtype)


class REBNCONV(nn.Module):
    """conv3×3(+dilation) → batchnorm → relu (U²-Net's basic unit)."""

    out_ch: int
    dirate: int = 1
    stride: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.out_ch, (3, 3), strides=(self.stride, self.stride),
            kernel_dilation=(self.dirate, self.dirate),
            padding=self.dirate, dtype=self.dtype, name="conv_s1",
        )(x)
        x = InferenceBatchNorm(name="bn_s1")(x)
        return nn.relu(x)


def _max_pool_ceil(x):
    """``nn.MaxPool2d(2, stride=2, ceil_mode=True)``: pad odd spatial dims
    (max_pool pads with -inf) so the trailing row/column is kept."""
    ph, pw = x.shape[1] % 2, x.shape[2] % 2
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding=((0, ph), (0, pw)))


def _upsample_like(src, tar):
    """Bilinear resize to ``tar``'s spatial dims (torch ``F.interpolate``
    mode='bilinear', align_corners=False — jax.image.resize's half-pixel
    convention matches)."""
    b, _, _, c = src.shape
    return jax.image.resize(
        src, (b, tar.shape[1], tar.shape[2], c), method="bilinear"
    ).astype(src.dtype)


class RSU(nn.Module):
    """RSU-``height`` block: an encoder of ``height-1`` REBNCONVs with pools
    between, a dilated top, and a skip-concat decoder; residual over the
    stage-entry ``rebnconvin``."""

    height: int
    mid_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = self.height
        hxin = REBNCONV(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)
        enc = []
        hx = hxin
        for i in range(1, h):
            hx = REBNCONV(self.mid_ch, dtype=self.dtype, name=f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < h - 1:
                hx = _max_pool_ceil(hx)
        hx = REBNCONV(self.mid_ch, dirate=2, dtype=self.dtype,
                      name=f"rebnconv{h}")(hx)
        for i in range(h - 1, 0, -1):
            out = self.out_ch if i == 1 else self.mid_ch
            hx = REBNCONV(out, dtype=self.dtype, name=f"rebnconv{i}d")(
                jnp.concatenate([hx, enc[i - 1]], axis=-1)
            )
            if i > 1:
                hx = _upsample_like(hx, enc[i - 2])
        return hx + hxin


class RSU4F(nn.Module):
    """Pool-free RSU variant: dilation 1/2/4/8 up, 4/2/1 down."""

    mid_ch: int
    out_ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        hxin = REBNCONV(self.out_ch, dtype=self.dtype, name="rebnconvin")(x)
        hx1 = REBNCONV(self.mid_ch, dirate=1, dtype=self.dtype, name="rebnconv1")(hxin)
        hx2 = REBNCONV(self.mid_ch, dirate=2, dtype=self.dtype, name="rebnconv2")(hx1)
        hx3 = REBNCONV(self.mid_ch, dirate=4, dtype=self.dtype, name="rebnconv3")(hx2)
        hx4 = REBNCONV(self.mid_ch, dirate=8, dtype=self.dtype, name="rebnconv4")(hx3)
        hx3d = REBNCONV(self.mid_ch, dirate=4, dtype=self.dtype, name="rebnconv3d")(
            jnp.concatenate([hx4, hx3], axis=-1))
        hx2d = REBNCONV(self.mid_ch, dirate=2, dtype=self.dtype, name="rebnconv2d")(
            jnp.concatenate([hx3d, hx2], axis=-1))
        hx1d = REBNCONV(self.out_ch, dirate=1, dtype=self.dtype, name="rebnconv1d")(
            jnp.concatenate([hx2d, hx1], axis=-1))
        return hx1d + hxin


class MyRebnConv(nn.Module):
    """The checkpoint's ``myrebnconv`` stem (children ``conv``/``bn``)."""

    out_ch: int
    stride: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.out_ch, (3, 3), strides=(self.stride, self.stride),
                    padding=1, dtype=self.dtype, name="conv")(x)
        x = InferenceBatchNorm(name="bn")(x)
        return nn.relu(x)


def _make_stage(spec, dtype, name):
    kind, mid, out = spec
    if kind == "F":
        return RSU4F(mid, out, dtype=dtype, name=name)
    return RSU(int(kind), mid, out, dtype=dtype, name=name)


class ISNet(nn.Module):
    """BriaRMBG forward: stride-2 stem, pooled RSU encoder, upsample-concat
    RSU decoder, six side heads upsampled to input resolution.  Returns the
    tuple ``(sigmoid(d1), …, sigmoid(dN))`` — the pipeline consumes d1."""

    config: ISNetConfig = RMBG_14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        n = len(cfg.enc_stages)
        hxin = MyRebnConv(cfg.stem_channels, stride=2, dtype=self.dtype,
                          name="conv_in")(x)
        # (pool_in exists in the checkpoint but is unused in its forward)
        feats = []
        hx = hxin
        for i, spec in enumerate(cfg.enc_stages):
            hx = _make_stage(spec, self.dtype, f"stage{i + 1}")(hx)
            feats.append(hx)
            if i < n - 1:
                hx = _max_pool_ceil(hx)
        # decoder: stage<N-1>d .. stage1d
        dec_feats = [feats[-1]]                      # hx6 (deepest) is side N
        hx = feats[-1]
        for j, spec in enumerate(cfg.dec_stages):
            stage_idx = n - 1 - j                    # N-1 .. 1
            skip = feats[stage_idx - 1]
            hx = _upsample_like(hx, skip)
            hx = _make_stage(spec, self.dtype, f"stage{stage_idx}d")(
                jnp.concatenate([hx, skip], axis=-1)
            )
            dec_feats.append(hx)
        dec_feats = dec_feats[::-1]                  # hx1d, hx2d, …, hxN
        sides = []
        for i, f in enumerate(dec_feats):
            d = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=self.dtype,
                        name=f"side{i + 1}")(f)
            sides.append(_upsample_like(d, x))
        return tuple(jax.nn.sigmoid(s.astype(jnp.float32)) for s in sides)


@dataclasses.dataclass
class ISNetBundle:
    module: ISNet
    params: dict

    def saliency(self, params, image):
        """image NHWC in the model's normalized space → d1 probability map
        [N,H,W,1] in [0,1]."""
        return self.module.apply({"params": params}, image)[0]


_PRESETS = {"rmbg": RMBG_14, "tiny": TINY_ISNET}


def build_isnet(
    preset: str = "rmbg",
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
    params: Optional[dict] = None,
    fast_init: bool = False,
) -> ISNetBundle:
    if preset not in _PRESETS:
        raise ValueError(f"unknown isnet preset {preset!r}; have {sorted(_PRESETS)}")
    cfg = _PRESETS[preset]
    module = ISNet(cfg, dtype=dtype)
    if params is None:
        if key is None:
            key = jax.random.key(0)
        img = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels), dtype)
        if fast_init:
            from tml_image_editing_defense_tpu.models.model_zoo import (
                _fast_random_params,
            )

            shapes = jax.eval_shape(
                lambda: module.init(jax.random.key(0), img))["params"]
            params = _fast_random_params(shapes, key, jnp.float32)
        else:
            params = module.init(key, img)["params"]
    return ISNetBundle(module=module, params=params)


def load_rmbg_checkpoint(model_dir, dtype=jnp.float32) -> ISNetBundle:
    """Load a real ``briaai/RMBG-1.4`` directory (any ``*.safetensors``
    inside) through the mechanical converter; every model param must land
    (key/shape manifest: ``tests/manifests/rmbg_isnet.json``)."""
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
    template = build_isnet("rmbg", dtype=dtype, fast_init=True)
    params = convert_state_dict(template.params, state, "vae", strict=True)
    return ISNetBundle(module=template.module, params=params)


def isnet_param_shapes(preset: str = "rmbg") -> dict:
    """Full-size parameter shape tree (no weight materialization) for the
    manifest test."""
    cfg = _PRESETS[preset]
    module = ISNet(cfg)
    img = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels))
    return jax.eval_shape(lambda: module.init(jax.random.key(0), img))["params"]


def salient_mask(
    bundle: ISNetBundle,
    image01: np.ndarray,
    out_size: int,
    threshold: float = 0.5,
) -> np.ndarray:
    """RMBG pipeline pre/post-processing around the flax forward.

    ``image01``: HWC float array in [0,1] at any resolution.  Resizes to the
    model's native size, normalizes (mean 0.5, std 1.0), runs d1, min-max
    normalizes (the pipeline's post_process), resizes to ``out_size``, and
    binarizes at ``threshold`` (reference main.py:320-321).  Returns float32
    {0,1} [out_size, out_size].
    """
    s = bundle.module.config.image_size
    x = jnp.asarray(image01, jnp.float32)[None]          # [1,H,W,3]
    x = jax.image.resize(x, (1, s, s, 3), method="bilinear")
    x = x - 0.5
    d1 = bundle.saliency(bundle.params, x.astype(bundle.module.dtype))
    lo, hi = jnp.min(d1), jnp.max(d1)
    d1 = (d1 - lo) / jnp.maximum(hi - lo, 1e-8)
    m = jax.image.resize(d1, (1, out_size, out_size, 1), method="bilinear")
    return (np.asarray(m[0, :, :, 0]) > threshold).astype(np.float32)
