"""Numerical parity of the linen UNet and VAE against an independent torch
mirror (VERDICT r2 item 4: an *external* oracle for the networks the attack
differentiates through — reference ``main.py:229-243``,
``pipelines/pipeline_stable_diffusion_img2img.py:1102-1129``).

The mirror is a from-scratch functional torch implementation of the tiny
presets, written to diffusers' documented block structure (ResnetBlock2D,
Transformer2DModel, AutoencoderKL) in NCHW with torch ops, consuming the
torch-layout state dict produced by ``export_state_dict``.  A transposed
GroupNorm, wrong attention scale, flipped GEGLU chunk order, wrong skip
concat order, or a mis-mapped converter key all fail here — none of which
the key/shape manifests or self-consistency tests can catch.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.convert import export_state_dict
from tml_image_editing_defense_tpu.models.unet import (
    TINY_SDXL_UNET,
    TINY_UNET,
    UNet2DCondition,
)
from tml_image_editing_defense_tpu.models.vae import TINY_VAE, AutoencoderKL

torch.set_grad_enabled(False)


# --------------------------------------------------------------------------
# torch-side functional mirror (NCHW, diffusers block structure)
# --------------------------------------------------------------------------

def _t(sd, key):
    return torch.from_numpy(np.ascontiguousarray(sd[key]))


def _conv(sd, p, x, stride=1, pad=1):
    return F.conv2d(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"),
                    stride=stride, padding=pad)


def _lin(sd, p, x, bias=True):
    return F.linear(x, _t(sd, p + ".weight"),
                    _t(sd, p + ".bias") if bias else None)


def _gn(sd, p, x, groups, eps):
    return F.group_norm(x, groups, _t(sd, p + ".weight"), _t(sd, p + ".bias"), eps)


def _ln(sd, p, x, eps=1e-5):
    return F.layer_norm(x, x.shape[-1:], _t(sd, p + ".weight"),
                        _t(sd, p + ".bias"), eps)


def _timestep_embedding(t, dim):
    # diffusers Timesteps: flip_sin_to_cos=True, freq_shift=0 → [cos, sin]
    half = dim // 2
    exponent = -math.log(10000.0) * torch.arange(half, dtype=torch.float32) / half
    emb = torch.exp(exponent)[None, :] * t.float()[:, None]
    return torch.cat([torch.cos(emb), torch.sin(emb)], dim=-1)


def _time_mlp(sd, p, x):
    return _lin(sd, p + ".linear_2", F.silu(_lin(sd, p + ".linear_1", x)))


def _resnet(sd, p, x, temb, groups=32):
    h = F.silu(_gn(sd, p + ".norm1", x, groups, 1e-5))
    h = _conv(sd, p + ".conv1", h)
    if temb is not None and (p + ".time_emb_proj.weight") in sd:
        h = h + _lin(sd, p + ".time_emb_proj", F.silu(temb))[:, :, None, None]
    h = F.silu(_gn(sd, p + ".norm2", h, groups, 1e-5))
    h = _conv(sd, p + ".conv2", h)
    if (p + ".conv_shortcut.weight") in sd:
        x = _conv(sd, p + ".conv_shortcut", x, pad=0)
    return x + h


def _attention(sd, p, x, ctx, heads):
    q = _lin(sd, p + ".to_q", x, bias=False)
    k = _lin(sd, p + ".to_k", ctx, bias=False)
    v = _lin(sd, p + ".to_v", ctx, bias=False)
    b, t, inner = q.shape
    dh = inner // heads
    q = q.view(b, t, heads, dh).transpose(1, 2)
    k = k.view(b, -1, heads, dh).transpose(1, 2)
    v = v.view(b, -1, heads, dh).transpose(1, 2)
    o = F.scaled_dot_product_attention(q, k, v)
    o = o.transpose(1, 2).reshape(b, t, inner)
    return _lin(sd, p + ".to_out.0", o)


def _transformer2d(sd, p, x, ctx, heads, depth, linear_proj):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(sd, p + ".norm", x, 32, 1e-6)
    if linear_proj:
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
        h = _lin(sd, p + ".proj_in", h)
    else:
        h = _conv(sd, p + ".proj_in", h, pad=0)
        inner = h.shape[1]
        h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, inner)
    for i in range(depth):
        bp = f"{p}.transformer_blocks.{i}"
        normed = _ln(sd, bp + ".norm1", h)
        h = h + _attention(sd, bp + ".attn1", normed, normed, heads)
        h = h + _attention(sd, bp + ".attn2", _ln(sd, bp + ".norm2", h),
                           ctx, heads)
        ffh = _ln(sd, bp + ".norm3", h)
        proj = _lin(sd, bp + ".ff.net.0.proj", ffh)
        a, gate = proj.chunk(2, dim=-1)
        h = h + _lin(sd, bp + ".ff.net.2", a * F.gelu(gate))
    if linear_proj:
        h = _lin(sd, p + ".proj_out", h)
        h = h.reshape(b, hh, ww, c).permute(0, 3, 1, 2)
    else:
        inner = h.shape[-1]
        h = h.reshape(b, hh, ww, inner).permute(0, 3, 1, 2)
        h = _conv(sd, p + ".proj_out", h, pad=0)
    return h + res


def torch_unet(sd, cfg, sample, t, ctx, text_embeds=None, time_ids=None):
    """Full tiny-UNet forward in torch, NCHW (mirrors unet.py:144-234)."""
    b = sample.shape[0]
    temb = _timestep_embedding(t.expand(b) if t.ndim == 0 else t,
                               cfg.block_out_channels[0])
    emb = _time_mlp(sd, "time_embedding", temb)
    if cfg.addition_embed_type == "text_time":
        tid = _timestep_embedding(time_ids.reshape(-1), cfg.addition_time_embed_dim)
        tid = tid.reshape(b, -1)
        add = torch.cat([text_embeds, tid], dim=-1)
        emb = emb + _time_mlp(sd, "add_embedding", add)

    h = _conv(sd, "conv_in", sample)
    skips = [h]
    n_blocks = len(cfg.block_out_channels)
    for i, out_ch in enumerate(cfg.block_out_channels):
        heads = cfg.num_attention_heads[i]
        for j in range(cfg.layers_per_block):
            h = _resnet(sd, f"down_blocks.{i}.resnets.{j}", h, emb)
            if cfg.cross_attention_blocks[i]:
                h = _transformer2d(sd, f"down_blocks.{i}.attentions.{j}", h, ctx,
                                   heads, cfg.transformer_layers_per_block[i],
                                   cfg.use_linear_projection)
            skips.append(h)
        if i < n_blocks - 1:
            h = _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", h, stride=2, pad=1)
            skips.append(h)

    h = _resnet(sd, "mid_block.resnets.0", h, emb)
    if cfg.transformer_layers_per_block[-1] > 0:
        h = _transformer2d(sd, "mid_block.attentions.0", h, ctx,
                           cfg.num_attention_heads[-1],
                           cfg.transformer_layers_per_block[-1],
                           cfg.use_linear_projection)
    h = _resnet(sd, "mid_block.resnets.1", h, emb)

    for i in range(n_blocks):
        level = n_blocks - 1 - i
        heads = cfg.num_attention_heads[level]
        for j in range(cfg.layers_per_block + 1):
            h = torch.cat([h, skips.pop()], dim=1)
            h = _resnet(sd, f"up_blocks.{i}.resnets.{j}", h, emb)
            if cfg.cross_attention_blocks[level]:
                h = _transformer2d(sd, f"up_blocks.{i}.attentions.{j}", h, ctx,
                                   heads, cfg.transformer_layers_per_block[level],
                                   cfg.use_linear_projection)
        if i < n_blocks - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", h)

    c = h.shape[1]
    h = _gn(sd, "conv_norm_out", h, 32 if c % 32 == 0 else c // 4, 1e-5)
    return _conv(sd, "conv_out", F.silu(h))


def _vae_self_attention(sd, p, x, groups):
    b, c, hh, ww = x.shape
    res = x
    h = _gn(sd, p + ".group_norm", x, groups, 1e-6)
    h = h.permute(0, 2, 3, 1).reshape(b, hh * ww, c)
    q = _lin(sd, p + ".to_q", h)[:, None]          # [b, 1 head, hw, c]
    k = _lin(sd, p + ".to_k", h)[:, None]
    v = _lin(sd, p + ".to_v", h)[:, None]
    o = F.scaled_dot_product_attention(q, k, v)[:, 0]
    o = _lin(sd, p + ".to_out.0", o)
    return res + o.reshape(b, hh, ww, c).permute(0, 3, 1, 2)


def torch_vae_encode(sd, cfg, x):
    """AutoencoderKL.encode → (mean, logvar) in torch (mirrors vae.py:58-79,
    123-126)."""
    g = cfg.norm_groups
    h = _conv(sd, "encoder.conv_in", x)
    for i, _ in enumerate(cfg.block_out_channels):
        for j in range(cfg.layers_per_block):
            h = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", h, None, g)
        if i < len(cfg.block_out_channels) - 1:
            h = F.pad(h, (0, 1, 0, 1))
            h = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv", h,
                      stride=2, pad=0)
    h = _resnet(sd, "encoder.mid_block.resnets.0", h, None, g)
    h = _vae_self_attention(sd, "encoder.mid_block.attentions.0", h, g)
    h = _resnet(sd, "encoder.mid_block.resnets.1", h, None, g)
    h = F.silu(_gn(sd, "encoder.conv_norm_out", h, g, 1e-6))
    h = _conv(sd, "encoder.conv_out", h)
    moments = _conv(sd, "quant_conv", h, pad=0)
    mean, logvar = moments.chunk(2, dim=1)
    return mean, torch.clamp(logvar, -30.0, 20.0)


def torch_vae_decode(sd, cfg, z):
    g = cfg.norm_groups
    h = _conv(sd, "post_quant_conv", z, pad=0)
    h = _conv(sd, "decoder.conv_in", h)
    h = _resnet(sd, "decoder.mid_block.resnets.0", h, None, g)
    h = _vae_self_attention(sd, "decoder.mid_block.attentions.0", h, g)
    h = _resnet(sd, "decoder.mid_block.resnets.1", h, None, g)
    rev = list(reversed(cfg.block_out_channels))
    for i, _ in enumerate(rev):
        for j in range(cfg.layers_per_block + 1):
            h = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", h, None, g)
        if i < len(rev) - 1:
            h = F.interpolate(h, scale_factor=2, mode="nearest")
            h = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", h)
    h = F.silu(_gn(sd, "decoder.conv_norm_out", h, g, 1e-6))
    return _conv(sd, "decoder.conv_out", h)


# --------------------------------------------------------------------------
# tests
# --------------------------------------------------------------------------

def _nchw(x_nhwc):
    return torch.from_numpy(np.ascontiguousarray(
        np.asarray(x_nhwc).transpose(0, 3, 1, 2)))


def _nhwc(x_nchw):
    return x_nchw.numpy().transpose(0, 2, 3, 1)


def test_unet_forward_matches_torch_mirror():
    cfg = TINY_UNET
    module = UNet2DCondition(cfg)
    rng = np.random.default_rng(0)
    sample = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, cfg.cross_attention_dim)),
                      jnp.float32)
    t = jnp.asarray([519, 41], jnp.int32)
    params = module.init(jax.random.key(0), sample, t, ctx)["params"]
    ours = np.asarray(module.apply({"params": params}, sample, t, ctx))

    sd = export_state_dict(params, "unet")
    theirs = torch_unet(sd, cfg, _nchw(sample), torch.tensor([519, 41]),
                        torch.from_numpy(np.asarray(ctx)))
    np.testing.assert_allclose(ours, _nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_sdxl_unet_forward_matches_torch_mirror():
    """Linear-projection transformers + text_time additional embeddings
    (pooled embeds + micro-conditioning time-ids, reference main.py:362-408)."""
    cfg = TINY_SDXL_UNET
    module = UNet2DCondition(cfg)
    rng = np.random.default_rng(1)
    sample = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((2, 7, cfg.cross_attention_dim)),
                      jnp.float32)
    pooled = jnp.asarray(rng.standard_normal((2, 32)), jnp.float32)
    tids = jnp.asarray(rng.integers(0, 1024, (2, 6)), jnp.float32)
    t = jnp.asarray(700, jnp.int32)
    params = module.init(jax.random.key(0), sample, t, ctx,
                         text_embeds=pooled, time_ids=tids)["params"]
    ours = np.asarray(module.apply({"params": params}, sample, t, ctx,
                                   text_embeds=pooled, time_ids=tids))

    sd = export_state_dict(params, "unet")
    theirs = torch_unet(sd, cfg, _nchw(sample), torch.tensor(700),
                        torch.from_numpy(np.asarray(ctx)),
                        text_embeds=torch.from_numpy(np.asarray(pooled)),
                        time_ids=torch.from_numpy(np.asarray(tids)))
    np.testing.assert_allclose(ours, _nhwc(theirs), rtol=1e-5, atol=1e-5)


def test_vae_encode_decode_matches_torch_mirror():
    cfg = TINY_VAE
    module = AutoencoderKL(cfg)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)), jnp.float32)
    params = module.init(jax.random.key(0), x, jax.random.key(1))["params"]

    mean, logvar = module.apply({"params": params}, x, method="encode")
    sd = export_state_dict(params, "vae")
    t_mean, t_logvar = torch_vae_encode(sd, cfg, _nchw(x))
    np.testing.assert_allclose(np.asarray(mean), _nhwc(t_mean),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar), _nhwc(t_logvar),
                               rtol=1e-5, atol=1e-5)

    z = jnp.asarray(rng.standard_normal((2, 8, 8, cfg.latent_channels)),
                    jnp.float32)
    dec = module.apply({"params": params}, z, method="decode")
    t_dec = torch_vae_decode(sd, cfg, _nchw(z))
    np.testing.assert_allclose(np.asarray(dec), _nhwc(t_dec),
                               rtol=1e-5, atol=1e-5)


def test_unet_chunked_attention_matches_torch_mirror(monkeypatch):
    """The KV-chunked online-softmax attention path (the one production uses
    at ≥512² — api.py:_train_attn_chunk) must agree with the same oracle, not
    just with the fused path."""
    import tml_image_editing_defense_tpu.models.layers as L

    monkeypatch.setattr(L, "MIN_CHUNKED_SEQ", 16)
    from dataclasses import replace

    cfg = replace(TINY_UNET, attn_kv_chunk=8)
    module = UNet2DCondition(cfg)
    rng = np.random.default_rng(3)
    sample = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    ctx = jnp.asarray(rng.standard_normal((1, 7, cfg.cross_attention_dim)),
                      jnp.float32)
    t = jnp.asarray(123, jnp.int32)
    params = module.init(jax.random.key(0), sample, t, ctx)["params"]
    ours = np.asarray(module.apply({"params": params}, sample, t, ctx))

    sd = export_state_dict(params, "unet")
    theirs = torch_unet(sd, TINY_UNET, _nchw(sample), torch.tensor(123),
                        torch.from_numpy(np.asarray(ctx)))
    np.testing.assert_allclose(ours, _nhwc(theirs), rtol=1e-4, atol=1e-5)
