"""Weight-conversion round-trip on tiny presets (no real weights needed):
our params → torch-layout state dict → back must be exact, and the exported
key names must follow diffusers/transformers conventions."""

import jax
import numpy as np
import pytest

from tml_image_editing_defense_tpu.models import build_model
from tml_image_editing_defense_tpu.models.convert import (
    convert_state_dict,
    export_state_dict,
)
from tml_image_editing_defense_tpu.models.lora import fuse_lora


@pytest.fixture(scope="module")
def tiny():
    return build_model("tiny", key=jax.random.key(0))


@pytest.fixture(scope="module")
def tiny_sdxl():
    return build_model("tiny-sdxl", key=jax.random.key(1))


@pytest.mark.parametrize("part,kind", [("unet", "unet"), ("vae", "vae")])
def test_roundtrip(tiny, part, kind):
    params = tiny.params[part]
    sd = export_state_dict(params, kind)
    back = convert_state_dict(params, sd, kind, strict=True)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_roundtrip_clip(tiny):
    params = tiny.params["text"][0]
    sd = export_state_dict(params, "clip")
    back = convert_state_dict(params, sd, "clip", strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_exported_keys_follow_diffusers_conventions(tiny, tiny_sdxl):
    sd = export_state_dict(tiny.params["unet"], "unet")
    keys = set(sd)
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert "down_blocks.0.resnets.0.norm1.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.ff.net.0.proj.weight" in keys
    assert "down_blocks.0.attentions.0.transformer_blocks.0.attn2.to_out.0.weight" in keys
    assert "mid_block.resnets.0.conv1.weight" in keys
    assert "up_blocks.0.resnets.0.time_emb_proj.weight" in keys
    assert "down_blocks.0.downsamplers.0.conv.weight" in keys
    # SDXL add_embedding
    sdxl = export_state_dict(tiny_sdxl.params["unet"], "unet")
    assert "add_embedding.linear_1.weight" in sdxl

    vae = export_state_dict(tiny.params["vae"], "vae")
    assert "encoder.conv_in.weight" in vae
    assert "encoder.mid_block.attentions.0.to_q.weight" in vae
    assert "decoder.up_blocks.0.resnets.0.conv1.weight" in vae
    assert "quant_conv.weight" in vae and "post_quant_conv.weight" in vae

    clip = export_state_dict(tiny.params["text"][0], "clip")
    assert "text_model.embeddings.token_embedding.weight" in clip
    assert "text_model.encoder.layers.0.self_attn.q_proj.weight" in clip
    assert "text_model.encoder.layers.0.mlp.fc1.weight" in clip
    assert "text_model.final_layer_norm.weight" in clip


def test_conv_kernel_layout(tiny):
    """Conv kernels must export as OIHW (torch) from HWIO (flax)."""
    sd = export_state_dict(tiny.params["unet"], "unet")
    w = sd["conv_in.weight"]
    cfg = tiny.unet.config
    assert w.shape == (cfg.block_out_channels[0], cfg.in_channels, 3, 3)
    d = sd["down_blocks.0.resnets.0.time_emb_proj.weight"]
    assert d.shape == (cfg.block_out_channels[0], cfg.time_embed_dim)  # [out,in]


def test_lora_fusion(tiny):
    """W' = W + scale·(BA)^T on matched modules; unmatched warn, not crash."""
    params = tiny.params["unet"]
    key = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    from flax import traverse_util

    flat = traverse_util.flatten_dict(params)
    path = ("down_blocks_0_attentions_0", "transformer_blocks_0", "attn1", "to_q", "kernel")
    w = np.asarray(flat[path])
    rng = np.random.default_rng(0)
    r = 2
    a = rng.normal(size=(r, w.shape[0])).astype(np.float32)     # [r, in]
    b = rng.normal(size=(w.shape[1], r)).astype(np.float32)     # [out, r]
    lora_sd = {
        f"unet.{key}.lora_A.weight": a,
        f"unet.{key}.lora_B.weight": b,
        f"unet.{key}.alpha": np.asarray(4.0, np.float32),
        "unet.bogus.module.lora_A.weight": a,
        "unet.bogus.module.lora_B.weight": b,
    }
    fused = fuse_lora(params, lora_sd, scale=0.5)
    got = np.asarray(traverse_util.flatten_dict(fused)[path])
    expect = w + 0.5 * (4.0 / r) * (b @ a).T
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    # every other kernel untouched
    other = ("conv_in", "kernel")
    np.testing.assert_array_equal(
        np.asarray(traverse_util.flatten_dict(fused)[other]), np.asarray(flat[other])
    )
