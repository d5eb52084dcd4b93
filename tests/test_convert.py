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
    with pytest.raises(KeyError):
        fuse_lora(params, lora_sd, scale=0.5)          # strict default: bogus module
    fused = fuse_lora(params, lora_sd, scale=0.5, strict=False)
    got = np.asarray(traverse_util.flatten_dict(fused)[path])
    expect = w + 0.5 * (4.0 / r) * (b @ a).T
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    # every other kernel untouched
    other = ("conv_in", "kernel")
    np.testing.assert_array_equal(
        np.asarray(traverse_util.flatten_dict(fused)[other]), np.asarray(flat[other])
    )


def test_conv_lora_fusion_matches_oracle(tiny):
    """4-D conv adapters (PEFT layout: down [r,in,kh,kw], up [out,r,1,1])
    must fuse as Δ[o,i,h,w] = Σ_r B[o,r]A[r,i,h,w] in HWIO — the conv part of
    LCM-LoRA (reference fuse_lora, main.py:292-295)."""
    from flax import traverse_util

    params = tiny.params["unet"]
    flat = traverse_util.flatten_dict(params)
    path = ("down_blocks_0_resnets_0", "conv1", "kernel")
    w = np.asarray(flat[path])                          # HWIO [3,3,in,out]
    kh, kw, cin, cout = w.shape
    rng = np.random.default_rng(1)
    r = 2
    a = rng.normal(size=(r, cin, kh, kw)).astype(np.float32)
    b = rng.normal(size=(cout, r, 1, 1)).astype(np.float32)
    key = "down_blocks.0.resnets.0.conv1"
    lora_sd = {
        f"unet.{key}.lora_A.weight": a,
        f"unet.{key}.lora_B.weight": b,
        f"unet.{key}.alpha": np.asarray(8.0, np.float32),
    }
    fused = fuse_lora(params, lora_sd, scale=1.0)
    got = np.asarray(traverse_util.flatten_dict(fused)[path])
    delta = np.einsum("or,rikl->oikl", b[:, :, 0, 0], a).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(got, w + (8.0 / r) * delta, rtol=1e-5, atol=1e-6)


def test_lora_every_kernel_fusable(tiny):
    """An LCM-LoRA-shaped adapter set (one pair per UNet kernel — attention
    Denses AND conv1/conv2/conv_shortcut/samplers/proj layers) must fuse with
    zero unmatched modules under strict=True: the name mapping covers every
    module type the real checkpoint touches (VERDICT round-1 item 4)."""
    from flax import traverse_util

    from tml_image_editing_defense_tpu.models.convert import _generic_key

    params = tiny.params["unet"]
    flat = traverse_util.flatten_dict(params)
    rng = np.random.default_rng(2)
    lora_sd = {}
    n_conv = n_dense = 0
    for path, w in flat.items():
        if path[-1] != "kernel":
            continue
        w = np.asarray(w)
        key = _generic_key(path)[: -len(".weight")]
        r = 2
        if w.ndim == 2:                                 # [in, out]
            a = rng.normal(size=(r, w.shape[0])).astype(np.float32)
            b = rng.normal(size=(w.shape[1], r)).astype(np.float32)
            n_dense += 1
        elif w.ndim == 4:                               # HWIO
            kh, kw, cin, cout = w.shape
            a = rng.normal(size=(r, cin, kh, kw)).astype(np.float32)
            b = rng.normal(size=(cout, r, 1, 1)).astype(np.float32)
            n_conv += 1
        else:
            continue
        lora_sd[f"unet.{key}.lora_A.weight"] = a
        lora_sd[f"unet.{key}.lora_B.weight"] = b
    assert n_conv > 3 and n_dense > 3                  # both families present
    fused = fuse_lora(params, lora_sd, scale=0.1, strict=True)  # must not raise
    for path, w in traverse_util.flatten_dict(fused).items():
        if path[-1] == "kernel":
            assert not np.array_equal(np.asarray(w), np.asarray(flat[path])), path


MANIFESTS = [
    ("sd15", "unet", "unet", "sd15_unet"),
    ("sd15", "vae", "vae", "sd15_vae"),
    ("sd15", ("text", 0), "clip", "sd15_text"),
    ("sd15-inpaint", "unet", "unet", "sd15_inpaint_unet"),
    ("sdxl", "unet", "unet", "sdxl_unet"),
    ("sdxl", "vae", "vae", "sdxl_vae"),
    ("sdxl", ("text", 0), "clip", "sdxl_text"),
    ("sdxl", ("text", 1), "clip", "sdxl_text_2"),
]


@pytest.mark.parametrize("family,part,kind,name", MANIFESTS)
def test_real_config_key_manifest(family, part, kind, name):
    """Every parameter of the REAL SD-1.5/SDXL checkpoints (key + torch
    shape, manifests generated independently of the converter — see
    scripts/gen_key_manifests.py) must be exactly what the full-size template
    exports: the offline proof that a real checkpoint converts with zero
    unmapped params (reference model loading, main.py:278-309)."""
    import json
    from pathlib import Path

    from tml_image_editing_defense_tpu.models.convert import export_key_shapes
    from tml_image_editing_defense_tpu.models.model_zoo import param_shapes

    shapes = param_shapes(family)
    tree = shapes[part] if isinstance(part, str) else shapes[part[0]][part[1]]
    exported = export_key_shapes(tree, kind)
    manifest = json.loads(
        (Path(__file__).parent / "manifests" / f"{name}.json").read_text()
    )
    missing = set(manifest) - set(exported)
    extra = set(exported) - set(manifest)
    assert not missing, f"{len(missing)} checkpoint keys unmapped, e.g. {sorted(missing)[:5]}"
    assert not extra, f"{len(extra)} model params not in checkpoint, e.g. {sorted(extra)[:5]}"
    bad = {k: (exported[k], tuple(manifest[k])) for k in manifest
           if tuple(exported[k]) != tuple(manifest[k])}
    assert not bad, f"{len(bad)} shape mismatches, e.g. {list(bad.items())[:5]}"
