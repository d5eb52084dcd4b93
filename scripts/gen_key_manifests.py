"""Generate diffusers/transformers state-dict key+shape manifests.

These manifests are the OFFLINE proxy for loading real SD-1.5 / SDXL
checkpoints (reference model loading, main.py:278-309): they enumerate every
parameter key and torch shape the real checkpoints contain, generated
INDEPENDENTLY of this package's converter —

- text encoders: instantiated through ``transformers`` (installed) with the
  real configs and dumped from ``state_dict()`` — a true oracle;
- UNet / VAE: enumerated from the known diffusers ``UNet2DConditionModel`` /
  ``AutoencoderKL`` module structure (diffusers itself is not installed in
  this image), parameterized exactly like the real configs.

tests/test_convert.py asserts ``export_key_shapes(full-config template)``
matches these manifests exactly, so any conversion-name drift fails CI
without needing weights.

Run: ``python scripts/gen_key_manifests.py`` (writes tests/manifests/*.json).
"""

from __future__ import annotations

import json
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "tests" / "manifests"


# ---------------------------------------------------------------------------
# UNet2DConditionModel (diffusers layout)
# ---------------------------------------------------------------------------


def unet_manifest(
    in_channels: int,
    out_channels: int,
    block_out: tuple,
    layers_per_block: int,
    cross_attn: tuple,            # True ⇒ CrossAttnDownBlock2D at that index
    tf_layers: tuple,             # transformer_blocks per attention
    heads: tuple,
    cross_dim: int,
    linear_proj: bool,
    add_embedding: bool = False,
    add_embed_in_dim: int = 0,
) -> dict:
    m = {}
    temb = block_out[0] * 4

    def p(key, shape):
        m[key] = list(shape)

    def resnet(prefix, cin, cout, time_emb=True):
        p(f"{prefix}.norm1.weight", (cin,)); p(f"{prefix}.norm1.bias", (cin,))
        p(f"{prefix}.conv1.weight", (cout, cin, 3, 3)); p(f"{prefix}.conv1.bias", (cout,))
        if time_emb:
            p(f"{prefix}.time_emb_proj.weight", (cout, temb))
            p(f"{prefix}.time_emb_proj.bias", (cout,))
        p(f"{prefix}.norm2.weight", (cout,)); p(f"{prefix}.norm2.bias", (cout,))
        p(f"{prefix}.conv2.weight", (cout, cout, 3, 3)); p(f"{prefix}.conv2.bias", (cout,))
        if cin != cout:
            p(f"{prefix}.conv_shortcut.weight", (cout, cin, 1, 1))
            p(f"{prefix}.conv_shortcut.bias", (cout,))

    def transformer(prefix, ch, n_layers, n_heads):
        inner = ch
        p(f"{prefix}.norm.weight", (ch,)); p(f"{prefix}.norm.bias", (ch,))
        if linear_proj:
            p(f"{prefix}.proj_in.weight", (inner, ch))
        else:
            p(f"{prefix}.proj_in.weight", (inner, ch, 1, 1))
        p(f"{prefix}.proj_in.bias", (inner,))
        for k in range(n_layers):
            b = f"{prefix}.transformer_blocks.{k}"
            for n in ("norm1", "norm2", "norm3"):
                p(f"{b}.{n}.weight", (inner,)); p(f"{b}.{n}.bias", (inner,))
            p(f"{b}.attn1.to_q.weight", (inner, inner))
            p(f"{b}.attn1.to_k.weight", (inner, inner))
            p(f"{b}.attn1.to_v.weight", (inner, inner))
            p(f"{b}.attn1.to_out.0.weight", (inner, inner))
            p(f"{b}.attn1.to_out.0.bias", (inner,))
            p(f"{b}.attn2.to_q.weight", (inner, inner))
            p(f"{b}.attn2.to_k.weight", (inner, cross_dim))
            p(f"{b}.attn2.to_v.weight", (inner, cross_dim))
            p(f"{b}.attn2.to_out.0.weight", (inner, inner))
            p(f"{b}.attn2.to_out.0.bias", (inner,))
            p(f"{b}.ff.net.0.proj.weight", (inner * 8, inner))
            p(f"{b}.ff.net.0.proj.bias", (inner * 8,))
            p(f"{b}.ff.net.2.weight", (inner, inner * 4))
            p(f"{b}.ff.net.2.bias", (inner,))
        if linear_proj:
            p(f"{prefix}.proj_out.weight", (ch, inner))
        else:
            p(f"{prefix}.proj_out.weight", (ch, inner, 1, 1))
        p(f"{prefix}.proj_out.bias", (ch,))

    n = len(block_out)
    p("conv_in.weight", (block_out[0], in_channels, 3, 3))
    p("conv_in.bias", (block_out[0],))
    p("time_embedding.linear_1.weight", (temb, block_out[0]))
    p("time_embedding.linear_1.bias", (temb,))
    p("time_embedding.linear_2.weight", (temb, temb))
    p("time_embedding.linear_2.bias", (temb,))
    if add_embedding:
        p("add_embedding.linear_1.weight", (temb, add_embed_in_dim))
        p("add_embedding.linear_1.bias", (temb,))
        p("add_embedding.linear_2.weight", (temb, temb))
        p("add_embedding.linear_2.bias", (temb,))

    # down blocks
    for i in range(n):
        cin = block_out[i - 1] if i > 0 else block_out[0]
        cout = block_out[i]
        for j in range(layers_per_block):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
        if cross_attn[i]:
            for j in range(layers_per_block):
                transformer(f"down_blocks.{i}.attentions.{j}", cout, tf_layers[i], heads[i])
        if i < n - 1:
            p(f"down_blocks.{i}.downsamplers.0.conv.weight", (cout, cout, 3, 3))
            p(f"down_blocks.{i}.downsamplers.0.conv.bias", (cout,))

    # mid block (always cross-attn in these configs)
    ch = block_out[-1]
    resnet("mid_block.resnets.0", ch, ch)
    transformer("mid_block.attentions.0", ch, tf_layers[-1] if tf_layers[-1] else 1, heads[-1])
    resnet("mid_block.resnets.1", ch, ch)

    # up blocks (diffusers channel bookkeeping)
    rev = list(reversed(block_out))
    rev_cross = list(reversed(cross_attn))
    rev_tf = list(reversed(tf_layers))
    rev_heads = list(reversed(heads))
    output_channel = rev[0]
    for i in range(n):
        prev_output = output_channel
        output_channel = rev[i]
        input_channel = rev[min(i + 1, n - 1)]
        for j in range(layers_per_block + 1):
            res_skip = input_channel if j == layers_per_block else output_channel
            rin = prev_output if j == 0 else output_channel
            resnet(f"up_blocks.{i}.resnets.{j}", rin + res_skip, output_channel)
        if rev_cross[i]:
            for j in range(layers_per_block + 1):
                transformer(f"up_blocks.{i}.attentions.{j}", output_channel,
                            rev_tf[i], rev_heads[i])
        if i < n - 1:
            p(f"up_blocks.{i}.upsamplers.0.conv.weight",
              (output_channel, output_channel, 3, 3))
            p(f"up_blocks.{i}.upsamplers.0.conv.bias", (output_channel,))

    p("conv_norm_out.weight", (block_out[0],)); p("conv_norm_out.bias", (block_out[0],))
    p("conv_out.weight", (out_channels, block_out[0], 3, 3))
    p("conv_out.bias", (out_channels,))
    return m


# ---------------------------------------------------------------------------
# AutoencoderKL (diffusers layout)
# ---------------------------------------------------------------------------


def vae_manifest(in_channels: int, out_channels: int, block_out: tuple,
                 layers_per_block: int, latent_channels: int) -> dict:
    m = {}

    def p(key, shape):
        m[key] = list(shape)

    def resnet(prefix, cin, cout):
        p(f"{prefix}.norm1.weight", (cin,)); p(f"{prefix}.norm1.bias", (cin,))
        p(f"{prefix}.conv1.weight", (cout, cin, 3, 3)); p(f"{prefix}.conv1.bias", (cout,))
        p(f"{prefix}.norm2.weight", (cout,)); p(f"{prefix}.norm2.bias", (cout,))
        p(f"{prefix}.conv2.weight", (cout, cout, 3, 3)); p(f"{prefix}.conv2.bias", (cout,))
        if cin != cout:
            p(f"{prefix}.conv_shortcut.weight", (cout, cin, 1, 1))
            p(f"{prefix}.conv_shortcut.bias", (cout,))

    def attention(prefix, ch):
        p(f"{prefix}.group_norm.weight", (ch,)); p(f"{prefix}.group_norm.bias", (ch,))
        for nm in ("to_q", "to_k", "to_v"):
            p(f"{prefix}.{nm}.weight", (ch, ch)); p(f"{prefix}.{nm}.bias", (ch,))
        p(f"{prefix}.to_out.0.weight", (ch, ch)); p(f"{prefix}.to_out.0.bias", (ch,))

    n = len(block_out)
    # encoder
    p("encoder.conv_in.weight", (block_out[0], in_channels, 3, 3))
    p("encoder.conv_in.bias", (block_out[0],))
    for i in range(n):
        cin = block_out[i - 1] if i > 0 else block_out[0]
        cout = block_out[i]
        for j in range(layers_per_block):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
        if i < n - 1:
            p(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight", (cout, cout, 3, 3))
            p(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias", (cout,))
    ch = block_out[-1]
    resnet("encoder.mid_block.resnets.0", ch, ch)
    attention("encoder.mid_block.attentions.0", ch)
    resnet("encoder.mid_block.resnets.1", ch, ch)
    p("encoder.conv_norm_out.weight", (ch,)); p("encoder.conv_norm_out.bias", (ch,))
    p("encoder.conv_out.weight", (2 * latent_channels, ch, 3, 3))
    p("encoder.conv_out.bias", (2 * latent_channels,))

    # decoder
    p("decoder.conv_in.weight", (ch, latent_channels, 3, 3))
    p("decoder.conv_in.bias", (ch,))
    resnet("decoder.mid_block.resnets.0", ch, ch)
    attention("decoder.mid_block.attentions.0", ch)
    resnet("decoder.mid_block.resnets.1", ch, ch)
    rev = list(reversed(block_out))
    output_channel = rev[0]
    for i in range(n):
        prev_output = output_channel
        output_channel = rev[i]
        for j in range(layers_per_block + 1):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev_output if j == 0 else output_channel, output_channel)
        if i < n - 1:
            p(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
              (output_channel, output_channel, 3, 3))
            p(f"decoder.up_blocks.{i}.upsamplers.0.conv.bias", (output_channel,))
    p("decoder.conv_norm_out.weight", (block_out[0],))
    p("decoder.conv_norm_out.bias", (block_out[0],))
    p("decoder.conv_out.weight", (out_channels, block_out[0], 3, 3))
    p("decoder.conv_out.bias", (out_channels,))

    p("quant_conv.weight", (2 * latent_channels, 2 * latent_channels, 1, 1))
    p("quant_conv.bias", (2 * latent_channels,))
    p("post_quant_conv.weight", (latent_channels, latent_channels, 1, 1))
    p("post_quant_conv.bias", (latent_channels,))
    return m


# ---------------------------------------------------------------------------
# AutoencoderTiny (diffusers layout — madebyollin/taesd[xl], the universal
# trainer's preview decoder, old/train_noise.py:82)
# ---------------------------------------------------------------------------


def tiny_vae_manifest(
    in_channels: int = 3,
    out_channels: int = 3,
    latent_channels: int = 4,
    block_out: tuple = (64, 64, 64, 64),
    num_encoder_blocks: tuple = (1, 3, 3, 3),
    num_decoder_blocks: tuple = (3, 3, 3, 1),
) -> dict:
    """Enumerate diffusers ``AutoencoderTiny`` state-dict keys: flat
    ``nn.Sequential`` indices where parameter-free entries (activations,
    Upsample) still consume an index; blocks are conv.0/2/4 (+1×1 ``skip``
    only on channel change); stride-2 encoder entries and non-final decoder
    stage-exit convs are bias-free."""
    m = {}

    def p(key, shape):
        m[key] = list(shape)

    def block(prefix, cin, cout):
        p(f"{prefix}.conv.0.weight", (cout, cin, 3, 3)); p(f"{prefix}.conv.0.bias", (cout,))
        p(f"{prefix}.conv.2.weight", (cout, cout, 3, 3)); p(f"{prefix}.conv.2.bias", (cout,))
        p(f"{prefix}.conv.4.weight", (cout, cout, 3, 3)); p(f"{prefix}.conv.4.bias", (cout,))
        if cin != cout:
            p(f"{prefix}.skip.weight", (cout, cin, 1, 1))

    # encoder: [stage conv, blocks…]×n, final conv to latents
    idx = 0
    for i, n_blocks in enumerate(num_encoder_blocks):
        ch = block_out[i]
        if i == 0:
            p(f"encoder.layers.{idx}.weight", (ch, in_channels, 3, 3))
            p(f"encoder.layers.{idx}.bias", (ch,))
        else:
            p(f"encoder.layers.{idx}.weight", (ch, block_out[i - 1], 3, 3))
        idx += 1
        for _ in range(n_blocks):
            block(f"encoder.layers.{idx}", ch, ch)
            idx += 1
    p(f"encoder.layers.{idx}.weight", (latent_channels, block_out[-1], 3, 3))
    p(f"encoder.layers.{idx}.bias", (latent_channels,))

    # decoder: conv+act stem, then [blocks…, Upsample, conv]×n
    rev = list(reversed(block_out))
    p("decoder.layers.0.weight", (rev[0], latent_channels, 3, 3))
    p("decoder.layers.0.bias", (rev[0],))
    idx = 2                              # index 1 is the stem activation
    n_stages = len(num_decoder_blocks)
    for i, n_blocks in enumerate(num_decoder_blocks):
        is_final = i == n_stages - 1
        ch = rev[i]
        for _ in range(n_blocks):
            block(f"decoder.layers.{idx}", ch, ch)
            idx += 1
        if not is_final:
            idx += 1                     # nn.Upsample consumes an index
        out_ch = ch if not is_final else out_channels
        p(f"decoder.layers.{idx}.weight", (out_ch, ch, 3, 3))
        if is_final:
            p(f"decoder.layers.{idx}.bias", (out_ch,))
        idx += 1
    return m


# ---------------------------------------------------------------------------
# ISNet / briaai RMBG-1.4 (segmenter, reference main.py:316-322)
# ---------------------------------------------------------------------------


def isnet_manifest() -> dict:
    """Enumerate ``briaai/RMBG-1.4`` (BriaRMBG = ISNetDIS) state-dict keys
    from the known module structure: ``myrebnconv`` stem (conv/bn), RSU7..4F
    encoder stages, RSU decoder stages, six side heads.  BatchNorm buffers
    ``running_mean``/``running_var``/``num_batches_tracked`` appear in the
    real checkpoint; the converter maps the first two and ignores the
    counter (tests/test_isnet.py drops it before comparing)."""
    m = {}

    def p(key, shape):
        m[key] = list(shape)

    def bn(prefix, ch):
        p(f"{prefix}.weight", (ch,)); p(f"{prefix}.bias", (ch,))
        p(f"{prefix}.running_mean", (ch,)); p(f"{prefix}.running_var", (ch,))
        p(f"{prefix}.num_batches_tracked", ())

    def rebnconv(prefix, cin, cout):
        p(f"{prefix}.conv_s1.weight", (cout, cin, 3, 3))
        p(f"{prefix}.conv_s1.bias", (cout,))
        bn(f"{prefix}.bn_s1", cout)

    def rsu(prefix, height, cin, mid, cout):
        rebnconv(f"{prefix}.rebnconvin", cin, cout)
        rebnconv(f"{prefix}.rebnconv1", cout, mid)
        for i in range(2, height + 1):
            rebnconv(f"{prefix}.rebnconv{i}", mid, mid)
        for i in range(height - 1, 1, -1):
            rebnconv(f"{prefix}.rebnconv{i}d", 2 * mid, mid)
        rebnconv(f"{prefix}.rebnconv1d", 2 * mid, cout)

    def rsu4f(prefix, cin, mid, cout):
        rebnconv(f"{prefix}.rebnconvin", cin, cout)
        rebnconv(f"{prefix}.rebnconv1", cout, mid)
        for i in (2, 3, 4):
            rebnconv(f"{prefix}.rebnconv{i}", mid, mid)
        for i in (3, 2):
            rebnconv(f"{prefix}.rebnconv{i}d", 2 * mid, mid)
        rebnconv(f"{prefix}.rebnconv1d", 2 * mid, cout)

    # stem: myrebnconv(3, 64, stride=2) — children conv / bn
    p("conv_in.conv.weight", (64, 3, 3, 3)); p("conv_in.conv.bias", (64,))
    bn("conv_in.bn", 64)
    # encoder (in, mid, out): stage outputs feed the next stage via maxpool
    enc = [(7, 64, 32, 64), (6, 64, 32, 128), (5, 128, 64, 256),
           (4, 256, 128, 512)]
    for i, (h, cin, mid, cout) in enumerate(enc):
        rsu(f"stage{i + 1}", h, cin, mid, cout)
    rsu4f("stage5", 512, 256, 512)
    rsu4f("stage6", 512, 256, 512)
    # decoder: inputs are concat(upsampled deeper output, encoder skip)
    rsu4f("stage5d", 1024, 256, 512)
    rsu("stage4d", 4, 1024, 128, 256)
    rsu("stage3d", 5, 512, 64, 128)
    rsu("stage2d", 6, 256, 32, 64)
    rsu("stage1d", 7, 128, 16, 64)
    for i, ch in enumerate((64, 64, 128, 256, 512, 512)):
        p(f"side{i + 1}.weight", (1, ch, 3, 3)); p(f"side{i + 1}.bias", (1,))
    return m


# ---------------------------------------------------------------------------
# CLIP text encoders (oracle: transformers)
# ---------------------------------------------------------------------------


def clip_manifest(hidden: int, layers: int, heads: int, intermediate: int,
                  projection_dim: int = None) -> dict:
    from transformers import CLIPTextConfig, CLIPTextModel, CLIPTextModelWithProjection

    cfg = CLIPTextConfig(
        hidden_size=hidden, num_hidden_layers=layers, num_attention_heads=heads,
        intermediate_size=intermediate, vocab_size=49408,
        max_position_embeddings=77,
        projection_dim=projection_dim or hidden,
    )
    cls = CLIPTextModelWithProjection if projection_dim else CLIPTextModel
    model = cls(cfg)
    out = {}
    for k, v in model.state_dict().items():
        if k.endswith("position_ids"):      # non-param buffer in old versions
            continue
        out[k] = list(v.shape)
    return out


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    manifests = {
        # SD-1.5: runwayml/stable-diffusion-v1-5 (main.py:297-301)
        "sd15_unet": unet_manifest(
            4, 4, (320, 640, 1280, 1280), 2, (True, True, True, False),
            (1, 1, 1, 1), (8, 8, 8, 8), 768, linear_proj=False),
        # stabilityai/sd-vae-ft-mse (main.py:302) — same shape as SD VAE
        "sd15_vae": vae_manifest(3, 3, (128, 256, 512, 512), 2, 4),
        # openai/clip-vit-large-patch14 text encoder
        "sd15_text": clip_manifest(768, 12, 12, 3072),
        # SDXL base 1.0 (main.py:284-288)
        "sdxl_unet": unet_manifest(
            4, 4, (320, 640, 1280), 2, (False, True, True),
            (0, 2, 10), (5, 10, 20), 2048, linear_proj=True,
            add_embedding=True, add_embed_in_dim=2816),
        # madebyollin/sdxl-vae-fp16-fix (main.py:290) — SD VAE shape
        "sdxl_vae": vae_manifest(3, 3, (128, 256, 512, 512), 2, 4),
        "sdxl_text": clip_manifest(768, 12, 12, 3072),
        # OpenCLIP bigG text encoder (with projection)
        "sdxl_text_2": clip_manifest(1280, 32, 20, 5120, projection_dim=1280),
        # runwayml/stable-diffusion-inpainting UNet (9 input channels)
        "sd15_inpaint_unet": unet_manifest(
            9, 4, (320, 640, 1280, 1280), 2, (True, True, True, False),
            (1, 1, 1, 1), (8, 8, 8, 8), 768, linear_proj=False),
        # madebyollin/taesdxl preview decoder (old/train_noise.py:82);
        # madebyollin/taesd is architecturally identical
        "taesd_vae": tiny_vae_manifest(),
        # briaai/RMBG-1.4 segmenter (main.py:316-322)
        "rmbg_isnet": isnet_manifest(),
    }
    for name, m in manifests.items():
        path = OUT / f"{name}.json"
        path.write_text(json.dumps(m, indent=0, sort_keys=True))
        print(f"{name}: {len(m)} keys -> {path}")


if __name__ == "__main__":
    main()
