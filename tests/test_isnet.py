"""ISNet (RMBG-1.4) port: torch-mirror forward parity, conversion manifest,
and mask-inference contract (reference segmenter, main.py:311-322).

The mirror below is a literal parametric transcription of the public
BriaRMBG/ISNetDIS module structure (REBNCONV = conv+bn+relu, RSU encoder
with ceil-mode maxpools, bilinear-upsample decoder, myrebnconv stem, side
heads) so the flax implementation is checked against real torch semantics
(BatchNorm eval mode, F.interpolate align_corners=False, ceil_mode pooling)
on the tiny config — the same oracle pattern as test_unet_vae_torch_parity.
"""

import json
from pathlib import Path

import numpy as np
import pytest
import torch
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.convert import (
    convert_state_dict,
    export_key_shapes,
)
from tml_image_editing_defense_tpu.models.isnet import (
    TINY_ISNET,
    build_isnet,
    isnet_param_shapes,
    salient_mask,
)


# ---------------------------------------------------------------------------
# torch mirror (BriaRMBG / ISNetDIS structure)
# ---------------------------------------------------------------------------


class TREBNCONV(tnn.Module):
    def __init__(self, cin, cout, dirate=1):
        super().__init__()
        self.conv_s1 = tnn.Conv2d(cin, cout, 3, padding=dirate, dilation=dirate)
        self.bn_s1 = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn_s1(self.conv_s1(x)))


def _up_like(src, tar):
    return F.interpolate(src, size=tar.shape[2:], mode="bilinear")


class TRSU(tnn.Module):
    def __init__(self, height, cin, mid, cout):
        super().__init__()
        self.height = height
        self.rebnconvin = TREBNCONV(cin, cout)
        self.add_module("rebnconv1", TREBNCONV(cout, mid))
        for i in range(2, height + 1):
            self.add_module(f"rebnconv{i}",
                            TREBNCONV(mid, mid, dirate=2 if i == height else 1))
        for i in range(height - 1, 1, -1):
            self.add_module(f"rebnconv{i}d", TREBNCONV(2 * mid, mid))
        self.add_module("rebnconv1d", TREBNCONV(2 * mid, cout))

    def forward(self, x):
        h = self.height
        hxin = self.rebnconvin(x)
        enc, hx = [], hxin
        for i in range(1, h):
            hx = getattr(self, f"rebnconv{i}")(hx)
            enc.append(hx)
            if i < h - 1:
                hx = F.max_pool2d(hx, 2, stride=2, ceil_mode=True)
        hx = getattr(self, f"rebnconv{h}")(hx)
        for i in range(h - 1, 0, -1):
            hx = getattr(self, f"rebnconv{i}d")(torch.cat([hx, enc[i - 1]], 1))
            if i > 1:
                hx = _up_like(hx, enc[i - 2])
        return hx + hxin


class TRSU4F(tnn.Module):
    def __init__(self, cin, mid, cout):
        super().__init__()
        self.rebnconvin = TREBNCONV(cin, cout)
        self.rebnconv1 = TREBNCONV(cout, mid, 1)
        self.rebnconv2 = TREBNCONV(mid, mid, 2)
        self.rebnconv3 = TREBNCONV(mid, mid, 4)
        self.rebnconv4 = TREBNCONV(mid, mid, 8)
        self.rebnconv3d = TREBNCONV(2 * mid, mid, 4)
        self.rebnconv2d = TREBNCONV(2 * mid, mid, 2)
        self.rebnconv1d = TREBNCONV(2 * mid, cout, 1)

    def forward(self, x):
        hxin = self.rebnconvin(x)
        hx1 = self.rebnconv1(hxin)
        hx2 = self.rebnconv2(hx1)
        hx3 = self.rebnconv3(hx2)
        hx4 = self.rebnconv4(hx3)
        hx3d = self.rebnconv3d(torch.cat([hx4, hx3], 1))
        hx2d = self.rebnconv2d(torch.cat([hx3d, hx2], 1))
        hx1d = self.rebnconv1d(torch.cat([hx2d, hx1], 1))
        return hx1d + hxin


class TMyRebnConv(tnn.Module):
    def __init__(self, cin, cout, stride=2):
        super().__init__()
        self.conv = tnn.Conv2d(cin, cout, 3, stride=stride, padding=1)
        self.bn = tnn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


def _t_stage(spec, cin):
    kind, mid, cout = spec
    if kind == "F":
        return TRSU4F(cin, mid, cout)
    return TRSU(int(kind), cin, mid, cout)


class TISNet(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        n = len(cfg.enc_stages)
        self.conv_in = TMyRebnConv(cfg.in_channels, cfg.stem_channels)
        cin = cfg.stem_channels
        for i, spec in enumerate(cfg.enc_stages):
            self.add_module(f"stage{i + 1}", _t_stage(spec, cin))
            cin = spec[2]
        deep = cfg.enc_stages[-1][2]
        for j, spec in enumerate(cfg.dec_stages):
            idx = n - 1 - j
            skip_ch = cfg.enc_stages[idx - 1][2]
            self.add_module(f"stage{idx}d", _t_stage(spec, deep + skip_ch))
            deep = spec[2]
        side_ch = [s[2] for s in cfg.dec_stages[::-1]] + [cfg.enc_stages[-1][2]]
        for i, ch in enumerate(side_ch):
            self.add_module(f"side{i + 1}",
                            tnn.Conv2d(ch, cfg.out_channels, 3, padding=1))

    def forward(self, x):
        cfg = self.cfg
        n = len(cfg.enc_stages)
        hx = self.conv_in(x)
        feats = []
        for i in range(n):
            hx = getattr(self, f"stage{i + 1}")(hx)
            feats.append(hx)
            if i < n - 1:
                hx = F.max_pool2d(hx, 2, stride=2, ceil_mode=True)
        dec = [feats[-1]]
        hx = feats[-1]
        for j in range(len(cfg.dec_stages)):
            idx = n - 1 - j
            skip = feats[idx - 1]
            hx = getattr(self, f"stage{idx}d")(
                torch.cat([_up_like(hx, skip), skip], 1))
            dec.append(hx)
        dec = dec[::-1]
        return [torch.sigmoid(_up_like(getattr(self, f"side{i + 1}")(f), x))
                for i, f in enumerate(dec)]


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def _randomized_state_dict(model, seed=0):
    """Random weights INCLUDING non-trivial BN running stats (fresh-init BN
    is identity-ish and would hide mean/var mapping bugs)."""
    g = torch.Generator().manual_seed(seed)
    sd = model.state_dict()
    for k, v in sd.items():
        if k.endswith("num_batches_tracked"):
            continue
        if k.endswith("running_var"):
            sd[k] = 0.5 + torch.rand(v.shape, generator=g)
        else:
            sd[k] = torch.randn(v.shape, generator=g) * 0.2
    model.load_state_dict(sd)
    return {k: v.numpy() for k, v in sd.items()}


def test_isnet_matches_torch_mirror():
    tm = TISNet(TINY_ISNET).eval()
    sd = _randomized_state_dict(tm, seed=1)

    template = build_isnet("tiny")
    params = convert_state_dict(template.params, sd, "vae", strict=True)

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32) * 0.4
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_out = template.module.apply({"params": params}, jnp.asarray(x))
    assert len(j_out) == len(t_out) == len(TINY_ISNET.enc_stages)
    for i, (j, t) in enumerate(zip(j_out, t_out)):
        np.testing.assert_allclose(
            np.asarray(j), t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-4, err_msg=f"side{i + 1}",
        )


def test_isnet_odd_size_ceil_pool_matches():
    """ceil_mode pooling parity on a non-power-of-two input (odd interior
    sizes force the padded-window path)."""
    tm = TISNet(TINY_ISNET).eval()
    sd = _randomized_state_dict(tm, seed=3)
    template = build_isnet("tiny")
    params = convert_state_dict(template.params, sd, "vae", strict=True)
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 52, 52, 3)).astype(np.float32) * 0.4  # 52→26→13→7
    with torch.no_grad():
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))[0]
    j_out = template.module.apply({"params": params}, jnp.asarray(x))[0]
    np.testing.assert_allclose(
        np.asarray(j_out), t_out.numpy().transpose(0, 2, 3, 1),
        rtol=1e-4, atol=1e-4,
    )


def test_rmbg_manifest_matches_full_template():
    """The full-size flax template must map 1:1 onto the real RMBG-1.4
    state dict (manifest enumerated independently in
    scripts/gen_key_manifests.py); BN's num_batches_tracked counters are the
    only checkpoint-side extras (the converter ignores extras)."""
    shapes = isnet_param_shapes("rmbg")
    exported = export_key_shapes(shapes, "vae")
    manifest = json.loads(
        (Path(__file__).parent / "manifests" / "rmbg_isnet.json").read_text()
    )
    counters = {k for k in manifest if k.endswith("num_batches_tracked")}
    assert counters, "manifest should carry the real checkpoint's BN counters"
    expected = {k: v for k, v in manifest.items() if k not in counters}
    missing = set(expected) - set(exported)
    extra = set(exported) - set(expected)
    assert not missing, f"unmapped checkpoint keys, e.g. {sorted(missing)[:5]}"
    assert not extra, f"model params not in checkpoint, e.g. {sorted(extra)[:5]}"
    bad = {k: (exported[k], tuple(expected[k])) for k in expected
           if tuple(exported[k]) != tuple(expected[k])}
    assert not bad, f"shape mismatches, e.g. {list(bad.items())[:5]}"
    # the real model is ~44M params — a structure-level sanity pin
    n_params = sum(int(np.prod(s)) for s in expected.values())
    assert 40e6 < n_params < 50e6, n_params


def test_salient_mask_contract(tmp_path):
    """salient_mask: RMBG pipeline pre/post around the flax forward →
    binary {0,1} float mask at the requested size."""
    bundle = build_isnet("tiny", key=jax.random.key(0))
    rng = np.random.default_rng(5)
    img = rng.uniform(0, 1, (48, 80, 3)).astype(np.float32)
    m = salient_mask(bundle, img, out_size=32, threshold=0.5)
    assert m.shape == (32, 32) and m.dtype == np.float32
    assert set(np.unique(m)) <= {0.0, 1.0}


def test_get_salient_mask_prefers_flax(tmp_path, monkeypatch):
    """aux_models.segment routes through the flax ISNet when an RMBG
    checkpoint (or injected bundle) is available — torch pipeline and
    heuristic remain fallbacks."""
    from PIL import Image

    from tml_image_editing_defense_tpu.aux_models import segment

    img_path = tmp_path / "img.png"
    rng = np.random.default_rng(6)
    Image.fromarray(rng.uniform(0, 255, (40, 40, 3)).astype(np.uint8)).save(img_path)

    bundle = build_isnet("tiny", key=jax.random.key(1))
    called = {"torch": False}
    monkeypatch.setattr(
        segment, "torch_salient_mask",
        lambda *a, **k: called.__setitem__("torch", True) or (_ for _ in ()).throw(RuntimeError()),
    )
    m = segment.get_salient_mask(img_path, size=32, isnet_bundle=bundle)
    assert m.shape == (32, 32) and set(np.unique(m)) <= {0.0, 1.0}
    assert not called["torch"], "flax path must win when a bundle is available"


def test_fast_init_running_stats_are_valid():
    """fast_init must give InferenceBatchNorm positive running_var (a normal
    draw fed rsqrt(var+eps) NaNs through every stage, zeroing the saliency
    mask) and zero running_mean."""
    import flax.traverse_util as tu

    b = build_isnet("tiny", fast_init=True)
    flat = tu.flatten_dict(b.params)
    rvs = [v for k, v in flat.items() if k[-1] == "running_var"]
    rms = [v for k, v in flat.items() if k[-1] == "running_mean"]
    assert rvs and rms
    assert min(float(v.min()) for v in rvs) > 0.0
    assert max(float(abs(m).max()) for m in rms) == 0.0
    img = np.random.default_rng(0).uniform(0, 1, (32, 32, 3)).astype(np.float32)
    sal = salient_mask(b, img, out_size=32)
    assert np.isfinite(sal).all()


def test_flax_salient_mask_geometry_matches_training_image(tmp_path):
    """The flax path must mask the SAME frame the attack perturbs: resize
    shorter side + center crop (core/image_ops.load_image) — NOT a square
    stretch of the full photo, which misaligns the mask for any non-square
    source (the torch path aligns by resize_crop_pil'ing the mask)."""
    from PIL import Image

    from tml_image_editing_defense_tpu.aux_models.segment import flax_salient_mask
    from tml_image_editing_defense_tpu.core.image_ops import resize_crop_pil

    rng = np.random.default_rng(7)
    wide = rng.uniform(0, 255, (40, 120, 3)).astype(np.uint8)   # 3:1 landscape
    p = tmp_path / "wide.png"
    Image.fromarray(wide).save(p)
    bundle = build_isnet("tiny", key=jax.random.key(2))

    got = flax_salient_mask(p, size=32, isnet_bundle=bundle)
    cropped = np.asarray(
        resize_crop_pil(Image.open(p).convert("RGB"), 32), np.float32) / 255.0
    expect = salient_mask(bundle, cropped, out_size=32)
    np.testing.assert_array_equal(got, expect)
