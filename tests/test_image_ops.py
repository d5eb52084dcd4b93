"""Preprocessing parity vs torchvision (the reference's exact transform,
data/dataset.py:16-35), uint8 round-trip, device-side ops."""

import numpy as np
import pytest
import torch
from PIL import Image

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.core import image_ops


@pytest.fixture(scope="module")
def pil_img():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, (75, 111, 3), dtype=np.uint8).astype(np.uint8))


def _tv_resize_shorter(img, size):
    """torchvision Resize(size) on PIL semantics: shorter side -> size,
    other side scaled proportionally (round), PIL BILINEAR (antialiased)."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, int(size * h / w)
    else:
        new_w, new_h = int(size * w / h), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def _tv_center_crop(img, size):
    """torchvision CenterCrop integer math: top = (h - size) // 2 ... wait,
    torchvision uses round((h - size) / 2) == (h - size + 1) // 2 for odd
    differences?  F.center_crop: crop_top = int(round((image_height - crop_height) / 2.0)).
    """
    w, h = img.size
    top = int(round((h - size) / 2.0))
    left = int(round((w - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def test_preprocess_matches_torchvision_semantics(pil_img):
    ref_img = _tv_center_crop(_tv_resize_shorter(pil_img, 48), 48)
    ref = (np.asarray(ref_img, np.float32) / 255.0).transpose(2, 0, 1)[None]
    ref_norm = ref * 2.0 - 1.0
    ours = image_ops.preprocess_pil(pil_img, size=48, normalize=True)
    np.testing.assert_allclose(ours, ref_norm, atol=1e-6)
    ours_raw = image_ops.preprocess_pil(pil_img, size=48, normalize=False)
    np.testing.assert_allclose(ours_raw, ref, atol=1e-6)


def test_to_pil_quantization(pil_img):
    """to_pil must quantize exactly like ToPILImage: floor(x*255 + 0.5)."""
    x = image_ops.preprocess_pil(pil_img, size=48)
    ref = np.floor((np.clip(x[0] / 2 + 0.5, 0, 1) * 255) + 0.5).astype(np.uint8).transpose(1, 2, 0)
    ours = np.asarray(image_ops.to_pil(x))
    np.testing.assert_array_equal(ours, ref)


def test_uint8_roundtrip_is_quantization():
    x = jnp.asarray(np.linspace(-1, 1, 256 * 3).reshape(1, 3, 16, 16).astype(np.float32))
    q = image_ops.quantize_uint8_roundtrip(x)
    # idempotent and within one uint8 level
    q2 = image_ops.quantize_uint8_roundtrip(q)
    np.testing.assert_allclose(np.asarray(q), np.asarray(q2), atol=1e-7)
    assert np.max(np.abs(np.asarray(q) - np.asarray(x))) <= (1.0 / 255.0) + 1e-6


def test_device_resize_and_crop_shapes():
    x = jnp.zeros((2, 3, 60, 90))
    y = image_ops.resize_bilinear(x, 48)
    assert y.shape == (2, 3, 48, 72)
    z = image_ops.center_crop(y, 48)
    assert z.shape == (2, 3, 48, 48)
