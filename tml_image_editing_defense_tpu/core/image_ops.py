"""Image preprocessing ops — host (PIL) and device (jax) variants.

Reference semantics: ``transforms.Resize(512, BILINEAR)`` (shorter side → 512,
antialiased) → ``CenterCrop(512)`` → ``ToTensor`` → ``Normalize([0.5],[0.5])``
(``data/dataset.py:16-35``), i.e. images live in [-1, 1], NCHW.

The host path uses PIL for exact parity with torchvision-on-PIL (file loading
is not on the hot path).  The device path provides the same ops as jittable
functions for in-graph preprocessing of already-resident batches, including
the uint8 PNG round-trip quantization that is deliberately part of the
reference's artifact contract (``main.py:618-621``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

# ---------------------------------------------------------------------------
# Host path (PIL): load → resize(shorter side) → center crop → [-1,1] NCHW
# ---------------------------------------------------------------------------


def resize_shorter_side(img: Image.Image, size: int) -> Image.Image:
    """torchvision ``Resize(size)`` semantics: shorter side → ``size``, long
    side ``int(size * long / short)`` (truncation, per torchvision
    ``_compute_resized_output_size``)."""
    w, h = img.size
    if w <= h:
        new_w, new_h = size, max(1, int(size * h / w))
    else:
        new_w, new_h = max(1, int(size * w / h)), size
    return img.resize((new_w, new_h), Image.BILINEAR)


def center_crop_pil(img: Image.Image, size: int) -> Image.Image:
    """torchvision ``CenterCrop`` offset math: ``int(round((dim - size)/2))``
    (round-half-even, matching ``F.center_crop``)."""
    w, h = img.size
    left = int(round((w - size) / 2.0))
    top = int(round((h - size) / 2.0))
    return img.crop((left, top, left + size, top + size))


def load_image(path: Union[str, Path], size: int = 512, normalize: bool = True) -> np.ndarray:
    """Load → resize/crop → float32 NCHW, in [-1,1] (normalize) or [0,1]."""
    img = Image.open(path).convert("RGB")
    return preprocess_pil(img, size=size, normalize=normalize)


def preprocess_pil(img: Image.Image, size: int = 512, normalize: bool = True) -> np.ndarray:
    img = center_crop_pil(resize_shorter_side(img, size), size)
    arr = np.asarray(img, np.float32) / 255.0            # HWC, [0,1]
    arr = arr.transpose(2, 0, 1)[None]                   # NCHW
    if normalize:
        arr = arr * 2.0 - 1.0
    return arr


def resize_crop_pil(img: Image.Image, size: int = 512) -> Image.Image:
    """PIL-in/PIL-out variant (the reference's eval transform, main.py:447-450)."""
    return center_crop_pil(resize_shorter_side(img, size), size)


def to_pil(x: Union[np.ndarray, jnp.ndarray], denormalize: bool = True) -> Image.Image:
    """NCHW/CHW float → PIL, matching ``T.ToPILImage()((x/2+0.5).clamp(0,1))``
    (reference ``main.py:118-126, 139-140``)."""
    x = np.asarray(jax.device_get(x))
    if x.ndim == 4:
        x = x[0]
    if denormalize:
        x = x / 2.0 + 0.5
    x = np.clip(x, 0.0, 1.0)
    # torchvision ToPILImage rounds half away via (x*255+0.5).floor on uint8 cast
    arr = (x * 255.0 + 0.5).astype(np.uint8).transpose(1, 2, 0)
    return Image.fromarray(arr)


# ---------------------------------------------------------------------------
# Device path (jittable)
# ---------------------------------------------------------------------------


def normalize(x: jnp.ndarray) -> jnp.ndarray:
    """[0,1] → [-1,1] (torchvision Normalize([0.5],[0.5]))."""
    return x * 2.0 - 1.0


def denormalize(x: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] → [0,1], clamped (reference main.py:139)."""
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)


def resize_bilinear(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Antialiased bilinear shorter-side resize of an NCHW batch (static shapes)."""
    n, c, h, w = x.shape
    if h <= w:
        new_h, new_w = size, max(1, int(size * w / h))
    else:
        new_h, new_w = max(1, int(size * h / w)), size
    return jax.image.resize(x, (n, c, new_h, new_w), method="bilinear", antialias=True)


def center_crop(x: jnp.ndarray, size: int) -> jnp.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    top, left = (h - size) // 2, (w - size) // 2
    return x[..., top : top + size, left : left + size]


def quantize_uint8_roundtrip(x: jnp.ndarray) -> jnp.ndarray:
    """uint8 quantize/dequantize of a [-1,1] image — the PNG round-trip that is
    part of the reference's measured defense (``main.py:618-621``)."""
    u8 = jnp.clip(jnp.round(denormalize(x) * 255.0), 0, 255).astype(jnp.uint8)
    return normalize(u8.astype(x.dtype) / 255.0)
