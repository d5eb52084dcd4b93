"""Salient-object segmentation (reference C12: RMBG-1.4 mask restricting the
perturbation to foreground regions, ``main.py:311-322``, applied on the L2
branch at ``main.py:260-261``).

Gated aux model: a local RMBG checkpoint runs on torch-cpu; without one, a
deterministic gradient-energy saliency heuristic produces an approximate
foreground mask so the masked-PGD code path stays usable offline (clearly an
approximation — swap in the real model for production parity).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Union

import numpy as np
from PIL import Image

from tml_image_editing_defense_tpu.core.image_ops import resize_crop_pil

_DEFAULT_MODEL = "briaai/RMBG-1.4"


def _heuristic_saliency(img: np.ndarray) -> np.ndarray:
    """Center-prior gradient-energy saliency, binarized at its mean.

    ``img``: HWC float [0,1].  Returns {0,1} float mask [H,W].
    """
    gray = img.mean(-1)
    gy, gx = np.gradient(gray)
    energy = np.hypot(gx, gy)
    # smooth with a cheap box blur (three passes ≈ gaussian)
    k = max(3, energy.shape[0] // 32) | 1
    for _ in range(3):
        c = np.cumsum(np.cumsum(np.pad(energy, k // 2, mode="edge"), 0), 1)
        energy = (
            c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        ) / (k * k)
    h, w = energy.shape
    yy, xx = np.mgrid[0:h, 0:w]
    center = np.exp(-(((yy - h / 2) / (h / 2)) ** 2 + ((xx - w / 2) / (w / 2)) ** 2))
    sal = energy * center
    return (sal > sal.mean()).astype(np.float32)


def get_salient_mask(
    image_path: Union[str, Path],
    size: int = 512,
    model_path: Optional[str] = None,
    threshold: float = 0.5,
) -> np.ndarray:
    """Foreground mask at ``[size, size]``, binarized at 0.5 like the
    reference (``main.py:320-321``).  Returns float32 {0,1} [H,W]."""
    pil = resize_crop_pil(Image.open(image_path).convert("RGB"), size)
    try:
        from transformers import pipeline as hf_pipeline

        src = model_path or _DEFAULT_MODEL
        pipe = hf_pipeline("image-segmentation", model=src, trust_remote_code=True,
                           local_files_only=model_path is not None)
        mask_img = pipe(str(image_path), return_mask=True)
        mask = np.asarray(resize_crop_pil(mask_img.convert("L"), size), np.float32) / 255.0
        return (mask > threshold).astype(np.float32)
    except Exception as e:
        print(f"[aux.segment] RMBG unavailable ({type(e).__name__}); using heuristic saliency")
        arr = np.asarray(pil, np.float32) / 255.0
        return _heuristic_saliency(arr)
