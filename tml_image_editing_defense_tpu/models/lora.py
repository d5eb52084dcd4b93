"""LoRA loading and offline fusion.

The reference fuses LCM-LoRA into the UNet at load time
(``pipeline.load_lora_weights(...); pipeline.fuse_lora()``,
``main.py:292-295, 305-308``) so the runtime graph is LoRA-free.  We do the
same, but as a pure param transformation: ``W' = W + scale·(B·A)`` applied to
our converted param tree — the jitted programs never see adapters.

Handles both common key layouts:
- PEFT/diffusers: ``unet.<module>.lora_A.weight`` / ``lora_B.weight``
- legacy diffusers: ``<module>.lora.down.weight`` / ``lora.up.weight``
(+ optional per-module ``alpha`` tensors, scaled as alpha/rank).
"""

from __future__ import annotations

import re
from typing import Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import traverse_util


_DOWN_PATTERNS = (".lora_A.weight", ".lora.down.weight", ".lora_down.weight")
_UP_FOR_DOWN = {
    ".lora_A.weight": ".lora_B.weight",
    ".lora.down.weight": ".lora.up.weight",
    ".lora_down.weight": ".lora_up.weight",
}


def collect_lora_pairs(
    state: Dict[str, np.ndarray],
) -> Dict[str, Tuple[np.ndarray, np.ndarray, float]]:
    """{diffusers module key → (A [r,in], B [out,r], scale)}."""
    pairs = {}
    for key in state:
        for down_pat in _DOWN_PATTERNS:
            if key.endswith(down_pat):
                module = key[: -len(down_pat)]
                up_key = module + _UP_FOR_DOWN[down_pat]
                if up_key not in state:
                    continue
                a = np.asarray(state[key])
                b = np.asarray(state[up_key])
                alpha_key = module + ".alpha"
                scale = 1.0
                if alpha_key in state:
                    scale = float(np.asarray(state[alpha_key])) / a.shape[0]
                module = module.removeprefix("unet.").removeprefix("lora_unet_")
                pairs[module] = (a, b, scale)
    return pairs


def _lora_delta(a: np.ndarray, b: np.ndarray, kernel_ndim: int) -> np.ndarray:
    """LoRA delta in OUR kernel layout.

    Dense (flax ``[in, out]``): torch factors A ``[r, in]``, B ``[out, r]`` →
    ``(B·A)^T``.

    Conv (flax HWIO ``[kh, kw, in, out]``): PEFT stores lora_A as a Conv2d
    with the target's kernel size — torch ``[r, in, kh, kw]`` — and lora_B as
    a 1×1 conv ``[out, r, 1, 1]``; the composed delta is
    ``Δ[o,i,kh,kw] = Σ_r B[o,r]·A[r,i,kh,kw]`` (what diffusers' fuse_lora
    materializes at main.py:292-295, 305-308), transposed to HWIO.
    """
    if kernel_ndim == 2:
        if a.ndim == 4:        # rank factors stored conv-style for a 1×1 proj
            a = a.reshape(a.shape[0], -1)
        if b.ndim == 4:
            b = b.reshape(b.shape[0], -1)
        return (b @ a).T                                   # [in, out]
    if kernel_ndim == 4:
        if a.ndim == 2:
            # 1×1 conv adapters are sometimes stored as plain matrices
            a = a[:, :, None, None]
        b2 = b.reshape(b.shape[0], b.shape[1])             # [out, r]
        delta = np.einsum("or,rikl->oikl", b2, a)          # torch OIHW
        return delta.transpose(2, 3, 1, 0)                 # HWIO
    raise ValueError(f"unsupported kernel ndim {kernel_ndim}")


def fuse_lora(
    params: dict,
    lora_state: Dict[str, np.ndarray],
    scale: float = 1.0,
    strict: bool = True,
) -> dict:
    """Return a new param tree with LoRA deltas fused into matching Dense
    AND Conv kernels (``W' = W + scale·alpha/r·Δ``), the pure-param analog of
    diffusers ``pipeline.fuse_lora()`` (main.py:292-295, 305-308).

    LCM-LoRA checkpoints carry adapters on conv1/conv2/conv_shortcut,
    up/downsampler convs and proj_in/proj_out in addition to the attention
    Denses — all are fused.  ``strict=True`` (default) fails loudly on any
    unmatched adapter: a partially-fused UNet is numerically wrong.
    """
    from tml_image_editing_defense_tpu.models.convert import _generic_key

    pairs = collect_lora_pairs(lora_state)
    flat = traverse_util.flatten_dict(params)
    used = set()
    out = {}
    for path, w in flat.items():
        if path[-1] != "kernel" or w.ndim not in (2, 4):
            out[path] = w
            continue
        key = _generic_key(path)[: -len(".weight")]
        if key in pairs:
            a, b, s = pairs[key]
            delta = _lora_delta(a, b, w.ndim).astype(np.asarray(w).dtype)
            out[path] = w + scale * s * jnp.asarray(delta)
            used.add(key)
        else:
            out[path] = w
    unused = set(pairs) - used
    if unused and strict:
        raise KeyError(f"{len(unused)} LoRA modules not matched, e.g. {sorted(unused)[:5]}")
    if unused:
        print(f"[lora] warning: {len(unused)} LoRA modules unmatched (e.g. {sorted(unused)[:3]})")
    return traverse_util.unflatten_dict(out)
