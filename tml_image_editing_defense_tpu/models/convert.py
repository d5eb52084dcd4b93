"""Checkpoint conversion: HF/diffusers state dicts → our param pytrees.

The reference pulls torch weights from the Hub at runtime
(``main.py:278-309``); this framework loads the same checkpoints from local
``.safetensors`` files and converts them offline.  Because every linen module
here is named after its diffusers counterpart (see models/layers.py), the
mapping is a mechanical rename + transpose:

- our path elements are joined with '.', with ``_<digit>`` boundaries
  rewritten to ``.<digit>.`` (``down_blocks_0_attentions_0`` →
  ``down_blocks.0.attentions.0``);
- leaves: ``kernel``/``scale``/``embedding`` → ``weight``; Dense kernels are
  transposed [out,in]→[in,out], conv kernels [O,I,kh,kw]→[kh,kw,I,O];
- CLIP adds the transformers prefixes (``text_model.encoder.…``,
  ``self_attn.``, ``mlp.``).

Both directions are provided; the round-trip is tested on the tiny presets
so conversion correctness does not depend on having real weights in CI.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np
from flax import traverse_util

_NUM_RE = re.compile(r"_(\d+)(_|$)")

#: names where diffusers itself uses an underscore before the digit
_LITERAL_NAMES = frozenset({"linear_1", "linear_2"})


def _name_to_diffusers(name: str) -> str:
    """``down_blocks_0_attentions_0`` → ``down_blocks.0.attentions.0``."""
    if name in _LITERAL_NAMES:
        return name
    if name.startswith("mid_block_"):     # mid_block has no index of its own
        name = "mid_block." + name[len("mid_block_"):]
    return _NUM_RE.sub(
        lambda m: f".{m.group(1)}" + ("." if m.group(2) else ""), name
    )


def _join(path) -> str:
    parts = [_name_to_diffusers(p) for p in path]
    return ".".join(parts).replace("..", ".")


def _leaf_to_torch(leaf: str) -> str:
    return {"kernel": "weight", "scale": "weight", "embedding": "weight"}.get(leaf, leaf)


def _to_flax(arr: np.ndarray, leaf: str) -> np.ndarray:
    if leaf == "kernel":
        if arr.ndim == 2:
            return arr.T                       # Dense
        if arr.ndim == 4:
            return arr.transpose(2, 3, 1, 0)   # Conv OIHW → HWIO
    return arr


def _to_torch(arr: np.ndarray, leaf: str) -> np.ndarray:
    if leaf == "kernel":
        if arr.ndim == 2:
            return arr.T
        if arr.ndim == 4:
            return arr.transpose(3, 2, 0, 1)
    return arr


def _clip_key(path) -> str:
    """Our CLIP path → transformers CLIPTextModel key."""
    parts = list(path)
    leaf = _leaf_to_torch(parts[-1])
    if parts[0] == "token_embedding":
        return "text_model.embeddings.token_embedding.weight"
    if parts[0] == "position_embedding":
        return "text_model.embeddings.position_embedding.weight"
    if parts[0] == "final_layer_norm":
        return f"text_model.final_layer_norm.{leaf}"
    if parts[0] == "text_projection":
        return "text_projection.weight"
    m = re.match(r"layers_(\d+)", parts[0])
    if m:
        sub = parts[1]
        prefix = f"text_model.encoder.layers.{m.group(1)}"
        if sub in ("q_proj", "k_proj", "v_proj", "out_proj"):
            return f"{prefix}.self_attn.{sub}.{leaf}"
        if sub in ("fc1", "fc2"):
            return f"{prefix}.mlp.{sub}.{leaf}"
        return f"{prefix}.{sub}.{leaf}"        # layer_norm1/2
    raise KeyError(f"unmapped CLIP path {path}")


def _generic_key(path) -> str:
    leaf = _leaf_to_torch(path[-1])
    return f"{_join(path[:-1])}.{leaf}"


def convert_state_dict(
    template_params: dict,
    state_dict: Dict[str, np.ndarray],
    kind: str = "unet",
    strict: bool = True,
) -> dict:
    """Fill a copy of ``template_params`` (a randomly-initialized tree that
    fixes shapes/structure) from a torch-layout ``state_dict``.

    ``kind``: "unet" | "vae" | "clip".
    """
    flat = traverse_util.flatten_dict(template_params)
    out = {}
    missing = []
    for path, tmpl in flat.items():
        key = _clip_key(path) if kind == "clip" else _generic_key(path)
        if key not in state_dict:
            missing.append((path, key))
            continue
        arr = _to_flax(np.asarray(state_dict[key]), path[-1])
        if arr.shape != tmpl.shape:
            raise ValueError(f"shape mismatch for {key}: ckpt {arr.shape} vs model {tmpl.shape}")
        out[path] = jnp.asarray(arr, tmpl.dtype)
    if missing:
        msg = f"{len(missing)} unmapped params, e.g. {missing[:5]}"
        if strict:
            raise KeyError(msg)
        print(f"[convert] warning: {msg}; keeping template init for those")
        for path, _ in missing:
            out[path] = flat[path]
    return traverse_util.unflatten_dict(out)


def export_state_dict(params: dict, kind: str = "unet") -> Dict[str, np.ndarray]:
    """Inverse of :func:`convert_state_dict` (used for round-trip tests and
    for exporting immunization-ready checkpoints back to torch tooling)."""
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, arr in flat.items():
        key = _clip_key(path) if kind == "clip" else _generic_key(path)
        out[key] = _to_torch(np.asarray(arr), path[-1])
    return out


def export_key_shapes(params, kind: str = "unet") -> Dict[str, tuple]:
    """Torch-layout {key: shape} for a param tree OR a tree of
    ``jax.ShapeDtypeStruct`` (from ``eval_shape`` — no weights needed).

    This is what the real-checkpoint manifest tests compare against
    (tests/manifests/*.json): if any real-config parameter would go unmapped
    or mis-shaped by the converter, the comparison fails offline.
    """
    flat = traverse_util.flatten_dict(params)
    out = {}
    for path, arr in flat.items():
        key = _clip_key(path) if kind == "clip" else _generic_key(path)
        shape = tuple(arr.shape)
        if path[-1] == "kernel":
            if len(shape) == 2:
                shape = shape[::-1]                      # [in,out] → [out,in]
            elif len(shape) == 4:
                shape = (shape[3], shape[2], shape[0], shape[1])  # HWIO → OIHW
        out[key] = shape
    return out


def load_safetensors(path: Path) -> Dict[str, np.ndarray]:
    """Load a ``.safetensors`` file to numpy (no torch dependency)."""
    from safetensors.numpy import load_file

    return load_file(str(path))


def load_sd_checkpoint(
    model_dir: Path,
    template_params: dict,
    strict: bool = True,
) -> dict:
    """Load a full diffusers-layout model directory:
    ``unet/…safetensors``, ``vae/…``, ``text_encoder/…`` (+``text_encoder_2``).
    Returns a params dict matching :class:`DiffusionModel.params`.
    """
    model_dir = Path(model_dir)

    def load_dir(sub: str) -> Dict[str, np.ndarray]:
        d = model_dir / sub
        state: Dict[str, np.ndarray] = {}
        for f in sorted(d.glob("*.safetensors")):
            state.update(load_safetensors(f))
        if not state:
            raise FileNotFoundError(f"no .safetensors under {d}")
        return state

    out = {
        "unet": convert_state_dict(template_params["unet"], load_dir("unet"), "unet", strict),
        "vae": convert_state_dict(template_params["vae"], load_dir("vae"), "vae", strict),
    }
    texts = []
    texts.append(convert_state_dict(
        template_params["text"][0], load_dir("text_encoder"), "clip", strict))
    if len(template_params["text"]) > 1:
        texts.append(convert_state_dict(
            template_params["text"][1], load_dir("text_encoder_2"), "clip", strict))
    out["text"] = tuple(texts)
    return out
