"""Image captioning (reference C11: BLIP-2 "what is shown in the image?"
prompt prefixing, ``main.py:324-332``).

Gated aux model: :func:`torch_image_caption` runs a real BLIP-2 checkpoint
on torch-cpu (the reference's ``Salesforce/blip2-flan-t5-xl``, or any local
BLIP-2 directory — see docs/AUX_MODELS.md); :func:`get_image_caption` wraps
it and degrades to an empty caption, which reproduces the reference's
default behaviour (``default_source_image_caption=""``,
``add_image_caption_to_prompts=False``, configs.py:93, 137).
"""

from __future__ import annotations

from typing import Optional

from PIL import Image

_DEFAULT_MODEL = "Salesforce/blip2-flan-t5-xl"
_QUESTION = "what is shown in the image?"


def torch_image_caption(
    image: Image.Image,
    model_path: Optional[str] = None,
    max_new_tokens: int = 20,
) -> str:
    """Real BLIP-2 torch path (raises if the checkpoint is missing).

    Mirrors the reference call exactly: processor(question) → generate →
    batch_decode (main.py:324-332).
    """
    import torch
    from transformers import AutoProcessor, Blip2ForConditionalGeneration

    src = model_path or _DEFAULT_MODEL
    local = model_path is not None
    processor = AutoProcessor.from_pretrained(src, local_files_only=local)
    model = Blip2ForConditionalGeneration.from_pretrained(
        src, torch_dtype=torch.float32, local_files_only=local
    )
    inputs = processor(image, _QUESTION, return_tensors="pt")
    ids = model.generate(**inputs, max_new_tokens=max_new_tokens)
    return processor.batch_decode(ids, skip_special_tokens=True)[0].strip()


def get_image_caption(
    image: Image.Image,
    model_path: Optional[str] = None,
    max_new_tokens: int = 20,
) -> str:
    """BLIP-2 caption used as a prompt prefix (main.py:324-332)."""
    try:
        return torch_image_caption(image, model_path, max_new_tokens)
    except Exception as e:  # no weights / no network — degrade to no prefix
        print(f"[aux.caption] BLIP-2 unavailable ({type(e).__name__}); using empty caption")
        return ""
