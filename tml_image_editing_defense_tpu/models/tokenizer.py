"""Prompt tokenization.

Production path: wrap a local Hugging Face ``CLIPTokenizer`` directory (the
reference gets tokenizers implicitly through ``from_pretrained``,
``main.py:284-301``; this framework has no network access at runtime, so
tokenizer files must be on disk).  Test/bench path: a deterministic hash
tokenizer with the same interface, so the full pipeline runs without any
downloaded assets.
"""

from __future__ import annotations

import hashlib
from pathlib import Path
from typing import List, Sequence, Union

import numpy as np


class HashTokenizer:
    """Deterministic stand-in tokenizer: stable word-hash ids, BOS/EOS/pad
    framing identical to CLIP's (BOS, tokens…, EOS, pad with EOS-style id)."""

    def __init__(self, vocab_size: int = 49408, max_length: int = 77,
                 bos_id: int = None, eos_id: int = None):
        self.vocab_size = vocab_size
        self.model_max_length = max_length
        self.bos_id = vocab_size - 2 if bos_id is None else bos_id
        self.eos_id = vocab_size - 1 if eos_id is None else eos_id

    def _word_id(self, w: str) -> int:
        h = int.from_bytes(hashlib.sha1(w.encode()).digest()[:4], "little")
        return h % (self.vocab_size - 2)

    def __call__(self, text: Union[str, Sequence[str]], max_length: int = None) -> np.ndarray:
        if isinstance(text, str):
            text = [text]
        L = max_length or self.model_max_length
        out = np.full((len(text), L), self.eos_id, np.int32)
        for i, t in enumerate(text):
            ids = [self.bos_id] + [self._word_id(w) for w in t.lower().split()][: L - 2] + [self.eos_id]
            out[i, : len(ids)] = ids
        return out


class HFCLIPTokenizer:
    """Real CLIP BPE tokenizer loaded from a local directory."""

    def __init__(self, path: Union[str, Path], max_length: int = 77):
        from transformers import CLIPTokenizer  # torch-free import

        self._tok = CLIPTokenizer.from_pretrained(str(path))
        self.model_max_length = max_length
        self.vocab_size = self._tok.vocab_size
        self.bos_id = self._tok.bos_token_id
        self.eos_id = self._tok.eos_token_id

    def __call__(self, text: Union[str, Sequence[str]], max_length: int = None) -> np.ndarray:
        if isinstance(text, str):
            text = [text]
        L = max_length or self.model_max_length
        enc = self._tok(list(text), padding="max_length", max_length=L, truncation=True)
        return np.asarray(enc["input_ids"], np.int32)


def load_tokenizer(path_or_none, vocab_size: int = 49408, max_length: int = 77):
    """Local HF tokenizer if a directory is given, hash fallback otherwise."""
    if path_or_none is not None and Path(path_or_none).exists():
        return HFCLIPTokenizer(path_or_none, max_length)
    return HashTokenizer(vocab_size=vocab_size, max_length=max_length)
