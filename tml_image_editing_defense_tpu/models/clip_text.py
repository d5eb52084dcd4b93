"""CLIP text encoders (SD-1.5 single encoder; SDXL dual encoders).

From-scratch linen implementation of the transformers ``CLIPTextModel`` /
``CLIPTextModelWithProjection`` forward the reference calls through
``pipeline.encode_prompt`` (``main.py:334-360``).  Supports:

- final-layer output after ``final_layer_norm`` (SD-1.5),
- penultimate hidden state (SDXL's ``clip_skip``-style conditioning),
- EOS-pooled + projected embedding (SDXL ``pooled_prompt_embeds``).

Prompt encoding is *setup-time* work in this framework: all prompt-bank
embeddings are computed once and stacked, so the jitted attack selects a
prompt with a gather instead of re-running the encoder (reference re-encodes
every iteration, ``main.py:185``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    intermediate_size: int = 3072
    hidden_act: str = "quick_gelu"     # "quick_gelu" (CLIP-L) | "gelu" (OpenCLIP-bigG)
    eos_token_id: int = 49407
    projection_dim: Optional[int] = None  # set for SDXL's second encoder


SD15_TEXT = CLIPTextConfig()
SDXL_TEXT_1 = CLIPTextConfig()          # CLIP-L, penultimate output
SDXL_TEXT_2 = CLIPTextConfig(
    hidden_size=1280, num_layers=32, num_heads=20, intermediate_size=5120,
    hidden_act="gelu", projection_dim=1280,
)
TINY_TEXT = CLIPTextConfig(
    vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
    max_length=16, intermediate_size=64, eos_token_id=999, projection_dim=32,
)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    # transformers "gelu" = exact erf form (OpenCLIP-bigG / SDXL encoder 2);
    # flax's default is the tanh approximation, ~4e-4 off.
    return lambda x: nn.gelu(x, approximate=False)


class CLIPLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        cfg = self.config
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        d = cfg.hidden_size
        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(h)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(h)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(h)
        b, t = h.shape[:2]
        hd = d // cfg.num_heads
        q = q.reshape(b, t, cfg.num_heads, hd)
        k = k.reshape(b, t, cfg.num_heads, hd)
        v = v.reshape(b, t, cfg.num_heads, hd)
        o = jax.nn.dot_product_attention(q, k, v, mask=mask)
        o = nn.Dense(d, dtype=self.dtype, name="out_proj")(o.reshape(b, t, d))
        x = x + o
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = nn.Dense(d, dtype=self.dtype, name="fc2")(h)
        return x + h


class CLIPTextModel(nn.Module):
    """Causal CLIP text transformer.

    ``__call__(ids)`` returns ``(final_hidden, penultimate_hidden, pooled)``:
    final is post-``final_layer_norm``; penultimate is the raw layer-(-2)
    output; pooled is the projected EOS-token embedding (projection applied
    iff ``projection_dim`` is configured).
    """

    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :t, :].astype(self.dtype)
        causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
        penultimate = x
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPLayer(cfg, dtype=self.dtype, name=f"layers_{i}")(x, causal)
        final = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_layer_norm")(x)
        eos_pos = jnp.argmax((input_ids == cfg.eos_token_id).astype(jnp.int32), axis=1)
        pooled = final[jnp.arange(b), eos_pos]
        if cfg.projection_dim is not None:
            pooled = nn.Dense(
                cfg.projection_dim, use_bias=False, dtype=self.dtype, name="text_projection"
            )(pooled)
        return final, penultimate, pooled
