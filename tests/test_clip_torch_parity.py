"""Numerical parity of our linen CLIP text encoder against the real
torch ``transformers`` CLIPTextModel, with identical weights moved through
our exporter — validates attention/LayerNorm/embedding conventions, the
penultimate-layer tap, EOS pooling, and the text projection."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tml_image_editing_defense_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel
from tml_image_editing_defense_tpu.models.convert import export_state_dict

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def pair():
    cfg = CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_layers=2, num_heads=2,
        max_length=16, intermediate_size=64, hidden_act="quick_gelu",
        eos_token_id=999, projection_dim=32,
    )
    ours = CLIPTextModel(cfg)
    params = ours.init(jax.random.key(0), jnp.zeros((1, 16), jnp.int32))["params"]

    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=1000, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, max_position_embeddings=16,
        intermediate_size=64, hidden_act="quick_gelu",
        eos_token_id=999, bos_token_id=998, projection_dim=32,
    )
    theirs = transformers.CLIPTextModelWithProjection(hf_cfg).eval()
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in export_state_dict(params, "clip").items()}
    # HF position embedding lives under an extra ".weight"-holding module and
    # expects exactly our exported names; load non-strictly to tolerate
    # HF-side buffers (position_ids).
    missing, unexpected = theirs.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    assert all("position_ids" in m or m == "" for m in missing) or not missing, missing
    return cfg, ours, params, theirs


def _ids(cfg, seed=0):
    rng = np.random.default_rng(seed)
    b, t = 3, cfg.max_length
    ids = rng.integers(0, cfg.vocab_size - 2, (b, t)).astype(np.int32)
    ids[:, 0] = 998                       # BOS
    eos_pos = rng.integers(2, t, b)
    for i, p in enumerate(eos_pos):
        ids[i, p] = cfg.eos_token_id
        ids[i, p + 1:] = cfg.eos_token_id  # pad with EOS like CLIP tokenizers
    return ids


def test_final_hidden_matches(pair):
    cfg, ours, params, theirs = pair
    ids = _ids(cfg)
    final, penult, pooled = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        out = theirs.text_model(torch.from_numpy(ids).long(), output_hidden_states=True)
    np.testing.assert_allclose(
        np.asarray(final), out.last_hidden_state.numpy(), rtol=2e-4, atol=2e-5
    )
    # penultimate tap (SDXL conditioning) == hidden_states[-2]
    np.testing.assert_allclose(
        np.asarray(penult), out.hidden_states[-2].numpy(), rtol=2e-4, atol=2e-5
    )


def test_projected_pooled_matches(pair):
    cfg, ours, params, theirs = pair
    ids = _ids(cfg, seed=1)
    _, _, pooled = ours.apply({"params": params}, jnp.asarray(ids))
    with torch.no_grad():
        out = theirs(torch.from_numpy(ids).long())
    np.testing.assert_allclose(
        np.asarray(pooled), out.text_embeds.numpy(), rtol=2e-4, atol=2e-5
    )
