"""Loss functions (reference ``losses/losses.py:6-41``), as pure jax fns."""

from __future__ import annotations

from typing import Sequence, Union

import jax.numpy as jnp


def lp_norm(x: jnp.ndarray, p: Union[int, float] = 2) -> jnp.ndarray:
    """torch.norm(x, p) over the flattened tensor."""
    x = x.reshape(-1)
    if p == 2:
        return jnp.sqrt(jnp.sum(x * x))
    if p == 1:
        return jnp.sum(jnp.abs(x))
    if p == jnp.inf or p == "inf":
        return jnp.max(jnp.abs(x))
    return jnp.sum(jnp.abs(x) ** p) ** (1.0 / p)


def lp_distance(x: jnp.ndarray, y: jnp.ndarray, p: Union[int, float] = 2) -> jnp.ndarray:
    """``LpDistance`` (losses/losses.py:19-27): ||x - y||_p, whole-tensor."""
    return lp_norm(x - y, p)


def lp_regularization(params, p: Union[int, float] = 2) -> jnp.ndarray:
    """``LpRegularization`` (losses/losses.py:6-16): sum of per-tensor norms."""
    if isinstance(params, jnp.ndarray):
        params = [params]
    return sum(lp_norm(t, p) for t in params)


def cosine_similarity_loss(x: jnp.ndarray, y: jnp.ndarray, axis: int = 1, eps: float = 1e-8) -> jnp.ndarray:
    """``CosineSimilarity`` (losses/losses.py:30-36): mean(cos_sim + 1)."""
    dot = jnp.sum(x * y, axis=axis)
    nx = jnp.sqrt(jnp.sum(x * x, axis=axis))
    ny = jnp.sqrt(jnp.sum(y * y, axis=axis))
    cos = dot / jnp.maximum(nx * ny, eps)
    return jnp.mean(cos + 1.0)


def perturbation_loss(adv_image: jnp.ndarray, source_image: jnp.ndarray) -> jnp.ndarray:
    """MSE between edited output and source (losses/losses.py:39-41; applied
    to the *decoded output* vs source at main.py:168)."""
    return jnp.mean((adv_image - source_image) ** 2)
