"""Explicit RNG plumbing.

The reference mixes three host RNG streams — Python/NumPy prompt choice
(``main.py:85``), noise-pool index choice (``main.py:215``), and torch noise
draws (``main.py:41-45, 212``) — plus global torch seeding (``main.py:454``).
Here every stochastic decision is a ``jax.random`` key split, so the whole PGD
program is deterministic given one seed and safe inside jit (no host RNG on
the hot path).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def make_noise_pool(
    key: jax.Array,
    n_noise: int,
    latent_shape: Sequence[int],
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Fixed pool of latent noise tensors, stacked ``[n_noise, *latent_shape]``.

    Replaces the reference's list of ``randn_tensor(1,4,64,64)`` draws
    (``main.py:41-45``); stacking lets the jitted step select a pool entry
    with a gather instead of host indexing.
    """
    return jax.random.normal(key, (n_noise, *latent_shape), dtype)


def select_from_pool(key: jax.Array, pool: jnp.ndarray) -> jnp.ndarray:
    """Uniformly pick one pool entry (reference ``main.py:215``)."""
    idx = jax.random.randint(key, (), 0, pool.shape[0])
    return jax.lax.dynamic_index_in_dim(pool, idx, axis=0, keepdims=False)


def save_noise_pool(path: Path, pool: jnp.ndarray) -> None:
    """Persist the noise pool (reference uses ``torch.save``, ``main.py:619``;
    we use a portable .npz).

    Stored widened to float32: .npz cannot represent ml_dtypes.bfloat16
    (it round-trips as raw void bytes and ``load`` explodes), and
    bf16 → f32 is exact, so the fixed-noise artifact contract
    (``main.py:619-622``) is preserved bit-for-bit for both compute dtypes.
    """
    host = np.asarray(jax.device_get(pool))
    if host.dtype not in (np.float32, np.float64):
        host = host.astype(np.float32)
    np.savez(str(path), noises=host)


def load_noise_pool(path: Path, dtype=jnp.float32) -> jnp.ndarray:
    with np.load(str(path)) as f:
        return jnp.asarray(f["noises"], dtype)


class KeyStream:
    """Sequential key splitter for host-side orchestration code."""

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self, n: Optional[int] = None):
        if n is None:
            self._key, sub = jax.random.split(self._key)
            return sub
        self._key, *subs = jax.random.split(self._key, n + 1)
        return list(subs)


def per_step_keys(key: jax.Array, n_steps: int) -> jax.Array:
    """``[n_steps, 2]``-shaped stacked keys for a ``lax.scan`` over steps."""
    return jax.random.split(key, n_steps)
