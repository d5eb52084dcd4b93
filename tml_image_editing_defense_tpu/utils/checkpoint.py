"""Attack-state checkpoint/resume.

The reference persists only final artifacts — adversarial PNG + noise pool
(``main.py:618-622``) — and reloads them before inference; that uint8 PNG
round-trip is part of the measured defense and is preserved by the api
layer.  This module adds what the reference lacks (SURVEY.md §5): mid-run
PGD-state checkpointing (X_adv, iteration, RNG key, noise pool) so long SDXL
immunizations survive preemption (the reference's SLURM script *requests* a
preemption signal it never handles, ``tml_project.slurm:7``).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def save_attack_state(
    path: Path,
    x_adv: jnp.ndarray,
    iteration: int,
    key: jax.Array,
    noise_pool: Optional[jnp.ndarray] = None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    payload = {
        "x_adv": np.asarray(jax.device_get(x_adv)),
        "iteration": np.asarray(iteration, np.int64),
        "key_data": np.asarray(jax.random.key_data(key)),
    }
    if noise_pool is not None:
        payload["noise_pool"] = np.asarray(jax.device_get(noise_pool))
    np.savez(str(path), **payload)


def load_attack_state(path: Path):
    """Returns (x_adv, iteration, key, noise_pool_or_None)."""
    with np.load(str(path)) as f:
        x_adv = jnp.asarray(f["x_adv"])
        iteration = int(f["iteration"])
        key = jax.random.wrap_key_data(jnp.asarray(f["key_data"]))
        pool = jnp.asarray(f["noise_pool"]) if "noise_pool" in f else None
    return x_adv, iteration, key, pool
