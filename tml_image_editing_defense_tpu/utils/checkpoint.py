"""Attack-state checkpoint/resume.

The reference persists only final artifacts — adversarial PNG + noise pool
(``main.py:618-622``) — and reloads them before inference; that uint8 PNG
round-trip is part of the measured defense and is preserved by the api
layer.  This module adds what the reference lacks (SURVEY.md §5): mid-run
PGD-state checkpointing (X_adv, iteration, RNG key, noise pool) so long SDXL
immunizations survive preemption (the reference's SLURM script *requests* a
preemption signal it never handles, ``tml_project.slurm:7``).

Arrays are stored widened to float32 with their true dtype recorded
alongside: .npz cannot represent ml_dtypes.bfloat16 (it round-trips as raw
void bytes and ``load`` explodes with ``Dtype |V2 is not a valid JAX array
type`` — observed live when a bf16 SDXL rehearsal checkpoint was resumed),
bf16 → f32 is exact, and the load casts back so the resumed program sees the
exact signature (and values) the interrupted run used.
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _widen(arr: np.ndarray) -> Tuple[np.ndarray, str]:
    """(f32-safe array for npz, original dtype name to restore on load)."""
    name = jnp.dtype(arr.dtype).name
    if arr.dtype not in (np.float32, np.float64):
        arr = arr.astype(np.float32)
    return arr, name


def save_attack_state(
    path: Path,
    x_adv: jnp.ndarray,
    iteration: int,
    key: jax.Array,
    noise_pool: Optional[jnp.ndarray] = None,
) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    x_host, x_dt = _widen(np.asarray(jax.device_get(x_adv)))
    payload = {
        "x_adv": x_host,
        "x_adv_dtype": np.str_(x_dt),
        "iteration": np.asarray(iteration, np.int64),
        "key_data": np.asarray(jax.random.key_data(key)),
    }
    if noise_pool is not None:
        p_host, p_dt = _widen(np.asarray(jax.device_get(noise_pool)))
        payload["noise_pool"] = p_host
        payload["noise_pool_dtype"] = np.str_(p_dt)
    np.savez(str(path), **payload)


def _restore(f, name: str) -> jnp.ndarray:
    dt_key = f"{name}_dtype"
    dt = str(f[dt_key]) if dt_key in f else None
    return jnp.asarray(f[name], dt)


def load_attack_state(path: Path):
    """Returns (x_adv, iteration, key, noise_pool_or_None)."""
    with np.load(str(path)) as f:
        x_adv = _restore(f, "x_adv")
        iteration = int(f["iteration"])
        key = jax.random.wrap_key_data(jnp.asarray(f["key_data"]))
        pool = _restore(f, "noise_pool") if "noise_pool" in f else None
    return x_adv, iteration, key, pool
