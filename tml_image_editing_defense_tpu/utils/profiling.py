"""Profiling/tracing (SURVEY.md §5: the reference has only ad-hoc
``time.time()`` prints in legacy playgrounds; the rebuild formalizes this).

- :func:`trace` — context manager around ``jax.profiler`` producing a
  TensorBoard-loadable trace of the jitted hot path.
- :class:`StepTimer` — cheap steady-state step timing with compile-time
  separation (first call is reported separately, not averaged in).
- :func:`sync` — force completion of the program producing an array.
  REQUIRED at the end of every timed region on remote-dispatch backends:
  ``jax.block_until_ready`` does not reliably block on the axon TPU plugin
  (dispatch is async; only host value fetches wait for execution).
- :func:`device_memory_stats` — live HBM usage of the attack program.
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tid_trace", host_tracer_level: int = 2):
    """``with trace("/tmp/trace"): step(...)`` → profile in TensorBoard."""
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


_ENTROPY = int(time.time_ns()) & 0x7FFFFFFF


def measure_seed(i: int) -> int:
    """Process-entropy-salted seed for MEASURED benchmark calls.

    The axon runtime value-caches executions on (executable, args) across
    runs; with the persistent compile cache and deterministic fast_init
    params, a re-run probe with constant keys replays as ~2 ms no-ops.
    Derive every measured call's key/seed from this instead of a literal."""
    return _ENTROPY ^ ((0x9E3779B9 * (i + 1)) & 0x7FFFFFFF)


def measure_key(i: int):
    """`jax.random.key(measure_seed(i))` — see :func:`measure_seed`."""
    return jax.random.key(measure_seed(i))


def sync(x) -> float:
    """Wait for the execution producing ``x`` and return its first element.

    An execution materializes all outputs atomically, so fetching one
    element of one output waits for the whole program — the only wait
    primitive that is reliable on every backend (``block_until_ready`` is a
    no-op on async remote-dispatch plugins; measured on the axon TPU
    tunnel: a 34 s program "blocked" in 0.000 s and the wait moved to the
    first value fetch).  Use as the last statement of a timed region:

        with StepTimer() as t:       # or a bare time.time() pair
            _, aux = step(params, x, data, key)
            sync(aux["avg_loss"])
    """
    import jax.numpy as jnp

    return float(jnp.asarray(x).reshape(-1)[0])


class StepTimer:
    """Accumulates per-step wall times; first (compile) step kept separate."""

    def __init__(self):
        self.compile_time: Optional[float] = None
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self._t0
        if self.compile_time is None:
            self.compile_time = dt
        else:
            self.times.append(dt)

    @property
    def steady_state(self) -> Optional[float]:
        return min(self.times) if self.times else None

    def summary(self) -> Dict[str, float]:
        out = {"compile_s": self.compile_time or 0.0, "n_steps": len(self.times)}
        if self.times:
            out.update(
                steady_min_s=min(self.times),
                steady_mean_s=sum(self.times) / len(self.times),
            )
        return out


def device_memory_stats(device=None) -> Dict[str, int]:
    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats()
        return {
            "bytes_in_use": stats.get("bytes_in_use", -1),
            "peak_bytes_in_use": stats.get("peak_bytes_in_use", -1),
            "bytes_limit": stats.get("bytes_limit", -1),
        }
    except Exception:
        return {}
