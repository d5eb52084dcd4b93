"""Diffusion noise schedules.

The forward (noising) process shared by every sampler in this framework.
Semantics match the Stable Diffusion training schedule the reference relies on
through diffusers (scaled-linear betas, T=1000; consumed at reference
``main.py:216`` via ``scheduler.add_noise`` and throughout the samplers).

Everything here is a pure function of static configuration; the schedule is a
small pytree of ``[T]`` arrays that lives in device memory and is indexed with
gathers inside jitted programs — no host round-trips on the hot path.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class NoiseSchedule:
    """Precomputed cumulative-alpha table for a DDPM-style schedule.

    Attributes:
      alphas_cumprod: ``[T]`` float32 — cumulative product of (1 - beta_t).
      final_alpha_cumprod: scalar — alpha-bar used for "step to t < 0". With
        ``set_alpha_to_one=False`` (SD-1.5 / SDXL configs) this is
        ``alphas_cumprod[0]``.
      num_train_timesteps: static int, T.
      prediction_type: static str, "epsilon" | "v_prediction".
    """

    alphas_cumprod: jnp.ndarray
    final_alpha_cumprod: jnp.ndarray
    num_train_timesteps: int = flax.struct.field(pytree_node=False, default=1000)
    prediction_type: str = flax.struct.field(pytree_node=False, default="epsilon")

    # -- forward process -------------------------------------------------

    def add_noise(self, sample: jnp.ndarray, noise: jnp.ndarray, t) -> jnp.ndarray:
        """q(x_t | x_0): sqrt(abar_t) * x0 + sqrt(1 - abar_t) * eps.

        ``t`` may be a scalar or a batch of per-sample timesteps.
        (Reference call site: ``main.py:216``.)
        """
        abar = self.alphas_cumprod[t].astype(sample.dtype)
        while abar.ndim < sample.ndim:
            abar = abar[..., None]
        return jnp.sqrt(abar) * sample + jnp.sqrt(1.0 - abar) * noise

    def pred_original(self, sample: jnp.ndarray, model_output: jnp.ndarray, t) -> jnp.ndarray:
        """Recover x0-hat from the model output at timestep t."""
        abar = self.alphas_cumprod[t].astype(sample.dtype)
        while abar.ndim < sample.ndim:
            abar = abar[..., None]
        sqrt_abar = jnp.sqrt(abar)
        sqrt_one_minus = jnp.sqrt(1.0 - abar)
        if self.prediction_type == "epsilon":
            return (sample - sqrt_one_minus * model_output) / sqrt_abar
        elif self.prediction_type == "v_prediction":
            return sqrt_abar * sample - sqrt_one_minus * model_output
        raise ValueError(f"unknown prediction_type {self.prediction_type}")

    def to_epsilon(self, sample: jnp.ndarray, model_output: jnp.ndarray, t) -> jnp.ndarray:
        """Convert the model output to an epsilon prediction."""
        if self.prediction_type == "epsilon":
            return model_output
        abar = self.alphas_cumprod[t].astype(sample.dtype)
        while abar.ndim < sample.ndim:
            abar = abar[..., None]
        # v = sqrt(abar) eps - sqrt(1-abar) x0  =>  eps = sqrt(abar) v + sqrt(1-abar) x
        return jnp.sqrt(abar) * model_output + jnp.sqrt(1.0 - abar) * sample


def make_noise_schedule(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = False,
    prediction_type: str = "epsilon",
) -> NoiseSchedule:
    """Build the cumulative-alpha table.

    Defaults are the Stable Diffusion config (scaled-linear, 0.00085→0.012,
    T=1000) that every model family in the reference uses.
    """
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64)
            ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta_schedule {beta_schedule}")
    alphas_cumprod = np.cumprod(1.0 - betas).astype(np.float32)
    final = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    return NoiseSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod),
        final_alpha_cumprod=jnp.asarray(final),
        num_train_timesteps=num_train_timesteps,
        prediction_type=prediction_type,
    )
