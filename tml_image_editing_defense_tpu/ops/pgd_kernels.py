"""Pallas TPU kernels for the PGD hot path.

The per-iteration elementwise chain — sign/normalized gradient step, ε-ball
projection, value clamp (reference ``main.py:248-276``) — fused into
single-dispatch kernels with zero intermediate HBM traffic:

- :func:`pgd_linf_update` — tiled, any size: one pass of VPU work per tile.
- :func:`pgd_l2_update` — single-block kernel holding the whole image in VMEM
  (a 512²×3 f32 image is 3 MB; ×3 operands ≈ 9 MB < 16 MB VMEM), computing
  both global reductions (grad norm, ε-ball renorm) in-kernel so the L2 step
  is one dispatch instead of XLA's reduce→broadcast→reduce→broadcast chain.
  Falls back to the jnp path when operands exceed the VMEM budget (SDXL
  1024²).

All kernels are wrapped with shape-generic reshaping (TPU wants ≥2D,
lane-dim 128) and carry a pure-jnp reference implementation used as fallback
off-TPU and as the oracle in tests.

(A scalar-prefetch noise-pool-gather kernel existed in round 1 but was never
on the hot path — XLA already fuses the ``dynamic_index_in_dim`` + q-sample
chain in attack/forward.py — so it was removed rather than carried dead.)
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tml_image_editing_defense_tpu.attack.pgd import (
    l2_perturbation_step,
    linf_perturbation_step,
)

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024  # bytes of operand data we allow in one block


def _as_2d(x: jnp.ndarray):
    """Flatten to (rows, 128) padding the tail; returns (arr2d, orig_size)."""
    n = x.size
    rows = -(-n // _LANE)
    flat = jnp.pad(x.reshape(-1), (0, rows * _LANE - n))
    return flat.reshape(rows, _LANE), n


def _from_2d(y2d: jnp.ndarray, n: int, shape, dtype):
    return y2d.reshape(-1)[:n].reshape(shape).astype(dtype)


def _on_tpu() -> bool:
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# L∞ update
# ---------------------------------------------------------------------------


def _linf_kernel(scal_ref, xadv_ref, grad_ref, src_ref, out_ref):
    dt = xadv_ref.dtype
    step, eps, mn, mx = (scal_ref[0].astype(dt), scal_ref[1].astype(dt),
                         scal_ref[2].astype(dt), scal_ref[3].astype(dt))
    x = xadv_ref[:] - jnp.sign(grad_ref[:]) * step
    src = src_ref[:]
    x = jnp.minimum(jnp.maximum(x, src - eps), src + eps)
    out_ref[:] = jnp.clip(x, mn, mx)


def pgd_linf_update(
    x_adv: jnp.ndarray,
    grad: jnp.ndarray,
    x_src: jnp.ndarray,
    step_size: float,
    eps: float,
    min_value: float,
    max_value: float,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused L∞ PGD update (reference main.py:270-274), one dispatch."""
    if not (_on_tpu() or interpret):
        return linf_perturbation_step(
            x_adv, grad, x_src, step_size, eps, min_value, max_value
        )
    dt = x_adv.dtype
    a2, n = _as_2d(x_adv)
    g2, _ = _as_2d(grad)
    s2, _ = _as_2d(x_src)
    scal = jnp.asarray([step_size, eps, min_value, max_value], jnp.float32)
    rows = a2.shape[0]
    tile = min(rows, 2048)
    grid = (-(-rows // tile),)
    out = pl.pallas_call(
        _linf_kernel,
        out_shape=jax.ShapeDtypeStruct(a2.shape, dt),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, _LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(scal, a2, g2, s2)
    return _from_2d(out, n, x_adv.shape, dt)


# ---------------------------------------------------------------------------
# L2 update (single block, in-kernel global reductions)
# ---------------------------------------------------------------------------


def _l2_kernel(scal_ref, xadv_ref, grad_ref, src_ref, out_ref):
    # reductions + scalar math in f32: Mosaic cannot legalize scalar bf16
    # sqrt, and f32 norms are more accurate anyway
    dt = xadv_ref.dtype
    step, eps, mn, mx = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    g = grad_ref[:].astype(jnp.float32)
    gnorm = jnp.sqrt(jnp.sum(g * g))
    x = xadv_ref[:].astype(jnp.float32) - (g / (gnorm + 1e-10)) * step
    src = src_ref[:].astype(jnp.float32)
    d = x - src
    dnorm = jnp.sqrt(jnp.sum(d * d))
    factor = jnp.where(dnorm > eps, eps / (dnorm + 1e-7), 1.0)
    out_ref[:] = jnp.clip(src + d * factor, mn, mx).astype(dt)


def _l2_masked_kernel(scal_ref, xadv_ref, grad_ref, src_ref, mask_ref, out_ref):
    dt = xadv_ref.dtype
    step, eps, mn, mx = (scal_ref[0], scal_ref[1], scal_ref[2], scal_ref[3])
    g = grad_ref[:].astype(jnp.float32)
    gnorm = jnp.sqrt(jnp.sum(g * g))
    x = xadv_ref[:].astype(jnp.float32) - (g / (gnorm + 1e-10)) * mask_ref[:].astype(jnp.float32) * step
    src = src_ref[:].astype(jnp.float32)
    d = x - src
    dnorm = jnp.sqrt(jnp.sum(d * d))
    factor = jnp.where(dnorm > eps, eps / (dnorm + 1e-7), 1.0)
    out_ref[:] = jnp.clip(src + d * factor, mn, mx).astype(dt)


def pgd_l2_update(
    x_adv: jnp.ndarray,
    grad: jnp.ndarray,
    x_src: jnp.ndarray,
    step_size: float,
    eps: float,
    min_value: float,
    max_value: float,
    mask: Optional[jnp.ndarray] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused L2 PGD update (reference main.py:254-268) for batch-1 images.

    Matches ``torch.renorm(dim=0)`` semantics for batch 1 (one slice = the
    whole tensor).  Larger batches or VMEM-exceeding images use the jnp path.
    """
    n_operands = 4 if mask is not None else 3
    too_big = x_adv.size * x_adv.dtype.itemsize * n_operands > _VMEM_BUDGET
    if x_adv.shape[0] != 1 or too_big or not (_on_tpu() or interpret):
        return l2_perturbation_step(
            x_adv, grad, x_src, step_size, eps, min_value, max_value, mask
        )
    dt = x_adv.dtype
    a2, n = _as_2d(x_adv)
    g2, _ = _as_2d(grad)
    s2, _ = _as_2d(x_src)
    scal = jnp.asarray([step_size, eps, min_value, max_value], jnp.float32)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if mask is not None:
        m2, _ = _as_2d(jnp.broadcast_to(mask, x_adv.shape).astype(dt))
        out = pl.pallas_call(
            _l2_masked_kernel,
            out_shape=jax.ShapeDtypeStruct(a2.shape, dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 4,
            out_specs=vspec,
            interpret=interpret,
        )(scal, a2, g2, s2, m2)
    else:
        out = pl.pallas_call(
            _l2_kernel,
            out_shape=jax.ShapeDtypeStruct(a2.shape, dt),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 3,
            out_specs=vspec,
            interpret=interpret,
        )(scal, a2, g2, s2)
    return _from_2d(out, n, x_adv.shape, dt)


def fused_perturbation_step(norm_type: str, **kw) -> jnp.ndarray:
    """Pallas-fused dispatcher mirroring :func:`attack.pgd.perturbation_step`.

    Mask semantics match the reference and the jnp path exactly: the
    segmentation mask applies on the L2 branch only (main.py:260-261 vs the
    unmasked L∞ branch at main.py:270-274)."""
    if norm_type == "l2":
        return pgd_l2_update(**kw)
    if norm_type == "linf":
        kw.pop("mask", None)
        return pgd_linf_update(**kw)
    raise ValueError(f"unknown norm_type {norm_type!r}")
