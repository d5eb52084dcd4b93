"""Analytic model-FLOPs counting and MFU reporting.

The reference publishes no throughput or utilization numbers (SURVEY.md §6);
BASELINE.md's targets are wall-clock only.  For TPU-first engineering we
report MFU = useful model FLOPs / wall-clock / peak-chip-FLOPs, the standard
utilization metric for MXU-bound programs.

"Useful model FLOPs" are counted *analytically* from the traced forward
jaxpr: every ``conv_general_dilated`` and ``dot_general`` contributes
``2 × output_elements × reduction_size`` multiply-accumulate FLOPs.  Tracing
(``jax.make_jaxpr``) is exact for static-shaped programs and costs no
compile.  Backward passes are counted as 2× the forward (the universal
dense-layer identity: dL/dW and dL/dx each cost one forward-sized
contraction); rematerialized recompute is deliberately NOT counted — MFU
measures useful work, so remat shows up as lower MFU, as it should.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import numpy as np

#: Peak dense bf16 FLOP/s per chip, by device-kind substring (public specs).
PEAK_BF16_FLOPS = {
    "v6e": 918e12,          # Trillium
    "v5p": 459e12,
    "v5 lite": 197e12,      # v5e (device_kind reports "TPU v5 lite")
    "v5e": 197e12,
    "v4": 275e12,
    "v3": 123e12,
    "v2": 46e12,
}


def device_peak_flops(device=None) -> Optional[float]:
    """Peak bf16 FLOP/s of ``device`` (default: first device), or None if
    unknown (e.g. the CPU test mesh)."""
    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, peak in PEAK_BF16_FLOPS.items():
        if key in kind:
            return peak
    return None


def _dot_flops(eqn) -> int:
    (lc, rc), (lb, rb) = eqn.params["dimension_numbers"]
    lhs = eqn.invars[0].aval
    rhs = eqn.invars[1].aval
    k = math.prod(lhs.shape[i] for i in lc)
    b = math.prod(lhs.shape[i] for i in lb)
    m = lhs.size // max(k * b, 1)
    n = rhs.size // max(k * b, 1)
    return 2 * b * m * n * k


def _conv_flops(eqn) -> int:
    out = eqn.outvars[0].aval
    rhs = eqn.invars[1].aval
    dn = eqn.params["dimension_numbers"]
    c_out = rhs.shape[dn.rhs_spec[0]]           # kernel output-feature dim
    groups = eqn.params.get("feature_group_count", 1)
    reduction = rhs.size // max(c_out, 1)       # kh*kw*(C_in/groups)
    return 2 * out.size * reduction * 1         # groups already folded into rhs


def count_jaxpr_flops(jaxpr) -> int:
    """Matmul+conv FLOPs of a (possibly nested) jaxpr.  ``scan`` bodies are
    multiplied by trip count; ``while`` bodies are counted once (trip count
    is dynamic — keep differentiated loops as ``scan`` for exact counts);
    ``cond`` contributes the most expensive branch."""
    total = 0
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name == "dot_general":
            total += _dot_flops(eqn)
        elif name == "conv_general_dilated":
            total += _conv_flops(eqn)
        elif name == "scan":
            total += eqn.params["length"] * count_jaxpr_flops(eqn.params["jaxpr"].jaxpr)
        elif name == "while":
            total += count_jaxpr_flops(eqn.params["body_jaxpr"].jaxpr)
        elif name == "cond":
            total += max(
                (count_jaxpr_flops(b.jaxpr) for b in eqn.params["branches"]), default=0
            )
        else:
            for pname in ("jaxpr", "call_jaxpr"):
                sub = eqn.params.get(pname)
                if sub is not None:
                    total += count_jaxpr_flops(getattr(sub, "jaxpr", sub))
    return total


def count_fn_flops(fn: Callable, *args, **kwargs) -> int:
    """Forward model FLOPs of ``fn(*args, **kwargs)`` (trace only, no
    compile/execute)."""
    closed = jax.make_jaxpr(lambda *a: fn(*a, **kwargs))(*args)
    return count_jaxpr_flops(closed.jaxpr)


def training_flops(forward_flops: int) -> int:
    """fwd+bwd FLOPs when differentiating w.r.t. *weights and inputs*:
    bwd ≈ 2 × fwd (dL/dW + dL/dx each cost one forward-sized contraction)."""
    return 3 * forward_flops


def input_grad_flops(forward_flops: int) -> int:
    """fwd+bwd FLOPs when differentiating w.r.t. the *input only* — the PGD
    attack regime (reference ``torch.autograd.grad(loss, [cur_image])``,
    main.py:176).  No dL/dW terms exist (XLA dead-code-eliminates them), so
    the backward is one forward-sized contraction chain: total ≈ 2 × fwd."""
    return 2 * forward_flops


def mfu(model_flops: float, seconds: float, device=None) -> Optional[float]:
    """Model-FLOPs utilization in [0,1], or None on unknown hardware."""
    peak = device_peak_flops(device)
    if peak is None or seconds <= 0:
        return None
    return model_flops / seconds / peak


def pgd_step_model_flops(
    unet_fwd: int,
    vae_encode_fwd: int,
    vae_decode_fwd: int,
    grad_reps: int,
    image_loss: bool,
    vis_decode: bool = False,
) -> int:
    """Useful FLOPs of one PGD outer step (attack/pgd.py structure):

    - per rep: the K-step CFG UNet chain (``unet_fwd`` must already include
      the K-scan and the CFG batch) fwd+bwd, plus a VAE decode fwd+bwd when
      the loss needs pixels;
    - once per step: VAE encode fwd + its VJP (factored out of the rep loop),
      plus one visualization decode (fwd only) when the step was built with
      ``decode_vis=True`` (the hot path carries the latent instead —
      attack/pgd.py::make_eot_grad).

    All backwards are input-gradient-only (2× fwd): PGD differentiates the
    image, never the weights.
    """
    per_rep = input_grad_flops(unet_fwd)
    if image_loss:
        per_rep += input_grad_flops(vae_decode_fwd)
    return (
        grad_reps * per_rep
        + input_grad_flops(vae_encode_fwd)
        + (vae_decode_fwd if vis_decode else 0)
    )
