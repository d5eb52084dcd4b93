"""Device-mesh utilities.

The reference has **no** distributed runtime — its only parallelism is a
hand-split image list pinned to two GPUs (``run_all.py:16-21``).  SURVEY.md
§2 maps that to first-class TPU equivalents: a ``jax.sharding.Mesh`` over ICI
with a ``data`` axis for image-parallel sweeps and a ``reps`` axis for EOT
gradient samples; collectives are XLA ``pmean`` over ICI.  These helpers
build the mesh and shard/replicate pytrees onto it.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: Canonical axis names: images across chips; EOT grad samples across chips.
DATA_AXIS = "data"
REPS_AXIS = "reps"


def make_mesh(
    axes: Optional[dict] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; default is a 1-D ``data`` mesh over all devices.

    ``axes`` maps axis name → size; sizes must multiply to the device count
    (a -1 size is inferred).
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if axes is None:
        axes = {DATA_AXIS: n}
    names = tuple(axes)
    sizes = list(axes.values())
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    if total > n or n % total:
        raise ValueError(
            f"mesh axes {dict(zip(names, sizes))} incompatible with {n} devices"
        )
    devices = devices[:total]            # explicit sub-mesh is allowed
    arr = mesh_utils.create_device_mesh(tuple(sizes), devices=devices)
    return Mesh(arr, names)


def shard_along(mesh: Mesh, tree, axis_name: str, dim: int = 0):
    """Place each array's ``dim`` on mesh axis ``axis_name`` (others replicated)."""

    def put(x):
        spec = [None] * x.ndim
        spec[dim] = axis_name
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
