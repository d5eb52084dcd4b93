"""Native param-tree persistence.

Converted checkpoints (models/convert.py) are expensive to re-derive; these
helpers store the whole ``DiffusionModel.params`` tree as one msgpack file
(flax serialization) so production runs load weights in seconds.  For
sharded/multi-host setups prefer orbax via ``use_orbax=True``.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from flax import serialization


def save_params(path: Path, params: dict, use_orbax: bool = False) -> None:
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path.absolute(), params)
        ckptr.wait_until_finished()
        return
    params = jax.device_get(params)
    path.write_bytes(serialization.to_bytes(params))


def load_params(path: Path, template: dict, use_orbax: bool = False, dtype=None) -> dict:
    """Load into the structure of ``template`` (shape/dtype checked)."""
    path = Path(path)
    if use_orbax:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        out = ckptr.restore(path.absolute(), template)
    else:
        out = serialization.from_bytes(template, path.read_bytes())
    if dtype is not None:
        out = jax.tree.map(lambda x: jnp.asarray(x, dtype), out)
    return out
