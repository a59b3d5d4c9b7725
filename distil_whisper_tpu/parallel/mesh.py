"""Device mesh + logical-axis rules (GSPMD-native).

Replaces the reference's T5X partitioner (partitioner.py:150-965) with the
modern JAX idiom: one ``jax.sharding.Mesh`` over ``('data', 'model')``,
logical parameter axes (models/init.py:param_axes) mapped through a rule table
to ``NamedSharding``s, and ``jax.jit``'s in/out shardings instead of pjit
wrappers.  ``mesh_utils.create_device_mesh`` already performs the
topology-aware device ordering the reference hand-rolls from TPU (x,y,z,core)
coordinates (partitioner.py:219-292).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Logical axis -> mesh axis.  Semantics carried over from the reference rule
# table (partitioner.py:509-555): batch -> data; the fanout/vocab axes ->
# model; everything else replicated.
DEFAULT_RULES: Dict[str, Optional[str]] = {
    "batch": "data",
    # NB: Whisper vocab sizes (51864/51865) are odd / not divisible by
    # practical model-parallel degrees, so embeddings are replicated (132 MB
    # bf16 for large-v3 — cheap next to activations).
    "vocab": None,
    "mlp": "model",
    "heads": "model",
    "joined_kv": "model",
    "kv": None,
    "embed": None,
    "layers": None,
    "length": None,
    "stack": None,
    "unmodeled": None,
}

# 2-D sharding variant (params sharded over both axes, FSDP-style), the
# analogue of the reference's 2-D rule sets (partitioner.py:529-549).
RULES_2D: Dict[str, Optional[str]] = {
    **DEFAULT_RULES,
    "embed": "data",
}


def make_mesh(shape: Optional[Tuple[int, int]] = None,
              axis_names: Tuple[str, str] = ("data", "model"),
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh.  Default: all devices on 'data'."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n, 1)
    assert shape[0] * shape[1] == n, f"mesh {shape} != {n} devices"
    if n == 1:
        arr = np.asarray(devices).reshape(shape)
    else:
        arr = mesh_utils.create_device_mesh(shape, devices=devices)
    return Mesh(arr, axis_names)


def spec_for_axes(axes: Sequence[str],
                  rules: Dict[str, Optional[str]] = DEFAULT_RULES) -> P:
    return P(*(rules.get(a) for a in axes))


def shardings_for_tree(axes_tree: Any, mesh: Mesh,
                       rules: Dict[str, Optional[str]] = DEFAULT_RULES) -> Any:
    """Map a logical-axes tree -> NamedSharding tree (same structure)."""
    def to_sharding(axes):
        return NamedSharding(mesh, spec_for_axes(axes, rules))
    return jax.tree.map(to_sharding, axes_tree,
                        is_leaf=lambda x: isinstance(x, tuple))


def shard_params(params: Any, axes_tree: Any, mesh: Mesh,
                 rules: Dict[str, Optional[str]] = DEFAULT_RULES) -> Any:
    """Place a param tree on the mesh according to its logical axes."""
    shardings = shardings_for_tree(axes_tree, mesh, rules)
    return jax.tree.map(jax.device_put, params, shardings)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Batch-leading arrays: shard dim 0 over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    return jax.tree.map(
        lambda x: jax.device_put(x, data_sharding(mesh, x.ndim)), batch)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
