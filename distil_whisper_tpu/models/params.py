"""Parameter-tree utilities.

The model is pure-functional: parameters live in nested dicts of ``jnp``
arrays.  Per-layer weights are **stacked along a leading ``layers`` axis** so
the forward pass is a single ``lax.scan`` over one super-block (fast compile,
natural remat unit) — the design the reference reaches via flax
``scan_with_axes`` + a scan<->unroll converter
(modeling_flax_whisper.py:543-651, :1270-1458); here stacked is simply the
native layout and HF (unrolled) checkpoints are stacked at load time.

Alongside the value tree we keep a parallel **axes tree**: a tuple of logical
axis names per parameter (T5X-style, cf. reference layers.py:417-480), which
``parallel.sharding`` maps onto a device mesh via the logical-axis rule table.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

PyTree = Any
Axes = Tuple[str, ...]


def tree_paths(tree: PyTree, sep: str = ".") -> Dict[str, Any]:
    """Flatten a nested dict into ``{'a.b.c': leaf}``."""
    out = {}

    def rec(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(f"{prefix}{sep}{k}" if prefix else k, v)
        else:
            out[prefix] = node

    rec("", tree)
    return out


def unflatten_paths(flat: Dict[str, Any], sep: str = ".") -> PyTree:
    tree: Dict[str, Any] = {}
    for path, leaf in flat.items():
        keys = path.split(sep)
        node = tree
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = leaf
    return tree


def cast_floating(tree: PyTree, dtype) -> PyTree:
    """Cast floating leaves to ``dtype`` (ints/bools untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, tree)


to_bf16 = lambda t: cast_floating(t, jnp.bfloat16)
to_fp32 = lambda t: cast_floating(t, jnp.float32)


def param_count(tree: PyTree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree))


def map_with_path(fn: Callable[[str, Any], Any], tree: PyTree) -> PyTree:
    """Map ``fn(path, leaf)`` over a nested-dict tree, preserving structure."""
    flat = tree_paths(tree)
    return unflatten_paths({p: fn(p, v) for p, v in flat.items()})
