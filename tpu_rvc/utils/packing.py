"""Parameter-tree packing: flatten a pytree of arrays into ONE device
buffer + a static unpack spec.

Per-call jit dispatch cost scales with the number of argument leaves
(validation/handle bookkeeping is per-buffer — ~50µs/leaf through the
remote-device tunnel, i.e. ~45ms for the synthesizer+HuBERT's ~900 tensors).
Packing turns that into a single buffer handoff; the unpack inside the
compiled graph is static slices+reshapes that XLA folds into layout
assignment.
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class PackSpec(NamedTuple):
    treedef: Any
    shapes: Tuple[Tuple[int, ...], ...]
    dtypes: Tuple[Any, ...]
    offsets: Tuple[int, ...]
    total: int


def pack_tree(tree, dtype=jnp.float32) -> Tuple[jax.Array, PackSpec]:
    """Flatten `tree` into one 1-D device array (cast to `dtype`)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    shapes, dtypes, offsets = [], [], []
    off = 0
    flats = []
    for leaf in leaves:
        arr = np.asarray(leaf)
        shapes.append(arr.shape)
        dtypes.append(arr.dtype)
        offsets.append(off)
        off += arr.size
        flats.append(arr.astype(np.dtype(dtype)).reshape(-1))
    flat = jnp.asarray(np.concatenate(flats) if flats
                       else np.zeros(0, np.float32))
    return flat, PackSpec(treedef, tuple(shapes), tuple(dtypes),
                          tuple(offsets), off)


def unpack_tree(flat: jax.Array, spec: PackSpec):
    """Rebuild the pytree from the packed buffer (trace-time static slices)."""
    leaves = []
    for shape, dt, off in zip(spec.shapes, spec.dtypes, spec.offsets):
        n = int(np.prod(shape)) if shape else 1
        leaf = jax.lax.dynamic_slice_in_dim(flat, off, n).reshape(shape)
        leaves.append(leaf.astype(dt))
    return jax.tree_util.tree_unflatten(spec.treedef, leaves)
