"""FSDP-style parameter sharding over the mesh "model" axis.

The reference trains with pure data parallelism (one process per GPU, DDP
all-reduce — /root/reference/infer/modules/train/train.py:102-217): every
replica holds the full G/D/optimizer state.  On TPU we can do strictly
better with the same step function: shard every parameter (and its Adam
moments) across the mesh's second axis, ZeRO-3 style, and let GSPMD insert
the all-gathers for the forward/backward and the reduce-scatters for the
update.  With a (data, model) mesh this composes with batch sharding into a
2-D dp x fsdp layout; per-chip state memory drops by ~n_model x, which is
what lets the ~72M-param RVC GAN (plus 2x Adam moments in fp32) ride small
ICI-connected slices at large batch.

No step-function changes are needed: jax.jit + GSPMD propagate the input
shardings.  Elementwise optimizer updates keep the sharded layout, so the
updated TrainState leaves stay distributed across steps.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def fsdp_spec(shape, n_shard: int, axis: str = "model") -> P:
    """PartitionSpec sharding the largest axis divisible by n_shard.

    Ties break toward the *last* qualifying axis (for conv kernels
    (K, Cin, Cout) that prefers Cout; for (Cin, Cout) matmuls likewise) so
    the all-gather happens on the output-channel axis, which XLA overlaps
    best with the producing matmul.  Leaves with no divisible axis (biases
    of odd length, scalars) stay replicated.
    """
    if n_shard <= 1 or not shape:
        return P()
    best = -1
    best_dim = 0
    for i, d in enumerate(shape):
        if d % n_shard == 0 and d >= best_dim and d > 1:
            best, best_dim = i, d
    if best < 0:
        return P()
    spec = [None] * len(shape)
    spec[best] = axis
    return P(*spec)


def fsdp_shardings(tree: Any, mesh: Mesh, axis: str = "model") -> Any:
    """A pytree of NamedShardings mirroring `tree`, FSDP-sharded on `axis`."""
    n = mesh.shape[axis]

    def one(leaf):
        shape = np.shape(leaf)
        return NamedSharding(mesh, fsdp_spec(shape, n, axis))

    return jax.tree.map(one, tree)


def shard_train_state(state, mesh: Mesh, axis: Optional[str] = "model"):
    """device_put a TrainState with FSDP param/optimizer sharding.

    `axis=None` (or a size-1 axis) degrades to full replication — the
    round-1 DP layout.  Optimizer moments share their parameter's spec
    because fsdp_spec is a pure function of the leaf shape.
    """
    if axis is None or mesh.shape.get(axis, 1) <= 1:
        return jax.device_put(state, NamedSharding(mesh, P()))
    return jax.device_put(state, fsdp_shardings(state, mesh, axis))


def assert_state_sharded(state, axis: str = "model",
                         min_sharded_frac: float = 0.9) -> float:
    """Sanity check: the fraction of parameter *elements* actually sharded
    over `axis` must exceed min_sharded_frac.  Returns the fraction."""
    total = 0
    sharded = 0
    for leaf in jax.tree.leaves(state.g_params) + jax.tree.leaves(
            state.d_params):
        n = int(np.prod(np.shape(leaf))) if np.shape(leaf) else 1
        total += n
        spec = getattr(leaf.sharding, "spec", None)
        if spec is not None and any(s == axis for s in spec if s):
            sharded += n
    frac = sharded / max(total, 1)
    if frac < min_sharded_frac:
        raise AssertionError(
            f"only {frac:.1%} of param elements sharded over '{axis}'")
    return frac
