"""On-device kNN retrieval (replaces faiss, reference pipeline.py:126-138).

The reference round-trips GPU -> CPU -> faiss IVF (nprobe=1) -> GPU per
chunk.  Here the index lives in HBM and the search is an exact matmul top-k
fused into the conversion graph:

    d(q, x) = |q|^2 - 2 q.x + |x|^2      (|x|^2 precomputed)
    top-8 by lax.top_k, inverse-square-distance weights, index_rate lerp
    (weights exactly as pipeline.py:129-131).

Exact search over the whole index is both simpler and higher-recall than
the reference's IVF nprobe=1; for very large indexes the index build
(retrieval/index.py) kmeans-compresses to <=10k rows first, mirroring the
reference's MiniBatchKMeans step (web.py:535-546).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("k",))
def knn_blend(feats: jax.Array, index_vecs: jax.Array, index_sq: jax.Array,
              index_rate: jax.Array, k: int = 8) -> jax.Array:
    """Blend features with their k nearest index rows.

    feats: (T, D); index_vecs: (N, D); index_sq: (N,) precomputed |x|^2.
    Returns (T, D): index_rate * knn_blend + (1 - index_rate) * feats.
    """
    f32 = feats.astype(jnp.float32)
    # squared L2 distances via one MXU matmul
    dots = jnp.einsum("td,nd->tn", f32, index_vecs.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    d2 = jnp.sum(f32 * f32, axis=1, keepdims=True) - 2.0 * dots + index_sq[None, :]
    neg_d, idx = jax.lax.top_k(-d2, k)
    score = jnp.maximum(-neg_d, 1e-12)
    weight = 1.0 / jnp.square(score)
    weight = weight / jnp.sum(weight, axis=1, keepdims=True)
    gathered = index_vecs[idx]  # (T, k, D)
    blended = jnp.sum(gathered * weight[:, :, None], axis=1)
    return (index_rate * blended + (1.0 - index_rate) * f32).astype(feats.dtype)
