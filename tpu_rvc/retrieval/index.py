"""Feature index build/store (replaces faiss IVF + sklearn MiniBatchKMeans;
reference web.py:499-596, tools/cmd/train-index-v2.py).

Build: concat per-utterance HuBERT features -> if > 2e5 rows, JAX
minibatch-kmeans to 10k centroids (reference web.py:535-546) -> store flat
vectors + precomputed squared norms.  Query is exact matmul top-k
(retrieval/search.py) — higher recall than the reference's IVF nprobe=1 and
no host round-trip.

Storage: `.tpuidx.npz` (vectors + norms + metadata).  The reference's
`total_fea.npy` big-npy is the same flat matrix; `save` also writes it for
ecosystem compatibility.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

KMEANS_THRESHOLD = 200_000  # reference web.py:535: kmeans when > 2e5 rows
KMEANS_CLUSTERS = 10_000


def train_kmeans(x: np.ndarray, k: int = KMEANS_CLUSTERS, iters: int = 20,
                 batch: int = 8192, seed: int = 0) -> np.ndarray:
    """Minibatch k-means on device; returns (k, D) float32 centroids."""
    rng = np.random.default_rng(seed)
    n, d = x.shape
    centroids = jnp.asarray(x[rng.choice(n, size=k, replace=False)],
                            jnp.float32)
    counts = jnp.ones((k,), jnp.float32)

    @jax.jit
    def step(cent, cnt, xb):
        d2 = (jnp.sum(xb * xb, 1, keepdims=True)
              - 2 * xb @ cent.T + jnp.sum(cent * cent, 1)[None, :])
        assign = jnp.argmin(d2, axis=1)
        one_hot = jax.nn.one_hot(assign, cent.shape[0], dtype=jnp.float32)
        batch_counts = one_hot.sum(0)
        batch_sums = one_hot.T @ xb
        new_cnt = cnt + batch_counts
        lr = batch_counts / jnp.maximum(new_cnt, 1.0)
        new_cent = cent + lr[:, None] * (
            batch_sums / jnp.maximum(batch_counts, 1.0)[:, None] - cent)
        new_cent = jnp.where(batch_counts[:, None] > 0, new_cent, cent)
        return new_cent, new_cnt

    for it in range(iters):
        order = rng.permutation(n)
        for s in range(0, n, batch):
            xb = jnp.asarray(x[order[s:s + batch]], jnp.float32)
            centroids, counts = step(centroids, counts, xb)
    return np.asarray(centroids)


@dataclasses.dataclass
class FeatureIndex:
    vectors: np.ndarray        # (N, D) float32
    norms_sq: np.ndarray       # (N,)
    version: str = "v2"
    kmeans_compressed: bool = False

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    def device_arrays(self) -> Tuple[jax.Array, jax.Array]:
        """HBM-resident copies, uploaded once and cached (the index is
        queried every chunk; re-uploading ~30MB per call dominates latency
        on remote-attached devices)."""
        cached = getattr(self, "_device_cache", None)
        if cached is None:
            cached = (jnp.asarray(self.vectors), jnp.asarray(self.norms_sq))
            object.__setattr__(self, "_device_cache", cached)
        return cached

    def save(self, path: str, write_big_npy: bool = False) -> None:
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 vectors=self.vectors.astype(np.float32),
                 norms_sq=self.norms_sq.astype(np.float32),
                 version=np.asarray(self.version),
                 kmeans=np.asarray(self.kmeans_compressed))
        if write_big_npy:
            np.save(str(Path(path).with_suffix("")) + "_total_fea.npy",
                    self.vectors)

    @classmethod
    def load(cls, path: str) -> "FeatureIndex":
        if path.endswith(".npy"):  # reference total_fea.npy big-npy
            vecs = np.load(path).astype(np.float32)
            return cls(vecs, (vecs * vecs).sum(1))
        z = np.load(path if path.endswith(".npz") else path + ".npz",
                    allow_pickle=False)
        return cls(z["vectors"], z["norms_sq"], str(z["version"]),
                   bool(z["kmeans"]))


def build_index(features: np.ndarray, version: str = "v2",
                kmeans_threshold: int = KMEANS_THRESHOLD,
                seed: int = 0) -> FeatureIndex:
    """Build a retrieval index from (N, D) HuBERT features."""
    feats = np.ascontiguousarray(features, dtype=np.float32)
    compressed = False
    if feats.shape[0] > kmeans_threshold:
        feats = train_kmeans(feats, KMEANS_CLUSTERS, seed=seed)
        compressed = True
    norms = (feats * feats).sum(axis=1)
    return FeatureIndex(feats, norms, version, compressed)
