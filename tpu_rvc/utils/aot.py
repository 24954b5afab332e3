"""Warm-start caching for compiled graphs (reference rvc/jit/jit.py:58
`get_jit_model` role, C46).

Two complementary layers, both wired into bench.py, apps/serve.py and the
convert CLI:

1. `enable_persistent_compilation_cache()` — JAX's on-disk executable
   cache.  On the remote-compile TPU service a big fused graph costs
   2-10 min to compile; with the cache the second process start is a disk
   hit.  (Measured working on the axon backend.)

2. `AOTGraphCache` — StableHLO serialize/reload per (config, bucket)
   graph via jax.export.  Skips Python *tracing* on warm starts (tens of
   seconds for the fused conversion graph) and is the durable, shippable
   artifact form of the graph — the TPU-native analogue of the
   reference's TorchScript `.jit` bundles.  Weights are NOT embedded:
   every cached graph takes parameter trees as call arguments (see
   CLAUDE.md: jitted graphs must not close over weight trees).
"""

from __future__ import annotations

import hashlib
import logging
import os
from typing import Any, Callable, Optional

logger = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_compilation_cache(
        cache_dir: Optional[str] = None) -> str:
    """Turn on JAX's persistent compilation cache (idempotent)."""
    import jax

    cache_dir = cache_dir or os.environ.get("TPU_RVC_JAX_CACHE",
                                            DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir


def _tree_shape_sig(tree: Any) -> str:
    """Stable hash of a pytree's (path, shape, dtype) structure."""
    import jax
    import numpy as np

    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts.append(f"{jax.tree_util.keystr(path)}:"
                     f"{tuple(np.shape(leaf))}:{np.asarray(leaf).dtype}")
    return hashlib.sha256("|".join(sorted(parts)).encode()).hexdigest()[:16]


class AOTGraphCache:
    """Per-graph StableHLO export cache.

    wrap(key, jitted) returns a callable with the jitted function's
    signature.  Warm start (cache file exists): the serialized export is
    deserialized — no tracing.  Cold start: the first call runs the jitted
    function, then exports with the call's concrete avals and writes the
    cache file for the next process.
    """

    def __init__(self, cache_dir: Optional[str] = None,
                 platform: Optional[str] = None):
        import jax

        self.dir = cache_dir or os.environ.get("TPU_RVC_AOT_CACHE",
                                               DEFAULT_CACHE_DIR)
        os.makedirs(self.dir, exist_ok=True)
        self.platform = platform or jax.devices()[0].platform
        self.jax_version = jax.__version__
        self.hits = 0
        self.misses = 0

    def _path(self, key: str) -> str:
        h = hashlib.sha256(
            f"{key}|{self.platform}|{self.jax_version}".encode()
        ).hexdigest()[:24]
        return os.path.join(self.dir, f"aot_{h}.stablehlo")

    def wrap(self, key: str, jitted: Callable) -> Callable:
        from jax import export as jexport

        path = self._path(key)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exported = jexport.deserialize(bytearray(f.read()))
                self.hits += 1
                logger.info("AOT cache hit: %s", key)

                def call_loaded(*args):
                    return exported.call(*args)

                call_loaded.aot_cache_status = "hit"  # type: ignore
                return call_loaded
            except Exception as e:  # corrupt/stale entry: re-trace
                logger.warning("AOT cache entry unusable (%s): %s", key, e)
                try:
                    os.unlink(path)
                except OSError:
                    pass

        self.misses += 1
        state = {"exported": False}

        def call_and_export(*args):
            out = jitted(*args)
            if not state["exported"]:
                state["exported"] = True
                try:
                    exported = jexport.export(jitted)(*args)
                    tmp = path + ".part"
                    with open(tmp, "wb") as f:
                        f.write(exported.serialize())
                    os.replace(tmp, path)
                    logger.info("AOT cache write: %s", key)
                except Exception as e:  # never fail the hot path
                    logger.warning("AOT export failed (%s): %s", key, e)
            return out

        call_and_export.aot_cache_status = "miss"  # type: ignore
        return call_and_export

    def stats(self) -> dict:
        return {"dir": self.dir, "hits": self.hits, "misses": self.misses}
