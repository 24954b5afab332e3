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


def register_optax_export_serialization() -> None:
    """Idempotently register optax optimizer-state NamedTuples with
    jax.export so training graphs (whose signatures carry optimizer
    state) can be AOT-serialized by `AOTGraphCache`.

    Without this, exporting the train step fails with "Cannot serialize
    PyTreeDef containing an unregistered type ScaleByAdamState" and the
    warm-start layer silently degrades to live tracing (observed as
    config5's 217 s warm compile in BENCH_CONFIGS).  Callers that define
    their own NamedTuple states (e.g. train.step.TrainState) must
    register those too.

    Best-effort: on jax versions without
    `export.register_namedtuple_serialization` this is a no-op (the AOT
    layer then simply never gets export coverage for training graphs) —
    it must never make `import tpu_rvc.train` fail.
    """
    try:
        from jax import export as jexport
        register = jexport.register_namedtuple_serialization
    except (ImportError, AttributeError) as e:
        logger.warning("jax.export namedtuple registration unavailable "
                       "(%s); train-step AOT caching disabled", e)
        return
    import optax

    for name in ("ScaleByAdamState", "EmptyState", "ScaleByScheduleState",
                 "MaskedState", "InjectHyperparamsState"):
        cls = getattr(optax, name, None)
        if cls is None:
            continue
        try:
            register(cls, serialized_name=f"optax.{name}")
        except ValueError:
            pass  # already registered (idempotent)


_SRC_FINGERPRINT: Optional[str] = None


def source_fingerprint() -> str:
    """Hash of every .py source under the tpu_rvc package (12 hex chars),
    computed once per process.

    Baked into every AOTGraphCache path so a cached StableHLO export can
    never outlive the code that produced it: cache keys are built from
    config/shape signatures only, so without this a source edit that
    keeps shapes (e.g. changing a loss weight in train/step.py) would
    silently replay the OLD graph on the next warm start and the "warm"
    benchmark would measure code that no longer exists.  Any package
    edit ⇒ all entries cold exactly once — correct, and the XLA
    persistent compile cache (keyed by HLO, unaffected) still absorbs
    most of the recompile cost for graphs that didn't actually change.
    """
    global _SRC_FINGERPRINT
    if _SRC_FINGERPRINT is None:
        pkg_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for root, dirs, files in sorted(os.walk(pkg_dir)):
            dirs.sort()
            for name in sorted(files):
                if not name.endswith(".py"):
                    continue
                path = os.path.join(root, name)
                rel = os.path.relpath(path, pkg_dir)
                # utils/roofline.py is introspection-only: it LOWERS
                # already-built graphs for FLOP counting and contributes
                # no ops to any traced graph, so accounting fixes there
                # must not cold-start every compiled-graph cache (a full
                # re-export+compile pass costs ~1 h through the remote
                # compile service).  Keep this list strictly to modules
                # that can never construct graph ops.
                if rel in ("utils/roofline.py",):
                    continue
                h.update(rel.encode())
                with open(path, "rb") as f:
                    h.update(f.read())
        _SRC_FINGERPRINT = h.hexdigest()[:12]
    return _SRC_FINGERPRINT


def _tree_shape_sig(tree: Any) -> str:
    """Stable hash of a pytree's (path, shape, dtype) structure.

    Reads ONLY metadata — never materializes leaves: np.asarray on a
    device-resident leaf would fetch it through the (slow) host link,
    and the weight trees this is called on are hundreds of MB.
    """
    import jax
    import numpy as np

    parts = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        shape = tuple(getattr(leaf, "shape", ()))
        dtype = getattr(leaf, "dtype", None) or np.result_type(leaf)
        parts.append(f"{jax.tree_util.keystr(path)}:{shape}:{dtype}")
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
            f"{key}|{self.platform}|{self.jax_version}|"
            f"{source_fingerprint()}".encode()
        ).hexdigest()[:24]
        return os.path.join(self.dir, f"aot_{h}.stablehlo")

    def wrap(self, key: str, jitted: Callable) -> Callable:
        from jax import export as jexport

        import jax

        path = self._path(key)

        def _write_export(*args):
            """Export jitted at these concrete avals and (over)write the
            cache file.  Never raises — the hot path must not fail."""
            try:
                exported = jexport.export(jitted)(*args)
                tmp = path + ".part"
                with open(tmp, "wb") as f:
                    f.write(exported.serialize())
                os.replace(tmp, path)
                logger.info("AOT cache write: %s", key)
            except Exception as e:
                logger.warning("AOT export failed (%s): %s", key, e)

        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    exported = jexport.deserialize(bytearray(f.read()))
                self.hits += 1
                logger.info("AOT cache hit: %s", key)
                # jit the reloaded export once: raw exported.call re-enters
                # tracing machinery per invocation (~3x Python dispatch
                # overhead measured on the streaming block path)
                jit_call = jax.jit(exported.call)
                state = {"fallback": False}

                def _is_stale(e: Exception) -> bool:
                    # Stale avals (e.g. a different-size retrieval index
                    # than the cached export saw) surface as jax
                    # shape-check TypeError/ValueError at trace time, or
                    # as a backend XlaRuntimeError(INVALID_ARGUMENT) when
                    # the mismatch (layout/sharding vs the deserialized
                    # executable) is only caught at run time.  The backend
                    # match is deliberately narrow: INVALID_ARGUMENT also
                    # covers genuinely bad caller inputs, so require a
                    # mismatch keyword too, and log the class either way
                    # so a misclassification is diagnosable from the logs.
                    if isinstance(e, (TypeError, ValueError)):
                        return True
                    stale = (type(e).__name__ == "XlaRuntimeError"
                             and "INVALID_ARGUMENT" in str(e)
                             and any(kw in str(e).lower() for kw in
                                     ("shape", "layout", "sharding",
                                      "incompatible", "mismatch")))
                    logger.info("AOT runtime fault class=%s stale=%s: %s",
                                type(e).__name__, stale, e)
                    return stale

                def call_loaded(*args):
                    if not state["fallback"]:
                        try:
                            return jit_call(*args)
                        except Exception as e:
                            # Stale entry: fall back to the live jitted fn
                            # and self-heal with the current shapes.
                            # Anything else (device OOM, transfer/runtime
                            # fault) is a REAL error — re-raise, don't
                            # clobber a valid cache entry with a
                            # mid-failure re-export.
                            if not _is_stale(e):
                                raise
                            logger.warning(
                                "AOT cache entry stale for current call "
                                "shapes (%s): %s — re-tracing", key, e)
                            state["fallback"] = True
                            out = jitted(*args)
                            _write_export(*args)
                            return out
                    return jitted(*args)

                call_loaded.aot_cache_status = "hit"  # type: ignore
                # underlying jitted fn, for client-side FLOP counting
                # (utils/roofline.graph_flops lowers it without compiling)
                call_loaded.jitted = jitted  # type: ignore
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
                _write_export(*args)
            return out

        call_and_export.aot_cache_status = "miss"  # type: ignore
        call_and_export.jitted = jitted  # type: ignore
        return call_and_export

    def stats(self) -> dict:
        return {"dir": self.dir, "hits": self.hits, "misses": self.misses}
