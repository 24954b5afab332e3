"""Data-parallel batched conversion over a `jax.sharding.Mesh`.

The reference serves one utterance per process (GPU) and scales by running
more processes.  On TPU pods the natural form is SPMD: stack B same-bucket
utterances, shard the batch over the mesh's `data` axis, and run ONE
program — each chip converts its shard, weights stay replicated, and no
collectives are needed on the forward path (embarrassingly parallel), so
scaling is linear in chips until HBM weight residency dominates.

Built by vmapping the pipeline's fused single-utterance graph
(pipeline/vc.py `_full_graph`), so every device-resident optimization
(in-graph f0, retrieval, RMS mix, int16 output) carries over per shard.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_batch_graph(pipeline, L: int, mesh: Mesh, *, use_f0: bool = True,
                     has_index: bool = False, protect_on: bool = True,
                     f0_mode: str = "pm"):
    """Batched variant of the fused conversion graph.

    Returns fn(hubert_vars, synth_vars, rmvpe_vars, audio (B, L), up_key,
    sid (B,), vecs, sq, index_rate, protect, rms_mix_rate, keys (B, 2))
    -> int16 (B, T_out), with the batch dim sharded over mesh axis "data".
    """
    cache_key = ("batch_par", L, use_f0, has_index, protect_on, f0_mode,
                 tuple(sorted(mesh.shape.items())))
    if cache_key in pipeline._graphs:
        return pipeline._graphs[cache_key]
    core = pipeline._full_graph(L, use_f0, has_index, protect_on,
                                f0_mode).__wrapped__
    batched = jax.vmap(
        core,
        in_axes=(None, None, None, 0, None, 0, None, None, None, None,
                 None, 0))
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def shardings_like(tree, s):
        return jax.tree_util.tree_map(lambda _: s, tree)

    # the jitted wrapper is built ONCE (first call supplies the var-tree
    # structures for in_shardings) and cached — re-wrapping jax.jit per
    # call would retrace and recompile every dispatch
    jitted = [None]

    def run(hubert_vars, synth_vars, rmvpe_vars, audio, up_key, sid,
            vecs, sq, index_rate, protect, rms_mix_rate, keys):
        if jitted[0] is None:
            in_shardings = (
                shardings_like(hubert_vars, repl),
                shardings_like(synth_vars, repl),
                shardings_like(rmvpe_vars, repl),
                data, repl, data, repl, repl, repl, repl, repl, data)
            jitted[0] = jax.jit(batched, in_shardings=in_shardings,
                                out_shardings=data)
        return jitted[0](
            hubert_vars, synth_vars, rmvpe_vars, audio, up_key, sid,
            vecs, sq, index_rate, protect, rms_mix_rate, keys)

    pipeline._graphs[cache_key] = run
    return run


def batch_convert(pipeline, audio_batch: np.ndarray, sids, mesh: Mesh,
                  *, f0_up_key: float = 0.0, f0_method: str = "pm",
                  index=None, index_rate: float = 0.0,
                  protect: float = 0.33, rms_mix_rate: float = 0.25,
                  noise_seed: int = 0) -> np.ndarray:
    """Convert B pre-padded utterances (B, L) @16k in one SPMD dispatch.

    B must be a multiple of the mesh's `data` axis size.  Inputs are
    expected already reflect-padded like Pipeline.pipeline does
    (pipeline.t_pad per side); output rows are int16 at pipeline.tgt_sr
    with the pad regions trimmed.
    """
    audio_batch = np.asarray(audio_batch, np.float32)
    B, L = audio_batch.shape
    n_data = mesh.shape["data"]
    if B % n_data:
        raise ValueError(f"batch {B} not divisible by data axis {n_data}")
    use_f0 = pipeline.synth.use_f0
    has_index = index is not None and index_rate > 0
    protect_on = use_f0 and protect < 0.5
    f0_mode = f0_method if use_f0 else "pm"
    if f0_mode == "fcpe" and pipeline.f0_gen._get("fcpe").model is None:
        f0_mode = "pm"
    if f0_mode not in ("pm", "rmvpe", "fcpe"):
        raise ValueError(f"f0 method {f0_mode} has no fused device variant")
    rmvpe_vars = (pipeline.f0_gen._get(f0_mode).variables
                  if use_f0 and f0_mode in ("rmvpe", "fcpe") else {})
    if has_index:
        vecs, sq = index.device_arrays()
    else:
        d = 256 if pipeline.version == "v1" else 768
        vecs = jnp.zeros((1, d), jnp.float32)
        sq = jnp.zeros((1,), jnp.float32)

    run = make_batch_graph(pipeline, L, mesh, use_f0=use_f0,
                           has_index=has_index, protect_on=protect_on,
                           f0_mode=f0_mode)
    data = NamedSharding(mesh, P("data"))
    audio_dev = jax.device_put(jnp.asarray(audio_batch), data)
    sid_dev = jax.device_put(jnp.asarray(np.asarray(sids, np.int32)), data)
    keys = jax.vmap(jax.random.PRNGKey)(
        noise_seed + jnp.arange(B, dtype=jnp.uint32))
    out = run(pipeline.hubert_vars, pipeline.synth_vars, rmvpe_vars,
              audio_dev, jnp.asarray(float(f0_up_key)), sid_dev,
              vecs, sq, jnp.asarray(index_rate, jnp.float32),
              jnp.asarray(protect, jnp.float32),
              jnp.asarray(rms_mix_rate, jnp.float32), keys)
    return np.asarray(out)
