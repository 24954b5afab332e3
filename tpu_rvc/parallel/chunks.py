"""Chunk-parallel conversion of ONE long utterance over the device mesh.

The reference converts a long file chunk-by-chunk on one GPU
(infer/modules/vc/pipeline.py:224-236 silence-point splitting, then a
sequential loop at :241-295).  tpu_rvc's sequential equivalent lives in
pipeline/vc.py.  This module is the beyond-reference scaling path: the
silence-split chunks of a single utterance are padded to one common
bucket, stacked, and run through ONE vmapped chunk graph whose batch axis
is sharded over the mesh's `data` axis — an hour of audio converts with
near-linear speedup in chips (chunks are independent given the globally
computed f0 track, exactly as in the sequential loop).

f0 is computed once over the whole padded signal (device-resident for
pm/rmvpe/fcpe, host estimators otherwise) and sliced per chunk with the
reference's boundary arithmetic (pipeline.py:241-267).
"""

from __future__ import annotations

import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_rvc.audio.dsp import change_rms, highpass_filter
from tpu_rvc.ops.resample import resample_poly
from tpu_rvc.pipeline.vc import (SR, WINDOW, _bucket, silence_chunk_bounds)


def _batched_chunk_graph(pipeline, bucket: int, mesh: Mesh, *,
                         use_f0: bool, has_index: bool, protect_on: bool):
    """vmap the per-chunk graph over a chunk axis sharded on `data`.
    Cached on the pipeline so repeated long files reuse the compilation."""
    cache_key = ("chunk_par", bucket, use_f0, has_index, protect_on,
                 tuple(sorted(mesh.shape.items())))
    if cache_key in pipeline._graphs:
        return pipeline._graphs[cache_key]
    core = pipeline._chunk_graph(bucket, use_f0, has_index,
                                 protect_on).__wrapped__
    batched = jax.vmap(
        core,
        in_axes=(None, None, 0, 0, None, 0, 0, None, None, None, None,
                 None))

    def scaled(*args):
        out = batched(*args)  # (n, frames*upsample) float32 in (-1, 1)
        # fixed-scale int16 for the fetch (tanh-bounded output; global
        # peak normalization happens on the host after assembly)
        return jnp.clip(out * 32767.0, -32768, 32767).astype(jnp.int16)

    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    like = lambda tree, s: jax.tree_util.tree_map(lambda _: s, tree)

    jitted = [None]

    def run(hubert_vars, synth_vars, audio, true_len, sid, pit, pitf,
            vecs, sq, index_rate, protect, noise_key):
        if jitted[0] is None:
            in_sh = (like(hubert_vars, repl), like(synth_vars, repl),
                     data, data, repl, data, data, repl, repl, repl, repl,
                     repl)
            jitted[0] = jax.jit(scaled, in_shardings=in_sh,
                                out_shardings=data)
        return jitted[0](hubert_vars, synth_vars, audio, true_len, sid,
                         pit, pitf, vecs, sq, index_rate, protect,
                         noise_key)

    pipeline._graphs[cache_key] = run
    return run


def convert_long(pipeline, sid: int, audio: np.ndarray, mesh: Mesh, *,
                 f0_up_key: int = 0, f0_method: str = "rmvpe",
                 index=None, index_rate: float = 0.0, if_f0: int = 1,
                 filter_radius: Optional[float] = 3,
                 resample_sr: int = 0, rms_mix_rate: float = 1.0,
                 protect: float = 0.33, noise_seed: int = 0) -> np.ndarray:
    """Convert one long 16 kHz utterance with its chunks sharded over the
    mesh.  Same arguments and output contract as Pipeline.pipeline; short
    audio (single chunk) falls through to the sequential path."""
    audio_raw = np.asarray(audio, np.float32)
    audio = highpass_filter(audio_raw)
    opt_ts = silence_chunk_bounds(audio, pipeline.t_center,
                                  pipeline.t_query, pipeline.t_max)
    if not opt_ts:
        # hand the UNfiltered audio to the sequential path — it applies the
        # 48 Hz highpass itself (double filtering would diverge from it)
        return pipeline.pipeline(
            sid, audio_raw, [0.0, 0.0, 0.0], f0_up_key, f0_method, index,
            index_rate, if_f0, filter_radius, resample_sr, rms_mix_rate,
            protect, noise_seed=noise_seed)

    t_pad, t_pad2 = pipeline.t_pad, pipeline.t_pad2
    audio_pad = np.pad(audio, (t_pad, t_pad), mode="reflect")
    p_len = audio_pad.shape[0] // WINDOW

    # ---- global f0 (one track, sliced per chunk like pipeline.py:241) ----
    pitch_np = pitchf_np = None
    if if_f0:
        if f0_method in ("pm", "rmvpe", "fcpe"):
            from tpu_rvc.f0 import device as f0dev
            audio_dev = jnp.asarray(audio_pad)
            if f0_method == "pm":
                pit, pf = jax.jit(lambda w, k: f0dev.pm_f0_device(
                    w, p_len, k))(audio_dev, jnp.asarray(float(f0_up_key)))
            else:
                est = pipeline.f0_gen._get(f0_method)
                fn = (f0dev.rmvpe_f0_device if f0_method == "rmvpe"
                      else f0dev.fcpe_f0_device)
                pit, pf = jax.jit(lambda w, k: fn(
                    w, p_len, k, est.model, est.variables,
                    dtype=pipeline.dtype))(
                    audio_dev, jnp.asarray(float(f0_up_key)))
            pitch_np = np.asarray(pit)[:p_len]
            pitchf_np = np.asarray(pf, np.float32)[:p_len]
        else:
            c, f = pipeline.f0_gen.calculate(
                audio_pad, p_len, f0_up_key, f0_method, filter_radius, None)
            pitch_np = np.asarray(c)[:p_len]
            pitchf_np = np.asarray(f, np.float32)[:p_len]

    # ---- chunk table (same boundary arithmetic as the sequential loop) ---
    starts: List[int] = []
    lens: List[int] = []
    pit_slices: List[np.ndarray] = []
    s = 0
    for t in opt_ts:
        t = t // WINDOW * WINDOW
        starts.append(s)
        lens.append(t + t_pad2 + WINDOW - s)
        if if_f0:
            pit_slices.append(
                np.stack([pitch_np[s // WINDOW: (t + t_pad2) // WINDOW],
                          pitchf_np[s // WINDOW: (t + t_pad2) // WINDOW]]))
        s = t
    starts.append(s)
    lens.append(audio_pad.shape[0] - s)
    if if_f0:
        pit_slices.append(np.stack([pitch_np[s // WINDOW:],
                                    pitchf_np[s // WINDOW:]]))

    n = len(starts)
    bucket = _bucket(max(lens))
    p_len_static = min(bucket // WINDOW, 2 * ((bucket - 400) // 320 + 1))
    n_data = mesh.shape["data"]
    n_pad = -(-n // n_data) * n_data

    audio_rows = np.zeros((n_pad, bucket), np.float32)
    true_len = np.zeros(n_pad, np.int32)
    pit_rows = np.zeros((n_pad, p_len_static), np.int32)
    pitf_rows = np.zeros((n_pad, p_len_static), np.float32)
    for i in range(n):
        audio_rows[i, :lens[i]] = audio_pad[starts[i]: starts[i] + lens[i]]
        true_len[i] = lens[i]
        if if_f0:
            m = min(p_len_static, pit_slices[i].shape[1])
            pit_rows[i, :m] = pit_slices[i][0, :m]
            pitf_rows[i, :m] = pit_slices[i][1, :m]
    true_len[n:] = WINDOW  # harmless filler rows

    use_f0 = bool(if_f0)
    has_index = index is not None and index_rate > 0
    protect_on = use_f0 and protect < 0.5
    if has_index:
        vecs, sq = index.device_arrays()
    else:
        d = 256 if pipeline.version == "v1" else 768
        vecs = jnp.zeros((1, d), jnp.float32)
        sq = jnp.zeros((1,), jnp.float32)

    run = _batched_chunk_graph(pipeline, bucket, mesh, use_f0=use_f0,
                               has_index=has_index, protect_on=protect_on)
    data = NamedSharding(mesh, P("data"))
    out = run(pipeline.hubert_vars, pipeline.synth_vars,
              jax.device_put(jnp.asarray(audio_rows), data),
              jax.device_put(jnp.asarray(true_len), data),
              jnp.asarray(sid),
              jax.device_put(jnp.asarray(pit_rows), data),
              jax.device_put(jnp.asarray(pitf_rows), data),
              vecs, sq, jnp.asarray(index_rate, jnp.float32),
              jnp.asarray(protect, jnp.float32),
              jax.random.PRNGKey(noise_seed))
    out = np.asarray(out).astype(np.float32) / 32767.0  # (n_pad, T_b)

    # ---- host assembly: per-chunk trim + concat (pipeline.py:241,295) ----
    upsample = math.prod(pipeline.synth.upsample_rates)
    t_pad_tgt = pipeline.t_pad_tgt
    pieces = []
    for i in range(n):
        true_frames = min(lens[i] // WINDOW, p_len_static)
        y = out[i, : true_frames * upsample]
        pieces.append(y[t_pad_tgt: y.shape[0] - t_pad_tgt])
    result = np.concatenate(pieces)

    if rms_mix_rate != 1:
        result = change_rms(audio, SR, result, pipeline.tgt_sr, rms_mix_rate)
    if pipeline.tgt_sr != resample_sr and resample_sr >= SR:
        result = np.asarray(resample_poly(jnp.asarray(result[None]),
                                          pipeline.tgt_sr, resample_sr))[0]
    audio_max = np.abs(result).max() / 0.99
    max_int16 = 32768.0
    if audio_max > 1:
        max_int16 /= audio_max
    return (result * max_int16).astype(np.int16)
