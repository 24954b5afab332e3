"""Realtime voice-conversion engine (reference infer/lib/rtrvc.py:19 `RVC`
and the gui.py stream loop math).

RealtimeVC — the per-block model engine (rtrvc.RVC role):
  - persistent HuBERT + synthesizer, rolling 1024-frame pitch cache shifted
    per block (rtrvc.py:209-217)
  - retrieval applied to the tail only (rtrvc.py:168-185)
  - formant shift via return_length2 + output polyphase resample
    (rtrvc.py:190,249-259)
  - the whole block (HuBERT -> retrieve -> enc_p full window -> flow on
    tail+24-frame pre-roll -> decode tail) is ONE jitted graph with static
    (window, skip_head, return_length, return_length2) — the streaming
    config fixes these, so there is exactly one compilation per session.

StreamSession — the block loop (gui.py:934-1126 math, device-I/O-free):
  rolling input windows, 16 kHz resample, RealtimeVC.infer, RMS mix, SOLA
  alignment (normalized cross-correlation, gui.py:1058-1073) and
  crossfade / phase-vocoder merge (gui.py:27-48).  Feed blocks in, get
  aligned blocks out; audio device plumbing stays outside.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.f0.gen import Generator as F0Generator
from tpu_rvc.ops.resample import resample_poly
from tpu_rvc.retrieval.index import FeatureIndex
from tpu_rvc.retrieval.search import knn_blend

SR = 16000
WINDOW = 160


class RealtimeVC:
    def __init__(self, *, hubert, hubert_vars, synth, synth_vars,
                 version: str = "v2", if_f0: int = 1,
                 index: Optional[FeatureIndex] = None,
                 index_rate: float = 0.0, f0_up_key: float = 0.0,
                 formant_shift: float = 0.0,
                 rmvpe_root: str = "assets/rmvpe", dtype=jnp.float32,
                 aot_cache=None):
        # aot_cache: utils.aot.AOTGraphCache — streaming block graphs are
        # StableHLO-serialized per (block geometry, config) and reloaded
        # without retracing on the next server start
        self.aot_cache = aot_cache
        self.hubert, self.hubert_vars = hubert, hubert_vars
        self.synth, self.synth_vars = synth, synth_vars
        self.version = version
        self.if_f0 = if_f0
        self.index = index
        self.index_rate = index_rate
        self.f0_up_key = f0_up_key
        self.formant_shift = formant_shift
        self.tgt_sr = synth.sr
        self.dtype = dtype
        self.cache_pitch = np.zeros(1024, np.int32)
        self.cache_pitchf = np.zeros(1024, np.float32)
        self.f0_gen = F0Generator(rmvpe_root, x_pad=0, window=WINDOW, sr=SR)
        self._graphs: Dict[Tuple, any] = {}
        self._step = 0

    def set_key(self, key):          # reference rtrvc.py:122
        self.f0_up_key = key

    def set_formant(self, formant):  # reference rtrvc.py:125
        self.formant_shift = formant

    def set_index_rate(self, rate):  # reference rtrvc.py:128
        self.index_rate = rate

    def _make_run(self, L16: int, skip_head: int, return_length: int,
                  return_length2: int, use_f0: bool, has_index: bool,
                  protect_on: bool):
        """The single-stream block graph body (unbatched inputs).
        BatchedRealtimeVC vmaps this same function over streams."""

        def run(hubert_vars, synth_vars, wav16, pitch, pitchf, index_vecs,
                index_sq, index_rate, protect, noise_key):
            feats = self.hubert.apply(hubert_vars,
                                      wav16[None].astype(self.dtype))
            feats = jnp.concatenate([feats, feats[:, -1:]], axis=1)
            feats0 = feats
            if has_index:
                tail = feats[0, skip_head // 2:]
                blended = knn_blend(tail, index_vecs, index_sq, index_rate)
                feats = feats.at[0, skip_head // 2:].set(
                    blended.astype(feats.dtype))
            p_len = L16 // WINDOW
            feats = jnp.repeat(feats, 2, axis=1)[:, :p_len]
            if use_f0 and protect_on:
                feats0 = jnp.repeat(feats0, 2, axis=1)[:, :p_len]
                pitchff = jnp.where(pitchf > 0, 1.0, protect)[None, :, None]
                feats = feats * pitchff + feats0 * (1 - pitchff)
            from tpu_rvc.nn.attention import pallas_attention
            with pallas_attention():
                audio = self.synth.apply(
                    synth_vars, feats.astype(self.dtype),
                    jnp.asarray([p_len]), jnp.asarray([0]),
                    pitch[None] if use_f0 else None,
                    pitchf[None].astype(self.dtype) if use_f0 else None,
                    skip_head=skip_head, return_length=return_length,
                    return_length2=return_length2,
                    method=self.synth.infer, rngs={"noise": noise_key})
            return audio[0, :, 0].astype(jnp.float32)

        return run

    def _graph(self, L16: int, skip_head: int, return_length: int,
               return_length2: int, use_f0: bool, has_index: bool,
               protect_on: bool):
        key = (L16, skip_head, return_length, return_length2, use_f0,
               has_index, protect_on)
        if key not in self._graphs:
            fn = jax.jit(self._make_run(
                L16, skip_head, return_length, return_length2, use_f0,
                has_index, protect_on))
            if self.aot_cache is not None:
                from tpu_rvc.utils.aot import _tree_shape_sig
                sig = _tree_shape_sig((self.hubert_vars, self.synth_vars))
                # index SIZE is part of the export's avals, so it must be
                # part of the cache key (stale hits fall back + self-heal)
                n = (self.index.vectors.shape[0]
                     if has_index and self.index is not None else 1)
                fn = self.aot_cache.wrap(
                    f"rt_block|{self.version}|{self.tgt_sr}|"
                    f"{jnp.dtype(self.dtype).name}|{sig}|{key}|n={n}", fn)
            self._graphs[key] = fn
        return self._graphs[key]

    def infer(self, input_wav: np.ndarray, block_frame_16k: int,
              skip_head: int, return_length: int,
              f0method: Union[tuple, str] = "rmvpe",
              protect: float = 1.0) -> np.ndarray:
        """Convert one rolling window; returns target-rate audio of
        return_length frames (reference rtrvc.RVC.infer, rtrvc.py:134)."""
        input_wav = np.asarray(input_wav, np.float32)
        L16 = len(input_wav)
        p_len = L16 // WINDOW
        factor = 2.0 ** (self.formant_shift / 12)
        return_length2 = int(np.ceil(return_length * factor))
        use_f0 = self.if_f0 == 1
        protect_on = use_f0 and protect < 0.5

        pitch = np.zeros(p_len, np.int32)
        pitchf = np.zeros(p_len, np.float32)
        if isinstance(f0method, tuple):
            pitch_t, pitchf_t = f0method
            pitch[:len(pitch_t)] = pitch_t[:p_len]
            pitchf[:len(pitchf_t)] = pitchf_t[:p_len]
        elif use_f0:
            # f0 on the tail only, rolled into the 1024-frame cache
            f0_extractor_frame = block_frame_16k + 800
            if f0method == "rmvpe":
                f0_extractor_frame = (
                    5120 * ((f0_extractor_frame - 1) // 5120 + 1) - WINDOW)
            c, f = self.f0_gen.calculate(
                input_wav[-f0_extractor_frame:], None,
                self.f0_up_key - self.formant_shift, f0method, None)
            shift = block_frame_16k // WINDOW
            self.cache_pitch[:-shift] = self.cache_pitch[shift:]
            self.cache_pitchf[:-shift] = self.cache_pitchf[shift:]
            n_new = len(c) - 4  # drop 3 head + 1 tail frames (rtrvc.py:212)
            self.cache_pitch[-n_new:] = c[3:-1]
            self.cache_pitchf[-n_new:] = f[3:-1]
            pitch = self.cache_pitch[-p_len:].astype(np.int32)
            pitchf = (self.cache_pitchf[-p_len:] *
                      (return_length2 / return_length)).astype(np.float32)

        has_index = self.index is not None and self.index_rate > 0
        if has_index:
            vecs, sq = self.index.device_arrays()
        else:
            d = 256 if self.version == "v1" else 768
            vecs, sq = jnp.zeros((1, d), jnp.float32), jnp.zeros((1,), jnp.float32)

        graph = self._graph(L16, skip_head, return_length, return_length2,
                            use_f0, has_index, protect_on)
        self._step += 1
        out = np.asarray(graph(
            self.hubert_vars, self.synth_vars,
            jnp.asarray(input_wav), jnp.asarray(pitch), jnp.asarray(pitchf),
            vecs, sq, jnp.asarray(self.index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32),
            jax.random.PRNGKey(self._step)))
        # formant-shift output resample (rtrvc.py:249-259)
        upp_res = int(np.floor(factor * self.tgt_sr // 100))
        if upp_res != self.tgt_sr // 100:
            out = np.asarray(resample_poly(
                jnp.asarray(out[: return_length * upp_res][None]),
                upp_res * 100, self.tgt_sr))[0]
        return out


class BatchedRealtimeVC(RealtimeVC):
    """N concurrent streaming sessions served by ONE jitted graph — the
    single-stream block body (`_make_run`) vmapped over a stream axis.

    A serving extension beyond the reference (whose realtime engine is
    strictly single-stream, rtrvc.py:19): per-chip realtime capacity
    scales with the batch dimension instead of one process per user.
    Pitch caches and noise keys are per-stream; the retrieval index and
    conversion settings are shared across streams."""

    def __init__(self, n_streams: int, **kw):
        super().__init__(**kw)
        self.n_streams = int(n_streams)
        self.cache_pitch = np.zeros((self.n_streams, 1024), np.int32)
        self.cache_pitchf = np.zeros((self.n_streams, 1024), np.float32)

    def _graph(self, L16, skip_head, return_length, return_length2,
               use_f0, has_index, protect_on):
        key = ("batched", L16, skip_head, return_length, return_length2,
               use_f0, has_index, protect_on)
        if key not in self._graphs:
            run = self._make_run(L16, skip_head, return_length,
                                 return_length2, use_f0, has_index,
                                 protect_on)
            fn = jax.jit(jax.vmap(
                run, in_axes=(None, None, 0, 0, 0, None, None, None, None,
                              0)))
            if self.aot_cache is not None:
                from tpu_rvc.utils.aot import _tree_shape_sig
                sig = _tree_shape_sig((self.hubert_vars, self.synth_vars))
                n = (self.index.vectors.shape[0]
                     if has_index and self.index is not None else 1)
                fn = self.aot_cache.wrap(
                    f"rt_batched{self.n_streams}|{self.version}|"
                    f"{self.tgt_sr}|{jnp.dtype(self.dtype).name}|{sig}|"
                    f"{key}|n={n}", fn)
            self._graphs[key] = fn
        return self._graphs[key]

    def infer(self, input_wavs: np.ndarray, block_frame_16k: int,
              skip_head: int, return_length: int,
              f0method: Union[tuple, str] = "pm",
              protect: float = 1.0) -> np.ndarray:
        """Convert one rolling window for every stream.
        input_wavs: (n_streams, L16) -> (n_streams, samples)."""
        input_wavs = np.asarray(input_wavs, np.float32)
        B, L16 = input_wavs.shape
        assert B == self.n_streams, (B, self.n_streams)
        p_len = L16 // WINDOW
        factor = 2.0 ** (self.formant_shift / 12)
        return_length2 = int(np.ceil(return_length * factor))
        use_f0 = self.if_f0 == 1
        protect_on = use_f0 and protect < 0.5

        pitch = np.zeros((B, p_len), np.int32)
        pitchf = np.zeros((B, p_len), np.float32)
        if isinstance(f0method, tuple):
            pitch_t, pitchf_t = f0method
            pitch[:, :pitch_t.shape[-1]] = pitch_t[..., :p_len]
            pitchf[:, :pitchf_t.shape[-1]] = pitchf_t[..., :p_len]
        elif use_f0:
            f0_extractor_frame = block_frame_16k + 800
            if f0method == "rmvpe":
                f0_extractor_frame = (
                    5120 * ((f0_extractor_frame - 1) // 5120 + 1) - WINDOW)
            shift = block_frame_16k // WINDOW
            for b in range(B):
                c, f = self.f0_gen.calculate(
                    input_wavs[b, -f0_extractor_frame:], None,
                    self.f0_up_key - self.formant_shift, f0method, None)
                self.cache_pitch[b, :-shift] = self.cache_pitch[b, shift:]
                self.cache_pitchf[b, :-shift] = self.cache_pitchf[b, shift:]
                n_new = len(c) - 4
                self.cache_pitch[b, -n_new:] = c[3:-1]
                self.cache_pitchf[b, -n_new:] = f[3:-1]
            pitch = self.cache_pitch[:, -p_len:].astype(np.int32)
            pitchf = (self.cache_pitchf[:, -p_len:] *
                      (return_length2 / return_length)).astype(np.float32)

        has_index = self.index is not None and self.index_rate > 0
        if has_index:
            vecs, sq = self.index.device_arrays()
        else:
            d = 256 if self.version == "v1" else 768
            vecs, sq = (jnp.zeros((1, d), jnp.float32),
                        jnp.zeros((1,), jnp.float32))

        graph = self._graph(L16, skip_head, return_length, return_length2,
                            use_f0, has_index, protect_on)
        self._step += 1
        base = jax.random.PRNGKey(self._step)
        keys = jax.vmap(jax.random.fold_in, (None, 0))(
            base, jnp.arange(B, dtype=jnp.uint32))
        out = np.asarray(graph(
            self.hubert_vars, self.synth_vars,
            jnp.asarray(input_wavs), jnp.asarray(pitch), jnp.asarray(pitchf),
            vecs, sq, jnp.asarray(self.index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32), keys))
        upp_res = int(np.floor(factor * self.tgt_sr // 100))
        if upp_res != self.tgt_sr // 100:
            out = np.asarray(resample_poly(
                jnp.asarray(out[:, : return_length * upp_res]),
                upp_res * 100, self.tgt_sr))
        return out


def phase_vocoder(a: np.ndarray, b: np.ndarray, fade_out: np.ndarray,
                  fade_in: np.ndarray) -> np.ndarray:
    """Phase-vocoder crossfade (reference gui.py:27-48)."""
    window = np.sqrt(fade_out * fade_in)
    fa = np.fft.rfft(a * window)
    fb = np.fft.rfft(b * window)
    absab = np.abs(fa) + np.abs(fb)
    n = a.shape[0]
    if n % 2 == 0:
        absab[1:-1] *= 2
    else:
        absab[1:] *= 2
    phia = np.angle(fa)
    phib = np.angle(fb)
    deltaphase = phib - phia
    deltaphase = deltaphase - 2 * np.pi * np.floor(
        deltaphase / 2 / np.pi + 0.5)
    w = 2 * np.pi * np.arange(n // 2 + 1) + deltaphase
    t = np.arange(n)[:, None] / n
    return (a * (fade_out ** 2) + b * (fade_in ** 2)
            + np.sum(absab * np.cos(w * t + phia), -1) * window / n)


class BlockGeometry:
    """Shared frame geometry of the streaming loops (reference
    gui.py:838-876 window math): ONE definition used by both
    StreamSession (single stream) and pipeline.serve.SlotScheduler
    (multi-slot server), so the seam math can never desynchronize
    between the two surfaces."""

    def __init__(self, samplerate: int, block_time: float,
                 crossfade_time: float, extra_time: float):
        zc = samplerate // 100
        self.sr = samplerate
        self.zc = zc
        self.block_frame = int(round(block_time * samplerate / zc)) * zc
        self.crossfade_frame = int(
            round(crossfade_time * samplerate / zc)) * zc
        self.sola_buffer_frame = min(self.crossfade_frame, 4 * zc)
        self.sola_search_frame = zc
        self.extra_frame = int(round(extra_time * samplerate / zc)) * zc
        self.total = (self.extra_frame + self.crossfade_frame +
                      self.sola_search_frame + self.block_frame)
        self.skip_head = self.extra_frame // zc
        self.return_length = (self.block_frame + self.sola_buffer_frame +
                              self.sola_search_frame) // zc
        fade = np.sin(0.5 * np.pi * np.linspace(
            0.0, 1.0, self.sola_buffer_frame)) ** 2
        self.fade_in = fade.astype(np.float32)
        self.fade_out = (1.0 - fade).astype(np.float32)


class StreamSession:
    """Block-by-block streaming loop (gui.py audio_infer math, device-free).

    feed(block) -> aligned output block of the same length, at `samplerate`.
    """

    def __init__(self, engine: RealtimeVC, samplerate: int = 48000,
                 block_time: float = 0.25, crossfade_time: float = 0.05,
                 extra_time: float = 2.5, f0method: str = "rmvpe",
                 rms_mix_rate: float = 1.0, protect: float = 1.0,
                 use_phase_vocoder: bool = False,
                 input_noise_reduce: bool = False,
                 output_noise_reduce: bool = False,
                 fused: bool = True):
        self.engine = engine
        geo = BlockGeometry(samplerate, block_time, crossfade_time,
                            extra_time)
        self.geometry = geo
        self.sr = samplerate
        self.zc = geo.zc
        self.block_frame = geo.block_frame
        self.block_frame_16k = 160 * geo.block_frame // geo.zc
        self.crossfade_frame = geo.crossfade_frame
        self.sola_buffer_frame = geo.sola_buffer_frame
        self.sola_search_frame = geo.sola_search_frame
        self.extra_frame = geo.extra_frame
        self.f0method = f0method
        self.rms_mix_rate = rms_mix_rate
        self.protect = protect
        self.use_pv = use_phase_vocoder

        total = geo.total
        self.input_wav = np.zeros(total, np.float32)
        self.input_wav_res = np.zeros(160 * total // self.zc, np.float32)
        self.sola_buffer = np.zeros(self.sola_buffer_frame, np.float32)
        self.fade_in_window = geo.fade_in
        self.fade_out_window = geo.fade_out
        self.skip_head = geo.skip_head
        self.return_length = geo.return_length
        # engine output sr must match stream sr (gui resampler2 role)
        self._out_resample = (self.engine.tgt_sr != samplerate)
        # spectral-gate denoisers (gui.py I/O_noise_reduce paths)
        self.input_noise_reduce = input_noise_reduce
        self.output_noise_reduce = output_noise_reduce
        if input_noise_reduce or output_noise_reduce:
            from tpu_rvc.audio.torchgate import TorchGate
            self._tg = TorchGate(sr=samplerate, n_fft=4 * self.zc,
                                 prop_decrease=0.9)
            self.input_wav_denoise = self.input_wav.copy()
            self.nr_buffer = np.zeros(self.sola_buffer_frame, np.float32)
            self.output_buffer = np.zeros(total, np.float32)
        # single-dispatch fused path (device-resident state); host fallback
        # covers noise-reduce / rms-mix / other-f0 configurations
        self._fused = None
        self._fused_saved = None  # kept when a slider disables the fast path
        if (fused and engine.if_f0 in (0, 1)
                and f0method in ("pm", "rmvpe", "fcpe")
                and not input_noise_reduce and not output_noise_reduce
                and rms_mix_rate >= 1.0 and engine.formant_shift == 0):
            try:
                self._fused = FusedStreamGraph(
                    engine, stream_sr=samplerate,
                    block_frame=self.block_frame,
                    ctx_frame=2 * self.zc, total_len=total,
                    skip_head=self.skip_head,
                    return_length=self.return_length,
                    f0method=f0method, protect=protect)
                self._fused_state = self._fused.init_state()
            except Exception:
                # e.g. rmvpe checkpoint unavailable: the host path will
                # surface the same error lazily, matching reference behavior
                self._fused = None

    # ---- mid-stream control (reference gui.py:518-592 slider events
    # calling rtrvc set_* while the stream runs) ----
    def set_key(self, key: float) -> None:
        self.engine.set_key(key)  # fused graph reads it per dispatch

    def set_formant(self, formant: float) -> None:
        # formant shift changes return_length2: the fused graph bakes it
        # in, so the host block path (which rebuilds its graph per formant
        # factor, reference rtrvc.py:249-259) takes over while the shift
        # is non-zero; the fast path is restored when it returns to 0.
        self.engine.set_formant(formant)
        self._update_fused_eligibility()

    def set_index_rate(self, rate: float) -> None:
        self.engine.set_index_rate(rate)

    def set_rms_mix_rate(self, rate: float) -> None:
        self.rms_mix_rate = float(rate)  # RMS mix is a host-path feature
        self._update_fused_eligibility()

    def _update_fused_eligibility(self) -> None:
        """Park/restore the fused single-dispatch graph as sliders leave/
        re-enter the fused-eligible configuration (returning a slider to
        neutral must not permanently strand the session on the
        several-round-trips-per-block host path)."""
        eligible = (self.engine.formant_shift == 0
                    and self.rms_mix_rate >= 1.0)
        if not eligible:
            if self._fused is not None:
                self._fused_saved = self._fused
                self._fused = None
                # back-fill the host path's 16 kHz window from the
                # always-fresh stream-rate buffer: while the fused path
                # ran, feed() returned before maintaining input_wav_res,
                # and the host graph must not resume on a mostly-zero
                # context (pitch caches refill over ~p_len frames, the
                # same warmup as the restore direction)
                res = np.asarray(resample_poly(
                    jnp.asarray(self.input_wav[None]), self.sr, SR))[0]
                L = len(self.input_wav_res)
                n = min(L, len(res))
                self.input_wav_res[:] = 0.0
                if n:
                    self.input_wav_res[-n:] = res[-n:]
        elif self._fused is None and self._fused_saved is not None:
            restored = self._fused_saved
            # re-seed the device window from the host rolling buffer
            # (kept fresh by feed() on both paths); pitch caches refill
            # over the next ~p_len frames, the same warmup a fresh
            # session has.  Stays on device (one small H2D, no fetch).
            state = restored.init_state()
            wav16 = resample_poly(
                jnp.asarray(self.input_wav[None]), self.sr, SR)[0]
            L = int(state["wav16"].shape[0])
            n = min(L, int(wav16.shape[0]))
            w = jnp.zeros(L, jnp.float32)
            if n:
                w = w.at[-n:].set(wav16[-n:])
            state["wav16"] = w
            # publish state BEFORE the graph: a concurrent feed() that
            # sees _fused non-None must never pair it with the stale
            # pre-park state
            self._fused_state = state
            self._fused_saved = None
            self._fused = restored

    def feed(self, block: np.ndarray) -> np.ndarray:
        """Process one block (len == block_frame at stream sr)."""
        assert len(block) == self.block_frame, \
            f"block must be {self.block_frame} samples"
        self.input_wav[:-self.block_frame] = self.input_wav[self.block_frame:]
        self.input_wav[-self.block_frame:] = block
        if self._fused is not None:
            seg48 = self.input_wav[-self.block_frame - 2 * self.zc:]
            infer_wav, self._fused_state = self._fused(
                self._fused_state, seg48)
            return self._merge_block(infer_wav)
        self.input_wav_res[:-self.block_frame_16k] = \
            self.input_wav_res[self.block_frame_16k:]
        if self.input_noise_reduce:
            # denoise the fresh block with crossfade against the previous
            # tail (gui.py:978-992)
            self.input_wav_denoise[:-self.block_frame] = \
                self.input_wav_denoise[self.block_frame:]
            seg_in = self.input_wav[-self.sola_buffer_frame -
                                    self.block_frame:].copy()
            den = self._tg(seg_in, self.input_wav).astype(np.float32)
            den[: self.sola_buffer_frame] *= self.fade_in_window
            den[: self.sola_buffer_frame] += (self.nr_buffer *
                                              self.fade_out_window)
            self.input_wav_denoise[-self.block_frame:] = \
                den[: self.block_frame]
            self.nr_buffer[:] = den[self.block_frame:
                                    self.block_frame +
                                    self.sola_buffer_frame]
            source_wav = self.input_wav_denoise
        else:
            source_wav = self.input_wav
        # resample the freshest audio (one extra zc of context, gui.py:997)
        seg = source_wav[-self.block_frame - 2 * self.zc:]
        res = np.asarray(resample_poly(jnp.asarray(seg[None]), self.sr, SR))[0]
        self.input_wav_res[-self.block_frame_16k - 160:] = \
            res[160: 160 + self.block_frame_16k + 160]

        infer_wav = self.engine.infer(
            self.input_wav_res, self.block_frame_16k, self.skip_head,
            self.return_length, self.f0method, self.protect)
        if self._out_resample:
            infer_wav = np.asarray(resample_poly(
                jnp.asarray(infer_wav[None]), self.engine.tgt_sr, self.sr))[0]
        if self.output_noise_reduce:
            # rolling output buffer as the noise profile (gui.py:1017-1026)
            self.output_buffer[:-self.block_frame] = \
                self.output_buffer[self.block_frame:]
            n_new = min(self.block_frame, len(infer_wav))
            self.output_buffer[-n_new:] = infer_wav[-n_new:]
            infer_wav = self._tg(infer_wav.astype(np.float32),
                                 self.output_buffer).astype(np.float32)
        need = (self.block_frame + self.sola_buffer_frame +
                self.sola_search_frame)
        if len(infer_wav) < need:
            infer_wav = np.pad(infer_wav, (0, need - len(infer_wav)))

        # RMS envelope mix (gui.py:1027-1056)
        if self.rms_mix_rate < 1:
            from tpu_rvc.audio.dsp import rms_envelope, _interp_to
            src = self.input_wav[self.extra_frame:]
            rms1 = _interp_to(rms_envelope(src[:len(infer_wav)], 4 * self.zc,
                                           self.zc), len(infer_wav))
            rms2 = np.maximum(_interp_to(
                rms_envelope(infer_wav, 4 * self.zc, self.zc),
                len(infer_wav)), 1e-3)
            infer_wav = infer_wav * np.power(
                rms1 / rms2, 1 - self.rms_mix_rate)

        return self._merge_block(infer_wav)

    def _merge_block(self, infer_wav: np.ndarray) -> np.ndarray:
        out, self.sola_buffer = sola_merge(
            infer_wav, self.sola_buffer, self.fade_in_window,
            self.fade_out_window, self.block_frame, self.sola_buffer_frame,
            self.sola_search_frame, use_pv=self.use_pv)
        return out


def sola_merge(infer_wav: np.ndarray, sola_buffer: np.ndarray,
               fade_in: np.ndarray, fade_out: np.ndarray,
               block_frame: int, sola_buffer_frame: int,
               sola_search_frame: int, use_pv: bool = False
               ) -> Tuple[np.ndarray, np.ndarray]:
    """SOLA alignment + crossfade merge of one converted block
    (gui.py:1058-1090): find the offset in the search window that best
    matches the previous block's tail, crossfade (or phase-vocoder) the
    seam, and return (aligned block, next sola_buffer).  Pure function of
    its inputs so multi-slot servers can keep one buffer per stream."""
    need = block_frame + sola_buffer_frame + sola_search_frame
    if len(infer_wav) < need:
        infer_wav = np.pad(infer_wav, (0, need - len(infer_wav)))
    # search window is EXACTLY buffer+search samples (gui.py:1058-1060):
    # valid-mode correlation then yields search+1 candidate offsets, so
    # sola_offset <= sola_search_frame and infer_wav[sola_offset:] always
    # retains >= block+buffer samples — one sample more and the seam
    # buffer for the NEXT block comes up short (soak-test regression)
    conv_input = infer_wav[:sola_buffer_frame + sola_search_frame]
    cor_nom = np.correlate(conv_input, sola_buffer, mode="valid")
    sq = np.convolve(conv_input ** 2,
                     np.ones(sola_buffer_frame), mode="valid")
    cor_den = np.sqrt(sq + 1e-8)
    k = min(len(cor_nom), len(cor_den))
    sola_offset = int(np.argmax(cor_nom[:k] / cor_den[:k]))
    infer_wav = np.array(infer_wav[sola_offset:])  # own writable copy
    if not use_pv:
        infer_wav[:sola_buffer_frame] = (
            infer_wav[:sola_buffer_frame] * fade_in +
            sola_buffer * fade_out)
    else:
        infer_wav[:sola_buffer_frame] = phase_vocoder(
            sola_buffer, infer_wav[:sola_buffer_frame], fade_out, fade_in)
    new_buffer = infer_wav[
        block_frame: block_frame + sola_buffer_frame].copy()
    return infer_wav[:block_frame].copy(), new_buffer


class FusedStreamGraph:
    """Single-dispatch streaming block (latency-critical path).

    The block-loop above (RealtimeVC.infer + StreamSession host glue) costs
    several device round-trips per block; on remote-attached chips each sync
    is ~27ms, blowing the <100ms p50 budget.  This graph fuses, per block:

        upload fresh 48k segment (tiny)
          -> device: resample to 16k, roll the 16k window state,
             pm f0 on the tail, roll the 1024-frame pitch cache
             (rtrvc.py:209-217), HuBERT on the window, tail retrieval,
             synthesizer streaming infer (skip_head/return_length),
             resample to stream rate
          -> fetch (block + crossfade + search) samples (tiny)

    All rolling state (16k window, pitch caches) lives on device and is
    threaded through the call (donated).  SOLA stays on host (it consumes
    the fetched audio anyway).
    """

    def __init__(self, engine: RealtimeVC, *, stream_sr: int,
                 block_frame: int, ctx_frame: int, total_len: int,
                 skip_head: int, return_length: int, f0method: str = "pm",
                 protect: float = 1.0, n_streams: int = 1):
        self.engine = engine
        self.n_streams = int(n_streams)
        self.stream_sr = stream_sr
        self.block_frame = block_frame          # stream-rate samples
        self.ctx_frame = ctx_frame              # extra context uploaded
        self.total_len = total_len              # stream-rate window length
        self.block_16k = 160 * block_frame // (stream_sr // 100)
        self.total_16k = 160 * total_len // (stream_sr // 100)
        self.skip_head = skip_head
        self.return_length = return_length
        self.f0method = f0method
        self.protect = protect
        self.use_f0 = engine.if_f0 == 1
        self._rmvpe_model, self._rmvpe_vars = None, {}
        if self.use_f0 and f0method in ("rmvpe", "fcpe"):
            est = engine.f0_gen._get(f0method)
            if getattr(est, "model", None) is None:
                self.f0method = f0method = "pm"  # ckpt-less fcpe fallback
            else:
                self._rmvpe_model = est.model
                self._rmvpe_vars = est.variables
        if self.n_streams == 1:
            self._jit = jax.jit(self._run, donate_argnums=(3,))
        else:
            # multi-stream serving: one dispatch advances every session
            # (state, fresh segment, noise key, and fed mask carry a
            # stream axis; weights and the retrieval index are shared)
            self._jit = jax.jit(
                jax.vmap(self._run,
                         in_axes=(None, None, None, 0, 0, None, None, None,
                                  None, None, 0, 0)),
                donate_argnums=(3,))
        if engine.aot_cache is not None:
            # warm-start the serving graph too (reference jit-cache role);
            # if jax.export rejects the donated state arg the wrapper
            # falls back to plain jit, never failing the hot path
            from tpu_rvc.utils.aot import _tree_shape_sig
            sig = _tree_shape_sig((engine.hubert_vars, engine.synth_vars))
            # the retrieval index rides in as a call argument whose SIZE
            # is pinned in the export's avals — key on it so restarting
            # with/without an index (or a different one) is a distinct
            # cache entry rather than a stale hit
            n = (engine.index.vectors.shape[0]
                 if engine.index is not None and engine.index_rate > 0
                 else 1)
            self._jit = engine.aot_cache.wrap(
                f"fused_stream|{engine.version}|{engine.tgt_sr}|"
                f"{jnp.dtype(engine.dtype).name}|{sig}|{n_streams}|"
                f"{stream_sr}|{block_frame}|{ctx_frame}|{total_len}|"
                f"{skip_head}|{return_length}|{self.f0method}|{protect}|"
                f"n={n}",
                self._jit)
        self._step = 0
        self._last_call_avals = None

    def init_state(self):
        state = {
            "wav16": jnp.zeros(self.total_16k, jnp.float32),
            "cache_pitch": jnp.zeros(1024, jnp.int32),
            "cache_pitchf": jnp.zeros(1024, jnp.float32),
        }
        if self.n_streams > 1:
            state = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (self.n_streams,) + x.shape),
                state)
        return state

    def _run(self, hubert_vars, synth_vars, rmvpe_vars, state, seg48,
             index_vecs, index_sq, index_rate, up_key, protect, noise_key,
             fed=True):
        # fed: per-stream bool — when False the stream was not given a new
        # block this tick, so its rolling state must NOT advance (the
        # batched dispatch has a static shape, so skipped slots still
        # compute; their state is reverted by the select at the end and
        # their output is discarded by the caller).
        eng = self.engine
        # 1. resample fresh segment to 16k, roll window state
        seg16 = resample_poly(seg48[None], self.stream_sr, SR)[0]
        n_new = self.block_16k + 160
        wav16 = jnp.concatenate(
            [state["wav16"][self.block_16k:],
             jnp.zeros(self.block_16k, jnp.float32)])
        wav16 = jax.lax.dynamic_update_slice(
            wav16, seg16[160:160 + n_new], (self.total_16k - n_new,))

        # 2. f0 on the tail + pitch cache roll (rtrvc.py:199-217)
        if self.use_f0:
            from tpu_rvc.f0.device import (pm_f0_device, rmvpe_f0_device,
                                           fcpe_f0_device)
            f0_frame = self.block_16k + 800
            if self.f0method == "rmvpe":
                # rmvpe tail padded to the reference's 5120-sample grid
                # (rtrvc.py:201-204)
                f0_frame = 5120 * ((f0_frame - 1) // 5120 + 1) - WINDOW
            f0_frame = min(f0_frame, self.total_16k)
            tail = jax.lax.dynamic_slice_in_dim(
                wav16, self.total_16k - f0_frame, f0_frame)
            if self.f0method == "rmvpe":
                c, f = rmvpe_f0_device(tail, f0_frame // WINDOW, up_key,
                                       self._rmvpe_model, rmvpe_vars,
                                       dtype=eng.dtype)
            elif self.f0method == "fcpe":
                c, f = fcpe_f0_device(tail, f0_frame // WINDOW, up_key,
                                      self._rmvpe_model, rmvpe_vars,
                                      dtype=eng.dtype)
            else:
                c, f = pm_f0_device(tail, f0_frame // WINDOW, up_key)
            shift = self.block_16k // WINDOW
            n_keep = c.shape[0] - 4
            cache_pitch = jnp.concatenate(
                [state["cache_pitch"][shift:],
                 jnp.zeros(shift, jnp.int32)])
            cache_pitchf = jnp.concatenate(
                [state["cache_pitchf"][shift:],
                 jnp.zeros(shift, jnp.float32)])
            cache_pitch = jax.lax.dynamic_update_slice(
                cache_pitch, c[3:-1], (1024 - n_keep,))
            cache_pitchf = jax.lax.dynamic_update_slice(
                cache_pitchf, f[3:-1], (1024 - n_keep,))
        else:
            cache_pitch = state["cache_pitch"]
            cache_pitchf = state["cache_pitchf"]
        p_len = self.total_16k // WINDOW
        pitch = cache_pitch[-p_len:]
        pitchf = cache_pitchf[-p_len:]

        # 3. HuBERT on the rolling window + tail retrieval + synth
        feats = eng.hubert.apply(hubert_vars,
                                 wav16[None].astype(eng.dtype))
        feats = jnp.concatenate([feats, feats[:, -1:]], axis=1)
        feats0 = feats
        has_index = index_vecs.shape[0] > 1
        if has_index:
            blended = knn_blend(feats[0, self.skip_head // 2:], index_vecs,
                                index_sq, index_rate)
            feats = feats.at[0, self.skip_head // 2:].set(
                blended.astype(feats.dtype))
        feats = jnp.repeat(feats, 2, axis=1)[:, :p_len]
        if self.use_f0 and self.protect < 0.5:
            feats0 = jnp.repeat(feats0, 2, axis=1)[:, :p_len]
            pitchff = jnp.where(pitchf > 0, 1.0, protect)[None, :, None]
            feats = feats * pitchff + feats0 * (1 - pitchff)
        from tpu_rvc.nn.attention import pallas_attention
        with pallas_attention():
            audio = eng.synth.apply(
                synth_vars, feats.astype(eng.dtype),
                jnp.asarray([p_len]), jnp.asarray([0]),
                pitch[None] if self.use_f0 else None,
                pitchf[None].astype(eng.dtype) if self.use_f0 else None,
                skip_head=self.skip_head,
                return_length=self.return_length,
                return_length2=self.return_length,
                method=eng.synth.infer, rngs={"noise": noise_key})
        out = audio[0, :, 0].astype(jnp.float32)
        # 4. to stream rate
        if eng.tgt_sr != self.stream_sr:
            out = resample_poly(out[None], eng.tgt_sr, self.stream_sr)[0]
        new_state = {"wav16": wav16, "cache_pitch": cache_pitch,
                     "cache_pitchf": cache_pitchf}
        new_state = jax.tree.map(
            lambda n, o: jnp.where(fed, n, o), new_state, state)
        return out, new_state

    def __call__(self, state, seg48: np.ndarray, fed=None, fetch=True):
        """fetch=False returns the output still on device (a later
        np.asarray triggers the D2H) — the tick-pipelining hook: the
        scheduler overlaps tick k's fetch with tick k+1's dispatch."""
        eng = self.engine
        if eng.index is not None and eng.index_rate > 0:
            vecs, sq = eng.index.device_arrays()
        else:
            d = 256 if eng.version == "v1" else 768
            vecs, sq = (jnp.zeros((1, d), jnp.float32),
                        jnp.zeros((1,), jnp.float32))
        self._step += 1
        if self.n_streams == 1:
            key = jax.random.PRNGKey(self._step)
            fed_arg = jnp.asarray(True if fed is None else bool(fed))
        else:
            key = jax.vmap(jax.random.fold_in, (None, 0))(
                jax.random.PRNGKey(self._step),
                jnp.arange(self.n_streams, dtype=jnp.uint32))
            fed_arg = (jnp.ones(self.n_streams, bool) if fed is None
                       else jnp.asarray(fed, bool))
        call_args = (eng.hubert_vars, eng.synth_vars, self._rmvpe_vars,
                     state, jnp.asarray(seg48),
                     vecs, sq, jnp.asarray(eng.index_rate, jnp.float32),
                     jnp.asarray(float(eng.f0_up_key)),
                     jnp.asarray(self.protect, jnp.float32),
                     key, fed_arg)
        if self._last_call_avals is None:  # roofline FLOP-count snapshot
            self._last_call_avals = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.result_type(x)),
                call_args)
        out, new_state = self._jit(*call_args)
        return (np.asarray(out) if fetch else out), new_state

    def last_graph_flops(self):
        """XLA-counted FLOPs of one block dispatch (utils/roofline.py)."""
        if self._last_call_avals is None:
            return None
        from tpu_rvc.utils.roofline import graph_flops
        return graph_flops(self._jit, *self._last_call_avals)
