"""Offline voice-conversion pipeline (reference infer/modules/vc/pipeline.py).

Flow per utterance (pipeline.py:186-366 semantics):
  1. 48 Hz Butterworth high-pass (zero phase)
  2. long audio (> x_max s) split at the quietest sample near every
     x_center-second boundary, searched within +-x_query s
  3. f0 once over the whole reflect-padded signal (coarse + continuous)
  4. per chunk: HuBERT -> retrieval blend -> 2x time upsample -> protect
     mask -> synthesizer.infer; trim the x_pad reflect padding
  5. RMS envelope mix, optional resample, int16 peak scaling

TPU-first rework: step 4 is ONE jitted device graph per bucketed chunk
length (chunks padded up to whole seconds; true lengths drive the masks),
and retrieval is an in-graph matmul top-k (no faiss host round trip,
reference pipeline.py:118-138).  The `times=[npy, f0, infer]` accounting is
preserved in the public API (reference modules.py:192).
"""

from __future__ import annotations

import math
import time
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.audio.dsp import change_rms, highpass_filter
from tpu_rvc.f0.gen import Generator as F0Generator
from tpu_rvc.retrieval.index import FeatureIndex
from tpu_rvc.retrieval.search import knn_blend
from tpu_rvc.ops.resample import resample_poly


SR = 16000
WINDOW = 160  # f0 / feature frame hop at 16 kHz


def _bucket(n: int, step: int = SR) -> int:
    return int(math.ceil(n / step)) * step


def _feat_frames(n16: int) -> int:
    """Feature frames after HuBERT's conv extractor (k=10,s=5 then 4x
    stride-2: (n-400)//320+1, hubert loader contract) x2 nearest time
    upsample — the single definition of the derived-shape formula used by
    the graph builders (train/extract.py uses the un-doubled count)."""
    return 2 * ((n16 - 400) // 320 + 1)


def silence_chunk_bounds(audio: np.ndarray, t_center: int, t_query: int,
                         t_max: int) -> List[int]:
    """Quietest-sample split points for long audio (reference
    pipeline.py:224-236): one cut near every t_center boundary, searched
    within +-t_query samples.  Empty list if audio fits in one chunk."""
    opt_ts: List[int] = []
    audio_pad_w = np.pad(audio, (WINDOW // 2, WINDOW // 2), mode="reflect")
    if audio_pad_w.shape[0] > t_max:
        audio_sum = np.zeros_like(audio)
        for i in range(WINDOW):
            audio_sum += np.abs(audio_pad_w[i: i - WINDOW])
        for t in range(t_center, audio.shape[0], t_center):
            win = audio_sum[t - t_query: t + t_query]
            opt_ts.append(t - t_query + int(np.argmin(win)))
    return opt_ts


def _device_change_rms(source, sr1, target, sr2, rate):
    """In-graph RMS envelope mix (reference change_rms, pipeline.py:26):
    target *= rms(source)^(1-rate) * rms(target)^(rate-1).  rate==1 is the
    identity (the jnp.where keeps one compiled graph for all rates)."""
    from tpu_rvc.ops.resample import linear_interp_1d

    def frame_rms(y, sr):
        frame, hop = sr // 2 * 2, sr // 2
        pad = frame // 2
        yp = jnp.pad(y, (pad, pad))
        n = 1 + (yp.shape[0] - frame) // hop
        idx = jnp.arange(n)[:, None] * hop + jnp.arange(frame)[None, :]
        return jnp.sqrt(jnp.mean(yp[idx] ** 2, axis=1))

    rms1 = linear_interp_1d(frame_rms(source, sr1), target.shape[0])
    rms2 = jnp.maximum(
        linear_interp_1d(frame_rms(target, sr2), target.shape[0]), 1e-6)
    mixed = target * jnp.power(rms1, 1.0 - rate) * jnp.power(rms2, rate - 1.0)
    return jnp.where(rate >= 1.0, target, mixed)


class Pipeline:
    def __init__(self, tgt_sr: int, *, hubert, hubert_vars, synth, synth_vars,
                 version: str = "v2", x_pad: float = 3.0, x_query: float = 10.0,
                 x_center: float = 60.0, x_max: float = 65.0,
                 rmvpe_root: str = "assets/rmvpe", is_half: bool = True,
                 dtype=jnp.float32, aot_cache=None,
                 noise_scale: float = 0.66666,
                 deterministic: bool = False):
        self.tgt_sr = tgt_sr
        # optional utils.aot.AOTGraphCache: fused conversion graphs are
        # StableHLO-serialized per (config, bucket) and reloaded without
        # retracing on the next process start (reference jit-cache role,
        # rvc/jit/jit.py:58)
        self.aot_cache = aot_cache
        # prior noise scale baked into the conversion graphs; 0.0 makes
        # the conversion deterministic (oracle MCD comparisons vs the
        # reference with torch.randn_like zeroed)
        self.noise_scale = float(noise_scale)
        # deterministic=True additionally zeroes the NSF source's random
        # harmonic phase and additive noise (SineGenerator) — required for
        # bit-comparable oracle runs; leave False in production
        self.deterministic = bool(deterministic)
        self.version = version
        self.hubert, self.hubert_vars = hubert, hubert_vars
        self.synth, self.synth_vars = synth, synth_vars
        self.dtype = dtype
        self.t_pad = int(SR * x_pad)
        self.t_pad_tgt = int(tgt_sr * x_pad)
        self.t_pad2 = self.t_pad * 2
        self.t_query = int(SR * x_query)
        self.t_center = int(SR * x_center)
        self.t_max = int(SR * x_max)
        self.f0_gen = F0Generator(rmvpe_root, is_half, x_pad,
                                  window=WINDOW, sr=SR)
        self._graphs: Dict[Tuple, Any] = {}
        # set when the last pipeline() call silently substituted an f0
        # method (e.g. "fcpe->pm (no checkpoint)"); surfaced by VC.vc_single
        self.last_f0_note: Optional[str] = None
        # (graph, arg avals) of the most recent fused full-graph dispatch;
        # consumed by last_graph_flops() for roofline/MFU accounting
        self._last_full_call: Optional[Tuple] = None

    def last_graph_flops(self) -> Optional[float]:
        """XLA-counted FLOPs of one dispatch of the most recent fused
        conversion graph (utils/roofline.py) — the MFU numerator the
        benchmarks record next to their walls."""
        if self._last_full_call is None:
            return None
        from tpu_rvc.utils.roofline import graph_flops
        graph, avals = self._last_full_call
        return graph_flops(graph, *avals)

    # ------------------------------------------------------------------
    def _chunk_graph(self, bucket_len: int, use_f0: bool, has_index: bool,
                     protect_on: bool):
        """Build/reuse the jitted per-chunk device graph."""
        key = (bucket_len, use_f0, has_index, protect_on)
        if key in self._graphs:
            return self._graphs[key]

        def run(hubert_vars, synth_vars, audio, true_len, sid, pitch,
                pitchf, index_vecs, index_sq, index_rate, protect, noise_key):
            # audio: (bucket_len,) float32 @16k; pitch/pitchf: (p_len,)
            # params are jit ARGUMENTS (closure capture would embed ~120MB
            # of weights into the serialized HLO)
            pos = jnp.arange(bucket_len)
            padding_mask = pos >= true_len
            feats = self.hubert.apply(hubert_vars,
                                      audio[None].astype(self.dtype),
                                      padding_mask[None])  # (1, F, D)
            feats0 = feats
            if has_index:
                feats = knn_blend(feats[0], index_vecs, index_sq,
                                  index_rate)[None]
            # 2x nearest time-upsample (reference F.interpolate scale 2)
            feats = jnp.repeat(feats, 2, axis=1)
            p_len_static = min(bucket_len // WINDOW, feats.shape[1])
            feats = feats[:, :p_len_static]
            if use_f0 and protect_on:
                feats0 = jnp.repeat(feats0, 2, axis=1)[:, :p_len_static]
                pitchff = jnp.where(pitchf > 0, 1.0, protect)[None, :, None]
                feats = feats * pitchff + feats0 * (1 - pitchff)
            true_frames = jnp.minimum(true_len // WINDOW, p_len_static)
            from tpu_rvc.nn.attention import pallas_attention
            with pallas_attention():
                audio_out = self.synth.apply(
                    synth_vars,
                    feats.astype(self.dtype),
                    true_frames[None],
                    sid[None],
                    pitch[None] if use_f0 else None,
                    pitchf[None].astype(self.dtype) if use_f0 else None,
                    noise_scale=self.noise_scale,
                    deterministic=self.deterministic,
                    method=self.synth.infer,
                    rngs={"noise": noise_key},
                )
            return audio_out[0, :, 0].astype(jnp.float32)

        jitted = jax.jit(run)
        self._graphs[key] = jitted
        return jitted

    # ------------------------------------------------------------------
    def _full_graph(self, L: int, use_f0: bool, has_index: bool,
                    protect_on: bool, f0_mode: str = "pm",
                    index_n: int = 0):
        """ONE jitted program for the common single-chunk utterance:
        device-side f0 + conversion + pad trimming.  Minimizes dispatch
        round-trips (each costs tunnel RTT on remote-attached devices):
        one upload, one call, one fetch.  f0_mode selects the in-graph
        estimator: "pm" (autocorrelation), "rmvpe" (E2E salience net) or
        "fcpe" (conv-conformer); estimator weights ride in as the
        rmvpe_vars jit argument."""
        key = ("full", L, use_f0, has_index, protect_on, f0_mode)
        if key in self._graphs:
            return self._graphs[key]
        bucket = _bucket(L)
        inner = self._chunk_graph(bucket, use_f0, has_index, protect_on)
        p_len = L // WINDOW
        upsample = math.prod(self.synth.upsample_rates)
        p_len_static = min(bucket // WINDOW, _feat_frames(bucket))
        true_frames = min(p_len, p_len_static)
        f0_model = (self.f0_gen._get(f0_mode).model
                    if use_f0 and f0_mode in ("rmvpe", "fcpe") else None)

        def run_full(hubert_vars, synth_vars, rmvpe_vars, audio, up_key, sid,
                     index_vecs, index_sq, index_rate, protect, rms_mix_rate,
                     noise_key):
            if use_f0:
                if f0_mode == "rmvpe":
                    from tpu_rvc.f0.device import rmvpe_f0_device
                    pitch, pitchf = rmvpe_f0_device(
                        audio, p_len, up_key, f0_model, rmvpe_vars,
                        dtype=self.dtype)
                elif f0_mode == "fcpe":
                    from tpu_rvc.f0.device import fcpe_f0_device
                    pitch, pitchf = fcpe_f0_device(
                        audio, p_len, up_key, f0_model, rmvpe_vars,
                        dtype=self.dtype)
                else:
                    from tpu_rvc.f0.device import pm_f0_device
                    pitch, pitchf = pm_f0_device(audio, p_len, up_key)
                pit = jnp.zeros(p_len_static, jnp.int32).at[:p_len].set(
                    pitch[:p_len_static])
                pitf = jnp.zeros(p_len_static, jnp.float32).at[:p_len].set(
                    pitchf[:p_len_static])
            else:
                pit = jnp.zeros(p_len_static, jnp.int32)
                pitf = jnp.zeros(p_len_static, jnp.float32)
            audio_b = jnp.zeros(bucket, jnp.float32).at[:L].set(audio)
            out = inner.__wrapped__(
                hubert_vars, synth_vars, audio_b, jnp.asarray(L), sid,
                pit, pitf, index_vecs, index_sq, index_rate, protect,
                noise_key)
            out = out[: true_frames * upsample]
            out = out[self.t_pad_tgt: out.shape[0] - self.t_pad_tgt]
            # device-side RMS envelope mix (reference change_rms,
            # pipeline.py:26) against the unpadded source region
            src16 = audio[self.t_pad: L - self.t_pad]
            out = _device_change_rms(src16, SR, out, self.tgt_sr,
                                     rms_mix_rate)
            # device-side int16 peak scaling (pipeline.py:356-360): the
            # fetch is half the bytes of fp32 and is the product format
            audio_max = jnp.max(jnp.abs(out)) / 0.99
            max_int16 = jnp.where(audio_max > 1, 32768.0 / audio_max, 32768.0)
            return jnp.clip(out * max_int16, -32768, 32767).astype(jnp.int16)

        fn = jax.jit(run_full)
        if self.aot_cache is not None:
            from tpu_rvc.utils.aot import _tree_shape_sig
            sig = _tree_shape_sig((self.hubert_vars, self.synth_vars))
            # index_n keys the retrieval index SIZE: the export's avals
            # pin (N, D), so a different index file must be a different
            # cache entry (a stale hit falls back + self-heals in aot.py)
            fn = self.aot_cache.wrap(
                f"vc_full|{self.version}|{self.tgt_sr}|"
                f"{jnp.dtype(self.dtype).name}|{sig}|{key}|n={index_n}|"
                f"ns={self.noise_scale}|det={self.deterministic}", fn)
        self._graphs[key] = fn
        return self._graphs[key]

    # ------------------------------------------------------------------
    def vc_chunk(self, audio_chunk, sid: int,
                 pitch, pitchf,
                 index: Optional[FeatureIndex], index_rate: float,
                 protect: float, times: List[float],
                 noise_seed: int = 0):
        """Convert one 16 kHz chunk -> target-sr audio ON DEVICE (reference
        vc, pipeline.py:76).  audio_chunk / pitch / pitchf may be numpy or
        device arrays; the return value stays on device (callers concatenate
        chunks and fetch once)."""
        use_f0 = pitch is not None
        has_index = index is not None and index_rate > 0
        protect_on = use_f0 and protect < 0.5
        L = int(audio_chunk.shape[0])
        bucket = _bucket(L)
        graph = self._chunk_graph(bucket, use_f0, has_index, protect_on)

        audio_dev = jnp.asarray(audio_chunk, jnp.float32)
        audio_pad = jnp.zeros(bucket, jnp.float32).at[:L].set(audio_dev)
        p_len_static = min(bucket // WINDOW, _feat_frames(bucket))
        if use_f0:
            pit = jnp.zeros(p_len_static, jnp.int32)
            pitf = jnp.zeros(p_len_static, jnp.float32)
            n = min(p_len_static, int(pitch.shape[0]))
            pit = pit.at[:n].set(jnp.asarray(pitch[:n], jnp.int32))
            pitf = pitf.at[:n].set(jnp.asarray(pitchf[:n], jnp.float32))
        else:
            pit = jnp.zeros(p_len_static, jnp.int32)
            pitf = jnp.zeros(p_len_static, jnp.float32)
        if has_index:
            vecs, sq = index.device_arrays()
        else:
            d = 256 if self.version == "v1" else 768
            vecs = jnp.zeros((1, d), jnp.float32)
            sq = jnp.zeros((1,), jnp.float32)

        t0 = time.time()
        out = graph(self.hubert_vars, self.synth_vars,
                    audio_pad, jnp.asarray(L), jnp.asarray(sid),
                    pit, pitf, vecs, sq,
                    jnp.asarray(index_rate, jnp.float32),
                    jnp.asarray(protect, jnp.float32),
                    jax.random.PRNGKey(noise_seed))
        times[2] += time.time() - t0
        # trim to the chunk's true frame count (device slice, no transfer)
        true_frames = min(L // WINDOW, p_len_static)
        upsample = math.prod(self.synth.upsample_rates)
        return out[: true_frames * upsample]

    # ------------------------------------------------------------------
    def pipeline(self, sid: int, audio: np.ndarray, times: List[float],
                 f0_up_key: int, f0_method: str,
                 index: Optional[FeatureIndex], index_rate: float,
                 if_f0: int, filter_radius: Optional[float],
                 resample_sr: int, rms_mix_rate: float, protect: float,
                 f0_file: Optional[np.ndarray] = None,
                 noise_seed: int = 0, fetch: bool = True) -> np.ndarray:
        """Full conversion (reference pipeline, pipeline.py:186)."""
        self.last_f0_note = None
        audio = highpass_filter(np.asarray(audio, np.float32))

        # silence-point chunking for long audio (pipeline.py:224-236)
        opt_ts = silence_chunk_bounds(audio, self.t_center, self.t_query,
                                      self.t_max)

        audio_pad = np.pad(audio, (self.t_pad, self.t_pad), mode="reflect")
        p_len = audio_pad.shape[0] // WINDOW

        # fused fast path: single chunk + device-side f0 -> ONE device call
        if (not opt_ts and f0_file is None and
                (if_f0 == 0 or
                 (if_f0 == 1 and f0_method in ("pm", "rmvpe", "fcpe")))):
            use_f0 = bool(if_f0)
            has_index = index is not None and index_rate > 0
            protect_on = use_f0 and protect < 0.5
            if has_index:
                vecs, sq = index.device_arrays()
            else:
                d = 256 if self.version == "v1" else 768
                vecs, sq = (jnp.zeros((1, d), jnp.float32),
                            jnp.zeros((1,), jnp.float32))
            # bucket the padded length to the 1 s grid so XLA compiles
            # ONE full graph per bucket, not per distinct utterance
            # length (each compile costs minutes on remote devices); the
            # tail is reflect-extended so the in-graph RMS envelope and
            # int16 peak scaling see audio-like samples, and the output
            # is trimmed back to the true length below
            L_true = audio_pad.shape[0]
            L = _bucket(L_true)
            if L != L_true:
                extra = L - L_true
                audio_pad = np.pad(
                    audio_pad, (0, extra),
                    mode="reflect" if extra < L_true else "constant")
            f0_mode = f0_method if use_f0 else "pm"
            if f0_mode == "fcpe" and \
                    self.f0_gen._get("fcpe").model is None:
                f0_mode = "pm"  # no fcpe ckpt: estimator falls back to PM
                self.last_f0_note = "fcpe->pm (no checkpoint)"
            graph = self._full_graph(L, use_f0, has_index, protect_on,
                                     f0_mode, index_n=int(vecs.shape[0]))
            rmvpe_vars = (self.f0_gen._get(f0_mode).variables
                          if use_f0 and f0_mode in ("rmvpe", "fcpe") else {})
            t0 = time.time()
            call_args = (self.hubert_vars, self.synth_vars, rmvpe_vars,
                         jnp.asarray(audio_pad),
                         jnp.asarray(float(f0_up_key)), jnp.asarray(sid),
                         vecs, sq, jnp.asarray(index_rate, jnp.float32),
                         jnp.asarray(protect, jnp.float32),
                         jnp.asarray(rms_mix_rate, jnp.float32),
                         jax.random.PRNGKey(noise_seed))
            # aval snapshot for roofline FLOP counting (last_graph_flops)
            self._last_full_call = (graph, jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(jnp.shape(x),
                                               jnp.result_type(x)),
                call_args))
            out = graph(*call_args)
            if L != L_true:  # trim the bucket tail to the true length
                upsample = math.prod(self.synth.upsample_rates)
                p_len_static = min(L // WINDOW, _feat_frames(L))
                n_true = (min(L_true // WINDOW, p_len_static) * upsample
                          - 2 * self.t_pad_tgt)
                out = out[:n_true]
            if self.tgt_sr != resample_sr and resample_sr >= SR:
                out = resample_poly(
                    (out.astype(jnp.float32) / 32768.0)[None],
                    self.tgt_sr, resample_sr)[0]
                out = jnp.clip(out * 32768.0, -32768, 32767).astype(jnp.int16)
            if not fetch:  # leave on device (throughput pipelining)
                times[2] += time.time() - t0
                return out
            result = np.asarray(out)  # single device->host fetch (int16)
            times[2] += time.time() - t0
            return result

        audio_pad_dev = jnp.asarray(audio_pad)  # single H2D upload
        pitch = pitchf = None
        if if_f0:
            t0 = time.time()
            if if_f0 == 2:
                # precomputed track passed through f0_method
                # (reference pipeline.py:268; used by model hashing)
                pitch, pitchf = f0_method
                pitch = jnp.asarray(np.asarray(pitch)[:p_len], jnp.int32)
                pitchf = jnp.asarray(np.asarray(pitchf,
                                                np.float32)[:p_len])
            elif f0_method == "pm" and f0_file is None:
                # fully device-resident f0 (no host round trip), compiled
                # per 1 s LENGTH BUCKET, not per exact utterance length
                from tpu_rvc.f0.device import pm_f0_device
                Lb = _bucket(audio_pad.shape[0])
                p_len_b = Lb // WINDOW
                key = (p_len_b, "pm_dev")
                if key not in self._graphs:
                    self._graphs[key] = jax.jit(
                        lambda w, k, n=p_len_b: pm_f0_device(w, n, k))
                audio_b = (audio_pad_dev if Lb == audio_pad.shape[0] else
                           jnp.zeros(Lb, jnp.float32)
                           .at[:audio_pad.shape[0]].set(audio_pad_dev))
                pitch, pitchf = self._graphs[key](
                    audio_b, jnp.asarray(float(f0_up_key)))
                pitch, pitchf = pitch[:p_len], pitchf[:p_len]
            else:
                if (f0_method == "fcpe"
                        and self.f0_gen._get("fcpe").model is None):
                    # estimator falls back to PM internally; surface it in
                    # the info string like the fused path does
                    self.last_f0_note = "fcpe->pm (no checkpoint)"
                c, f = self.f0_gen.calculate(
                    audio_pad, p_len, f0_up_key, f0_method, filter_radius,
                    f0_file)
                pitch = jnp.asarray(np.asarray(c)[:p_len], jnp.int32)
                pitchf = jnp.asarray(np.asarray(f, np.float32)[:p_len])
            times[1] += time.time() - t0

        audio_opt = []
        s, t = 0, None
        for t in opt_ts:
            t = t // WINDOW * WINDOW
            chunk = audio_pad_dev[s: t + self.t_pad2 + WINDOW]
            pi = pitch[s // WINDOW: (t + self.t_pad2) // WINDOW] if if_f0 else None
            pf = pitchf[s // WINDOW: (t + self.t_pad2) // WINDOW] if if_f0 else None
            out = self.vc_chunk(chunk, sid, pi, pf, index, index_rate,
                                protect, times, noise_seed)
            audio_opt.append(out[self.t_pad_tgt: -self.t_pad_tgt])
            s = t
        chunk = audio_pad_dev[t:] if t is not None else audio_pad_dev
        pi = (pitch[t // WINDOW:] if t is not None else pitch) if if_f0 else None
        pf = (pitchf[t // WINDOW:] if t is not None else pitchf) if if_f0 else None
        out = self.vc_chunk(chunk, sid, pi, pf, index, index_rate, protect,
                            times, noise_seed)
        audio_opt.append(out[self.t_pad_tgt: -self.t_pad_tgt])

        # single D2H fetch of the whole utterance
        result = np.asarray(jnp.concatenate(audio_opt)) \
            if len(audio_opt) > 1 else np.asarray(audio_opt[0])
        if rms_mix_rate != 1:
            result = change_rms(audio, SR, result, self.tgt_sr, rms_mix_rate)
        if self.tgt_sr != resample_sr and resample_sr >= SR:
            result = np.asarray(resample_poly(jnp.asarray(result[None]),
                                              self.tgt_sr, resample_sr))[0]
        audio_max = np.abs(result).max() / 0.99
        max_int16 = 32768.0
        if audio_max > 1:
            max_int16 /= audio_max
        return (result * max_int16).astype(np.int16)


class VC:
    """Model-lifecycle facade (reference infer/modules/vc/modules.py:18)."""

    def __init__(self, version_default: str = "v2", is_half: bool = True,
                 rmvpe_root: str = "assets/rmvpe",
                 hubert_path: str = "assets/hubert/hubert_base.pt",
                 x_pad: float = 3.0, aot_dir: Optional[str] = None):
        self.is_half = is_half
        self.rmvpe_root = rmvpe_root
        self.hubert_path = hubert_path
        self.x_pad = x_pad
        # aot_dir: StableHLO warm-start cache for the fused conversion
        # graphs (reference rvc/jit/jit.py:58 get_jit_model role)
        self.aot_cache = None
        if aot_dir:
            from tpu_rvc.utils.aot import AOTGraphCache
            self.aot_cache = AOTGraphCache(aot_dir)
        self.pipeline: Optional[Pipeline] = None
        self.tgt_sr: Optional[int] = None
        self.version: Optional[str] = None
        self.if_f0 = 1
        self.n_spk: Optional[int] = None
        self._hubert = None

    def get_vc(self, model_path: str, hubert=None, hubert_vars=None):
        """Load a small model + (lazily) HuBERT; build the pipeline
        (reference VC.get_vc, modules.py:32)."""
        from tpu_rvc.models.loader import load_synthesizer

        synth, synth_vars, meta = load_synthesizer(model_path)
        self.tgt_sr = synth.sr
        self.version = meta.get("version", "v1")
        self.if_f0 = int(meta.get("f0", 1))
        self.n_spk = synth.spk_embed_dim
        if hubert is None:
            if self._hubert is None:
                if self.hubert_path == "random":
                    # weightless smoke/bench mode (no assets available)
                    import jax
                    import jax.numpy as jnp
                    from tpu_rvc.models.hubert import hubert_for_version
                    hub = hubert_for_version(self.version)
                    hv = hub.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 16000)))
                    self._hubert = (hub, hv)
                else:
                    from tpu_rvc.ckpt.hubert_loader import load_hubert_base
                    self._hubert = load_hubert_base(self.hubert_path,
                                                    self.version)
            hubert, hubert_vars = self._hubert
        self.pipeline = Pipeline(
            self.tgt_sr, hubert=hubert, hubert_vars=hubert_vars,
            synth=synth, synth_vars=synth_vars, version=self.version,
            rmvpe_root=self.rmvpe_root, is_half=self.is_half,
            x_pad=self.x_pad, aot_cache=self.aot_cache)
        return meta

    def vc_single(self, sid: int, input_audio_path: str, f0_up_key: int = 0,
                  f0_method: str = "rmvpe", index: Optional[FeatureIndex] = None,
                  index_rate: float = 0.75, filter_radius: int = 3,
                  resample_sr: int = 0, rms_mix_rate: float = 0.25,
                  protect: float = 0.33, f0_file=None, fetch: bool = True,
                  chunk_parallel: bool = False):
        """Convert one file (reference vc_single, modules.py:117).
        Returns (info_message, (sr, int16 audio)).  fetch=False may leave
        the audio on device (callers fetch with np.asarray) so batch
        callers can overlap the D2H transfer with the next dispatch.
        chunk_parallel=True shards a long file's silence-split chunks over
        every visible device (tpu_rvc.parallel.convert_long) — a scaling
        mode the reference does not have."""
        from tpu_rvc.audio.io import load_audio

        if self.pipeline is None:
            raise RuntimeError("call get_vc first")
        audio = load_audio(input_audio_path, SR)
        if len(audio) == 0:
            raise ValueError(f"{input_audio_path}: empty audio")
        audio_max = np.abs(audio).max() / 0.95
        if audio_max > 1:
            audio = audio / audio_max
        times = [0.0, 0.0, 0.0]
        if chunk_parallel and f0_file is None:
            import jax
            from tpu_rvc.core.mesh import make_mesh
            from tpu_rvc.parallel.chunks import convert_long
            t0 = time.time()
            out = convert_long(
                self.pipeline, sid, audio,
                make_mesh(n_data=jax.device_count()),
                f0_up_key=f0_up_key, f0_method=f0_method, index=index,
                index_rate=index_rate, if_f0=self.if_f0,
                filter_radius=filter_radius, resample_sr=resample_sr,
                rms_mix_rate=rms_mix_rate, protect=protect)
            times[2] += time.time() - t0
        else:
            out = self.pipeline.pipeline(
                sid, audio, times, f0_up_key, f0_method, index, index_rate,
                self.if_f0, filter_radius, resample_sr, rms_mix_rate,
                protect, f0_file, fetch=fetch)
        tgt = (resample_sr if self.tgt_sr != resample_sr and
               resample_sr >= SR else self.tgt_sr)
        info = (f"npy: {times[0]:.2f}s, f0: {times[1]:.2f}s, "
                f"infer: {times[2]:.2f}s")
        if getattr(self.pipeline, "last_f0_note", None):
            info += f" [f0 {self.pipeline.last_f0_note}]"
        return info, (tgt, out)

    def vc_multi(self, sid: int, paths: List[str], out_dir: str, **kwargs):
        """Batch conversion (reference vc_multi, modules.py:201) with
        pipelined fetch+save on a 2-thread pool: utterance N's D2H
        transfer and wav write overlap utterance N+1's host prep and
        dispatch, and two transfers overlap each other through the
        tunnel (measured 1.5-1.6x, benchmarks/fetch_concurrency.py).
        In-flight depth is bounded at 2 to cap device-buffer residency;
        result lines keep the input order."""
        import collections
        import concurrent.futures as cf
        import os
        from tpu_rvc.audio.io import save_audio

        os.makedirs(out_dir, exist_ok=True)
        infos = []
        pool = cf.ThreadPoolExecutor(2)
        inflight = collections.deque()  # futures in dispatch order

        def flush(base, sr, audio, info):
            try:
                save_audio(os.path.join(out_dir, f"{base}.wav"),
                           np.asarray(audio), sr)
            except Exception as e:  # attribute the failure to its input
                return f"{base} -> {e}"
            return f"{base} -> Success ({info})"

        def drain(keep: int):
            while len(inflight) > keep:
                infos.append(inflight.popleft().result())

        try:
            for path in paths:
                base = os.path.basename(path)
                try:
                    info, (sr, audio) = self.vc_single(sid, path,
                                                       fetch=False, **kwargs)
                except Exception as e:  # pragma: no cover
                    drain(0)  # keep result order stable
                    infos.append(f"{path} -> {e}")
                    continue
                inflight.append(pool.submit(flush, base, sr, audio, info))
                drain(2)
            drain(0)
        finally:
            pool.shutdown()
        return "\n".join(infos)
