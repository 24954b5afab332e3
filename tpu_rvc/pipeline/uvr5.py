"""UVR5 vocal/instrument separation pipeline
(reference infer/modules/uvr5/vr.py `AudioPre` + lib_v5/spec_utils.py).

Flow: per band (multirate pyramid from the model's param JSON) resample +
STFT -> combine into one stacked spectrogram -> normalized sliding-window
CascadedASPPNet inference (optional TTA: half-window-shifted second pass
averaged in) -> mask -> instrument/vocal spectra -> per-band lp/hp filters
+ iSTFT + mirrored high-end restore -> sum.

Host orchestrates; each window runs through one jitted model call (all
windows share a shape, so a single compilation serves the whole file).
"""

from __future__ import annotations

import json
import math
import os
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.audio.io import load_audio
from tpu_rvc.ops.stft import stft as jstft, istft as jistft

PARAMS_DIR = Path(__file__).parent.parent / "assets" / "uvr5_params"


class ModelParameters:
    """Band-pyramid parameters (reference model_param_init.py)."""

    def __init__(self, config_path: str = "4band_v2.json"):
        p = Path(config_path)
        if not p.exists():
            p = PARAMS_DIR / config_path
        def int_keys(pairs):
            return {int(k) if isinstance(k, str) and k.isdigit() else k: v
                    for k, v in pairs}
        self.param = json.loads(p.read_text(), object_pairs_hook=int_keys)
        for k in ("mid_side", "mid_side_b", "mid_side_b2", "stereo_w",
                  "stereo_n", "reverse"):
            self.param.setdefault(k, False)


# complex arrays must not cross the host<->device boundary: the TPU
# runtime's transfer path rejects complex program inputs/outputs
# (UNIMPLEMENTED) — ship (real, imag) float pairs and pair them host-side
@partial(jax.jit, static_argnums=(1, 2))
def _stft_pair(w, n_fft: int, hop: int):
    s = jstft(w, n_fft, hop)
    return s.real, s.imag


@partial(jax.jit, static_argnums=(2,))
def _istft_pair(re, im, hop: int):
    n_fft = (re.shape[1] - 1) * 2
    return jistft(jax.lax.complex(re, im), n_fft, hop)


def _stft_stereo(wave: np.ndarray, n_fft: int, hop: int) -> np.ndarray:
    """(2, T) -> (2, F, frames) complex (librosa.stft center=True parity)."""
    pad = n_fft // 2
    w = np.pad(wave, ((0, 0), (pad, pad)), mode="reflect")
    re, im = _stft_pair(jnp.asarray(w), n_fft, hop)
    return np.asarray(re) + 1j * np.asarray(im)


def _istft_stereo(spec: np.ndarray, hop: int) -> np.ndarray:
    n_fft = (spec.shape[1] - 1) * 2
    spec = np.asarray(spec, np.complex64)
    y = np.asarray(_istft_pair(jnp.asarray(spec.real), jnp.asarray(spec.imag),
                               hop))
    pad = n_fft // 2
    return y[:, pad:-pad]


def _resample(wave: np.ndarray, sr_from: int, sr_to: int) -> np.ndarray:
    from scipy.signal import resample_poly
    g = math.gcd(sr_from, sr_to)
    return resample_poly(wave, sr_to // g, sr_from // g, axis=-1).astype(
        np.float32)


def fft_lp_filter(spec, start, stop):
    g = 1.0
    spec = spec.copy()
    for b in range(start, stop):
        g -= 1 / (stop - start)
        spec[:, b, :] = g * spec[:, b, :]
    spec[:, stop:, :] *= 0
    return spec


def fft_hp_filter(spec, start, stop):
    g = 1.0
    spec = spec.copy()
    for b in range(start, stop, -1):
        g -= 1 / (start - stop)
        spec[:, b, :] = g * spec[:, b, :]
    spec[:, 0:stop + 1, :] *= 0
    return spec


def combine_spectrograms(specs: Dict[int, np.ndarray], mp: ModelParameters
                         ) -> np.ndarray:
    l = min(specs[i].shape[2] for i in specs)
    out = np.zeros((2, mp.param["bins"] + 1, l), np.complex64)
    offset = 0
    bands_n = len(mp.param["band"])
    for d in range(1, bands_n + 1):
        bp = mp.param["band"][d]
        h = bp["crop_stop"] - bp["crop_start"]
        out[:, offset:offset + h, :l] = \
            specs[d][:, bp["crop_start"]:bp["crop_stop"], :l]
        offset += h
    if mp.param["pre_filter_start"] > 0:
        if bands_n == 1:
            out = fft_lp_filter(out, mp.param["pre_filter_start"],
                                mp.param["pre_filter_stop"])
        else:
            gp = 1.0
            for b in range(mp.param["pre_filter_start"] + 1,
                           mp.param["pre_filter_stop"]):
                g = 10 ** (-(b - mp.param["pre_filter_start"]) * (3.5 - gp) / 20.0)
                gp = g
                out[:, b, :] *= g
    return out


def mirroring(mode: str, spec_m: np.ndarray, input_high_end: np.ndarray,
              pre_filter_start: int) -> np.ndarray:
    mirror = np.flip(np.abs(
        spec_m[:, pre_filter_start - 10 - input_high_end.shape[1]:
               pre_filter_start - 10, :]), 1)
    if mode == "mirroring":
        mirror = mirror * np.exp(1.0j * np.angle(input_high_end))
        return np.where(np.abs(input_high_end) <= np.abs(mirror),
                        input_high_end, mirror)
    mi = np.multiply(mirror, input_high_end * 1.7)
    return np.where(np.abs(input_high_end) <= np.abs(mi), input_high_end, mi)


def cmb_spectrogram_to_wave(spec_m: np.ndarray, mp: ModelParameters,
                            extra_bins_h: Optional[int] = None,
                            extra_bins: Optional[np.ndarray] = None
                            ) -> np.ndarray:
    bands_n = len(mp.param["band"])
    offset = 0
    wave = None
    for d in range(1, bands_n + 1):
        bp = mp.param["band"][d]
        spec_s = np.zeros((2, bp["n_fft"] // 2 + 1, spec_m.shape[2]),
                          np.complex64)
        h = bp["crop_stop"] - bp["crop_start"]
        spec_s[:, bp["crop_start"]:bp["crop_stop"]] = \
            spec_m[:, offset:offset + h]
        offset += h
        if d == bands_n:  # highest band
            if extra_bins_h:
                max_bin = bp["n_fft"] // 2
                spec_s[:, max_bin - extra_bins_h:max_bin] = \
                    extra_bins[:, :extra_bins_h]
            if bp.get("hpf_start", 0) > 0:
                spec_s = fft_hp_filter(spec_s, bp["hpf_start"],
                                       bp["hpf_stop"] - 1)
            band_wave = _istft_stereo(spec_s, bp["hl"])
            wave = band_wave if bands_n == 1 else wave + band_wave
        else:
            sr_next = mp.param["band"][d + 1]["sr"]
            if d == 1:
                spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                wave = _resample(_istft_stereo(spec_s, bp["hl"]),
                                 bp["sr"], sr_next)
            else:
                spec_s = fft_hp_filter(spec_s, bp["hpf_start"],
                                       bp["hpf_stop"] - 1)
                spec_s = fft_lp_filter(spec_s, bp["lpf_start"], bp["lpf_stop"])
                w2 = wave[:, :] if wave is not None else 0
                band_wave = _istft_stereo(spec_s, bp["hl"])
                n = min(band_wave.shape[1], wave.shape[1])
                wave = _resample(wave[:, :n] + band_wave[:, :n],
                                 bp["sr"], sr_next)
    return wave.T  # (T, 2)


def make_padding(width: int, cropsize: int, offset: int):
    left = offset
    roi_size = cropsize - left * 2
    if roi_size == 0:
        roi_size = cropsize
    right = roi_size - (width % roi_size) + left
    return left, right, roi_size


class UVR5Separator:
    """AudioPre role (reference vr.py:18): load once, separate many."""

    def __init__(self, model, variables, mp: ModelParameters,
                 agg: float = 10.0, tta: bool = False,
                 window_size: int = 512,
                 high_end_process: str = "mirroring",
                 is_reverse: bool = False, dtype=jnp.float32):
        self.model = model
        self.variables = variables
        self.mp = mp
        self.agg = agg
        self.tta = tta
        self.window_size = window_size
        self.high_end_process = high_end_process
        self.is_reverse = is_reverse  # DeEcho models predict the complement
        self.dtype = dtype
        self._jit = None

    def _predict_window(self, window: np.ndarray, aggressiveness) -> np.ndarray:
        # window: (2, F, win) -> model NHWC (1, F, win, 2)
        if self._jit is None:
            def f(variables, x, value):
                xin = jnp.transpose(x, (1, 2, 0))[None].astype(self.dtype)
                out = self.model.apply(
                    variables, xin,
                    aggressiveness=(value, aggressiveness[1]))
                return jnp.transpose(out[0], (2, 0, 1)).astype(jnp.float32)
            self._jit = jax.jit(f)
        pred = np.asarray(self._jit(self.variables, jnp.asarray(window),
                                    jnp.asarray(aggressiveness[0])))
        off = self.model.offset
        return pred[:, :, off:-off] if off > 0 else pred

    def _inference(self, spec: np.ndarray, aggressiveness) -> Tuple:
        """Sliding-window inference (reference uvr5_pack/utils.py:16)."""
        x_mag = np.abs(spec)
        x_phase = np.angle(spec)
        coef = x_mag.max()
        x_pre = x_mag / max(coef, 1e-8)
        n_frame = x_pre.shape[2]
        pad_l, pad_r, roi = make_padding(n_frame, self.window_size,
                                         self.model.offset)

        def run_pass(pad_l, pad_r, n_window):
            xp = np.pad(x_pre, ((0, 0), (0, 0), (pad_l, pad_r)))
            preds = []
            for i in range(n_window):
                s = i * roi
                preds.append(self._predict_window(
                    xp[:, :, s:s + self.window_size], aggressiveness))
            return np.concatenate(preds, axis=2)

        n_window = int(np.ceil(n_frame / roi))
        pred = run_pass(pad_l, pad_r, n_window)[:, :, :n_frame]
        if self.tta:
            pred_tta = run_pass(pad_l + roi // 2, pad_r + roi // 2,
                                n_window + 1)
            pred = (pred + pred_tta[:, :, roi // 2: roi // 2 + n_frame]) * 0.5
        return pred * coef, x_mag, np.exp(1.0j * x_phase)

    def separate(self, music_file: str) -> Tuple[np.ndarray, np.ndarray, int]:
        """Returns (instrument (T,2), vocal (T,2), sr)."""
        bands_n = len(self.mp.param["band"])
        x_wave, x_spec = {}, {}
        input_high_end = input_high_end_h = None
        for d in range(bands_n, 0, -1):
            bp = self.mp.param["band"][d]
            if d == bands_n:
                mono = load_audio(music_file, bp["sr"])
                x_wave[d] = np.stack([mono, mono]) if mono.ndim == 1 else mono
                # stereo path: load_audio currently downmixes; duplicate
            else:
                x_wave[d] = _resample(x_wave[d + 1],
                                      self.mp.param["band"][d + 1]["sr"],
                                      bp["sr"])
            x_spec[d] = _stft_stereo(x_wave[d], bp["n_fft"], bp["hl"])
            if d == bands_n and self.high_end_process != "none":
                input_high_end_h = (bp["n_fft"] // 2 - bp["crop_stop"]) + (
                    self.mp.param["pre_filter_stop"]
                    - self.mp.param["pre_filter_start"])
                input_high_end = x_spec[d][
                    :, bp["n_fft"] // 2 - input_high_end_h: bp["n_fft"] // 2, :]

        spec_m = combine_spectrograms(x_spec, self.mp)
        aggressiveness = (self.agg / 100.0,
                          self.mp.param["band"][1]["crop_stop"])
        pred, x_mag, x_phase = self._inference(spec_m, aggressiveness)
        y_spec_m = pred * x_phase        # instruments
        v_spec_m = spec_m - y_spec_m     # vocals

        def to_wave(spec):
            if self.high_end_process.startswith("mirroring"):
                he = mirroring(self.high_end_process, spec, input_high_end,
                               self.mp.param["pre_filter_start"])
                return cmb_spectrogram_to_wave(spec, self.mp,
                                               input_high_end_h, he)
            return cmb_spectrogram_to_wave(spec, self.mp)

        ins = to_wave(y_spec_m)
        voc = to_wave(v_spec_m)
        if self.is_reverse:
            ins, voc = voc, ins
        return ins, voc, self.mp.param["sr"]


def _lp_gain(F: int, start: int, stop: int) -> np.ndarray:
    """Per-bin gain vector of fft_lp_filter (same loop, vectorized form)."""
    v = np.ones(F, np.float32)
    g = 1.0
    for b in range(start, stop):
        g -= 1 / (stop - start)
        v[b] = g
    v[stop:] = 0.0
    return v


def _hp_gain(F: int, start: int, stop: int) -> np.ndarray:
    """Per-bin gain vector of fft_hp_filter."""
    v = np.ones(F, np.float32)
    g = 1.0
    for b in range(start, stop, -1):
        g -= 1 / (start - stop)
        v[b] = g
    v[: stop + 1] = 0.0
    return v


class DeviceSeparator:
    """Fully device-resident UVR5 separation (TPU-first rework of
    `UVR5Separator.separate`, reference vr.py:51-173 + spec_utils.py).

    The host path round-trips every band's spectrogram through numpy as
    (real, imag) pairs and dispatches sliding windows one at a time —
    ruinous over a remote-attached chip where D2H costs 0.1-10 s/MB.
    Here the ENTIRE flow — band resample pyramid, 4x STFT, combine,
    normalized batched-window CascadedASPPNet (+TTA), mask, mirrored
    high-end restore, per-band gain filters, 4x iSTFT, upsample-sum — is
    ONE jitted graph per input-length bucket.  Host I/O is exactly one
    (2, T) float32 upload and two (T, 2) int16 fetches per file.

    Complex math stays inside the graph (allowed); only float tensors
    cross the host<->device boundary (CLAUDE.md: complex64 program
    inputs/outputs are UNIMPLEMENTED on this backend).
    """

    def __init__(self, sep: "UVR5Separator", bucket_s: float = 5.0,
                 aot_cache=None):
        self.sep = sep
        self.bucket_s = bucket_s
        self.aot_cache = aot_cache  # utils.aot.AOTGraphCache (warm start)
        self._graphs: Dict[int, object] = {}

    # -- graph builder ----------------------------------------------------
    def _build(self, T4: int):
        sep, mp = self.sep, self.sep.mp
        p = mp.param
        bands_n = len(p["band"])
        F_all = p["bins"] + 1
        win, off = sep.window_size, sep.model.offset
        dtype = sep.dtype

        # static pre-filter gain vector (combine_spectrograms tail)
        pre = np.ones(F_all, np.float32)
        if p["pre_filter_start"] > 0:
            if bands_n == 1:
                pre = _lp_gain(F_all, p["pre_filter_start"],
                               p["pre_filter_stop"])
            else:
                gp = 1.0
                for b in range(p["pre_filter_start"] + 1,
                               p["pre_filter_stop"]):
                    g = 10 ** (-(b - p["pre_filter_start"])
                               * (3.5 - gp) / 20.0)
                    gp = g
                    pre[b] = g

        from tpu_rvc.ops.resample import resample_poly

        def band_specs(wav):
            """wav (2, T4) @ band-N sr -> {d: complex spec}, high_end."""
            w = {bands_n: wav}
            for d in range(bands_n - 1, 0, -1):
                sp = p["band"][d + 1]["sr"]
                sn = p["band"][d]["sr"]
                w[d] = w[d + 1] if sp == sn else resample_poly(
                    w[d + 1], sp, sn)
            specs = {}
            for d in range(1, bands_n + 1):
                bp = p["band"][d]
                padw = bp["n_fft"] // 2
                wp = jnp.pad(w[d], ((0, 0), (padw, padw)), mode="reflect")
                specs[d] = jstft(wp, bp["n_fft"], bp["hl"])
            return specs

        def graph(variables, wav, agg_value):
            specs = band_specs(wav)
            bp_top = p["band"][bands_n]
            he_h = (bp_top["n_fft"] // 2 - bp_top["crop_stop"]) + (
                p["pre_filter_stop"] - p["pre_filter_start"])
            input_high_end = specs[bands_n][
                :, bp_top["n_fft"] // 2 - he_h: bp_top["n_fft"] // 2, :]

            # combine (static crops) + pre-filter gains
            l = min(int(specs[d].shape[2]) for d in specs)
            spec_m = jnp.concatenate(
                [specs[d][:, p["band"][d]["crop_start"]:
                          p["band"][d]["crop_stop"], :l]
                 for d in range(1, bands_n + 1)], axis=1)
            # host combine_spectrograms allocates bins+1 rows and fills
            # sum-of-crops; any remainder stays zero
            if spec_m.shape[1] < F_all:
                spec_m = jnp.pad(
                    spec_m, ((0, 0), (0, F_all - spec_m.shape[1]), (0, 0)))
            spec_m = spec_m * jnp.asarray(pre)[None, :, None]

            # normalized batched sliding-window inference
            x_mag = jnp.abs(spec_m)
            coef = jnp.maximum(x_mag.max(), 1e-8)
            x_pre = (x_mag / coef).astype(dtype)
            pad_l, pad_r, roi = make_padding(l, win, off)
            n_win = int(np.ceil(l / roi))
            split_bin = p["band"][1]["crop_stop"]

            def run_pass(pl, pr, nw):
                xp = jnp.pad(x_pre, ((0, 0), (0, 0), (pl, pr)))
                wins = jnp.stack([xp[:, :, i * roi: i * roi + win]
                                  for i in range(nw)])     # (nw, 2, F, win)
                xin = jnp.transpose(wins, (0, 2, 3, 1))    # (nw, F, win, 2)
                out = sep.model.apply(variables, xin,
                                      aggressiveness=(agg_value, split_bin))
                out = jnp.transpose(out, (0, 3, 1, 2))     # (nw, 2, F, win)
                if off > 0:
                    out = out[:, :, :, off:-off]
                # (nw, 2, F, roi) -> (2, F, nw*roi)
                return jnp.concatenate(list(out), axis=2)

            pred = run_pass(pad_l, pad_r, n_win)[:, :, :l]
            if sep.tta:
                shift = roi // 2
                pt = run_pass(pad_l + shift, pad_r + shift, n_win + 1)
                pred = (pred + pt[:, :, shift: shift + l]) * 0.5
            pred = pred.astype(jnp.float32) * coef

            phase = jnp.exp(1.0j * jnp.angle(spec_m))
            y_spec = pred * phase          # instruments
            v_spec = spec_m - y_spec       # vocals

            def to_wave(spec):
                # mirrored high-end restore (reference mirroring())
                he = None
                if sep.high_end_process.startswith("mirroring"):
                    pfs = p["pre_filter_start"]
                    mirror = jnp.flip(
                        jnp.abs(spec[:, pfs - 10 - he_h: pfs - 10, :l]), 1)
                    ihe = input_high_end[:, :, :l]
                    if sep.high_end_process == "mirroring":
                        m = mirror * jnp.exp(1.0j * jnp.angle(ihe))
                        he = jnp.where(jnp.abs(ihe) <= jnp.abs(m), ihe, m)
                    else:
                        mi = mirror * (ihe * 1.7)
                        he = jnp.where(jnp.abs(ihe) <= jnp.abs(mi), ihe, mi)

                offset_b = 0
                wave = None
                for d in range(1, bands_n + 1):
                    bp = p["band"][d]
                    Fd = bp["n_fft"] // 2 + 1
                    h = bp["crop_stop"] - bp["crop_start"]
                    rows = spec[:, offset_b: offset_b + h]
                    offset_b += h
                    spec_s = jnp.zeros((2, Fd, l), jnp.complex64)
                    spec_s = spec_s.at[:, bp["crop_start"]:
                                       bp["crop_stop"]].set(rows)
                    if d == bands_n:
                        if he is not None:
                            max_bin = bp["n_fft"] // 2
                            spec_s = spec_s.at[
                                :, max_bin - he_h: max_bin].set(he)
                        gain = np.ones(Fd, np.float32)
                        if bp.get("hpf_start", 0) > 0:
                            gain *= _hp_gain(Fd, bp["hpf_start"],
                                             bp["hpf_stop"] - 1)
                        spec_s = spec_s * jnp.asarray(gain)[None, :, None]
                        bw = jistft(spec_s, bp["n_fft"], bp["hl"])
                        padw = bp["n_fft"] // 2
                        bw = bw[:, padw:-padw]
                        if bands_n == 1:
                            wave = bw
                        else:
                            n = min(int(wave.shape[1]), int(bw.shape[1]))
                            wave = wave[:, :n] + bw[:, :n]
                    else:
                        gain = np.ones(Fd, np.float32)
                        if d > 1 and bp.get("hpf_start", 0) > 0:
                            gain *= _hp_gain(Fd, bp["hpf_start"],
                                             bp["hpf_stop"] - 1)
                        gain *= _lp_gain(Fd, bp["lpf_start"], bp["lpf_stop"])
                        spec_s = spec_s * jnp.asarray(gain)[None, :, None]
                        bw = jistft(spec_s, bp["n_fft"], bp["hl"])
                        padw = bp["n_fft"] // 2
                        bw = bw[:, padw:-padw]
                        sr_next = p["band"][d + 1]["sr"]
                        if d == 1:
                            wave = bw
                        else:
                            n = min(int(wave.shape[1]), int(bw.shape[1]))
                            wave = wave[:, :n] + bw[:, :n]
                        if bp["sr"] != sr_next:
                            wave = resample_poly(wave, bp["sr"], sr_next)
                return wave.T  # (T, 2) float32

            ins = to_wave(y_spec)
            voc = to_wave(v_spec)
            if sep.is_reverse:
                ins, voc = voc, ins
            to16 = lambda x: jnp.clip(
                jnp.round(x * 32768.0), -32768, 32767).astype(jnp.int16)
            return to16(ins), to16(voc)

        fn = jax.jit(graph)
        if self.aot_cache is not None:
            import hashlib
            from tpu_rvc.utils.aot import _tree_shape_sig
            mp_sig = hashlib.sha256(
                json.dumps(p, sort_keys=True).encode()).hexdigest()[:10]
            fn = self.aot_cache.wrap(
                f"uvr5_dev|{mp_sig}|T{T4}|w{win}|o{off}|tta{int(sep.tta)}|"
                f"rev{int(sep.is_reverse)}|{sep.high_end_process}|"
                f"{jnp.dtype(dtype).name}|{_tree_shape_sig(sep.variables)}",
                fn)
        return fn

    def last_graph_flops(self):
        """XLA-counted FLOPs of one dispatch of the most recently built
        separation graph (utils/roofline.py MFU numerator)."""
        if not self._graphs:
            return None
        T4 = list(self._graphs)[-1]
        from tpu_rvc.utils.roofline import graph_flops
        return graph_flops(
            self._graphs[T4], self.sep.variables,
            jax.ShapeDtypeStruct((2, T4), jnp.float32),
            jax.ShapeDtypeStruct((), jnp.float32))

    # -- public API -------------------------------------------------------
    def separate(self, music_file: str, fetch: bool = True):
        """Returns (instrument, vocal, sr): (T, 2) int16 numpy if fetch,
        else device arrays (caller overlaps the D2H via a fetch pool)."""
        p = self.sep.mp.param
        sr = p["band"][len(p["band"])]["sr"]
        mono = load_audio(music_file, sr)
        wav = np.stack([mono, mono]) if mono.ndim == 1 else mono
        T = wav.shape[1]
        bucket = int(self.bucket_s * sr)
        T4 = max(-(-T // bucket), 1) * bucket
        if T4 not in self._graphs:
            self._graphs[T4] = self._build(T4)
        wav_p = np.pad(wav, ((0, 0), (0, T4 - T)))
        ins, voc = self._graphs[T4](
            self.sep.variables, jnp.asarray(wav_p, jnp.float32),
            jnp.asarray(self.sep.agg / 100.0, jnp.float32))
        out_sr = p["sr"]
        n_out = min(int(ins.shape[0]), int(T * out_sr / sr))
        if not fetch:
            return ins, voc, out_sr, n_out
        return (np.asarray(ins)[:n_out], np.asarray(voc)[:n_out], out_sr)


def load_uvr5_model(model_path: str, param_name: str = "4band_v2.json",
                    agg: float = 10.0, tta: bool = False) -> UVR5Separator:
    """Load an HP2/HP3/HP5-style VR checkpoint (reference uvr5/modules.py:17)."""
    from tpu_rvc.ckpt.uvr5_loader import load_cascaded_aspp
    mp = ModelParameters(param_name)
    model, variables = load_cascaded_aspp(model_path)
    return UVR5Separator(model, variables, mp, agg=agg, tta=tta)


def load_separator(model_path: str, agg: float = 10.0, tta: bool = False):
    """Model-name dispatch (reference vr.py:22-39 + uvr5/modules.py:27):
    - onnx_dereverb_By_FoxJoy -> MDXNetDereverb
    - *DeEcho*/*DeReverb* -> CascadedNet + 4band_v3, outputs swapped
    - otherwise (HP2/HP3/HP5 ...) -> CascadedASPPNet + 4band_v2,
      HP3 outputs swapped
    """
    import os
    name = os.path.basename(model_path)
    if "onnx_dereverb" in model_path or name == "vocals.onnx":
        from .mdxnet import MDXNetDereverb
        onnx_dir = (os.path.dirname(model_path)
                    if model_path.endswith(".onnx") else model_path)
        return MDXNetDereverb(onnx_dir)
    if "DeEcho" in name or "DeReverb" in name:
        from tpu_rvc.ckpt.uvr5_loader import load_deecho
        mp = ModelParameters("4band_v3.json")
        model, variables = load_deecho(model_path,
                                       n_fft=mp.param["bins"] * 2)
        return UVR5Separator(model, variables, mp, agg=agg, tta=tta,
                             is_reverse=True)
    from tpu_rvc.ckpt.uvr5_loader import load_cascaded_aspp
    mp = ModelParameters("4band_v2.json")
    model, variables = load_cascaded_aspp(model_path,
                                          n_fft=mp.param["bins"] * 2)
    return UVR5Separator(model, variables, mp, agg=agg, tta=tta,
                         is_reverse="HP3" in name)
