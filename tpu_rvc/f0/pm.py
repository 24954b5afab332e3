"""Praat-style autocorrelation pitch estimator, fully in JAX
(reference rvc/f0/pm.py:9 wraps parselmouth/Praat C++ `to_pitch_ac`;
here the algorithm — Boersma 1993 — is implemented natively so the
whole f0 path stays on device).

Per frame (window = periods_per_window / f0_min seconds):
  1. subtract local mean, apply Hanning window
  2. normalized autocorrelation via rFFT, divided by the window's own
     autocorrelation (Boersma's r_x / r_w correction)
  3. parabolic-interpolated peaks in the [1/f0_max, 1/f0_min] lag range
  4. voiced if peak strength > voicing_threshold and frame intensity
     above silence threshold; best candidate by strength (no Viterbi --
     the candidate set at these thresholds is near-unimodal for speech)

Returns 0 for unvoiced frames like Praat's `selected_array["frequency"]`.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .base import F0Predictor


@partial(jax.jit, static_argnames=("sr", "hop", "win", "f0_min", "f0_max",
                                   "voicing_threshold"))
def _pm_f0(wav, sr: int, hop: int, win: int, f0_min: float, f0_max: float,
           voicing_threshold: float = 0.6):
    T = wav.shape[-1]
    n_frames = max(1 + (T - win) // hop, 1)
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(win)[None, :]
    frames = wav[idx]  # (F, win)
    frames = frames - jnp.mean(frames, axis=1, keepdims=True)

    n = np.arange(win)
    window = jnp.asarray(0.5 - 0.5 * np.cos(2 * np.pi * n / (win - 1)),
                         jnp.float32)
    xw = frames * window

    nfft = int(2 ** math.ceil(math.log2(2 * win)))
    spec = jnp.fft.rfft(xw, n=nfft, axis=1)
    ac = jnp.fft.irfft(spec * jnp.conj(spec), n=nfft, axis=1)[:, :win]
    ac0 = jnp.maximum(ac[:, :1], 1e-12)
    r_x = ac / ac0

    wspec = jnp.fft.rfft(window, n=nfft)
    wac = jnp.fft.irfft(wspec * jnp.conj(wspec), n=nfft)[:win]
    r_w = wac / jnp.maximum(wac[0], 1e-12)
    r = r_x / jnp.maximum(r_w, 1e-3)[None, :]  # normalized autocorr

    lag_min = max(int(sr / f0_max), 2)
    lag_max = min(int(sr / f0_min), win - 2)
    lags = np.arange(lag_min, lag_max + 1)
    rl = r[:, lag_min:lag_max + 1]
    rm = r[:, lag_min - 1:lag_max]
    rp = r[:, lag_min + 1:lag_max + 2]
    is_peak = (rl >= rm) & (rl >= rp)
    # Praat octave cost: penalize longer lags so harmonically-equal peaks
    # resolve to the true (shortest) period (Boersma 1993 eq. 23).
    octave_cost = 0.01
    lag_penalty = octave_cost * jnp.log2(
        jnp.asarray(lags, jnp.float32) * (f0_min / sr))
    strength = jnp.where(is_peak, rl - lag_penalty[None, :], -jnp.inf)
    best = jnp.argmax(strength, axis=1)
    bi = jnp.arange(strength.shape[0])
    y0, y1, y2 = rm[bi, best], rl[bi, best], rp[bi, best]
    denom = y0 - 2 * y1 + y2
    delta = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (y0 - y2) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    best_lag = lags[0] + best + delta
    f0 = sr / best_lag
    peak_val = y1

    # silence gate: frame rms vs global rms (Praat silence_threshold ~0.03
    # relative to global peak)
    frame_amp = jnp.max(jnp.abs(frames), axis=1)
    global_amp = jnp.maximum(jnp.max(jnp.abs(wav)), 1e-9)
    voiced = (peak_val > voicing_threshold) & \
             (frame_amp > 0.03 * global_amp) & \
             (f0 >= f0_min) & (f0 <= f0_max)
    return jnp.where(voiced, f0, 0.0).astype(jnp.float32)


class PM(F0Predictor):
    """Autocorrelation ("parselmouth") estimator (reference rvc/f0/pm.py:9)."""

    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius=None) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        # Praat window: 3 periods of f0_min, centered timestamps.  Pad so the
        # first frame is centered at t=0 like Praat's time grid.
        win = int(3 * self.sampling_rate / self.f0_min)
        win -= win % 2
        pad = win // 2
        wav_p = np.pad(wav, (pad, pad), mode="reflect")
        f0 = np.asarray(_pm_f0(jnp.asarray(wav_p), self.sampling_rate,
                               self.hop_length, win,
                               float(self.f0_min), float(self.f0_max)))
        f0 = self._fit_length(f0, p_len)
        from .base import interpolate_f0
        return interpolate_f0(f0)[0]
