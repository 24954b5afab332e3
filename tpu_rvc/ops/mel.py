"""Mel filterbanks and mel-spectrograms.

Two mel conventions exist in the reference and both are reproduced here:
  - Slaney-normalized mel (librosa default) used by the training frontend
    (infer/lib/train/mel_processing.py:98 `librosa_mel_fn` with defaults).
  - HTK mel used by the RMVPE f0 mel frontend (rvc/f0/mel.py:23 passes
    htk=True via librosa keywords).

Filterbanks are precomputed on host in numpy (static for a given config) and
closed over by jitted functions, so on device the mel projection is a single
(F x n_mels) matmul straight onto the MXU.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .stft import stft_magnitude


def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_branch = min_log_mel + np.log(
            np.maximum(f, 1e-10) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_branch, mels)


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs
    )


@lru_cache(maxsize=32)
def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: Optional[float] = None,
    htk: bool = False,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """librosa.filters.mel-equivalent triangular filterbank, (n_mels, F)."""
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
        weights = weights * enorm[:, None]
    return weights.astype(np.float32)


def dynamic_range_compression(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    return jnp.log(jnp.clip(x, min=clip_val))


def spectrogram(y: jax.Array, n_fft: int, hop: int, win: int) -> jax.Array:
    """Reference spectrogram_torch parity (B, T) -> (B, F, frames)."""
    return stft_magnitude(y, n_fft, hop, win)


def spec_to_mel(
    spec: jax.Array, n_fft: int, n_mels: int, sr: int,
    fmin: float = 0.0, fmax: Optional[float] = None,
) -> jax.Array:
    """(B, F, frames) -> (B, n_mels, frames), log-compressed (reference
    spec_to_mel_torch: mel_processing.py:92)."""
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, spec)
    return dynamic_range_compression(mel)


def mel_spectrogram(
    y: jax.Array, n_fft: int, n_mels: int, sr: int, hop: int, win: int,
    fmin: float = 0.0, fmax: Optional[float] = None,
) -> jax.Array:
    """Reference mel_spectrogram_torch parity (mel_processing.py:111)."""
    return spec_to_mel(spectrogram(y, n_fft, hop, win), n_fft, n_mels, sr, fmin, fmax)
