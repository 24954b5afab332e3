"""Mel-cepstral distortion (MCD) — the fidelity acceptance metric
(BASELINE.md: output MCD within 0.1 dB of the PyTorch reference).

MCD_k = (10 / ln 10) * sqrt(2 * sum_{i=1..k} (c1_i - c2_i)^2), averaged over
aligned frames, with cepstra from the log-mel spectrogram via DCT-II.
"""

from __future__ import annotations

import numpy as np

from tpu_rvc.ops.mel import mel_filterbank
from tpu_rvc.ops.stft import stft_magnitude

import jax.numpy as jnp


def mel_cepstra(wav: np.ndarray, sr: int, n_mfcc: int = 13,
                n_fft: int = 1024, hop: int = 256,
                n_mels: int = 80) -> np.ndarray:
    """(T,) wave -> (frames, n_mfcc) mel cepstra (c0 excluded downstream)."""
    spec = np.asarray(stft_magnitude(jnp.asarray(wav[None]), n_fft, hop))[0]
    basis = mel_filterbank(sr, n_fft, n_mels)
    logmel = np.log(np.maximum(basis @ spec, 1e-8))  # (n_mels, frames)
    # DCT-II orthonormal
    n = n_mels
    k = np.arange(n_mfcc)[:, None]
    m = np.arange(n)[None, :]
    dct = np.cos(np.pi * k * (2 * m + 1) / (2 * n)) * np.sqrt(2.0 / n)
    dct[0] /= np.sqrt(2.0)
    return (dct @ logmel).T  # (frames, n_mfcc)


def mcd(wav1: np.ndarray, wav2: np.ndarray, sr: int,
        n_mfcc: int = 13, energy_floor: float = 0.0) -> float:
    """Mean MCD in dB over aligned frames (no DTW; inputs are time-aligned
    outputs of two implementations on identical inputs).

    energy_floor > 0 excludes frames whose reference (wav2) RMS is below
    it — the standard speech-frame gate: in digital silence the residual
    is quantization noise, whose log-spectral distance is unbounded and
    says nothing about model parity."""
    n = min(len(wav1), len(wav2))
    c1 = mel_cepstra(np.asarray(wav1[:n], np.float64), sr, n_mfcc)
    c2 = mel_cepstra(np.asarray(wav2[:n], np.float64), sr, n_mfcc)
    if energy_floor > 0.0:
        hop, win = 256, 1024
        # RMS over the SAME samples each cepstral frame saw:
        # stft_magnitude reflect-pads (n_fft-hop)//2 per side, so frame i
        # covers ref[i*hop - pad : i*hop - pad + win] — reproduce the pad
        # here so onset/offset frames are gated against their own audio
        pad = (win - hop) // 2
        ref = np.pad(np.asarray(wav2[:n], np.float64), pad, mode="reflect")
        f = min(len(c1), len(c2))
        rms = np.asarray([np.sqrt((ref[i * hop:i * hop + win] ** 2).mean())
                          for i in range(f)])
        keep = rms >= energy_floor
        if not keep.any():
            raise ValueError(
                f"no frames above energy_floor={energy_floor} — the "
                "reference signal is effectively silent; an ungated MCD "
                "over quantization noise would be meaningless")
        c1, c2 = c1[:f][keep], c2[:f][keep]
    f = min(len(c1), len(c2))
    diff = c1[:f, 1:] - c2[:f, 1:]  # exclude c0 (energy)
    per_frame = np.sqrt(2.0 * np.sum(diff ** 2, axis=1))
    return float((10.0 / np.log(10.0)) * per_frame.mean())
