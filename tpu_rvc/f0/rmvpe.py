"""RMVPE estimator (reference rvc/f0/rmvpe.py:40).

mel frontend: 128 HTK mels over [30, 8000] Hz, win/n_fft 1024, hop 160,
center=True, log-clamp 1e-5 (reference rvc/f0/mel.py:10).  The model runs on
frames padded to a multiple of 32 (reference _mel2hidden, rmvpe.py:139); the
decode is local-average cents around the salience argmax (rmvpe.py:119).

The whole wav->mel->E2E->salience chain is one jitted function per bucketed
length; only the final decode runs in numpy (tiny).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.ops.mel import mel_filterbank
from tpu_rvc.ops.stft import stft, hann_window
from .base import F0Predictor, interpolate_f0, resize_f0

CENTS_MAPPING = 20 * np.arange(360) + 1997.3794084376191


def rmvpe_mel(wav: jax.Array, sr: int = 16000, n_fft: int = 1024,
              hop: int = 160, n_mels: int = 128, fmin: float = 30.0,
              fmax: float = 8000.0, clamp: float = 1e-5) -> jax.Array:
    """(B, T) -> (B, 128, frames), center=True framing."""
    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax, htk=True))
    pad = n_fft // 2
    y = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)], mode="reflect")
    spec = stft(y, n_fft, hop)
    mag = jnp.abs(spec)
    mel = jnp.einsum("mf,bft->bmt", basis, mag)
    return jnp.log(jnp.clip(mel, min=clamp))


def to_local_average_cents(salience: np.ndarray, threshold: float = 0.05
                           ) -> np.ndarray:
    """(T, 360) salience -> cents; 0 where peak below threshold
    (reference rmvpe.py:119, vectorized)."""
    center = np.argmax(salience, axis=1)
    sal_p = np.pad(salience, ((0, 0), (4, 4)))
    cents_p = np.pad(CENTS_MAPPING, (4, 4))
    centers = center + 4
    idx = centers[:, None] + np.arange(-4, 5)[None, :]
    rows = np.arange(salience.shape[0])[:, None]
    todo_sal = sal_p[rows, idx]
    todo_cents = cents_p[idx]
    divided = (todo_sal * todo_cents).sum(1) / todo_sal.sum(1)
    maxx = salience.max(axis=1)
    divided[maxx <= threshold] = 0
    return divided


class RMVPE(F0Predictor):
    def __init__(self, model_path: str = "assets/rmvpe/rmvpe.pt",
                 hop_length: int = 160, sampling_rate: int = 16000,
                 variables=None, dtype=jnp.float32):
        super().__init__(hop_length, 30.0, 8000.0, sampling_rate)
        from tpu_rvc.models.rmvpe import E2E
        self.model = E2E()
        self.dtype = dtype
        if variables is None:
            from tpu_rvc.ckpt.rmvpe_loader import load_rmvpe
            self.model, variables = load_rmvpe(model_path)
        self.variables = variables
        self._jitted = {}

    def _hidden(self, wav: np.ndarray) -> np.ndarray:
        T = wav.shape[-1]

        def run(variables, w):
            mel = rmvpe_mel(w, self.sampling_rate, hop=self.hop_length)
            n_frames = mel.shape[-1]
            n_pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
            melp = jnp.pad(mel, ((0, 0), (0, 0), (0, n_pad)))
            hidden = self.model.apply(variables, melp.astype(self.dtype))
            return hidden[:, :n_frames].astype(jnp.float32)

        key = T
        if key not in self._jitted:
            self._jitted[key] = jax.jit(run)
        return np.asarray(self._jitted[key](self.variables,
                                            jnp.asarray(wav[None])))[0]

    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius: Optional[Union[int, float]] = 0.03
                   ) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        hidden = self._hidden(wav)
        thred = 0.03 if filter_radius is None else float(filter_radius)
        cents = to_local_average_cents(hidden, threshold=thred)
        f0 = 10.0 * (2.0 ** (cents / 1200.0))
        f0[f0 == 10] = 0
        return interpolate_f0(resize_f0(f0, p_len))[0]
