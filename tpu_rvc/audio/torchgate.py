"""Spectral-gate denoiser in JAX (reference infer/modules/gui/torchgate.py:8
`TorchGate`; the name is kept for API familiarity).

Stationary mode: per-frequency threshold = mean + n_std * std of the noise
log-spectrogram.  Non-stationary mode: temperature sigmoid over the
(X - movmean(X)) / movmean(X) ratio.  The binary/soft mask is smoothed with
a separable triangular 2D filter and applied to the complex STFT.

Everything is one jittable function of (x, xn); StreamSession uses it for
input/output noise reduction (gui.py I/O_noise_reduce paths).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.ops.stft import stft as _stft, istft as _istft, hann_window


def _amp_to_db(x: jax.Array, eps: float = 2.220446049250313e-16,
               top_db: float = 40.0) -> jax.Array:
    """Reference gui/utils.py amp_to_db: 20*log10(|x| + eps), floored
    per-frequency-row at (row max over time) - top_db."""
    db = 20.0 * jnp.log10(jnp.abs(x) + eps)
    return jnp.maximum(db, jnp.max(db, axis=-1, keepdims=True) - top_db)


def _temperature_sigmoid(x, x0, temp):
    return jax.nn.sigmoid((x - x0) / temp)


class TorchGate:
    def __init__(self, sr: int, nonstationary: bool = False,
                 n_std_thresh_stationary: float = 1.5,
                 n_thresh_nonstationary: float = 1.3,
                 temp_coeff_nonstationary: float = 0.1,
                 n_movemean_nonstationary: int = 20,
                 prop_decrease: float = 1.0, n_fft: int = 1024,
                 win_length: Optional[int] = None,
                 hop_length: Optional[int] = None,
                 freq_mask_smooth_hz: Optional[float] = 500.0,
                 time_mask_smooth_ms: Optional[float] = 50.0):
        self.sr = sr
        self.nonstationary = nonstationary
        self.n_std = n_std_thresh_stationary
        self.n_thresh_ns = n_thresh_nonstationary
        self.temp_ns = temp_coeff_nonstationary
        self.n_mm = n_movemean_nonstationary
        self.prop_decrease = prop_decrease
        self.n_fft = n_fft
        self.win_length = n_fft if win_length is None else win_length
        self.hop_length = (self.win_length // 4 if hop_length is None
                           else hop_length)
        self.smoothing_filter = self._smoothing_filter(
            freq_mask_smooth_hz, time_mask_smooth_ms)
        self._jit = jax.jit(self._process)

    def _smoothing_filter(self, f_hz, t_ms) -> Optional[np.ndarray]:
        n_f = 1 if f_hz is None else int(f_hz / (self.sr / (self.n_fft / 2)))
        n_t = 1 if t_ms is None else int(
            t_ms / ((self.hop_length / self.sr) * 1000))
        if n_f < 1 or n_t < 1 or (n_f == 1 and n_t == 1):
            return None

        def tri(n):
            up = np.linspace(0, 1, n + 1, endpoint=False)
            down = np.linspace(1, 0, n + 2)
            return np.concatenate([up, down])[1:-1]

        filt = np.outer(tri(n_f), tri(n_t))
        return (filt / filt.sum()).astype(np.float32)

    def _spec(self, x):
        pad = self.n_fft // 2
        xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)])  # constant
        return _stft(xp, self.n_fft, self.hop_length, self.win_length)

    def _process(self, x: jax.Array, xn: Optional[jax.Array]) -> jax.Array:
        X = self._spec(x)  # (B, F, T)
        if self.nonstationary:
            X_abs = jnp.abs(X)
            kernel = jnp.ones((self.n_mm,), X_abs.dtype) / self.n_mm
            pad_l = (self.n_mm - 1) // 2
            pad_r = self.n_mm - 1 - pad_l
            xs = jnp.pad(X_abs, ((0, 0), (0, 0), (pad_l, pad_r)))
            X_smooth = jax.vmap(jax.vmap(
                lambda v: jnp.convolve(v, kernel, mode="valid")))(xs)
            ratio = (X_abs - X_smooth) / (X_smooth + 1e-6)
            sig_mask = _temperature_sigmoid(ratio, self.n_thresh_ns,
                                            self.temp_ns)
        else:
            X_db = _amp_to_db(X)
            XN_db = X_db if xn is None else _amp_to_db(self._spec(xn))
            mean = jnp.mean(XN_db, axis=-1)
            std = jnp.std(XN_db, axis=-1, ddof=1)
            noise_thresh = mean + std * self.n_std
            sig_mask = (X_db > noise_thresh[..., None]).astype(jnp.float32)
        sig_mask = self.prop_decrease * (sig_mask - 1.0) + 1.0
        if self.smoothing_filter is not None:
            filt = jnp.asarray(self.smoothing_filter)[:, :, None, None]
            kf, kt = filt.shape[:2]
            sm = jax.lax.conv_general_dilated(
                sig_mask[:, :, :, None], filt,
                window_strides=(1, 1),
                padding=[((kf - 1) // 2, kf // 2), ((kt - 1) // 2, kt // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            sig_mask = sm[:, :, :, 0]
        Y = X * sig_mask
        pad = self.n_fft // 2
        y = _istft(Y, self.n_fft, self.hop_length, self.win_length)
        return y[:, pad:pad + x.shape[-1]]

    def __call__(self, x: np.ndarray, xn: Optional[np.ndarray] = None
                 ) -> np.ndarray:
        x1 = jnp.asarray(np.atleast_2d(np.asarray(x, np.float32)))
        xn1 = None if xn is None else jnp.asarray(
            np.atleast_2d(np.asarray(xn, np.float32)))
        y = np.asarray(self._jit(x1, xn1))
        return y[0] if np.ndim(x) == 1 else y
