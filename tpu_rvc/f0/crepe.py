"""CREPE estimator (reference rvc/f0/crepe.py:10).

Mirrors the reference post-processing: median filter on periodicity,
mean filter on f0, zero where periodicity < 0.1 (crepe.py:52-55), then
resize + gap interpolation.  Decode is weighted-argmax over local cents
(torchcrepe's non-viterbi decoder); weights load from torchcrepe's crepe
full checkpoint via ckpt.crepe_loader when available.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from tpu_rvc.models.crepe import Crepe, WINDOW, CENTS_MAPPING
from .base import F0Predictor, interpolate_f0, resize_f0
from .harvest import median_filter_1d


def _mean_filter_1d(x: np.ndarray, k: int = 3) -> np.ndarray:
    pad = k // 2
    xp = np.pad(x, (pad, pad), mode="edge")
    win = np.lib.stride_tricks.sliding_window_view(xp, k)
    return win.mean(axis=-1).astype(x.dtype)


class CRePE(F0Predictor):
    def __init__(self, hop_length=160, f0_min=50.0, f0_max=1100.0,
                 sampling_rate=16000, model_path: Optional[str] = None,
                 variables=None):
        super().__init__(hop_length, f0_min, f0_max, sampling_rate)
        self.model = Crepe()
        if variables is None and model_path is not None:
            from tpu_rvc.ckpt.crepe_loader import load_crepe
            self.model, variables = load_crepe(model_path)
        if variables is None:
            raise ValueError(
                "CREPE requires weights: pass model_path=<crepe full .pth> "
                "or variables=")
        self.variables = variables
        self._jitted = {}

    def _salience(self, wav: np.ndarray) -> np.ndarray:
        pad = WINDOW // 2
        wav_p = np.pad(wav, (pad, pad))
        n = 1 + (len(wav_p) - WINDOW) // self.hop_length

        def run(variables, w):
            idx = (jnp.arange(n)[:, None] * self.hop_length +
                   jnp.arange(WINDOW)[None, :])
            frames = w[idx]
            mu = jnp.mean(frames, axis=1, keepdims=True)
            sd = jnp.maximum(jnp.std(frames, axis=1, keepdims=True), 1e-10)
            frames = (frames - mu) / sd
            return self.model.apply(variables, frames)

        if n not in self._jitted:
            self._jitted[n] = jax.jit(run)
        return np.asarray(self._jitted[n](self.variables, jnp.asarray(wav_p)))

    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius=None) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        sal = self._salience(wav)  # (T, 360)
        # weighted local average around argmax (torchcrepe "weighted_argmax")
        center = np.argmax(sal, axis=1)
        sal_p = np.pad(sal, ((0, 0), (4, 4)))
        cents_p = np.pad(CENTS_MAPPING, (4, 4))
        idx = (center + 4)[:, None] + np.arange(-4, 5)[None, :]
        rows = np.arange(sal.shape[0])[:, None]
        w = sal_p[rows, idx]
        cents = (w * cents_p[idx]).sum(1) / np.maximum(w.sum(1), 1e-9)
        f0 = 10.0 * 2.0 ** (cents / 1200.0)
        periodicity = sal.max(axis=1)
        periodicity = median_filter_1d(periodicity.astype(np.float32), 3)
        f0 = _mean_filter_1d(f0.astype(np.float32), 3)
        f0[periodicity < 0.1] = 0
        f0 = np.clip(f0, 0, self.f0_max)
        return interpolate_f0(resize_f0(f0, p_len))[0]
