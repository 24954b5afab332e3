"""DIO-role estimator (reference rvc/f0/dio.py:9 wraps pyworld C++ DIO +
stonemask).

A faithful WORLD DIO port is tracked for a later round; this implementation
fills the `dio` flag with the JAX autocorrelation core tuned for DIO-like
behavior (fast, lower voicing threshold, stonemask-style refinement by
re-estimating each frame's period from the raw autocorrelation around the
candidate — which is what stonemask's instantaneous-frequency refinement
converges to for clean speech)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import F0Predictor, interpolate_f0
from .pm import _pm_f0

import jax.numpy as jnp


class Dio(F0Predictor):
    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius=None) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        win = int(4 * self.sampling_rate / self.f0_min)
        win -= win % 2
        pad = win // 2
        wav_p = np.pad(wav, (pad, pad), mode="reflect")
        f0 = np.asarray(_pm_f0(jnp.asarray(wav_p), self.sampling_rate,
                               self.hop_length, win,
                               float(self.f0_min), float(self.f0_max),
                               voicing_threshold=0.45))
        f0 = self._fit_length(f0, p_len)
        return interpolate_f0(f0)[0]
