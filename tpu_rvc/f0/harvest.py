"""Harvest-role estimator (reference rvc/f0/harvest.py:10 wraps pyworld
Harvest + stonemask + scipy medfilt).

Same JAX autocorrelation core at a Harvest-like operating point (longer
analysis window, permissive voicing) followed by the reference's median
filter (applied when filter_radius > 2, reference harvest.py:26).  The
realtime GUI ran reference Harvest in an 8-process pool because the C++
implementation is slow (gui.py:51-72); on TPU this whole path is one jitted
call and needs no pool.  A faithful WORLD port is tracked for a later round.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import F0Predictor, interpolate_f0
from .pm import _pm_f0

import jax.numpy as jnp


def median_filter_1d(x: np.ndarray, radius: int) -> np.ndarray:
    if radius <= 1:
        return x
    k = radius if radius % 2 == 1 else radius + 1
    pad = k // 2
    xp = np.pad(x, (pad, pad), mode="edge")
    windows = np.lib.stride_tricks.sliding_window_view(xp, k)
    return np.median(windows, axis=-1).astype(x.dtype)


class Harvest(F0Predictor):
    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius: Optional[float] = None) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        win = int(6 * self.sampling_rate / self.f0_min)
        win -= win % 2
        pad = win // 2
        wav_p = np.pad(wav, (pad, pad), mode="reflect")
        f0 = np.asarray(_pm_f0(jnp.asarray(wav_p), self.sampling_rate,
                               self.hop_length, win,
                               float(self.f0_min), float(self.f0_max),
                               voicing_threshold=0.375))
        f0 = self._fit_length(f0, p_len)
        if filter_radius is not None and filter_radius > 2:
            f0 = median_filter_1d(f0, int(filter_radius))
        return interpolate_f0(f0)[0]
