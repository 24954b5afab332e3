"""FCPE-flag estimator (reference rvc/f0/fcpe.py:9 wraps the torchfcpe
bundled model).

The upstream FCPE checkpoint format is torch-specific and its weights are
not redistributable here; the `fcpe` flag stays API-compatible by routing to
the strongest available native estimator.  A native FCPE port is tracked for
a later round."""

from __future__ import annotations

from typing import Optional

import numpy as np

from .base import F0Predictor
from .pm import PM


class FCPE(F0Predictor):
    def __init__(self, hop_length=160, f0_min=50.0, f0_max=1100.0,
                 sampling_rate=16000):
        super().__init__(hop_length, f0_min, f0_max, sampling_rate)
        self._fallback = PM(hop_length, f0_min, f0_max, sampling_rate)

    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius=None) -> np.ndarray:
        return self._fallback.compute_f0(wav, p_len=p_len)
