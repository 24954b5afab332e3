"""FCPE estimator (reference rvc/f0/fcpe.py:9, torchfcpe bundled model).

Native JAX CFNaiveMelPE port (tpu_rvc/models/fcpe.py): the whole
wav -> log-mel -> conv-conformer -> local_argmax decode chain is one jitted
program per input length.  When no checkpoint is available (the upstream
weights are a separate download) the flag stays API-compatible by routing
to the native PM estimator.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from .base import F0Predictor, interpolate_f0, resize_f0

DEFAULT_PATHS = ("assets/fcpe/fcpe.pt", "assets/fcpe/fcpe_c_v001.pt")


class FCPE(F0Predictor):
    def __init__(self, hop_length=160, f0_min=50.0, f0_max=1100.0,
                 sampling_rate=16000, model_path: Optional[str] = None,
                 model=None, variables=None):
        super().__init__(hop_length, f0_min, f0_max, sampling_rate)
        self.model, self.variables = model, variables
        self._fallback = None
        self._jitted = {}
        if self.model is None:
            if model_path is None:
                model_path = next((p for p in DEFAULT_PATHS
                                   if os.path.exists(p)), None)
            if model_path is not None and os.path.exists(model_path):
                from tpu_rvc.ckpt.fcpe_loader import load_fcpe
                self.model, self.variables = load_fcpe(model_path)
            else:
                from .pm import PM
                self._fallback = PM(hop_length, f0_min, f0_max,
                                    sampling_rate)

    def compute_f0(self, wav: np.ndarray, p_len: Optional[int] = None,
                   filter_radius: Optional[float] = 0.006) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        if p_len is None:
            p_len = wav.shape[0] // self.hop_length
        if self._fallback is not None:
            return self._fallback.compute_f0(wav, p_len=p_len)
        import jax
        import jax.numpy as jnp
        from tpu_rvc.models.fcpe import fcpe_infer

        thred = 0.006 if filter_radius is None else float(filter_radius)
        key = (wav.shape[0], thred)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(
                lambda v, w: fcpe_infer(self.model, v, w, thred))
        f0 = np.asarray(self._jitted[key](self.variables,
                                          jnp.asarray(wav[None])))[0]
        return interpolate_f0(resize_f0(f0, p_len))[0]
