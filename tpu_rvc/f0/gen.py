"""f0 estimator dispatcher (reference rvc/f0/gen.py:44 `Generator`).

Lazily constructs the requested estimator; post-processing (transpose by
2^(key/12), optional manual f0 splice, mel-coarse quantization 1..255)
matches the reference's numba kernel (gen.py:11) — see base.post_process.
"""

from __future__ import annotations

from pathlib import Path
from typing import Literal, Optional, Tuple, Union

import numpy as np

from .base import post_process, F0_MIN, F0_MAX

F0Method = Literal["pm", "dio", "harvest", "crepe", "rmvpe", "fcpe"]


class Generator:
    def __init__(self, rmvpe_root: Union[str, Path] = "assets/rmvpe",
                 is_half: bool = True, x_pad: float = 3.0,
                 window: int = 160, sr: int = 16000):
        self.rmvpe_root = Path(rmvpe_root)
        self.is_half = is_half
        self.x_pad = x_pad
        self.window = window
        self.sr = sr
        self._estimators = {}

    def _get(self, method: str):
        if method in self._estimators:
            return self._estimators[method]
        if method == "pm":
            from .pm import PM
            est = PM(self.window, F0_MIN, F0_MAX, self.sr)
        elif method == "dio":
            from .dio import Dio
            est = Dio(self.window, F0_MIN, F0_MAX, self.sr)
        elif method == "harvest":
            from .harvest import Harvest
            est = Harvest(self.window, F0_MIN, F0_MAX, self.sr)
        elif method == "crepe":
            from .crepe import CRePE
            est = CRePE(self.window, F0_MIN, F0_MAX, self.sr)
        elif method == "rmvpe":
            from .rmvpe import RMVPE
            est = RMVPE(str(self.rmvpe_root / "rmvpe.pt"),
                        hop_length=self.window, sampling_rate=self.sr)
        elif method == "fcpe":
            from .fcpe import FCPE
            est = FCPE(self.window, F0_MIN, F0_MAX, self.sr)
        else:
            raise ValueError(f"f0 method {method} not supported")
        self._estimators[method] = est
        return est

    def calculate(
        self,
        x: np.ndarray,
        p_len: Optional[int],
        f0_up_key: int,
        f0_method: F0Method,
        filter_radius: Optional[Union[int, float]] = None,
        manual_f0: Optional[np.ndarray] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        est = self._get(f0_method)
        if f0_method == "harvest":
            f0 = est.compute_f0(x, p_len=p_len, filter_radius=filter_radius)
        elif f0_method == "rmvpe":
            f0 = est.compute_f0(x, p_len=p_len, filter_radius=0.03)
        else:
            f0 = est.compute_f0(x, p_len=p_len)
        return post_process(self.sr // self.window, f0, f0_up_key,
                            self.x_pad, F0_MIN, F0_MAX, manual_f0)
