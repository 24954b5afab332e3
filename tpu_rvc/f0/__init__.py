from .base import F0Predictor, interpolate_f0, resize_f0, post_process
from .gen import Generator

__all__ = ["F0Predictor", "interpolate_f0", "resize_f0", "post_process",
           "Generator"]
