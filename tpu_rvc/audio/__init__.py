from .io import load_audio, save_audio, load_wav, save_wav
from .slicer import Slicer, get_rms
from .dsp import change_rms, highpass_filter, rms_envelope

__all__ = ["load_audio", "save_audio", "load_wav", "save_wav",
           "Slicer", "get_rms", "change_rms", "highpass_filter",
           "rms_envelope"]
