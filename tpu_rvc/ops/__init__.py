from .conv import conv1d, conv_transpose1d, pad_reflect
from .stft import stft_magnitude, frame_signal, istft
from .mel import mel_filterbank, spec_to_mel, mel_spectrogram, spectrogram
from .resample import resample_poly, linear_interp_1d, nearest_upsample

__all__ = [
    "conv1d",
    "conv_transpose1d",
    "pad_reflect",
    "stft_magnitude",
    "frame_signal",
    "istft",
    "mel_filterbank",
    "spec_to_mel",
    "mel_spectrogram",
    "spectrogram",
    "resample_poly",
    "linear_interp_1d",
    "nearest_upsample",
]
