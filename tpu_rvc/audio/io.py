"""Audio file I/O (reference infer/lib/audio.py:49-205).

The reference decodes every container through PyAV/FFmpeg (C).  Here:
  - WAV/PCM: pure numpy reader/writer (no deps) — covers the dataset and
    CI fixtures.
  - other containers: ffmpeg subprocess when available (same engine the
    reference uses, without the PyAV binding), else a clear error.
  - resampling to the requested rate via ops.resample (device) or
    scipy.signal.resample_poly (host) — host path keeps load_audio usable
    in dataloader workers without touching the accelerator.
"""

from __future__ import annotations

import io
import os
import shutil
import struct
import subprocess
import wave
from typing import Optional, Tuple

import numpy as np


def float_to_int16(audio: np.ndarray) -> np.ndarray:
    """Peak-normalized int16 conversion (reference audio.py:29, numba-jitted
    there; plain vectorized numpy here)."""
    am = int(np.ceil(np.max(np.abs(audio))) * 32768)
    am = 32767 * 32768 // max(am, 1)
    return np.multiply(audio, am).astype(np.int16)


def load_wav(path: str) -> Tuple[np.ndarray, int]:
    """Read a PCM/float WAV as float32 (channels averaged), return (audio, sr)."""
    with open(path, "rb") as f:
        riff = f.read(12)
        if riff[:4] != b"RIFF" or riff[8:12] != b"WAVE":
            raise ValueError(f"{path}: not a RIFF/WAVE file")
        fmt = None
        data = None
        while True:
            hdr = f.read(8)
            if len(hdr) < 8:
                break
            cid, size = hdr[:4], struct.unpack("<I", hdr[4:])[0]
            payload = f.read(size + (size & 1))
            if cid == b"fmt ":
                fmt = struct.unpack("<HHIIHH", payload[:16])
            elif cid == b"data":
                data = payload[:size]
        if fmt is None or data is None:
            raise ValueError(f"{path}: missing fmt/data chunk")
    audio_format, channels, sr, _, _, bits = fmt
    if audio_format == 3:  # IEEE float
        dt = np.float32 if bits == 32 else np.float64
        x = np.frombuffer(data, dtype=dt).astype(np.float32)
    elif audio_format in (1, 0xFFFE):  # PCM / extensible
        if bits == 16:
            x = np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0
        elif bits == 32:
            x = np.frombuffer(data, dtype="<i4").astype(np.float32) / 2147483648.0
        elif bits == 8:
            x = (np.frombuffer(data, dtype="u1").astype(np.float32) - 128) / 128.0
        elif bits == 24:
            raw = np.frombuffer(data, dtype="u1").reshape(-1, 3)
            x = ((raw[:, 0].astype(np.int32)) |
                 (raw[:, 1].astype(np.int32) << 8) |
                 (raw[:, 2].astype(np.int32) << 16))
            x = (x - ((x & 0x800000) << 1)).astype(np.float32) / 8388608.0
        else:
            raise ValueError(f"unsupported PCM bits {bits}")
    else:
        raise ValueError(f"unsupported WAV format {audio_format}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    return x, sr


def save_wav(path: str, audio: np.ndarray, sr: int) -> None:
    """Write float32/-1..1 or int16 audio as 16-bit PCM WAV."""
    audio = np.asarray(audio)
    if audio.dtype != np.int16:
        audio = np.clip(audio, -1.0, 1.0)
        audio = (audio * 32767.0).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1 if audio.ndim == 1 else audio.shape[1])
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(audio.tobytes())


def _resample_host(x: np.ndarray, orig_sr: int, new_sr: int) -> np.ndarray:
    if orig_sr == new_sr:
        return x
    from scipy.signal import resample_poly
    import math
    g = math.gcd(orig_sr, new_sr)
    return resample_poly(x, new_sr // g, orig_sr // g).astype(np.float32)


def _ffmpeg_decode(path: str, sr: int) -> np.ndarray:
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(
            f"cannot decode {path}: not a WAV and ffmpeg unavailable")
    out = subprocess.run(
        [ffmpeg, "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
         "-ar", str(sr), "-"],
        capture_output=True, check=True)
    return np.frombuffer(out.stdout, dtype=np.float32)


def load_audio(path: str, sr: int) -> np.ndarray:
    """Decode any audio file to mono float32 at `sr`
    (reference load_audio, infer/lib/audio.py:78)."""
    path = str(path).strip().strip('"').strip("\n")
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    try:
        x, file_sr = load_wav(path)
    except ValueError:
        return _ffmpeg_decode(path, sr)
    return _resample_host(x, file_sr, sr)


def save_audio(path: str, audio: np.ndarray, sr: int,
               format: Optional[str] = None) -> None:
    """Encode audio (reference save_audio, audio.py:49).  WAV natively;
    other formats via ffmpeg when present."""
    fmt = (format or os.path.splitext(path)[1].lstrip(".")).lower() or "wav"
    if fmt == "wav":
        save_wav(path, audio, sr)
        return
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg is None:
        raise RuntimeError(f"encoding {fmt} requires ffmpeg")
    buf = io.BytesIO()
    import wave as _w
    tmp = path + ".tmp.wav"
    save_wav(tmp, audio, sr)
    try:
        subprocess.run([ffmpeg, "-v", "error", "-y", "-i", tmp, path],
                       check=True)
    finally:
        os.unlink(tmp)
