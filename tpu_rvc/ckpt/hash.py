"""Model identity hashing (reference infer/modules/vc/hash.py).

A model's hash is a 1024-byte perceptual fingerprint of its deterministic
(seed-114514) conversion of a bundled 3 s clip: 48 kHz output, normalized,
FFT'd, differenced against the original clip's time/freq fields, then
block-averaged into 512 big-endian int16s and base16384-encoded.
`hash_similarity` blends cosine and exp-distance (hash.py:171);
`hash_id` is a 9-byte digest of the hash (hash.py:198).
"""

from __future__ import annotations

import hashlib
import pathlib
from functools import lru_cache
from typing import Optional, Tuple

import numpy as np

from tpu_rvc.utils.base16384 import encode_to_string, decode_from_string

HALF_HASH_LEN = 512
EXPAND_FACTOR = 65536 * 8
_ASSET = pathlib.Path(__file__).parent.parent / "assets" / "lgdsng.npz"


@lru_cache(None)
def _storage():
    return np.load(_ASSET)


def original_audio() -> np.ndarray:
    return _storage()["a"]


def original_rmvpe_f0() -> Tuple[np.ndarray, np.ndarray]:
    x = _storage()
    return x["pitch"], x["pitchf"]


def _cut_u16(n: float) -> float:
    if n > 16384:
        n = 16384 + 16384 * (1 - np.exp((16384 - n) / EXPAND_FACTOR))
    elif n < -16384:
        n = -16384 - 16384 * (1 - np.exp((n + 16384) / EXPAND_FACTOR))
    return n


def wave_hash(time_field: np.ndarray) -> str:
    """48000-sample wave -> base16384 fingerprint (reference wave_hash,
    hash.py:66).  Mutates its input like the reference does."""
    np.divide(time_field, np.abs(time_field).max(), time_field)
    if len(time_field) != 48000:
        raise ValueError("time not hashable")
    freq_field = np.fft.fft(time_field)
    np.add(time_field, _storage()["t"], out=time_field)
    freq_field = freq_field + _storage()["f"]
    h = np.zeros(HALF_HASH_LEN, dtype=">i2")
    d = 375 * 512 // HALF_HASH_LEN
    for i in range(HALF_HASH_LEN // 4):
        a, b = i * 2, i * 2 + 1
        x = a + HALF_HASH_LEN // 2
        y = x + 1
        s = np.average(freq_field[i * d:(i + 1) * d])
        h[a] = np.int16(_cut_u16(round(32768 * np.real(s))))
        h[b] = np.int16(_cut_u16(round(32768 * np.imag(s))))
        h[x] = np.int16(_cut_u16(round(
            32768 * np.sum(time_field[i * d: i * d + d // 2]))))
        h[y] = np.int16(_cut_u16(round(
            32768 * np.sum(time_field[i * d + d // 2:(i + 1) * d]))))
    return encode_to_string(h.tobytes())


def model_hash(pipeline, if_f0: int) -> str:
    """Hash a loaded model by deterministically converting the bundled clip
    (reference model_hash, hash.py:94).  `pipeline` is a tpu_rvc Pipeline."""
    audio = original_audio().copy()
    pitch, pitchf = original_rmvpe_f0()
    times = [0.0, 0.0, 0.0]
    # if_f0==2 semantics: use the precomputed f0 track (reference passes
    # original_rmvpe_f0() as f0_method with if_f0=2)
    audio_opt = pipeline.pipeline(
        0, audio, times, 6, (pitch, pitchf) if if_f0 else "pm",
        None, 0.0, 2 if if_f0 else 0, 3, 16000, 0.25, 0.33,
        noise_seed=114514)
    audio_opt = audio_opt.astype(np.float64)
    opt_len = len(audio_opt)
    diff = 48000 - opt_len
    if diff > 0:
        audio_opt = np.pad(audio_opt, (diff, 0))
    elif diff < 0:
        n = -(diff // 2)
        audio_opt = audio_opt[n:-n]
    return wave_hash(audio_opt[:48000].astype(np.float64))


def model_hash_ckpt(cpt: dict) -> Optional[str]:
    """Hash directly from a small-model dict.  Returns None when the heavy
    conversion path (HuBERT weights) is unavailable — the hash field is
    optional metadata."""
    try:
        from tpu_rvc.pipeline.vc import VC
        import tempfile, os
        from .torch_pth import save_pth

        with tempfile.TemporaryDirectory() as td:
            p = os.path.join(td, "m.pth")
            save_pth(cpt, p)
            # the reference hashes under CPUConfig geometry (x_pad=1)
            vc = VC(x_pad=1.0)
            meta = vc.get_vc(p)
            return model_hash(vc.pipeline, int(meta.get("f0", 1)))
    except Exception:
        return None


def _extend_difference(n, a, b):
    n = min(max(n, a), b)
    return (n - a) / (b - a)


def hash_similarity(h1: str, h2: str) -> float:
    """Cosine + exp-distance blend in [0, 1] (reference hash.py:171)."""
    h1b, h2b = decode_from_string(h1), decode_from_string(h2)
    if len(h1b) != HALF_HASH_LEN * 2 or len(h2b) != HALF_HASH_LEN * 2:
        raise ValueError("invalid hash length")
    h1n = np.frombuffer(h1b, dtype=">i2")
    h2n = np.frombuffer(h2b, dtype=">i2")
    d = 0.0
    for i in range(HALF_HASH_LEN // 4):
        a, b = i * 2, i * 2 + 1
        ax = complex(h1n[a], h1n[b])
        bx = complex(h2n[a], h2n[b])
        if abs(ax) == 0 or abs(bx) == 0:
            continue
        d += np.abs(ax - bx)
    frac = np.linalg.norm(h1n) * np.linalg.norm(h2n)
    cosine = (np.dot(h1n.astype(np.float32), h2n.astype(np.float32)) / frac
              if frac != 0 else 1.0)
    distance = _extend_difference(np.exp(-d / EXPAND_FACTOR), 0.5, 1.0)
    return round((abs(cosine) + distance) / 2, 6)


def hash_id(h: str) -> str:
    """Short display id derived from a hash (reference hash.py:198)."""
    d = decode_from_string(h)
    if len(d) != HALF_HASH_LEN * 2:
        return "invalid hash length"
    return (encode_to_string(
        np.frombuffer(d, dtype=np.uint64).sum(keepdims=True).tobytes())[:-2]
        + encode_to_string(hashlib.md5(d).digest()[:7]))
