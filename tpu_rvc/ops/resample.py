"""Device-side resampling and interpolation.

Replaces the reference's host round-trips:
  - librosa.resample in the offline pipeline (infer/modules/vc/pipeline.py:352)
  - torchaudio.transforms.Resample in the realtime engine (infer/lib/rtrvc.py)
  - torch F.interpolate(mode="linear"/"nearest") used for feature 2x upsample
    (pipeline.py:140) and the decoder's n_res resizing (rvc/layers/nsf.py:158).

Polyphase resampling is expressed as a strided conv1d over a windowed-sinc
kernel — a single MXU-friendly op with static shapes for a given (up, down).
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .conv import conv1d


@lru_cache(maxsize=32)
def _sinc_kernel(up: int, down: int, width: int = 64, rolloff: float = 0.945,
                 beta: float = 14.769656459379492) -> np.ndarray:
    """Windowed-sinc lowpass bank for polyphase resampling.

    Matches torchaudio's sinc_interp_kaiser-style construction: one kernel per
    output phase, shape (up, kernel_width).
    """
    cutoff = rolloff * min(1.0, up / down) / 2.0
    half = int(width * max(1.0, down / up))
    idx = np.arange(-half, half + 1, dtype=np.float64)
    # phase offsets for each of the `up` output phases
    t = (idx[None, :] - np.arange(up)[:, None] / up) * 2 * cutoff
    window = np.i0(beta * np.sqrt(np.clip(1 - (t / (2 * cutoff * half)) ** 2, 0, 1))) / np.i0(beta)
    safe_t = np.where(t == 0, 1.0, t)  # sinc(0)=1 without a 0/0 warning
    kern = np.where(t == 0, 1.0,
                    np.sin(np.pi * safe_t) / (np.pi * safe_t)) * window
    kern = kern * (2 * cutoff)
    return kern.astype(np.float32)  # (up, 2*half+1)


def resample_poly(x: jax.Array, orig_sr: int, new_sr: int) -> jax.Array:
    """Resample (..., T) from orig_sr to new_sr via polyphase windowed sinc."""
    if orig_sr == new_sr:
        return x
    g = math.gcd(orig_sr, new_sr)
    up, down = new_sr // g, orig_sr // g
    kern = _sinc_kernel(up, down)  # (up, K)
    K = kern.shape[1]
    half = (K - 1) // 2

    shape = x.shape
    xb = x.reshape(-1, shape[-1], 1)  # (B, T, 1)
    # One conv with `up` output channels = the up phases, then interleave.
    w = jnp.asarray(kern.T[:, None, :])  # (K, 1, up)
    y = conv1d(xb, w, padding=(half, half + down))  # (B, T', up)
    y = y.reshape(y.shape[0], -1)  # interleave phases -> (B, T*up)
    T_out = int(math.ceil(shape[-1] * up / down))
    y = y[:, ::down][:, :T_out] if down > 1 else y[:, :T_out]
    return y.reshape(*shape[:-1], T_out)


def linear_interp_1d(x: jax.Array, out_len: int) -> jax.Array:
    """torch F.interpolate(mode='linear', align_corners=False) parity.

    x: (..., T) -> (..., out_len).
    """
    T = x.shape[-1]
    if T == out_len:
        return x
    scale = T / out_len
    pos = (jnp.arange(out_len, dtype=jnp.float32) + 0.5) * scale - 0.5
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, T - 1)
    hi = jnp.clip(lo + 1, 0, T - 1)
    frac = jnp.clip(pos - lo, 0.0, 1.0).astype(x.dtype)
    return x[..., lo] * (1 - frac) + x[..., hi] * frac


def nearest_upsample(x: jax.Array, factor: int) -> jax.Array:
    """torch F.interpolate(mode='nearest', scale_factor=factor) on last axis."""
    return jnp.repeat(x, factor, axis=-1)
