"""STFT primitives with bit-parity to the reference's torch.stft usage.

Reference behaviors reproduced (validated against torch in tests/test_ops.py):
  - infer/lib/train/mel_processing.py:42 `spectrogram_torch`:
    reflect-pad (n_fft - hop) / 2 each side, center=False, hann window,
    magnitude = sqrt(re^2 + im^2 + 1e-6).
  - rvc/f0/stft.py:81 conv-style STFT (the "DFT matmul" formulation — which
    is the natural XLA form and is what we use for everything).

Framing is a gather-free reshape-via-strided-slice: XLA lowers
``frame_signal`` into a cheap windowed gather; the rfft then batches over
frames.  All shapes static under jit.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(win_length: int, dtype=jnp.float32) -> jax.Array:
    """torch.hann_window(periodic=True) equivalent."""
    n = np.arange(win_length)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    return jnp.asarray(w, dtype=dtype)


def frame_signal(y: jax.Array, frame_length: int, hop: int) -> jax.Array:
    """(B, T) -> (B, n_frames, frame_length) with n_frames = 1+(T-frame)//hop.

    The index grid is built from traced iotas (not a numpy literal) so large
    framings don't embed multi-MB constants in the HLO.
    """
    T = y.shape[-1]
    n_frames = 1 + (T - frame_length) // hop
    idx = (jnp.arange(n_frames)[:, None] * hop +
           jnp.arange(frame_length)[None, :])
    return y[..., idx]


def stft(
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """Complex STFT, center=False. y: (B, T) -> (B, n_fft//2+1, n_frames)."""
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, y.dtype)
    frames = frame_signal(y, n_fft, hop)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    frames = frames * window
    spec = jnp.fft.rfft(frames.astype(jnp.float32), n=n_fft, axis=-1)
    return jnp.swapaxes(spec, -1, -2)


def stft_magnitude(
    y: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    *,
    pad_mode: str = "reference",
    eps: float = 1e-6,
) -> jax.Array:
    """Reference `spectrogram_torch` parity: (B, T) -> (B, F, frames).

    pad_mode "reference": reflect-pad (n_fft - hop)//2 per side (center=False),
    so T multiple-of-hop gives exactly T//hop frames.
    """
    if win_length is None:
        win_length = n_fft
    if pad_mode == "reference":
        p = int((n_fft - hop) / 2)
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(p, p)], mode="reflect")
    spec = stft(y, n_fft, hop, win_length)
    return jnp.sqrt(spec.real**2 + spec.imag**2 + eps)


def istft(
    spec: jax.Array,
    n_fft: int,
    hop: int,
    win_length: Optional[int] = None,
    window: Optional[jax.Array] = None,
    length: Optional[int] = None,
) -> jax.Array:
    """Inverse STFT with overlap-add + window-square normalization.

    spec: (B, F, n_frames) complex -> (B, T).  Matches torch.istft
    (center=True semantics left to the caller via `length` trimming).
    """
    if win_length is None:
        win_length = n_fft
    if window is None:
        window = hann_window(win_length, jnp.float32)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        window = jnp.pad(window, (pad, n_fft - win_length - pad))
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    frames = frames * window
    B, n_frames, _ = frames.shape
    T = n_fft + hop * (n_frames - 1)

    # Overlap-add via segment sum: scatter-add each frame at its hop offset.
    def oadd(fr):  # fr: (n_frames, n_fft)
        out = jnp.zeros((T,), fr.dtype)
        idx = (np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :])
        return out.at[idx.reshape(-1)].add(fr.reshape(-1))

    y = jax.vmap(oadd)(frames)
    wsq = jax.vmap(oadd)(jnp.broadcast_to(window**2, (B, n_frames, n_fft)))
    y = y / jnp.maximum(wsq, 1e-11)
    if length is not None:
        start = (T - length) // 2 if length < T else 0
        y = y[:, start:start + length]
    return y
