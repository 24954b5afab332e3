"""Device-resident f0 post-processing.

The reference's f0 chain bounces through numpy/numba between the estimator
and the synthesizer (gen.py post_process + f0.py interpolation).  On a
remote-attached TPU every host round-trip costs more than the compute, so
the gap interpolation, transpose, and coarse quantization are reimplemented
as jnp ops and fused into the conversion graph.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .base import F0_MIN, F0_MAX


def interpolate_f0_jax(f0: jax.Array) -> jax.Array:
    """Vectorized unvoiced-gap interpolation (base.interpolate_f0 parity).

    f0: (T,) with 0 = unvoiced.  Linear interp between voiced neighbors,
    edge-hold at both ends, all-zeros passthrough.
    """
    n = f0.shape[-1]
    idx = jnp.arange(n)
    voiced = f0 > 0.0
    # index of previous voiced frame (inclusive), -1 if none
    prev_idx = jax.lax.associative_scan(
        jnp.maximum, jnp.where(voiced, idx, -1))
    # index of next voiced frame (inclusive), n if none
    next_idx = jax.lax.associative_scan(
        jnp.minimum, jnp.where(voiced, idx, n), reverse=True)
    prev_val = f0[jnp.clip(prev_idx, 0, n - 1)]
    next_val = f0[jnp.clip(next_idx, 0, n - 1)]
    has_prev = prev_idx >= 0
    has_next = next_idx < n
    span = jnp.maximum(next_idx - prev_idx, 1)
    w = (idx - prev_idx).astype(f0.dtype) / span.astype(f0.dtype)
    interp = prev_val * (1 - w) + next_val * w
    out = jnp.where(has_prev & has_next, interp,
                    jnp.where(has_prev, prev_val,
                              jnp.where(has_next, next_val, 0.0)))
    return jnp.where(voiced, f0, out)


def post_process_jax(f0: jax.Array, f0_up_key: jax.Array,
                     f0_min: float = F0_MIN, f0_max: float = F0_MAX):
    """Transpose + coarse mel quantization (base.post_process parity,
    minus the host-only manual-curve splice)."""
    f0 = f0 * (2.0 ** (f0_up_key / 12.0))
    mel_min = 1127.0 * jnp.log(1 + f0_min / 700.0)
    mel_max = 1127.0 * jnp.log(1 + f0_max / 700.0)
    mel = 1127.0 * jnp.log(1 + f0 / 700.0)
    scaled = jnp.where(mel > 0,
                       (mel - mel_min) * 254.0 / (mel_max - mel_min) + 1.0,
                       mel)
    coarse = jnp.rint(jnp.clip(scaled, 1.0, 255.0)).astype(jnp.int32)
    return coarse, f0.astype(jnp.float32)


def pm_f0_device(wav: jax.Array, p_len: int, f0_up_key, sr: int = 16000,
                 hop: int = 160, f0_min: float = F0_MIN,
                 f0_max: float = F0_MAX):
    """Full device-side pm pitch track: estimate -> fit length ->
    interpolate -> transpose -> quantize.  wav: (T,) at `sr`."""
    from .pm import _pm_f0

    win = int(3 * sr / f0_min)
    win -= win % 2
    pad = win // 2
    wav_p = jnp.pad(wav, (pad, pad), mode="reflect")
    f0 = _pm_f0(wav_p, sr, hop, win, float(f0_min), float(f0_max))
    # center pad/trim to p_len (base._fit_length parity)
    m = f0.shape[0]
    if m >= p_len:
        f0 = f0[:p_len]
    else:
        left = (p_len - m + 1) // 2
        f0 = jnp.pad(f0, (left, p_len - m - left))
    f0 = interpolate_f0_jax(f0)
    return post_process_jax(f0, f0_up_key, f0_min, f0_max)


def to_local_average_cents_jax(salience: jax.Array,
                               threshold: float = 0.05) -> jax.Array:
    """Device-side RMVPE decode (f0/rmvpe.py to_local_average_cents parity):
    salience (T, 360) -> cents, 0 below threshold."""
    cents_mapping = jnp.asarray(20.0 * jnp.arange(360) + 1997.3794084376191)
    cents_p = jnp.pad(cents_mapping, (4, 4))
    sal_p = jnp.pad(salience, ((0, 0), (4, 4)))
    center = jnp.argmax(salience, axis=1) + 4
    idx = center[:, None] + jnp.arange(-4, 5)[None, :]
    rows = jnp.arange(salience.shape[0])[:, None]
    todo_sal = sal_p[rows, idx]
    todo_cents = cents_p[idx]
    divided = (todo_sal * todo_cents).sum(1) / todo_sal.sum(1)
    maxx = salience.max(axis=1)
    return jnp.where(maxx > threshold, divided, 0.0)


def resize_f0_jax(f0: jax.Array, target_len: int) -> jax.Array:
    """Device-side f0 resize (base.resize_f0 parity): NaN-mask unvoiced,
    linear resample, zero-fill."""
    n = f0.shape[0]
    src = jnp.where(f0 < 0.001, jnp.nan, f0.astype(jnp.float32))
    pos = jnp.arange(target_len) * (n / target_len)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(lo + 1, 0, n - 1)
    frac = (pos - lo).astype(jnp.float32)
    out = src[lo] * (1 - frac) + src[hi] * frac
    # exact grid points must not pull NaN in from the other endpoint
    # (0 * NaN = NaN would zero a voiced frame)
    out = jnp.where(frac == 0, src[lo], out)
    # np.interp-style edge hold beyond the last source point
    out = jnp.where(pos >= n - 1, src[n - 1], out)
    return jnp.nan_to_num(out)


def rmvpe_f0_device(wav: jax.Array, p_len: int, f0_up_key,
                    rmvpe_model, rmvpe_vars, threshold: float = 0.03,
                    dtype=jnp.float32):
    """Fully device-side RMVPE pitch: mel -> E2E -> local-average decode ->
    resize -> interpolate -> transpose -> quantize.  wav: (T,) @16k."""
    from tpu_rvc.f0.rmvpe import rmvpe_mel

    mel = rmvpe_mel(wav[None])
    n_frames = mel.shape[-1]
    n_pad = 32 * ((n_frames - 1) // 32 + 1) - n_frames
    melp = jnp.pad(mel, ((0, 0), (0, 0), (0, n_pad)))
    hidden = rmvpe_model.apply(rmvpe_vars, melp.astype(dtype))[0]
    hidden = hidden[:n_frames].astype(jnp.float32)
    cents = to_local_average_cents_jax(hidden, threshold)
    f0 = 10.0 * (2.0 ** (cents / 1200.0))
    f0 = jnp.where(f0 == 10.0, 0.0, f0)
    f0 = resize_f0_jax(f0, p_len)
    f0 = interpolate_f0_jax(f0)
    # quantization range is the global F0_MIN/F0_MAX (gen.py defaults),
    # NOT the estimator's 30-8000 Hz search range
    return post_process_jax(f0, f0_up_key)


def fcpe_f0_device(wav: jax.Array, p_len: int, f0_up_key,
                   fcpe_model, fcpe_vars, threshold: float = 0.006,
                   dtype=jnp.float32):
    """Fully device-side FCPE pitch (models/fcpe.py chain + the same
    resize/interpolate/quantize tail as the host estimator).
    wav: (T,) @16k."""
    from tpu_rvc.models.fcpe import fcpe_infer

    f0 = fcpe_infer(fcpe_model, fcpe_vars, wav[None], threshold, dtype)[0]
    f0 = resize_f0_jax(f0, p_len)
    f0 = interpolate_f0_jax(f0)
    return post_process_jax(f0, f0_up_key)
