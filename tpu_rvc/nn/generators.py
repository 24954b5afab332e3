"""HiFiGAN / NSF-HiFiGAN decoders (reference rvc/layers/generators.py, nsf.py).

This is the FLOP-dominant subgraph of the whole system (audio-rate convs).
TPU-first choices:
  - channel-last convs (MXU-tiled contractions, no transposes)
  - the NSF sine source's per-frame phase accumulation is ONE frame-rate
    cumsum (length T_frames, not T_samples) followed by a broadcasted
    within-frame ramp — same recurrence the reference computes
    (generators.py:148-168) but shaped so XLA sees a short cumsum plus
    elementwise math instead of an audio-rate scan.
  - all upsample ratios/kernels are static; the whole decoder is one fused
    XLA program.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_rvc.ops.resample import linear_interp_1d, nearest_upsample
from .modules import (
    Conv1d,
    ConvTranspose1d,
    Linear,
    ResBlock1,
    ResBlock2,
    LRELU_SLOPE,
    normal_001_init,
)


def _interp_channels_last(x: jax.Array, out_len: int) -> jax.Array:
    """linear_interp_1d over the time axis of (B, T, C)."""
    return linear_interp_1d(jnp.swapaxes(x, 1, 2), out_len).swapaxes(1, 2)


def _resblock_stage(x, ch, i, kernel_sizes, dilation_sizes, weight_norm, rb):
    """One upsample level's resblock stage: mean_j ResBlock_j(x).

    When the trace-time PALLAS_STAGE_CHANNELS toggle includes `ch` (and
    the config matches the stock 3-resblock/3-dilation shape), the whole
    stage runs as ONE pallas kernel (fused_stage) — all 18 convs + the
    average in a single VMEM residency, amortizing the custom-call
    boundary that defeated per-resblock swaps in round 1."""
    from tpu_rvc.nn import modules as _modules

    num_kernels = len(kernel_sizes)
    use_stage = (rb is ResBlock1 and x.shape[0] == 1
                 and ch in _modules.PALLAS_STAGE_CHANNELS
                 and len(kernel_sizes) == 3
                 and all(tuple(d) == tuple(dilation_sizes[0])
                         for d in dilation_sizes)
                 and len(dilation_sizes[0]) == 3)
    if use_stage:
        import os
        from tpu_rvc.ops.pallas.resblock import fused_stage
        ws, bs = [], []
        for j, (rk, rd) in enumerate(zip(kernel_sizes, dilation_sizes)):
            w6, b6 = rb(ch, rk, tuple(rd), weight_norm=weight_norm,
                        name=f"resblock_{i}_{j}")(x, collect_weights=True)
            ws += w6
            bs += b6
        xk = x[0].astype(jnp.bfloat16)
        ws = [w.astype(jnp.bfloat16) for w in ws]
        bs = [b.astype(jnp.bfloat16) for b in bs]
        # tile 1024: the 3-resblock stage holds ~3x the live state of the
        # single-resblock kernel, and tile 2048 blows the 16 MB scoped
        # VMEM limit (measured 21.07 MB on v5e).  Env-tunable for A/B.
        tile = int(os.environ.get("PALLAS_STAGE_TILE", "1024"))
        return fused_stage(xk, tuple(ws), tuple(bs),
                           kernel_sizes=tuple(kernel_sizes),
                           dilations=tuple(dilation_sizes[0]),
                           tile=tile)[None].astype(x.dtype)
    xs = None
    for j, (rk, rd) in enumerate(zip(kernel_sizes, dilation_sizes)):
        y = rb(ch, rk, tuple(rd), weight_norm=weight_norm,
               name=f"resblock_{i}_{j}")(x)
        xs = y if xs is None else xs + y
    return xs / num_kernels


class Generator(nn.Module):
    """HiFiGAN generator, no f0 (reference generators.py:14)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int = 0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, g=None, n_res: Optional[int] = None,
                 deterministic: bool = False):
        # x: (B, T, C); g: (B, 1, gin)
        # deterministic: accepted for call-site symmetry with
        # NSFGenerator (the synthesizer passes it to whichever decoder
        # it holds); the plain HiFiGAN decoder has no stochastic terms
        del deterministic
        if n_res is not None and int(n_res) != x.shape[1]:
            x = _interp_channels_last(x, int(n_res))
        rb = ResBlock1 if self.resblock == "1" else ResBlock2
        x = Conv1d(self.upsample_initial_channel, 7, padding=3,
                   name="conv_pre")(x)
        if g is not None and self.gin_channels != 0:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)
        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2,
                                weight_norm=self.weight_norm,
                                kernel_init=normal_001_init,
                                name=f"up_{i}")(x)
            x = _resblock_stage(x, ch, i, self.resblock_kernel_sizes,
                                self.resblock_dilation_sizes,
                                self.weight_norm, rb)
        x = jax.nn.leaky_relu(x)  # default slope 0.01, as reference F.leaky_relu
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)


def f0_to_sine_phases(
    f0: jax.Array, upp: int, sampling_rate: int, n_harmonics: int,
    rand_key: Optional[jax.Array],
) -> jax.Array:
    """Continuous-phase harmonic angles from frame-rate f0.

    f0: (B, L) Hz at frame rate -> phases (B, L*upp, n_harmonics) in cycles.
    Matches reference SineGenerator._f02sine (generators.py:148): within each
    frame the phase advances linearly at that frame's f0; frame boundaries
    accumulate wrapped phase so the sine is continuous across frames.
    """
    B, L = f0.shape
    # per-sample increment within a frame, in cycles
    inc = f0[:, :, None] / sampling_rate  # (B, L, 1)
    ramp = jnp.arange(1, upp + 1, dtype=f0.dtype)[None, None, :]  # (1,1,upp)
    rad = inc * ramp  # (B, L, upp): phase within frame (end-exclusive start)
    # accumulated phase at each frame start = cumsum of previous frames'
    # full-frame advance, wrapped to [-0.5, 0.5) before accumulation exactly
    # as the reference does (fmod(x+0.5,1)-0.5 then cumsum then fmod 1).
    frame_adv = rad[:, :-1, -1]  # (B, L-1): last sample's phase per frame
    wrapped = jnp.mod(frame_adv.astype(jnp.float32) + 0.5, 1.0) - 0.5
    acc = jnp.mod(jnp.cumsum(wrapped, axis=1), 1.0).astype(f0.dtype)
    acc = jnp.pad(acc, ((0, 0), (1, 0)))  # frame 0 starts at phase 0
    rad = rad + acc[:, :, None]
    rad = rad.reshape(B, L * upp, 1)
    harm = jnp.arange(1, n_harmonics + 1, dtype=f0.dtype)[None, None, :]
    rad = rad * harm
    if rand_key is not None and n_harmonics > 1:
        rand_ini = jax.random.uniform(rand_key, (1, 1, n_harmonics), f0.dtype)
        rand_ini = rand_ini.at[..., 0].set(0.0)
        rad = rad + rand_ini
    return rad


class SineGenerator(nn.Module):
    """Sine + UV-gated-noise source (reference generators.py:116)."""

    sampling_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0, upp: int, noise_key=None, deterministic: bool = False):
        # f0: (B, L) frame-rate Hz -> sine (B, L*upp, dim), uv (B, L*upp, 1)
        dim = self.harmonic_num + 1
        if noise_key is None and not deterministic:
            noise_key = self.make_rng("noise")
        if deterministic:
            k_phase = k_noise = None
        else:
            k_phase, k_noise = jax.random.split(noise_key)
        phases = f0_to_sine_phases(f0, upp, self.sampling_rate, dim,
                                   k_phase if dim > 1 else None)
        sines = jnp.sin(2 * jnp.pi * phases) * self.sine_amp
        uv = (f0 > self.voiced_threshold).astype(f0.dtype)[:, :, None]
        uv = nearest_upsample(uv.swapaxes(1, 2), upp).swapaxes(1, 2)
        noise_amp = uv * self.noise_std + (1 - uv) * self.sine_amp / 3
        if deterministic:
            noise = jnp.zeros_like(sines)
        else:
            noise = noise_amp * jax.random.normal(k_noise, sines.shape, sines.dtype)
        return sines * uv + noise, uv, noise


class SourceModuleHnNSF(nn.Module):
    """Merge harmonics to one excitation via Linear+tanh (reference nsf.py:16)."""

    sampling_rate: int
    harmonic_num: int = 0
    sine_amp: float = 0.1
    add_noise_std: float = 0.003
    voiced_threshold: float = 0.0

    @nn.compact
    def __call__(self, f0, upp: int = 1, noise_key=None,
                 deterministic: bool = False):
        sine_wavs, _, _ = SineGenerator(
            self.sampling_rate, self.harmonic_num, self.sine_amp,
            self.add_noise_std, self.voiced_threshold, name="l_sin_gen",
        )(f0, upp, noise_key, deterministic)
        return jnp.tanh(Linear(1, name="l_linear")(sine_wavs))


class NSFGenerator(nn.Module):
    """NSF-HiFiGAN: harmonic source injected at every upsample stage
    (reference nsf.py:64)."""

    initial_channel: int
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    gin_channels: int
    sr: int
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, f0, g=None, n_res: Optional[int] = None,
                 noise_key=None, deterministic: bool = False):
        # x: (B, T, C) latent; f0: (B, T_frames) Hz; g: (B, 1, gin)
        upp = math.prod(self.upsample_rates)
        rb = ResBlock1 if self.resblock == "1" else ResBlock2

        har = SourceModuleHnNSF(self.sr, harmonic_num=0, name="m_source")(
            f0, upp, noise_key, deterministic)  # (B, T_f*upp, 1)

        if n_res is not None:
            n = int(n_res)
            if n * upp != har.shape[1]:
                har = _interp_channels_last(har, n * upp)
            if n != x.shape[1]:
                x = _interp_channels_last(x, n)

        x = Conv1d(self.upsample_initial_channel, 7, padding=3,
                   name="conv_pre")(x)
        if g is not None and self.gin_channels != 0:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        for i, (u, k) in enumerate(zip(self.upsample_rates,
                                       self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(ch, k, u, padding=(k - u) // 2,
                                weight_norm=self.weight_norm,
                                kernel_init=normal_001_init,
                                name=f"up_{i}")(x)
            # strided conv brings the audio-rate source down to this stage's rate
            if i + 1 < len(self.upsample_rates):
                stride_f0 = math.prod(self.upsample_rates[i + 1:])
                x_source = Conv1d(ch, kernel_size=stride_f0 * 2,
                                  stride=stride_f0, padding=stride_f0 // 2,
                                  name=f"noise_conv_{i}")(har)
            else:
                x_source = Conv1d(ch, 1, name=f"noise_conv_{i}")(har)
            x = x + x_source
            x = _resblock_stage(x, ch, i, self.resblock_kernel_sizes,
                                self.resblock_dilation_sizes,
                                self.weight_norm, rb)
        x = jax.nn.leaky_relu(x)
        x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post")(x)
        return jnp.tanh(x)
