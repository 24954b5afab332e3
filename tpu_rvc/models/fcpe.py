"""Native FCPE pitch estimator (reference rvc/f0/fcpe.py:9 wraps the
torchfcpe bundled model; this is an independent JAX implementation of the
published CFNaiveMelPE architecture).

Structure (conv-only conformer, the bundled `fcpe_c_v001` configuration):

  log-mel (B, T, 128)
    -> input stem: conv3 -> GroupNorm(4) -> LeakyReLU -> conv3   (hidden)
    -> N x CFNEncoderLayer, each a residual conformer conv module:
         LayerNorm -> 1x1 conv to 2*inner -> GLU -> depthwise conv(31)
         -> SiLU -> 1x1 conv back -> residual
    -> LayerNorm -> weight-normed Linear -> sigmoid              (360 bins)

Decode ("local_argmax"): weighted average of the cent table over the 9 bins
around the per-frame argmax; frames whose peak confidence is below the
threshold are unvoiced.  cent_table spans f0_to_cent(f0_min=32.70 Hz) ..
f0_to_cent(f0_max=1975.5 Hz) in out_dims equal steps, cent = 1200*log2(f/10).

Everything is channel-last and static-shape so the whole wav->f0 chain jits
into one XLA program (TPU: the depthwise/1x1 convs fuse; the stem and
projection land on the MXU).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from tpu_rvc.ops.conv import conv1d


def f0_to_cent(f0: float) -> float:
    return 1200.0 * math.log2(f0 / 10.0)


class ConformerConvModule(nn.Module):
    """Residual conv block of the conv-only conformer encoder."""

    dim: int
    expansion: int = 2
    kernel: int = 31

    @nn.compact
    def __call__(self, x):  # (B, T, C)
        inner = self.dim * self.expansion
        g = self.param("ln_g", nn.initializers.ones, (self.dim,))
        b = self.param("ln_b", nn.initializers.zeros, (self.dim,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        y = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b).astype(x.dtype)

        w1 = self.param("pw1_w", nn.initializers.lecun_normal(),
                        (1, self.dim, 2 * inner))
        b1 = self.param("pw1_b", nn.initializers.zeros, (2 * inner,))
        y = conv1d(y, w1.astype(y.dtype)) + b1.astype(y.dtype)
        a, gate = y[..., :inner], y[..., inner:]
        y = a * jax.nn.sigmoid(gate)  # GLU over channels

        wd = self.param("dw_w", nn.initializers.lecun_normal(),
                        (self.kernel, 1, inner))
        bd = self.param("dw_b", nn.initializers.zeros, (inner,))
        pad = (self.kernel // 2, (self.kernel - 1) // 2)
        y = conv1d(y, wd.astype(y.dtype), padding=pad, groups=inner) \
            + bd.astype(y.dtype)
        y = jax.nn.silu(y)

        w2 = self.param("pw2_w", nn.initializers.lecun_normal(),
                        (1, inner, self.dim))
        b2 = self.param("pw2_b", nn.initializers.zeros, (self.dim,))
        return conv1d(y, w2.astype(y.dtype)) + b2.astype(y.dtype)


class CFNaiveMelPE(nn.Module):
    """torchfcpe CFNaiveMelPE, conv-only variant (bundled model config)."""

    in_dims: int = 128
    hidden_dims: int = 512
    out_dims: int = 360
    n_layers: int = 6
    expansion: int = 2
    kernel: int = 31
    f0_min: float = 32.70
    f0_max: float = 1975.5

    @nn.compact
    def __call__(self, mel):  # (B, T, in_dims) -> (B, T, out_dims) in (0,1)
        w0 = self.param("stem0_w", nn.initializers.lecun_normal(),
                        (3, self.in_dims, self.hidden_dims))
        b0 = self.param("stem0_b", nn.initializers.zeros, (self.hidden_dims,))
        x = conv1d(mel, w0.astype(mel.dtype), padding=(1, 1)) \
            + b0.astype(mel.dtype)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, name="stem_gn")(x)
        x = nn.leaky_relu(x, 0.01)
        w1 = self.param("stem1_w", nn.initializers.lecun_normal(),
                        (3, self.hidden_dims, self.hidden_dims))
        b1 = self.param("stem1_b", nn.initializers.zeros, (self.hidden_dims,))
        x = conv1d(x, w1.astype(x.dtype), padding=(1, 1)) + b1.astype(x.dtype)

        for i in range(self.n_layers):
            x = x + ConformerConvModule(self.hidden_dims, self.expansion,
                                        self.kernel, name=f"layer_{i}")(x)

        g = self.param("norm_g", nn.initializers.ones, (self.hidden_dims,))
        b = self.param("norm_b", nn.initializers.zeros, (self.hidden_dims,))
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = xf.var(-1, keepdims=True)
        x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * g + b)

        # weight-normed Linear, stored folded (ckpt loader folds g*v/|v|)
        wp = self.param("proj_w", nn.initializers.lecun_normal(),
                        (self.hidden_dims, self.out_dims))
        bp = self.param("proj_b", nn.initializers.zeros, (self.out_dims,))
        return jax.nn.sigmoid(x @ wp + bp)

    def cent_table(self) -> jnp.ndarray:
        return jnp.linspace(f0_to_cent(self.f0_min), f0_to_cent(self.f0_max),
                            self.out_dims)


def latent2cents_local(y: jax.Array, cent_table: jax.Array,
                       threshold: float = 0.006) -> jax.Array:
    """local_argmax decode (torchfcpe decoder): (B, T, D) -> (B, T) cents,
    -inf where the peak confidence is below threshold (maps to f0=0)."""
    D = y.shape[-1]
    conf = y.max(-1)
    center = jnp.argmax(y, axis=-1)
    idx = jnp.clip(center[..., None] + jnp.arange(-4, 5), 0, D - 1)
    y_l = jnp.take_along_axis(y, idx, axis=-1)
    ci_l = cent_table[idx]
    cents = (y_l * ci_l).sum(-1) / y_l.sum(-1)
    return jnp.where(conf > threshold, cents, -jnp.inf)


def cents_to_f0(cents: jax.Array) -> jax.Array:
    """cent = 1200*log2(f0/10); -inf cents decode to f0 = 0."""
    return 10.0 * (2.0 ** (cents / 1200.0))


def fcpe_mel(wav: jax.Array, sr: int = 16000, n_fft: int = 1024,
             hop: int = 160, n_mels: int = 128, fmin: float = 0.0,
             fmax: float = 8000.0, clamp: float = 1e-5) -> jax.Array:
    """torchfcpe Wav2Mel: slaney mel over a centered STFT, log-clamped.
    (B, T) -> (B, frames, n_mels)."""
    from tpu_rvc.ops.mel import mel_filterbank
    from tpu_rvc.ops.stft import stft

    basis = jnp.asarray(mel_filterbank(sr, n_fft, n_mels, fmin, fmax,
                                       htk=False))
    pad = n_fft // 2
    y = jnp.pad(wav, [(0, 0)] * (wav.ndim - 1) + [(pad, pad)],
                mode="reflect")
    mag = jnp.abs(stft(y, n_fft, hop))
    mel = jnp.einsum("mf,bft->btm", basis, mag)
    return jnp.log(jnp.clip(mel, min=clamp))


def fcpe_infer(model: CFNaiveMelPE, variables, wav: jax.Array,
               threshold: float = 0.006, dtype=jnp.float32) -> jax.Array:
    """wav (B, T) @16k -> f0 (B, frames); 0 = unvoiced.  Jit-safe."""
    mel = fcpe_mel(wav)
    latent = model.apply(variables, mel.astype(dtype)).astype(jnp.float32)
    cents = latent2cents_local(latent, model.cent_table(), threshold)
    return cents_to_f0(cents)
