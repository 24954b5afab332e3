"""Multi-period discriminator (training only; reference rvc/layers/discriminators.py).

DiscriminatorP's period-fold is a reshape + 2D conv: (B, T) -> (B, T/p, p, C).
Channel-last NHWC keeps the convs MXU-friendly.  v1 periods (2,3,5,7,11,17),
v2 adds (23,37) (reference discriminators.py:23).
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import LRELU_SLOPE, torch_conv_bias_init_factory

V1_PERIODS = (2, 3, 5, 7, 11, 17)
V2_PERIODS = (2, 3, 5, 7, 11, 17, 23, 37)


def _wn_conv2d(x, features, kernel, stride, padding, name_scope, module,
               weight_norm=True):
    """2D conv with torch-style weight-norm params, NHWC, kernel (kh,kw,cin,cout)."""
    cin = x.shape[-1]
    kh, kw = kernel
    shape = (kh, kw, cin, features)

    def kinit(key, s, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(cin * kh * kw)
        return jax.random.uniform(key, s, dtype, -bound, bound)

    if weight_norm:
        v = module.param(f"{name_scope}_v", kinit, shape)
        g = module.param(
            f"{name_scope}_g",
            lambda key, s: jnp.sqrt(jnp.sum(kinit(key, shape) ** 2,
                                            axis=(0, 1, 2), keepdims=True)),
            (1, 1, 1, features),
        )
        norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
        w = g * v / norm
    else:
        w = module.param(f"{name_scope}_kernel", kinit, shape)
    b = module.param(f"{name_scope}_bias",
                     torch_conv_bias_init_factory(cin * kh * kw), (features,))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b.astype(x.dtype)


class DiscriminatorP(nn.Module):
    """Period discriminator (reference discriminators.py:104)."""

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, list]:
        # x: (B, T, 1) -> fold to (B, T/p, p, 1)
        B, T, _ = x.shape
        p = self.period
        if T % p != 0:
            n_pad = p - (T % p)
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)), mode="reflect")
            T = T + n_pad
        x = x.reshape(B, T // p, p, 1)
        fmap = []
        chans = [32, 128, 512, 1024]
        pad = ((self.kernel_size - 1) // 2, 0)
        for i, ch in enumerate(chans):
            x = _wn_conv2d(x, ch, (self.kernel_size, 1), (self.stride, 1),
                           pad, f"conv_{i}", self)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = _wn_conv2d(x, 1024, (self.kernel_size, 1), (1, 1), pad, "conv_4", self)
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = _wn_conv2d(x, 1, (3, 1), (1, 1), (1, 0), "conv_post", self)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class DiscriminatorS(nn.Module):
    """Scale discriminator on the raw waveform (reference discriminators.py:69)."""

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, list]:
        # x: (B, T, 1); 1D convs expressed as (kh=k, kw=1) 2D on (B, T, 1, 1)
        B = x.shape[0]
        x = x[:, :, None, :]
        fmap = []
        specs = [  # (ch, k, stride, groups, pad)
            (16, 15, 1, 1, 7),
            (64, 41, 4, 4, 20),
            (256, 41, 4, 16, 20),
            (1024, 41, 4, 64, 20),
            (1024, 41, 4, 256, 20),
            (1024, 5, 1, 1, 2),
        ]
        for i, (ch, k, s, gdiv, pad) in enumerate(specs):
            cin = x.shape[-1]
            shape = (k, 1, cin // gdiv, ch)

            def kinit(key, sh, dtype=jnp.float32):
                bound = 1.0 / math.sqrt(sh[0] * sh[2])
                return jax.random.uniform(key, sh, dtype, -bound, bound)

            v = self.param(f"conv_{i}_v", kinit, shape)
            g = self.param(
                f"conv_{i}_g",
                lambda key, sh, _shape=shape, _k=kinit: jnp.sqrt(
                    jnp.sum(_k(key, _shape) ** 2, axis=(0, 1, 2), keepdims=True)),
                (1, 1, 1, ch),
            )
            w = g * v / jnp.sqrt(jnp.sum(v * v, axis=(0, 1, 2), keepdims=True))
            b = self.param(f"conv_{i}_bias",
                           torch_conv_bias_init_factory(shape[0] * shape[2]),
                           (ch,))
            x = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(s, 1),
                padding=[(pad, pad), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=gdiv,
            ) + b.astype(x.dtype)
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = _wn_conv2d(x, 1, (3, 1), (1, 1), (1, 0), "conv_post", self)
        fmap.append(x)
        return x.reshape(B, -1), fmap


class MultiPeriodDiscriminator(nn.Module):
    """MPD = DiscriminatorS + per-period DiscriminatorP (reference :14)."""

    version: str = "v2"

    @nn.compact
    def __call__(self, y, y_hat):
        periods = V2_PERIODS if self.version == "v2" else V1_PERIODS
        y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
        ds = DiscriminatorS(name="disc_s")
        for xr, out_list, fmaps in ((y, y_d_rs, fmap_rs), (y_hat, y_d_gs, fmap_gs)):
            o, f = ds(xr)
            out_list.append(o)
            fmaps.append(f)
        for p in periods:
            dp = DiscriminatorP(p, name=f"disc_p{p}")
            for xr, out_list, fmaps in ((y, y_d_rs, fmap_rs),
                                        (y_hat, y_d_gs, fmap_gs)):
                o, f = dp(xr)
                out_list.append(o)
                fmaps.append(f)
        return y_d_rs, y_d_gs, fmap_rs, fmap_gs
