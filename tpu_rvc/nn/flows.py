"""Normalizing flow: mean-only affine coupling stack (reference residuals.py:166-334).

Forward (training) maps posterior z -> prior space; reverse (inference) maps
sampled prior -> decoder latent.  Couplings alternate with channel Flips.
All ops are elementwise + WN convs — XLA fuses the whole reverse chain into
the synthesis graph.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from .modules import Conv1d, WN


class ResidualCouplingLayer(nn.Module):
    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    mean_only: bool = True
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, self.weight_norm,
               name="enc")(h, x_mask, g=g)
        out_ch = half * (1 if self.mean_only else 2)
        stats = Conv1d(out_ch, 1, kernel_init=nn.initializers.zeros,
                       name="post")(h) * x_mask
        if self.mean_only:
            m, logs = stats, jnp.zeros_like(stats)
        else:
            m, logs = jnp.split(stats, 2, axis=-1)
        if not reverse:
            x1 = (m + x1 * jnp.exp(logs)) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
        else:
            x1 = (x1 - m) * jnp.exp(-logs) * x_mask
            logdet = None
        return jnp.concatenate([x0, x1], axis=-1), logdet


class ResidualCouplingBlock(nn.Module):
    """4x (coupling + flip).  reverse=True runs the stack backwards."""

    channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 3
    n_flows: int = 4
    gin_channels: int = 0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers,
                gin_channels=self.gin_channels, mean_only=True,
                weight_norm=self.weight_norm, name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        if not reverse:
            total_logdet = jnp.zeros((x.shape[0],), jnp.float32)
            for layer in layers:
                x, logdet = layer(x, x_mask, g=g, reverse=False)
                total_logdet = total_logdet + logdet
                x = jnp.flip(x, axis=-1)  # channel Flip
            return x
        for layer in reversed(layers):
            x = jnp.flip(x, axis=-1)  # undo Flip first when reversed
            x, _ = layer(x, x_mask, g=g, reverse=True)
        return x
