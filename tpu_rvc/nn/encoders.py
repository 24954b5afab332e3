"""Text/unit encoder and posterior encoder (reference rvc/layers/encoders.py)."""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .attention import Encoder
from .modules import Conv1d, Linear, WN


def sequence_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) lengths -> (B, max_len) 0/1 mask."""
    pos = jnp.arange(max_len)[None, :]
    return (pos < lengths[:, None]).astype(jnp.float32)


class TextEncoder(nn.Module):
    """enc_p: phone(+pitch) embedding -> rel-attn encoder -> (m, logs).

    Reference: rvc/layers/encoders.py:84.  Channel-last: phone (B, T, Din),
    pitch (B, T) int32 coarse bins, returns m/logs (B, T', C) and mask
    (B, T', 1).  `skip_head` is a static python int for the streaming path.
    """

    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float = 0.0
    f0: bool = True

    @nn.compact
    def __call__(
        self,
        phone: jax.Array,
        pitch: Optional[jax.Array],
        lengths: jax.Array,
        skip_head: Optional[int] = None,
        deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        x = Linear(self.hidden_channels, name="emb_phone")(phone)
        if self.f0 and pitch is not None:
            emb_pitch = self.param(
                "emb_pitch", nn.initializers.normal(1.0),
                (256, self.hidden_channels),
            )
            x = x + jnp.take(emb_pitch.astype(x.dtype), pitch, axis=0)
        x = x * math.sqrt(self.hidden_channels)
        x = jax.nn.leaky_relu(x, 0.1)
        x_mask = sequence_mask(lengths, x.shape[1])[..., None].astype(x.dtype)
        x = Encoder(
            self.hidden_channels, self.filter_channels, self.n_heads,
            self.n_layers, self.kernel_size, self.p_dropout, name="encoder",
        )(x * x_mask, x_mask, deterministic)
        if skip_head is not None:
            x = x[:, int(skip_head):]
            x_mask = x_mask[:, int(skip_head):]
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs, x_mask


class PosteriorEncoder(nn.Module):
    """enc_q: linear spec -> WN(16) -> (z, m, logs); train-only
    (reference encoders.py:162, stripped for inference at rvc/synthesizer.py:23)."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    n_layers: int = 16
    gin_channels: int = 0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_lengths, g=None, noise_key=None, eps=None):
        # x: (B, T, spec_channels); g: (B, 1, gin)
        # eps: optional pre-drawn posterior noise (B, T, out_channels) —
        # pins the reparametrization draw for step-level loss parity vs
        # the reference trainer (torch.randn_like at reference
        # encoders.py:190 / train.py:540 role)
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(x.dtype)
        h = Conv1d(self.hidden_channels, 1, name="pre")(x) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, self.weight_norm,
               name="enc")(h, x_mask, g=g)
        stats = Conv1d(self.out_channels * 2, 1, name="proj")(h) * x_mask
        m, logs = jnp.split(stats, 2, axis=-1)
        if eps is None:
            if noise_key is None:
                noise_key = self.make_rng("noise")
            eps = jax.random.normal(noise_key, m.shape, m.dtype)
        else:
            eps = eps.astype(m.dtype)
        z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask
