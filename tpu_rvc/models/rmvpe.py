"""RMVPE pitch model in flax (reference rvc/f0/e2e.py:8, rvc/f0/deepunet.py).

E2E(n_blocks=4, n_gru=1, kernel=(2,2)): a 5-level res-conv U-net over the
128-mel log spectrogram, a 1x BiGRU, and a 360-bin salience head.

TPU-first notes:
  - NHWC layout (time as H, mel as W) so every conv tiles the MXU.
  - BatchNorm is inference-only here (the reference downloads trained
    rmvpe.pt); loaders fold running stats into per-channel (scale, bias).
  - The BiGRU is two `lax.scan`s over time.  T <= a few thousand frames and
    hidden 256, so the scan's sequential matmuls are small; the U-net
    dominates FLOPs.
  - Time is padded to a multiple of 32 (5 avg-pools of 2) before the U-net
    (reference rmvpe.py:139 _mel2hidden).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

N_MELS = 128
N_CLASS = 360

# lax.scan unroll factor for the GRU recurrence.  The on-chip A/B
# (benchmarks/f0_floor.py, F0_FLOOR.json bigru_unroll_ab_ms: unroll
# 1/4/8/16/32 -> 0.28/0.28/0.27/0.26/0.25 ms) shows the fused
# single-scan recurrence is NOT loop-overhead-bound — unrolling buys
# ~0.01 ms while multiplying the scan body in the traced HLO of every
# rmvpe graph (compiles cost 2-10 min on the remote service).  Default
# is therefore 1; the env knob remains for re-running the A/B.
GRU_SCAN_UNROLL = int(os.environ.get("TPU_RVC_GRU_UNROLL", 1))


class FoldedBN(nn.Module):
    """Inference BatchNorm: y = x * scale + bias (stats folded at load)."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _conv2d(x, w, stride=(1, 1), padding=(1, 1)):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ConvBlockRes(nn.Module):
    """2x (conv3x3 -> BN -> relu) + residual (reference deepunet.py:7)."""

    in_channels: int
    out_channels: int

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(2):
            cin = self.in_channels if i == 0 else self.out_channels
            w = self.param(f"conv{i}_w", nn.initializers.he_normal(),
                           (3, 3, cin, self.out_channels))
            h = _conv2d(h, w)
            h = FoldedBN(self.out_channels, name=f"bn{i}")(h)
            h = jax.nn.relu(h)
        if self.in_channels != self.out_channels:
            ws = self.param("shortcut_w", nn.initializers.he_normal(),
                            (1, 1, self.in_channels, self.out_channels))
            bs = self.param("shortcut_b", nn.initializers.zeros,
                            (self.out_channels,))
            x = _conv2d(x, ws, padding=(0, 0)) + bs.astype(x.dtype)
        return h + x


class ResEncoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int = 4
    pool: bool = True

    @nn.compact
    def __call__(self, x):
        x = ConvBlockRes(self.in_channels, self.out_channels, name="block_0")(x)
        for i in range(1, self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.out_channels,
                             name=f"block_{i}")(x)
        if self.pool:
            pooled = nn.avg_pool(x, (2, 2), strides=(2, 2))
            return x, pooled
        return x


class ResDecoderBlock(nn.Module):
    in_channels: int
    out_channels: int
    n_blocks: int = 4

    @nn.compact
    def __call__(self, x, skip):
        # ConvTranspose2d(3x3, stride 2, pad 1, output_pad 1): out = 2*in.
        # == lhs-dilated conv with flipped kernel, per-side pad 1 and an
        # extra 1 on the trailing edges for output_padding.
        w = self.param("up_w", nn.initializers.he_normal(),
                       (3, 3, self.in_channels, self.out_channels))
        x = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=(1, 1),
            padding=[(1, 2), (1, 2)], lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = FoldedBN(self.out_channels, name="up_bn")(x)
        x = jax.nn.relu(x)
        x = jnp.concatenate([x, skip], axis=-1)
        x = ConvBlockRes(self.out_channels * 2, self.out_channels,
                         name="block_0")(x)
        for i in range(1, self.n_blocks):
            x = ConvBlockRes(self.out_channels, self.out_channels,
                             name=f"block_{i}")(x)
        return x


class DeepUnet(nn.Module):
    n_blocks: int = 4
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, x):
        # x: (B, T, 128, 1)
        x = FoldedBN(1, name="in_bn")(x)
        skips: List[jax.Array] = []
        cin, cout = 1, self.en_out_channels
        for i in range(self.en_de_layers):
            skip, x = ResEncoderBlock(cin, cout, self.n_blocks,
                                      name=f"enc_{i}")(x)
            skips.append(skip)
            cin, cout = cout, cout * 2
        # intermediate: cin (=256) -> cout (=512), no pooling
        x = ResEncoderBlock(cin, cout, self.n_blocks, pool=False,
                            name="inter_0")(x)
        for i in range(1, self.inter_layers):
            x = ResEncoderBlock(cout, cout, self.n_blocks, pool=False,
                                name=f"inter_{i}")(x)
        cin = cout
        for i in range(self.en_de_layers):
            cout = cin // 2
            x = ResDecoderBlock(cin, cout, self.n_blocks,
                                name=f"dec_{i}")(x, skips[-1 - i])
            cin = cout
        return x


def _gru_scan(x, wi, bi, wh, bh, reverse=False):
    """Single-direction GRU over (B, T, in) -> (B, T, H); torch gate order r,z,n.

    The input projection (the big in->3H matmul) is hoisted out of the
    scan as ONE (B*T, in) x (in, 3H) matmul; only the small recurrent
    h @ wh stays sequential."""
    H = wh.shape[0]  # wh: (H, 3H)
    gi_all = jnp.swapaxes(x @ wi + bi, 0, 1)  # (T, B, 3H)

    def cell(h, gi):
        gh = h @ wh + bh
        r = jax.nn.sigmoid(gi[:, :H] + gh[:, :H])
        z = jax.nn.sigmoid(gi[:, H:2 * H] + gh[:, H:2 * H])
        n = jnp.tanh(gi[:, 2 * H:] + r * gh[:, 2 * H:])
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((x.shape[0], H), x.dtype)
    _, ys = jax.lax.scan(cell, h0, gi_all, reverse=reverse,
                         unroll=GRU_SCAN_UNROLL)
    return jnp.swapaxes(ys, 0, 1)


def _bigru_fused(x, wi_f, bi_f, wh_f, bh_f, wi_b, bi_b, wh_b, bh_b):
    """Both GRU directions in ONE scan: the backward pass consumes
    time-flipped inputs, so a single T-step scan with a direction axis
    replaces two sequential T-step scans — half the recurrence latency,
    bit-identical math to running _gru_scan twice."""
    H = wh_f.shape[0]
    gi_f = jnp.swapaxes(x @ wi_f + bi_f, 0, 1)            # (T, B, 3H)
    gi_b = jnp.flip(jnp.swapaxes(x @ wi_b + bi_b, 0, 1), 0)
    gi = jnp.stack([gi_f, gi_b], axis=1)                  # (T, 2, B, 3H)
    wh = jnp.stack([wh_f, wh_b])                          # (2, H, 3H)
    bh = jnp.stack([bh_f, bh_b])[:, None]                 # (2, 1, 3H)

    def cell(h, gi_t):                                    # h: (2, B, H)
        gh = jnp.einsum("dbh,dhk->dbk", h, wh) + bh
        r = jax.nn.sigmoid(gi_t[..., :H] + gh[..., :H])
        z = jax.nn.sigmoid(gi_t[..., H:2 * H] + gh[..., H:2 * H])
        n = jnp.tanh(gi_t[..., 2 * H:] + r * gh[..., 2 * H:])
        h_new = (1 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, x.shape[0], H), x.dtype)
    _, ys = jax.lax.scan(cell, h0, gi,
                         unroll=GRU_SCAN_UNROLL)          # (T, 2, B, H)
    fwd = jnp.swapaxes(ys[:, 0], 0, 1)                    # (B, T, H)
    bwd = jnp.swapaxes(jnp.flip(ys[:, 1], 0), 0, 1)
    return jnp.concatenate([fwd, bwd], axis=-1)


class BiGRU(nn.Module):
    """1-layer bidirectional GRU (reference e2e.py:50)."""

    in_features: int
    hidden: int = 256

    @nn.compact
    def __call__(self, x):
        shapes = dict(
            wi=(self.in_features, 3 * self.hidden),
            wh=(self.hidden, 3 * self.hidden),
            bi=(3 * self.hidden,), bh=(3 * self.hidden,),
        )
        # params ride in f32; compute in the activation dtype (bf16 on TPU)
        # or the scan carry dtype diverges from h0 and tracing fails
        p = {f"{n}{sfx}": self.param(f"{n}{sfx}",
                                     nn.initializers.uniform(scale=0.06),
                                     shape).astype(x.dtype)
             for sfx in ("", "_rev") for n, shape in shapes.items()}
        return _bigru_fused(x, p["wi"], p["bi"], p["wh"], p["bh"],
                            p["wi_rev"], p["bi_rev"], p["wh_rev"],
                            p["bh_rev"])


class E2E(nn.Module):
    """RMVPE end-to-end: mel (B, 128, T) -> salience (B, T, 360)."""

    n_blocks: int = 4
    n_gru: int = 1
    en_de_layers: int = 5
    inter_layers: int = 4
    en_out_channels: int = 16

    @nn.compact
    def __call__(self, mel):
        # reference e2e.py:44: mel.transpose(-1,-2).unsqueeze(1) ->
        # (B, 1, T, 128) NCHW == (B, T, 128, 1) NHWC here.
        x = jnp.swapaxes(mel, 1, 2)[..., None]
        x = DeepUnet(self.n_blocks, self.en_de_layers, self.inter_layers,
                     self.en_out_channels, name="unet")(x)
        w = self.param("cnn_w", nn.initializers.he_normal(),
                       (3, 3, self.en_out_channels, 3))
        b = self.param("cnn_b", nn.initializers.zeros, (3,))
        x = _conv2d(x, w) + b.astype(x.dtype)          # (B, T, 128, 3)
        B, T = x.shape[0], x.shape[1]
        # torch: transpose(1,2).flatten(-2) on (B,3,T,128) -> (B,T,3*128)
        # NHWC (B,T,128,3) -> match channel-major order (c, mel):
        x = jnp.swapaxes(x, 2, 3).reshape(B, T, 3 * N_MELS)
        x = BiGRU(3 * N_MELS, 256, name="gru")(x)
        wf = self.param("fc_w", nn.initializers.xavier_uniform(),
                        (512, N_CLASS))
        bf = self.param("fc_b", nn.initializers.zeros, (N_CLASS,))
        x = x @ wf.astype(x.dtype) + bf.astype(x.dtype)
        return jax.nn.sigmoid(x)
