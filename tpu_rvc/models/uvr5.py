"""UVR5 vocal/instrument separation nets in flax
(reference infer/lib/uvr5_pack/lib_v5/nets_123821KB.py `CascadedASPPNet` +
layers_123821KB.py; serves the HP2/HP3/HP5 model weights).

NHWC layout: spectrogram windows are (B, F, T, C=2-stereo).  torch's NCHW
(B, 2, F, T) maps to this with C last.  BatchNorm folded for inference.
Bilinear upsampling uses align_corners=True to match torch F.interpolate in
the decoder (layers_123821KB.py:76).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from tpu_rvc.models.rmvpe import FoldedBN


def bilinear_x2_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample over (H, W) of NHWC with align_corners=True."""
    B, H, W, C = x.shape
    return _bilinear_resize_ac(x, 2 * H, 2 * W)


def _bilinear_resize_ac(x: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """align_corners=True bilinear resize (torch semantics)."""
    B, H, W, C = x.shape

    def grid(n_in, n_out):
        if n_out == 1:
            return jnp.zeros((1,), jnp.float32)
        return jnp.arange(n_out, dtype=jnp.float32) * ((n_in - 1) / (n_out - 1))

    gy, gx = grid(H, out_h), grid(W, out_w)
    y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, H - 1)
    y1 = jnp.clip(y0 + 1, 0, H - 1)
    x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, W - 1)
    x1 = jnp.clip(x0 + 1, 0, W - 1)
    wy = (gy - y0).astype(x.dtype)[None, :, None, None]
    wx = (gx - x0).astype(x.dtype)[None, None, :, None]
    a = x[:, y0][:, :, x0]
    b = x[:, y0][:, :, x1]
    c = x[:, y1][:, :, x0]
    d = x[:, y1][:, :, x1]
    return (a * (1 - wy) * (1 - wx) + b * (1 - wy) * wx +
            c * wy * (1 - wx) + d * wy * wx)


def _conv2d(x, w, stride=(1, 1), pad=(1, 1), dilation=(1, 1), groups=1):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=stride,
        padding=[(pad[0], pad[0]), (pad[1], pad[1])],
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups)


class Conv2DBNActiv(nn.Module):
    """conv -> folded BN -> activation (layers_123821KB.py:8)."""

    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        w = self.param("conv_w", nn.initializers.he_normal(),
                       (self.ksize, self.ksize, x.shape[-1], self.nout))
        x = _conv2d(x, w, (self.stride, self.stride), (self.pad, self.pad),
                    (self.dilation, self.dilation))
        x = FoldedBN(self.nout, name="bn")(x)
        if self.activ == "relu":
            return jax.nn.relu(x)
        return jax.nn.leaky_relu(x, 0.01)


class SeperableConv2DBNActiv(nn.Module):
    """depthwise + pointwise + BN + activ (layers_123821KB.py:29)."""

    nout: int
    ksize: int = 3
    stride: int = 1
    pad: int = 1
    dilation: int = 1
    activ: str = "relu"

    @nn.compact
    def __call__(self, x):
        nin = x.shape[-1]
        wd = self.param("dw_w", nn.initializers.he_normal(),
                        (self.ksize, self.ksize, 1, nin))
        x = _conv2d(x, wd, (self.stride, self.stride), (self.pad, self.pad),
                    (self.dilation, self.dilation), groups=nin)
        wp = self.param("pw_w", nn.initializers.he_normal(),
                        (1, 1, nin, self.nout))
        x = _conv2d(x, wp, pad=(0, 0))
        x = FoldedBN(self.nout, name="bn")(x)
        return jax.nn.relu(x) if self.activ == "relu" else \
            jax.nn.leaky_relu(x, 0.01)


class EncoderBlock(nn.Module):
    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        skip = Conv2DBNActiv(self.nout, 3, 1, 1, activ="leaky",
                             name="conv1")(x)
        h = Conv2DBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                          name="conv2")(skip)
        return h, skip


class DecoderBlock(nn.Module):
    nout: int

    @nn.compact
    def __call__(self, x, skip=None):
        x = bilinear_x2_align_corners(x)
        if skip is not None:
            # crop_center on the time axis (spec_utils.py:8)
            if skip.shape[2] != x.shape[2]:
                s = (skip.shape[2] - x.shape[2]) // 2
                skip = skip[:, :, s: s + x.shape[2]]
            if skip.shape[1] != x.shape[1]:
                s = (skip.shape[1] - x.shape[1]) // 2
                skip = skip[:, s: s + x.shape[1]]
            x = jnp.concatenate([x, skip], axis=-1)
        return Conv2DBNActiv(self.nout, 3, 1, 1, name="conv")(x)


class ASPPModule(nn.Module):
    nout: int
    dilations: Tuple[int, int, int] = (4, 8, 16)

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        # conv1: adaptive avg pool to (1, W) then 1x1 conv, upsampled back
        pooled = jnp.mean(x, axis=1, keepdims=True)
        feat1 = Conv2DBNActiv(C, 1, 1, 0, name="conv1")(pooled)
        feat1 = _bilinear_resize_ac(feat1, H, W)
        feat2 = Conv2DBNActiv(C, 1, 1, 0, name="conv2")(x)
        feat3 = SeperableConv2DBNActiv(C, 3, 1, self.dilations[0],
                                       self.dilations[0], name="conv3")(x)
        feat4 = SeperableConv2DBNActiv(C, 3, 1, self.dilations[1],
                                       self.dilations[1], name="conv4")(x)
        feat5 = SeperableConv2DBNActiv(C, 3, 1, self.dilations[2],
                                       self.dilations[2], name="conv5")(x)
        out = jnp.concatenate([feat1, feat2, feat3, feat4, feat5], axis=-1)
        return Conv2DBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class BaseASPPNet(nn.Module):
    ch: int
    dilations: Tuple[int, int, int] = (4, 8, 16)

    @nn.compact
    def __call__(self, x):
        h, e1 = EncoderBlock(self.ch, name="enc1")(x)
        h, e2 = EncoderBlock(self.ch * 2, name="enc2")(h)
        h, e3 = EncoderBlock(self.ch * 4, name="enc3")(h)
        h, e4 = EncoderBlock(self.ch * 8, name="enc4")(h)
        h = ASPPModule(self.ch * 16, self.dilations, name="aspp")(h)
        h = DecoderBlock(self.ch * 8, name="dec4")(h, e4)
        h = DecoderBlock(self.ch * 4, name="dec3")(h, e3)
        h = DecoderBlock(self.ch * 2, name="dec2")(h, e2)
        h = DecoderBlock(self.ch, name="dec1")(h, e1)
        return h


class CascadedASPPNet(nn.Module):
    """HP2/HP3/HP5 separator (nets_123821KB.py:40).  Input (B, F, T, 2)
    magnitude; output masked magnitude, same shape."""

    n_fft: int
    offset: int = 128  # frames cropped from each window edge (predict())

    @nn.compact
    def __call__(self, x, aggressiveness: Optional[Tuple[float, int]] = None):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        mix = x
        x = x[:, :max_bin]
        bandw = x.shape[1] // 2
        low = BaseASPPNet(32, name="stg1_low")(x[:, :bandw])
        high = BaseASPPNet(32, name="stg1_high")(x[:, bandw:])
        aux1 = jnp.concatenate([low, high], axis=1)

        h = jnp.concatenate([x, aux1], axis=-1)
        h = Conv2DBNActiv(16, 1, 1, 0, name="stg2_bridge")(h)
        aux2 = BaseASPPNet(32, name="stg2_full")(h)

        h = jnp.concatenate([x, aux1, aux2], axis=-1)
        h = Conv2DBNActiv(32, 1, 1, 0, name="stg3_bridge")(h)
        h = BaseASPPNet(64, name="stg3_full")(h)

        w_out = self.param("out_w", nn.initializers.he_normal(),
                           (1, 1, 64, 2))
        mask = jax.nn.sigmoid(_conv2d(h, w_out, pad=(0, 0)))
        # replicate-pad the frequency axis up to output_bin
        pad_f = output_bin - mask.shape[1]
        if pad_f > 0:
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, -1:], pad_f, axis=1)], axis=1)
        if aggressiveness is not None:
            value, split_bin = aggressiveness
            lowm = mask[:, :split_bin] ** (1 + value / 3)
            highm = mask[:, split_bin:] ** (1 + value)
            mask = jnp.concatenate([lowm, highm], axis=1)
        return mask * mix


# ---------------------------------------------------------------------------
# DeEcho / DeReverb variant: CascadedNet with LSTM bottlenecks
# (reference nets.py:47 + layers.py; serves VR-DeEchoNormal/Aggressive/
# DeReverb weights)
# ---------------------------------------------------------------------------


def _lstm_scan(x, wi, bi, wh, bh, reverse=False):
    """Single-direction LSTM (T, B, in) -> (T, B, H); torch gate order
    i, f, g, o."""
    H = wh.shape[0]  # wh: (H, 4H)

    def cell(carry, xt):
        h, c = carry
        gates = xt @ wi + bi + h @ wh + bh  # (B, 4H)
        i = jax.nn.sigmoid(gates[:, :H])
        f = jax.nn.sigmoid(gates[:, H:2 * H])
        g = jnp.tanh(gates[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(gates[:, 3 * H:])
        c_new = f * c + i * g
        h_new = o * jnp.tanh(c_new)
        return (h_new, c_new), h_new

    B = x.shape[1]
    h0 = jnp.zeros((B, H), x.dtype)
    (_, _), ys = jax.lax.scan(cell, (h0, h0), x, reverse=reverse)
    return ys


class LSTMModule(nn.Module):
    """1x1-conv squeeze -> BiLSTM over time (bins as features) -> dense
    (reference layers.py:109)."""

    nin_lstm: int
    nout_lstm: int

    @nn.compact
    def __call__(self, x):
        # x: (B, F, T, C) NHWC
        B, F_, T, C = x.shape
        h = Conv2DBNActiv(1, 1, 1, 0, name="conv")(x)[..., 0]  # (B, F, T)
        h = jnp.transpose(h, (2, 0, 1))  # (T, B, F)
        H = self.nout_lstm // 2
        shapes = dict(wi=(self.nin_lstm, 4 * H), wh=(H, 4 * H),
                      bi=(4 * H,), bh=(4 * H,))
        p = {f"{n}{s}": self.param(
                f"{n}{s}", nn.initializers.uniform(scale=0.06), shape)
             for s in ("", "_rev") for n, shape in shapes.items()}
        fwd = _lstm_scan(h, p["wi"], p["bi"], p["wh"], p["bh"])
        bwd = _lstm_scan(h, p["wi_rev"], p["bi_rev"], p["wh_rev"],
                         p["bh_rev"], reverse=True)
        h = jnp.concatenate([fwd, bwd], axis=-1)  # (T, B, nout_lstm)
        wd = self.param("dense_w", nn.initializers.xavier_uniform(),
                        (self.nout_lstm, self.nin_lstm))
        bd = self.param("dense_b", nn.initializers.zeros, (self.nin_lstm,))
        h = h @ wd.astype(h.dtype) + bd.astype(h.dtype)
        h = FoldedBN(self.nin_lstm, name="dense_bn")(h)
        h = jax.nn.relu(h)
        # (T, B, F) -> (B, F, T, 1)
        return jnp.transpose(h, (1, 2, 0))[..., None]


class ASPPModuleNew(nn.Module):
    """Dense (non-separable) ASPP with paired dilations (layers.py:70)."""

    nout: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        B, H, W, C = x.shape
        pooled = jnp.mean(x, axis=1, keepdims=True)
        feat1 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv1")(pooled)
        feat1 = _bilinear_resize_ac(feat1, H, W)
        feat2 = Conv2DBNActiv(self.nout, 1, 1, 0, name="conv2")(x)
        feats = [feat1, feat2]
        for i, d in enumerate(self.dilations):
            dd = d if isinstance(d, (tuple, list)) else (d, d)
            w = self.param(f"conv{i + 3}_w", nn.initializers.he_normal(),
                           (3, 3, C, self.nout))
            y = jax.lax.conv_general_dilated(
                x, w.astype(x.dtype), window_strides=(1, 1),
                padding=[(dd[0], dd[0]), (dd[1], dd[1])],
                rhs_dilation=tuple(dd),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = FoldedBN(self.nout, name=f"conv{i + 3}_bn")(y)
            feats.append(jax.nn.relu(y))
        out = jnp.concatenate(feats, axis=-1)
        return Conv2DBNActiv(self.nout, 1, 1, 0, name="bottleneck")(out)


class EncoderNew(nn.Module):
    """conv(stride) -> conv(1), single output (reference layers.py:30)."""

    nout: int
    stride: int = 2

    @nn.compact
    def __call__(self, x):
        h = Conv2DBNActiv(self.nout, 3, self.stride, 1, activ="leaky",
                          name="conv1")(x)
        return Conv2DBNActiv(self.nout, 3, 1, 1, activ="leaky",
                             name="conv2")(h)


class BaseNetNew(nn.Module):
    """BaseNet for the DeEcho CascadedNet (reference nets.py:8): 4 stride-2
    encoders, dense ASPP with paired dilations, decoders, and a BiLSTM
    bottleneck concatenated before the last decoder."""

    nout: int
    nin_lstm: int
    nout_lstm: int
    dilations: Tuple[Tuple[int, int], ...] = ((4, 2), (8, 4), (12, 6))

    @nn.compact
    def __call__(self, x):
        e1 = Conv2DBNActiv(self.nout, 3, 1, 1, name="enc1")(x)
        e2 = EncoderNew(self.nout * 2, name="enc2")(e1)
        e3 = EncoderNew(self.nout * 4, name="enc3")(e2)
        e4 = EncoderNew(self.nout * 6, name="enc4")(e3)
        e5 = EncoderNew(self.nout * 8, name="enc5")(e4)
        h = ASPPModuleNew(self.nout * 8, self.dilations, name="aspp")(e5)
        h = DecoderBlock(self.nout * 6, name="dec4")(h, e4)
        h = DecoderBlock(self.nout * 4, name="dec3")(h, e3)
        h = DecoderBlock(self.nout * 2, name="dec2")(h, e2)
        lstm_out = LSTMModule(self.nin_lstm, self.nout_lstm,
                              name="lstm_dec2")(h)
        h = jnp.concatenate([h, lstm_out], axis=-1)
        h = DecoderBlock(self.nout, name="dec1")(h, e1)
        return h


class CascadedNetDeEcho(nn.Module):
    """DeEcho/DeReverb separator (reference nets.py:47 CascadedNet).
    Input (B, F, T, 2) magnitude; output mask, same shape."""

    n_fft: int
    nout: int = 32
    nout_lstm: int = 128
    offset: int = 64

    @nn.compact
    def __call__(self, x, aggressiveness: Optional[Tuple[float, int]] = None):
        max_bin = self.n_fft // 2
        output_bin = self.n_fft // 2 + 1
        nin_lstm = max_bin // 2
        mix = x
        x = x[:, :max_bin]
        bandw = x.shape[1] // 2
        l1_in, h1_in = x[:, :bandw], x[:, bandw:]
        l1 = BaseNetNew(self.nout // 2, nin_lstm // 2, self.nout_lstm,
                        name="stg1_low_base")(l1_in)
        l1 = Conv2DBNActiv(self.nout // 4, 1, 1, 0, name="stg1_low_conv")(l1)
        h1 = BaseNetNew(self.nout // 4, nin_lstm // 2, self.nout_lstm // 2,
                        name="stg1_high")(h1_in)
        aux1 = jnp.concatenate([l1, h1], axis=1)

        l2_in = jnp.concatenate([l1_in, l1], axis=-1)
        h2_in = jnp.concatenate([h1_in, h1], axis=-1)
        l2 = BaseNetNew(self.nout, nin_lstm // 2, self.nout_lstm,
                        name="stg2_low_base")(l2_in)
        l2 = Conv2DBNActiv(self.nout // 2, 1, 1, 0, name="stg2_low_conv")(l2)
        h2 = BaseNetNew(self.nout // 2, nin_lstm // 2, self.nout_lstm // 2,
                        name="stg2_high")(h2_in)
        aux2 = jnp.concatenate([l2, h2], axis=1)

        f3_in = jnp.concatenate([x, aux1, aux2], axis=-1)
        f3 = BaseNetNew(self.nout, nin_lstm, self.nout_lstm,
                        name="stg3_full")(f3_in)
        w_out = self.param("out_w", nn.initializers.he_normal(),
                           (1, 1, self.nout, 2))
        mask = jax.nn.sigmoid(_conv2d(f3, w_out, pad=(0, 0)))
        pad_f = output_bin - mask.shape[1]
        if pad_f > 0:
            mask = jnp.concatenate(
                [mask, jnp.repeat(mask[:, -1:], pad_f, axis=1)], axis=1)
        if aggressiveness is not None:
            value, split_bin = aggressiveness
            lowm = mask[:, :split_bin] ** (1 + value / 3)
            highm = mask[:, split_bin:] ** (1 + value)
            mask = jnp.concatenate([lowm, highm], axis=1)
        return mask * mix
