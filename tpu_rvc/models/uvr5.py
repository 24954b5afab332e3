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
