"""HuBERT-base content encoder in flax (reference rvc/hubert.py:27-339).

The reference wraps fairseq's HubertModel and monkeypatches
`extract_features` to tap layer 9 (v1; + final_proj to 256) or layer 12
(v2, 768-d).  Here the architecture is implemented natively:

  wave (B, T) 16 kHz
   -> 7-layer conv feature extractor (512 ch, 320x downsample, GELU,
      GroupNorm after conv0)                       [fairseq "default" mode]
   -> LayerNorm(512) -> Linear 512->768
   -> + positional grouped conv (k=128, groups=16, weight-norm dim=2,
      SamePad trim, GELU)
   -> LayerNorm -> 12 post-norm transformer layers (12 heads, FFN 3072)
   -> tap at `output_layer` (1-based, reference infer: rvc/hubert.py:327)
   -> optional final_proj 768->256 when output_layer == 9 (v1)

Weights load from `hubert_base.pt` via ckpt.hubert_loader (torch-free).
Everything is channel-last and static-shaped; attention uses plain dot
attention (seq <= ~2.5k frames fits VMEM comfortably at 768 dims).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_rvc.ops.conv import conv1d, conv1d_im2col

BASE_CONV_LAYERS: Tuple[Tuple[int, int, int], ...] = (
    (512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2),
    (512, 3, 2), (512, 2, 2), (512, 2, 2),
)


class _LN(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + self.eps)
        return (y * scale + bias).astype(x.dtype)


class ConvFeatureExtractor(nn.Module):
    """Raw wave -> (B, T/320, 512).  fairseq "default": GroupNorm(512) after
    conv0 only, no biases, GELU everywhere."""

    conv_layers: Tuple[Tuple[int, int, int], ...] = BASE_CONV_LAYERS

    @nn.compact
    def __call__(self, wav):
        x = wav[:, :, None]  # (B, T, 1)
        for i, (ch, k, s) in enumerate(self.conv_layers):
            w = self.param(f"conv_{i}", nn.initializers.he_normal(),
                           (k, x.shape[-1], ch))
            x = conv1d(x, w.astype(x.dtype), stride=s)
            if i == 0:
                # GroupNorm with n_groups == n_channels: per-channel instance
                # norm over time.
                gamma = self.param("gn_scale", nn.initializers.ones, (ch,))
                beta = self.param("gn_bias", nn.initializers.zeros, (ch,))
                xf = x.astype(jnp.float32)
                mu = jnp.mean(xf, axis=1, keepdims=True)
                var = jnp.var(xf, axis=1, keepdims=True)
                x = ((xf - mu) * jax.lax.rsqrt(var + 1e-5) * gamma + beta
                     ).astype(x.dtype)
            x = jax.nn.gelu(x, approximate=False)
        return x


class SelfAttention(nn.Module):
    """fairseq MultiheadAttention semantics (separate qkv proj, q pre-scaled)."""

    n_heads: int = 12

    @nn.compact
    def __call__(self, x, padding_mask=None):
        B, T, C = x.shape
        n_heads = self.n_heads
        dk = C // n_heads

        def proj(name):
            w = self.param(f"{name}_w", nn.initializers.xavier_uniform(), (C, C))
            b = self.param(f"{name}_b", nn.initializers.zeros, (C,))
            return lambda t: t @ w.astype(t.dtype) + b.astype(t.dtype)

        q = proj("q")(x) * (dk ** -0.5)
        k = proj("k")(x)
        v = proj("v")(x)

        def split(t):
            return t.reshape(B, T, n_heads, dk).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                            preferred_element_type=jnp.float32)
        if padding_mask is not None:
            scores = jnp.where(padding_mask[:, None, None, :], -jnp.inf, scores)
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        o = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        o = o.transpose(0, 2, 1, 3).reshape(B, T, C)
        wo = self.param("out_w", nn.initializers.xavier_uniform(), (C, C))
        bo = self.param("out_b", nn.initializers.zeros, (C,))
        return o @ wo.astype(o.dtype) + bo.astype(o.dtype)


class TransformerLayer(nn.Module):
    """Post-norm (layer_norm_first=False for hubert-base)."""

    embed: int = 768
    ffn_dim: int = 3072
    n_heads: int = 12

    @nn.compact
    def __call__(self, x, padding_mask=None):
        res = x
        x = SelfAttention(self.n_heads, name="self_attn")(x, padding_mask)
        x = _LN(name="self_attn_layer_norm")(res + x)
        res = x
        w1 = self.param("fc1_w", nn.initializers.xavier_uniform(),
                        (self.embed, self.ffn_dim))
        b1 = self.param("fc1_b", nn.initializers.zeros, (self.ffn_dim,))
        w2 = self.param("fc2_w", nn.initializers.xavier_uniform(),
                        (self.ffn_dim, self.embed))
        b2 = self.param("fc2_b", nn.initializers.zeros, (self.embed,))
        h = jax.nn.gelu(x @ w1.astype(x.dtype) + b1.astype(x.dtype),
                        approximate=False)
        x = h @ w2.astype(x.dtype) + b2.astype(x.dtype)
        return _LN(name="final_layer_norm")(res + x)


class Hubert(nn.Module):
    """HuBERT-base with layer tap.  output_layer is 1-based like the
    reference's `infer` (rvc/hubert.py:327): 9 -> v1 (+final_proj), 12 -> v2."""

    output_layer: int = 12
    final_proj: bool = False
    embed: int = 768
    ffn_dim: int = 3072
    n_heads: int = 12
    final_dim: int = 256
    pos_conv_k: int = 128
    pos_conv_groups: int = 16
    conv_layers: Tuple[Tuple[int, int, int], ...] = BASE_CONV_LAYERS

    @nn.compact
    def __call__(self, wav, padding_mask=None):
        # wav: (B, T) float32 16 kHz
        feats = ConvFeatureExtractor(self.conv_layers,
                                     name="feature_extractor")(wav)
        feats = _LN(name="layer_norm_pre")(feats)
        wpe = self.param("post_extract_w", nn.initializers.xavier_uniform(),
                         (feats.shape[-1], self.embed))
        bpe = self.param("post_extract_b", nn.initializers.zeros, (self.embed,))
        x = feats @ wpe.astype(feats.dtype) + bpe.astype(feats.dtype)

        if padding_mask is not None:
            # downsample wave-level padding mask to frame rate (fairseq
            # forward_padding_mask): frame is padded iff all samples padded
            extra = padding_mask.shape[1] % x.shape[1]
            pm = padding_mask[:, :padding_mask.shape[1] - extra]
            pm = pm.reshape(pm.shape[0], x.shape[1], -1)
            frame_pad = jnp.all(pm, axis=-1)
            x = jnp.where(frame_pad[:, :, None], 0.0, x)
        else:
            frame_pad = None

        # positional grouped conv, weight-norm dim=2, SamePad trims 1 (k even)
        vk = self.param("pos_conv_v", nn.initializers.he_normal(),
                        (self.pos_conv_k, self.embed // self.pos_conv_groups,
                         self.embed))
        gk = self.param("pos_conv_g", nn.initializers.ones,
                        (self.pos_conv_k, 1, 1))
        bk = self.param("pos_conv_b", nn.initializers.zeros, (self.embed,))
        norm = jnp.sqrt(jnp.sum(vk * vk, axis=(1, 2), keepdims=True))
        wk = (gk * vk / norm).astype(x.dtype)
        pos = conv1d(x, wk, bk.astype(x.dtype), padding=self.pos_conv_k // 2,
                     groups=self.pos_conv_groups)
        if self.pos_conv_k % 2 == 0:  # SamePad trims one for even kernels
            pos = pos[:, :-1]
        pos = jax.nn.gelu(pos, approximate=False)
        x = x + pos
        x = _LN(name="encoder_layer_norm")(x)

        # pad T to required_seq_len_multiple=2
        pad_len = x.shape[1] % 2
        if pad_len:
            x = jnp.pad(x, ((0, 0), (0, pad_len), (0, 0)))
            fp = (jnp.zeros(x.shape[:2], bool) if frame_pad is None
                  else jnp.pad(frame_pad, ((0, 0), (0, pad_len))))
            frame_pad = fp.at[:, -pad_len:].set(True)

        for i in range(self.output_layer):
            x = TransformerLayer(self.embed, self.ffn_dim, self.n_heads,
                                 name=f"layer_{i}")(x, frame_pad)
        if pad_len:
            x = x[:, :-pad_len]

        if self.final_proj:
            wf = self.param("final_proj_w", nn.initializers.xavier_uniform(),
                            (self.embed, self.final_dim))
            bf = self.param("final_proj_b", nn.initializers.zeros,
                            (self.final_dim,))
            x = x @ wf.astype(x.dtype) + bf.astype(x.dtype)
        return x


def hubert_for_version(version: str) -> Hubert:
    """v1: layer-9 tap + final_proj (256-d); v2: layer-12, 768-d
    (reference rvc/hubert.py:332, infer/modules/vc/pipeline.py:109)."""
    if version == "v1":
        return Hubert(output_layer=9, final_proj=True)
    return Hubert(output_layer=12, final_proj=False)
