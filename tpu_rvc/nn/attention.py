"""VITS-style relative-position multi-head attention, channel-last.

Semantics match the reference (rvc/layers/attentions.py:9-226): window-size-W
relative key/value embeddings shared across heads, rel<->abs index shuffles
implemented as static pad+reshape (shapes are static under jit so the trick
compiles to cheap relayouts), additive -1e4 masking, softmax in fp32.

The sequence lengths here are short (<=~900 frames, hidden 192, 2 heads), so
the whole attention fits VMEM easily; XLA fuses the QK^T -> softmax -> PV
chain well at these sizes.  A Pallas fused kernel is kept for the hot
streaming path (ops/pallas/attention.py) and validated against this module.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .modules import Conv1d, LayerNorm1d

# Trace-time toggle for the Pallas fused kernel (inference graphs only —
# the kernel has no VJP).  Pipelines set this around synth.apply.
PALLAS_ATTENTION = False

# Trace-time override FORCING the pure-XLA formulation even inside a
# `pallas_attention()` block.  utils/roofline.graph_flops sets this around
# its CPU-backend re-lowering: a TPU pallas_call cannot lower for the CPU
# backend ("Only interpret mode is supported"), so FLOP counting re-traces
# the graph with every kernel swapped for its exact XLA equivalent.  The
# dense rel-attention counts slightly MORE flops than the banded kernel
# executes (full T x T scores vs the 2W+1 band) — an upper bound on the
# attention term, <1% of any graph total here (all are conv-dominated).
# Module global, not a contextvar: consulted only at trace time, and
# graph_flops never runs concurrently with another trace in this codebase.
FORCE_XLA_ATTENTION = False


class pallas_attention:
    """Context manager enabling the fused kernels while tracing an
    inference graph (no-op off-TPU).

    resblocks defaults OFF: the fused ResBlock kernel is numerically exact
    and compiles, but Mosaic's per-tap matmuls at C<=64 (25% contraction
    utilization + lane padding) measured slower than XLA's im2col lowering
    (39.6x vs 47x RTF); revisit with a lane-packed layout."""

    def __init__(self, enabled: bool = True, resblocks: bool = False,
                 stage_channels=None):
        self.enabled = enabled and jax.default_backend() == "tpu"
        self.resblocks = resblocks and self.enabled
        if stage_channels is None:
            # experiment hook: PALLAS_STAGE_CHANNELS=128 enables the
            # whole-stage kernel for those widths in every inference
            # graph.  Default OFF: the C=128 stage kernel wins the
            # decoder-only amplified A/B (40.7 vs 42.8 ms,
            # benchmarks/stage_ab.py) but REGRESSES the full fused
            # conversion graph ~80 ms (median 198.9 vs 117.5, min 185
            # vs 91, back-to-back bench.py runs) — the custom-call
            # boundary breaks XLA's scheduling in the large graph, the
            # second composition failure of this kind (see
            # docs/en/performance.md).
            env = os.environ.get("PALLAS_STAGE_CHANNELS", "")
            stage_channels = [int(c) for c in env.split(",") if c.strip()]
        self.stage_channels = (frozenset(stage_channels) if self.enabled
                               else frozenset())

    def __enter__(self):
        global PALLAS_ATTENTION
        from tpu_rvc.nn import modules as _modules
        self.prev = PALLAS_ATTENTION
        self.prev_rb = _modules.PALLAS_RESBLOCKS
        self.prev_st = _modules.PALLAS_STAGE_CHANNELS
        PALLAS_ATTENTION = self.enabled and not FORCE_XLA_ATTENTION
        _modules.PALLAS_RESBLOCKS = (self.resblocks
                                     and not FORCE_XLA_ATTENTION)
        _modules.PALLAS_STAGE_CHANNELS = (frozenset() if FORCE_XLA_ATTENTION
                                          else self.stage_channels)
        return self

    def __exit__(self, *exc):
        global PALLAS_ATTENTION
        from tpu_rvc.nn import modules as _modules
        PALLAS_ATTENTION = self.prev
        _modules.PALLAS_RESBLOCKS = self.prev_rb
        _modules.PALLAS_STAGE_CHANNELS = self.prev_st
        return False


def relative_to_absolute(x: jax.Array) -> jax.Array:
    """(B, H, L, 2L-1) relative logits -> (B, H, L, L) absolute.

    Standard Shaw/Music-Transformer index shuffle via pad+reshape.
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(b, h, l * 2 * l)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l + 1, 2 * l - 1)
    return x[:, :, :l, l - 1:]


def absolute_to_relative(x: jax.Array) -> jax.Array:
    """(B, H, L, L) attention weights -> (B, H, L, 2L-1) relative layout."""
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x = x.reshape(b, h, l * l + l * (l - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (l, 0)))
    x = x.reshape(b, h, l, 2 * l)
    return x[:, :, :, 1:]


def window_relative_embeddings(emb: jax.Array, length: int, window: int) -> jax.Array:
    """Slice/pad the (1, 2W+1, Dk) window embedding table to (1, 2L-1, Dk)."""
    pad_len = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    if pad_len > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
    return emb[:, start:start + 2 * length - 1]


class MultiHeadRelAttention(nn.Module):
    """Self-attention with windowed relative position (reference attentions.py:9)."""

    channels: int
    out_channels: int
    n_heads: int
    window_size: int = 10
    p_dropout: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask=None, deterministic: bool = True,
                 lengths=None):
        # x: (B, T, C); attn_mask: (B, 1, T, T) or (B, T, T) with 1=keep;
        # lengths: (B,) overrides attn_mask for the Pallas fast path
        h, c = self.n_heads, self.channels
        dk = c // h
        xavier = nn.initializers.xavier_uniform()
        q = Conv1d(c, 1, kernel_init=xavier, name="conv_q")(x)
        k = Conv1d(c, 1, kernel_init=xavier, name="conv_k")(x)
        v = Conv1d(c, 1, kernel_init=xavier, name="conv_v")(x)

        B, T, _ = x.shape
        # (B, T, C) -> (B, H, T, Dk).  Note the reference views (B, C, T) as
        # (B, H, Dk, T): head i owns channels [i*dk:(i+1)*dk] — same split.
        def split(t):
            return t.reshape(B, T, h, dk).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)

        if (PALLAS_ATTENTION and lengths is not None
                and T > self.window_size + 1 and self.p_dropout == 0):
            from tpu_rvc.ops.pallas.rel_attention import banded_rel_attention
            rel_stddev = dk ** -0.5
            ek = self.param(
                "emb_rel_k",
                lambda key, s: jax.random.normal(key, s) * rel_stddev,
                (1, 2 * self.window_size + 1, dk))
            ev = self.param(
                "emb_rel_v",
                lambda key, s: jax.random.normal(key, s) * rel_stddev,
                (1, 2 * self.window_size + 1, dk))
            bh_len = jnp.repeat(jnp.asarray(lengths, jnp.int32), h)
            out = banded_rel_attention(
                qh.reshape(B * h, T, dk), kh.reshape(B * h, T, dk),
                vh.reshape(B * h, T, dk), ek[0], ev[0], bh_len,
                window=self.window_size)
            out = out.reshape(B, h, T, dk).transpose(0, 2, 1, 3).reshape(B, T, c)
            out = out.astype(x.dtype)
            xav = nn.initializers.xavier_uniform()
            return Conv1d(self.out_channels, 1, kernel_init=xav,
                          name="conv_o")(out)

        scale = 1.0 / math.sqrt(dk)
        scores = jnp.einsum(
            "bhtd,bhsd->bhts", qh * scale, kh,
            preferred_element_type=jnp.float32,
        )

        rel_stddev = dk ** -0.5
        W = self.window_size
        emb_rel_k = self.param(
            "emb_rel_k",
            lambda key, s: jax.random.normal(key, s) * rel_stddev,
            (1, 2 * W + 1, dk),
        )
        emb_rel_v = self.param(
            "emb_rel_v",
            lambda key, s: jax.random.normal(key, s) * rel_stddev,
            (1, 2 * W + 1, dk),
        )
        banded = T > W + 1
        if banded:
            # The padded relative table is ZERO outside |i-j|<=W
            # (window_relative_embeddings), so the Shaw shuffles reduce to
            # exact banded scatter/gather — O(T*(2W+1)) instead of O(T*2T)
            # intermediates.
            band = jnp.einsum("bhtd,gmd->bhtm", qh * scale,
                              emb_rel_k.astype(x.dtype),
                              preferred_element_type=jnp.float32)  # (B,H,T,2W+1)
            rows = jnp.arange(T)[:, None]                 # (T, 1)
            cols = rows + jnp.arange(-W, W + 1)[None, :]  # (T, 2W+1)
            valid = (cols >= 0) & (cols < T)
            cols_c = jnp.clip(cols, 0, T - 1)
            scores = scores.at[:, :, rows, cols_c].add(
                jnp.where(valid[None, None], band, 0.0))
        else:
            kr = window_relative_embeddings(emb_rel_k.astype(x.dtype), T, W)
            rel_logits = jnp.einsum("bhtd,gmd->bhtm", qh * scale, kr,
                                    preferred_element_type=jnp.float32)
            scores = scores + relative_to_absolute(rel_logits)

        if attn_mask is not None:
            if attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            scores = jnp.where(attn_mask == 0, -1e4, scores)
        p = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        if self.p_dropout > 0 and not deterministic:
            p = nn.Dropout(rate=self.p_dropout)(p, deterministic=False)
        out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        if banded:
            rel_w = jnp.where(valid[None, None], p[:, :, rows, cols_c], 0.0)
            out = out + jnp.einsum("bhtm,gmd->bhtd", rel_w,
                                   emb_rel_v.astype(x.dtype))
        else:
            vr = window_relative_embeddings(emb_rel_v.astype(x.dtype), T, W)
            rel_w = absolute_to_relative(p)
            out = out + jnp.einsum("bhtm,gmd->bhtd", rel_w, vr)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, c)
        return Conv1d(self.out_channels, 1, kernel_init=xavier, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward (reference attentions.py:228), relu, same padding."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        def pad(t):
            if self.kernel_size == 1:
                return t
            if self.causal:
                pl, pr = self.kernel_size - 1, 0
            else:
                pl, pr = (self.kernel_size - 1) // 2, self.kernel_size // 2
            return jnp.pad(t, ((0, 0), (pl, pr), (0, 0)))

        y = Conv1d(self.filter_channels, self.kernel_size, name="conv_1")(
            pad(x * x_mask))
        y = jax.nn.relu(y)
        if self.p_dropout > 0 and not deterministic:
            y = nn.Dropout(rate=self.p_dropout)(y, deterministic=False)
        y = Conv1d(self.out_channels, self.kernel_size, name="conv_2")(
            pad(y * x_mask))
        return y * x_mask


class Encoder(nn.Module):
    """n_layers x (rel-attention + FFN), post-norm (reference encoders.py:12)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 10

    @nn.compact
    def __call__(self, x, x_mask, deterministic: bool = True):
        # x: (B, T, H); x_mask: (B, T, 1)
        attn_mask = (x_mask[:, None, :, 0][..., None] *
                     x_mask[:, None, :, 0][..., None, :])  # (B,1,T,T)
        lengths = jnp.sum(x_mask[:, :, 0], axis=1).astype(jnp.int32)
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadRelAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                self.window_size, self.p_dropout, name=f"attn_{i}",
            )(x, attn_mask, deterministic, lengths=lengths)
            x = LayerNorm1d(name=f"norm1_{i}")(x + y)
            y = FFN(
                self.hidden_channels, self.filter_channels, self.kernel_size,
                self.p_dropout, name=f"ffn_{i}",
            )(x, x_mask, deterministic)
            x = LayerNorm1d(name=f"norm2_{i}")(x + y)
        return x * x_mask
