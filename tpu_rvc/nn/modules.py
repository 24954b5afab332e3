"""Base flax modules, channel-last (B, T, C).

Design notes (TPU-first, not a torch translation):
  - channel-last keeps channels on the lane dim; every conv lowers to an MXU
    contraction without transposes.
  - weight norm is a *training-time* parametrization: modules take
    `weight_norm=True` to train with the (g, v) split exactly like the
    reference (rvc/layers/norms.py:54), and checkpoints are folded to plain
    kernels for inference (reference removes weight norm before inference too,
    rvc/layers/synthesizers.py:115-119).
  - gates/activations are left to XLA fusion; the attention core has a Pallas
    fast path (tpu_rvc/ops/pallas).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from tpu_rvc.ops import conv as conv_ops

LRELU_SLOPE = 0.1

# Trace-time toggle: inference pipelines enable the fused Pallas resblock
# kernel (set together with attention's flag by
# tpu_rvc.nn.attention.pallas_attention).
PALLAS_RESBLOCKS = False
# Trace-time toggle for the WHOLE-STAGE kernel (3 resblocks + average as
# one pallas_call, ops/pallas/resblock.py fused_stage).  Set of channel
# widths it applies to; empty set disables.  Controlled by
# tpu_rvc.nn.attention.pallas_attention(stage_channels=...).
PALLAS_STAGE_CHANNELS: frozenset = frozenset()


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv1d default init: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    k, cin, cout = shape
    bound = 1.0 / math.sqrt(cin * k)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init_factory(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_001_init(key, shape, dtype=jnp.float32):
    """Reference `call_weight_data_normal_if_Conv`: N(0, 0.01) for vocoder convs."""
    return jax.random.normal(key, shape, dtype) * 0.01


class Conv1d(nn.Module):
    """Channel-last conv1d with torch semantics and optional weight norm.

    kernel param layout: (K, Cin, Cout).
    """

    features: int
    kernel_size: int = 1
    stride: int = 1
    padding: Union[int, Tuple[int, int], str] = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Optional[nn.initializers.Initializer] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def make_weights(self, cin):
        """Create/fetch this conv's parameters (shared by __call__ and the
        fused-kernel paths that need raw weights)."""
        shape = (self.kernel_size, cin // self.groups, self.features)
        kinit = self.kernel_init or torch_conv_kernel_init
        if self.weight_norm:
            v = self.param("v", kinit, shape)
            g = self.param(
                "g",
                lambda key, s: jnp.sqrt(
                    jnp.sum(kinit(key, shape) ** 2, axis=(0, 1), keepdims=True)
                ),
                (1, 1, self.features),
            )
            w = conv_ops.fold_weight_norm(g, v)
        else:
            w = self.param("kernel", kinit, shape)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                torch_conv_bias_init_factory(shape[0] * shape[1]),
                (self.features,),
            )
        return w, b

    def __call__(self, x):
        cin = x.shape[-1]
        w, b = self.make_weights(cin)
        dt = self.dtype or x.dtype
        # Conv impl choice, from measured TPU A/B at the vocoder's shapes
        # (benchmarks/synth_stages.py harness; v5e, bf16, T up to 480k):
        #   - im2col (unfold + one matmul, contraction k*Cin) wins when the
        #     unfolded contraction stays within ~3 MXU tiles: all k at
        #     Cin<=32, and k<=3 up to Cin=128 (0.05-0.24 ms vs direct's
        #     ~0.5-1.4 ms floor).
        #   - XLA's direct conv wins for k>=7 at Cin>=64 (k-invariant
        #     ~0.5 ms, up to 85 TF/s at Cin=128 k=11).
        use_im2col = (self.groups == 1 and self.kernel_size > 1
                      and isinstance(self.padding, int)
                      and (cin <= 32
                           or (self.kernel_size <= 3 and cin <= 128)
                           or (cin <= 96
                               and self.kernel_size * cin <= 352)))
        if use_im2col:
            y = conv_ops.conv1d_im2col(
                x.astype(dt), w.astype(dt),
                None if b is None else b.astype(dt),
                stride=self.stride, padding=self.padding,
                dilation=self.dilation,
            )
        else:
            y = conv_ops.conv1d(
                x.astype(dt), w.astype(dt),
                None if b is None else b.astype(dt),
                stride=self.stride, padding=self.padding,
                dilation=self.dilation, groups=self.groups,
            )
        return y


class ConvTranspose1d(nn.Module):
    """torch-equivalent ConvTranspose1d (see ops.conv.conv_transpose1d)."""

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    use_bias: bool = True
    weight_norm: bool = False
    kernel_init: Optional[nn.initializers.Initializer] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        shape = (self.kernel_size, cin, self.features)
        kinit = self.kernel_init or torch_conv_kernel_init
        if self.weight_norm:
            # torch weight_norm(dim=0) on ConvTranspose1d keeps per-INPUT-channel
            # norms (torch layout (in, out, k)); in our (K, Cin, Cout) layout the
            # kept axis is 1.
            v = self.param("v", kinit, shape)
            g = self.param(
                "g",
                lambda key, s: jnp.sqrt(
                    jnp.sum(kinit(key, shape) ** 2, axis=(0, 2), keepdims=True)
                ),
                (1, cin, 1),
            )
            w = conv_ops.fold_weight_norm(g, v, axis_keep=1)
        else:
            w = self.param("kernel", kinit, shape)
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                torch_conv_bias_init_factory(self.features * self.kernel_size),
                (self.features,),
            )
        dt = self.dtype or x.dtype
        return conv_ops.conv_transpose1d_poly(
            x.astype(dt), w.astype(dt), None if b is None else b.astype(dt),
            stride=self.stride, padding=self.padding,
        )


class Linear(nn.Module):
    """torch-default-init Linear; kernel (in, out)."""

    features: int
    use_bias: bool = True
    kernel_init: Optional[nn.initializers.Initializer] = None

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]

        def kinit(key, shape, dtype=jnp.float32):
            bound = 1.0 / math.sqrt(cin)
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        w = self.param("kernel", self.kernel_init or kinit, (cin, self.features))
        y = x @ w.astype(x.dtype)
        if self.use_bias:
            b = self.param("bias", torch_conv_bias_init_factory(cin),
                           (self.features,))
            y = y + b.astype(x.dtype)
        return y


class LayerNorm1d(nn.Module):
    """Per-channel LayerNorm over C of (B, T, C) (reference norms.py:12)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.var(xf, axis=-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * gamma + beta).astype(x.dtype)


def gated_tanh_sigmoid(x_in: jax.Array, g_l: jax.Array, channels: int) -> jax.Array:
    """Fused add + tanh·sigmoid gate (reference layers/utils.py torch.jit.script
    `activate_add_tanh_sigmoid_multiply`); XLA fuses this elementwise chain."""
    acts = x_in + g_l
    t = jnp.tanh(acts[..., :channels])
    s = jax.nn.sigmoid(acts[..., channels:])
    return t * s


class WN(nn.Module):
    """Non-causal WaveNet block with global conditioning (reference norms.py:27).

    x: (B, T, H); g: (B, 1, gin) or None.
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_mask, g=None):
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None and self.gin_channels != 0:
            g_all = Conv1d(2 * h * self.n_layers, 1,
                           weight_norm=self.weight_norm, name="cond_layer")(g)
        else:
            g_all = None
        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            padding = (self.kernel_size * dilation - dilation) // 2
            x_in = Conv1d(2 * h, self.kernel_size, padding=padding,
                          dilation=dilation, weight_norm=self.weight_norm,
                          name=f"in_{i}")(x)
            if g_all is not None:
                g_l = g_all[..., i * 2 * h:(i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = gated_tanh_sigmoid(x_in, g_l, h)
            res_skip_ch = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(res_skip_ch, 1, weight_norm=self.weight_norm,
                              name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


def _get_padding(kernel_size: int, dilation: int) -> int:
    return (kernel_size * dilation - dilation) // 2


class ResBlock1(nn.Module):
    """HiFiGAN ResBlock1 (reference residuals.py:19): 3x (dilated + plain) convs."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3, 5)
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_mask=None, collect_weights: bool = False):
        # collect_weights: bind/return the 6 folded (w, b) pairs instead of
        # computing — lets NSFGenerator hand a whole stage's weights to the
        # fused_stage pallas kernel while the params stay owned here.
        if collect_weights:
            ws, bs = [], []
            for i, d in enumerate(self.dilation):
                c1 = Conv1d(self.channels, self.kernel_size,
                            padding=_get_padding(self.kernel_size, d),
                            dilation=d, weight_norm=self.weight_norm,
                            kernel_init=normal_001_init, name=f"c1_{i}")
                c2 = Conv1d(self.channels, self.kernel_size,
                            padding=_get_padding(self.kernel_size, 1),
                            dilation=1, weight_norm=self.weight_norm,
                            kernel_init=normal_001_init, name=f"c2_{i}")
                w1, b1 = c1.make_weights(self.channels)
                w2, b2 = c2.make_weights(self.channels)
                ws += [w1, w2]
                bs += [b1, b2]
            return ws, bs
        # Fused Pallas path: the whole 6-conv chain in VMEM (inference
        # graphs, B==1, unmasked, C small enough that weights fit VMEM).
        # Isolated A/B wins at C=64 (k7 scratch 1.84 ms vs XLA 4.04; k11
        # per-tap 3.24 vs ~5.4; on-chip numerics rel err <= 3e-3 bf16)
        # did NOT compose: auto-enabling it in the full conversion graph
        # measured 127 ms/10 s vs 118-120 ms on the pure-XLA policy (the
        # custom-call boundary costs more than the kernels save), so it
        # stays opt-in via the PALLAS_RESBLOCKS trace-time toggle.
        if (PALLAS_RESBLOCKS and x_mask is None and x.shape[0] == 1
                and self.channels <= 64 and len(self.dilation) == 3):
            from tpu_rvc.ops.pallas.resblock import fused_resblock
            ws, bs = [], []
            for i, d in enumerate(self.dilation):
                c1 = Conv1d(self.channels, self.kernel_size,
                            padding=_get_padding(self.kernel_size, d),
                            dilation=d, weight_norm=self.weight_norm,
                            kernel_init=normal_001_init, name=f"c1_{i}")
                c2 = Conv1d(self.channels, self.kernel_size,
                            padding=_get_padding(self.kernel_size, 1),
                            dilation=1, weight_norm=self.weight_norm,
                            kernel_init=normal_001_init, name=f"c2_{i}")
                w1, b1 = c1.make_weights(self.channels)
                w2, b2 = c2.make_weights(self.channels)
                ws += [w1, w2]
                bs += [b1, b2]
            # Measured-best config (round-1 A/B on chip): tile 2048, bf16
            # operands (fp32 tiles blow the 16 MB scoped-VMEM limit in the
            # full graph; bf16 numerics validated on chip, rel <= 3e-3),
            # scratch im2col at k=7, per-tap otherwise (k=11/C=64 scratch
            # crashes the TPU compiler — fused_resblock guards it).
            xk = x[0].astype(jnp.bfloat16)
            ws = [w.astype(jnp.bfloat16) for w in ws]
            bs = [b.astype(jnp.bfloat16) for b in bs]
            return fused_resblock(
                xk, tuple(ws), tuple(bs),
                kernel_size=self.kernel_size,
                dilations=tuple(self.dilation),
                tile=2048)[None].astype(x.dtype)
        # Time-packed conv path (ops/conv.py conv1d_packed): measured ON
        # TPU as a NET REGRESSION in the full decoder graph (v2/48k
        # 10 s: decoder 43.8 -> 63.9 ms) — the block-sparse packed
        # weights waste 2-5x FLOPs, which outweighs the lane-width gain.
        # Kept parity-tested in ops/conv.py as a documented negative result.
        for i, d in enumerate(self.dilation):
            c1 = Conv1d(self.channels, self.kernel_size,
                        padding=_get_padding(self.kernel_size, d), dilation=d,
                        weight_norm=self.weight_norm,
                        kernel_init=normal_001_init, name=f"c1_{i}")
            c2 = Conv1d(self.channels, self.kernel_size,
                        padding=_get_padding(self.kernel_size, 1), dilation=1,
                        weight_norm=self.weight_norm,
                        kernel_init=normal_001_init, name=f"c2_{i}")
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = c1(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = c2(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """HiFiGAN ResBlock2 (reference residuals.py:103; unused by stock configs)."""

    channels: int
    kernel_size: int = 3
    dilation: Sequence[int] = (1, 3)
    weight_norm: bool = True

    @nn.compact
    def __call__(self, x, x_mask=None):
        for i, d in enumerate(self.dilation):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(self.channels, self.kernel_size,
                        padding=_get_padding(self.kernel_size, d), dilation=d,
                        weight_norm=self.weight_norm,
                        kernel_init=normal_001_init, name=f"c_{i}")(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x
