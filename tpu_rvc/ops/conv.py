"""1-D convolution primitives, channel-last, with torch-compatible semantics.

Everything here operates on (B, T, C) tensors — channel-last keeps C on the
TPU lane dimension so XLA tiles the contractions onto the MXU without
relayouts.  Weight layout is (K, C_in, C_out) throughout; `ckpt/convert.py`
maps torch's layouts onto these.

Semantics matched against torch (validated in tests/test_ops.py):
  conv1d            <-> torch.nn.functional.conv1d (explicit padding, dilation)
  conv_transpose1d  <-> torch.nn.functional.conv_transpose1d
                        (the reference's upsamplers: rvc/layers/generators.py:38,
                        rvc/layers/nsf.py:94)
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

_DN = ("NHC", "HIO", "NHC")  # batch-time-channel / k-in-out


def conv1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: Union[int, Tuple[int, int], str] = 0,
    dilation: int = 1,
    groups: int = 1,
    precision=None,
) -> jax.Array:
    """Channel-last conv1d.  x: (B, T, Cin), w: (K, Cin/groups, Cout)."""
    if isinstance(padding, str):
        pad = padding  # "SAME" / "VALID"
    elif isinstance(padding, int):
        pad = [(padding, padding)]
    else:
        pad = [tuple(padding)]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=pad,
        rhs_dilation=(dilation,),
        dimension_numbers=_DN,
        feature_group_count=groups,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def conv_transpose1d(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    precision=None,
) -> jax.Array:
    """torch-equivalent ConvTranspose1d, channel-last.

    x: (B, T, Cin); w: (K, Cin, Cout) stored so that
    ``w[k, i, o] == torch_weight[i, o, K - 1 - k]`` (the converter flips K and
    moves torch's (Cin, Cout, K) layout here).  Output length is
    (T - 1) * stride - 2 * padding + K, identical to torch.

    Implementation: transposed conv == input-dilated regular conv with the
    kernel flipped, with per-side padding K - 1 - padding.
    """
    k = w.shape[0]
    pad = k - 1 - padding
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=_DN,
        precision=precision,
    )
    if b is not None:
        y = y + b
    return y


def pad_reflect(x: jax.Array, pad_left: int, pad_right: int, axis: int = -1) -> jax.Array:
    """Reflect padding along one axis (torch F.pad mode='reflect')."""
    if pad_left == 0 and pad_right == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (pad_left, pad_right)
    return jnp.pad(x, pads, mode="reflect")


def fold_weight_norm(g: jax.Array, v: jax.Array, axis_keep: int = -1) -> jax.Array:
    """Fold a weight-norm (g, v) parametrization into a dense weight.

    torch weight_norm on Conv1d keeps norms over all dims except dim 0
    (C_out).  In our (K, Cin, Cout) layout C_out is the last axis, so the
    norm reduces over (K, Cin).  Weight-norm exists only in reference
    training checkpoints (rvc/layers/norms.py:54-83); at load time we fold it
    so inference graphs see plain weights.
    """
    axes = tuple(i for i in range(v.ndim) if i != (axis_keep % v.ndim))
    norm = jnp.sqrt(jnp.sum(v * v, axis=axes, keepdims=True))
    return g * v / norm


def conv_transpose1d_poly(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
) -> jax.Array:
    """Polyphase transposed conv — exact conv_transpose1d semantics without
    lhs-dilation zero-multiplication.

    The dilated formulation multiplies `stride-1` zeros per input sample
    (a ~`stride`x FLOP waste at the vocoder's 10-12x upsample stages).  Here
    each of the `stride` output phases contracts only its own <=ceil(K/u)
    kernel taps:

        y[q*u + r] = sum_m x[q + s_r - m] . W_torch[j_{r,m}]
          with j_{r,m} = (r + pad) % u + m*u,  s_r = (r + pad) // u

    expressed as one einsum over (phase, tap) weight slices — pure MXU work.
    Weight layout matches conv_transpose1d: (K, Cin, Cout), K flipped from
    the torch tap order.
    """
    import numpy as np

    K, cin, cout = w.shape
    u = stride
    if u == 1:
        return conv_transpose1d(x, w, b, stride=1, padding=padding)
    B, T, _ = x.shape
    M = -(-K // u) + 1  # upper bound on taps per phase

    # torch tap j lives at our flipped index K-1-j
    w_t = jnp.flip(w, axis=0)  # w_t[j] = torch tap j, (K, Cin, Cout)
    # build (u, M, Cin, Cout) phase-tap weights and (u, M) input shifts
    taps = np.zeros((u, M), np.int64)
    valid = np.zeros((u, M), bool)
    shifts = np.zeros((u, M), np.int64)
    for r in range(u):
        base = (r + padding) % u
        s_r = (r + padding) // u
        for m in range(M):
            j = base + m * u
            if j < K:
                taps[r, m] = j
                valid[r, m] = True
                shifts[r, m] = s_r - m  # x index offset relative to q
    wp = w_t[taps.reshape(-1)].reshape(u, M, cin, cout)
    wp = jnp.where(jnp.asarray(valid)[:, :, None, None], wp, 0.0)

    # distinct shifts are few (usually 2); group matmuls by shift
    y = jnp.zeros((B, T, u, cout), x.dtype)
    for sh in sorted(set(shifts[valid].tolist())):
        mask = jnp.asarray((shifts == sh) & valid, x.dtype)
        w_sh = jnp.einsum("umio,um->uio", wp.astype(jnp.float32),
                          mask.astype(jnp.float32)).astype(x.dtype)
        # x shifted: y_q uses x[q + sh]
        if sh == 0:
            xs = x
        elif sh > 0:
            xs = jnp.concatenate(
                [x[:, sh:], jnp.zeros((B, sh, cin), x.dtype)], axis=1)
        else:
            xs = jnp.concatenate(
                [jnp.zeros((B, -sh, cin), x.dtype), x[:, :sh]], axis=1)
        y = y + jnp.einsum("bti,uio->btuo", xs, w_sh)
    y = y.reshape(B, T * u, cout)
    out_len = (T - 1) * u - 2 * padding + K
    # alignment: output position n corresponds to q*u + r with q from x's
    # frame; the first valid n is 0 <-> (q=0, r=0) already by construction
    y = y[:, :out_len]
    if b is not None:
        y = y + b
    return y


def conv1d_im2col(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    """conv1d as an unfold + single matmul.

    For small channel counts the MXU contraction dim of a direct conv is
    Cin (e.g. 32 of 128 lanes at the vocoder's last stages, or 1 for the
    NSF noise_convs / HuBERT conv0); unfolding the k taps makes it k*Cin.
    x: (B, T, Cin), w: (K, Cin, Cout); same semantics as conv1d.
    """
    K, cin, cout = w.shape
    B, T, _ = x.shape
    span = (K - 1) * dilation
    T_out = (T + 2 * padding - span - 1) // stride + 1
    # pad enough that every strided tap slice is in range
    need = (T_out - 1) * stride + span + 1
    xp = jnp.pad(x, ((0, 0), (padding, max(need - T - padding, 0) + 1),
                     (0, 0)))
    cols = []
    for j in range(K):
        s = jax.lax.slice_in_dim(xp, j * dilation,
                                 j * dilation + (T_out - 1) * stride + 1,
                                 stride=stride, axis=1)
        cols.append(s)
    unf = jnp.concatenate(cols, axis=-1)  # (B, T_out, K*Cin)
    y = jnp.einsum("btk,ko->bto", unf, w.reshape(K * cin, cout),
                   preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def conv1d_packed(
    x: jax.Array,
    w: jax.Array,
    b: Optional[jax.Array] = None,
    *,
    pack: int,
    dilation: int = 1,
) -> jax.Array:
    """'Same'-padded conv1d computed in a time-packed layout.

    The vocoder's late stages run at tiny channel counts (C=32/64) over
    very long T, starving the MXU's 128 lanes.  Packing p consecutive
    timesteps into channels — (B, T, C) -> (B, T/p, p*C), a FREE reshape
    in channel-last layout — turns the conv into an exact conv over packed
    time with block-structured (k', p*C, p*C) weights, where
    k' = |{floor((r + d*(j - h)) / p)}| <= ceil((k-1)*d/p) + 1 taps.
    Zero blocks cost extra FLOPs but every matmul runs at full lane width;
    measured on TPU this beats both direct conv and plain im2col for
    k >= 7 at C <= 64 (see benchmarks/synth_stages.py harness).

    x: (B, T, C) with T % pack == 0; w: (K, C, C) (square convs only);
    output equals conv1d(x, w, b, padding=(K-1)//2*dilation, dilation=d).
    """
    import numpy as np

    K, cin, cout = w.shape
    assert cin == cout, "packed conv supports square channel counts"
    B, T, C = x.shape
    p = pack
    assert T % p == 0 and C == cin
    h = (K - 1) // 2
    # packed-tap decomposition: output slot r tap j reads input slot
    # m = r + d*(j - h): packed time offset floor(m/p), slot m mod p
    offs = {}
    for r in range(p):
        for j in range(K):
            m = r + dilation * (j - h)
            offs.setdefault(m // p, []).append((r, j, m % p))
    s_min, s_max = min(offs), max(offs)
    # contiguous tap range (missing offsets stay zero blocks) so the conv
    # padding maps tap t to packed-time offset s_min + t exactly
    kp = s_max - s_min + 1
    # scatter original taps into the packed kernel (trace-time indices)
    ti, ci_, co_ = [], [], []
    jj = []
    for s, entries in offs.items():
        for (r, j, mm) in entries:
            ti.append(s - s_min)
            jj.append(j)
            ci_.append(mm)
            co_.append(r)
    ti = np.asarray(ti)
    jj = np.asarray(jj)
    ci_ = np.asarray(ci_)
    co_ = np.asarray(co_)
    wp = jnp.zeros((kp, p * C, p * C), w.dtype)
    # block (ci_slot, co_slot) holds w[j] (C x C)
    cidx = np.arange(C)
    wp = wp.at[ti[:, None, None],
               (ci_[:, None, None] * C + cidx[None, :, None]),
               (co_[:, None, None] * C + cidx[None, None, :])].set(
        w[jj])
    xq = x.reshape(B, T // p, p * C)
    # 'same' output over packed time: tap t reads xq[q + s_min + t], so
    # left pad = -s_min, right pad = s_max; pad explicitly (asymmetric)
    xq = jnp.pad(xq, ((0, 0), (-s_min, s_max), (0, 0)))
    y = conv1d_im2col(xq, wp, None, padding=0)
    y = y.reshape(B, T, C)
    if b is not None:
        y = y + b
    return y
