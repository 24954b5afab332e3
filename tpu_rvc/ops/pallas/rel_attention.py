"""Pallas TPU kernel: fused VITS relative-position attention.

One kernel per (batch*head, q-tile) computes

    scores = (q/sqrt(dk)) K^T  +  banded_rel_bias(q, emb_k)
    scores = mask(-1e4 beyond true length)
    p      = softmax(scores)
    out    = p V + banded_rel_values(p, emb_v)

entirely in VMEM — the XLA path materializes (B,H,T,T) scores plus the
banded scatter/gather in HBM; here the score tile never leaves the chip.
The band is the VITS window (|i-j| <= W, W=10): rel bias/values are exact
(the padded table is zero outside the band, rvc/layers/attentions.py:162).

K/V for RVC's encoder are small (T<=~2200, dk<=96): the whole K and V fit
VMEM alongside a q tile, so no streaming loop is needed.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(length_ref, q_ref, k_ref, v_ref, ek_ref, ev_ref, o_ref, *,
            window: int, q_tile: int, t_pad: int):
    # q_ref: (q_tile, dk); k_ref/v_ref: (t_pad, dk); ek/ev: (2W+1, dk)
    b = pl.program_id(0)  # batch*head index
    i = pl.program_id(1)  # q-tile index
    q0 = i * q_tile
    dk = q_ref.shape[-1]
    scale = 1.0 / math.sqrt(dk)
    q = q_ref[:].astype(jnp.float32) * scale
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)

    scores = jnp.dot(q, k.T, preferred_element_type=jnp.float32)

    # banded relative bias: qr[r, m] = q_r . emb_k[m]
    qr = jnp.dot(q, ek_ref[:].astype(jnp.float32).T,
                 preferred_element_type=jnp.float32)  # (q_tile, 2W+1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (q_tile, t_pad), 0) + q0
    cols = jax.lax.broadcasted_iota(jnp.int32, (q_tile, t_pad), 1)
    rel = cols - rows  # j - i
    for m in range(2 * window + 1):
        d = m - window
        scores += jnp.where(rel == d, qr[:, m:m + 1], 0.0)

    # length mask (true sequence length; padded keys get -1e4 like the
    # reference's masked_fill, attentions.py:117)
    true_len = length_ref[b]
    scores = jnp.where(cols < true_len, scores, -1e4)

    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.dot(p, v, preferred_element_type=jnp.float32)

    # banded value contribution: pd[r, m] = p[r, r+d];  out += pd @ emb_v
    pd_cols = []
    for m in range(2 * window + 1):
        d = m - window
        pd_cols.append(jnp.sum(jnp.where(rel == d, p, 0.0), axis=1))
    pd = jnp.stack(pd_cols, axis=1)  # (q_tile, 2W+1)
    out += jnp.dot(pd, ev_ref[:].astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "q_tile", "interpret"))
def banded_rel_attention(q, k, v, emb_rel_k, emb_rel_v, lengths,
                         window: int = 10, q_tile: int = 128,
                         interpret: bool = False):
    """Fused attention.  q/k/v: (BH, T, dk); emb_rel_*: (2W+1, dk);
    lengths: (BH,) int32 true sequence lengths.  Returns (BH, T, dk)."""
    BH, T, dk = q.shape
    t_pad = -(-T // q_tile) * q_tile
    if t_pad != T:
        pad = [(0, 0), (0, t_pad - T), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    n_q = t_pad // q_tile
    length_arr = jnp.broadcast_to(
        jnp.asarray(lengths, jnp.int32).reshape(-1), (BH,))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, n_q),
        in_specs=[
            pl.BlockSpec((None, q_tile, dk), lambda b, i, L: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, dk), lambda b, i, L: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t_pad, dk), lambda b, i, L: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * window + 1, dk), lambda b, i, L: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * window + 1, dk), lambda b, i, L: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, q_tile, dk), lambda b, i, L: (b, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, window=window, q_tile=q_tile,
                          t_pad=t_pad),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((BH, t_pad, dk), q.dtype),
        interpret=interpret,
    )(length_arr, q, k, v, emb_rel_k, emb_rel_v)
    return out[:, :T]
