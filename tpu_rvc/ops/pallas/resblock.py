"""Pallas TPU kernel: fused HiFiGAN ResBlock1.

A ResBlock1 (reference rvc/layers/residuals.py:19) is six convs with
residual adds:

    for d in dilations:  x += conv_1(lrelu(conv_d(lrelu(x))))

Run as separate XLA convs, the (T, C) activation round-trips HBM ~12 times
per block at audio rate (T up to ~10^6).  This kernel keeps the whole chain
in VMEM: tiles of T with a halo wide enough for all six receptive fields,
convs as unfold+matmul (contraction k*C — full MXU lanes even at C=32).

Halo assembly uses three views of the same input (previous / current / next
tile) via BlockSpec index maps, masked at the sequence edges, so no manual
DMA is needed.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LRELU_SLOPE = 0.1


def _halo(kernel_size: int, dilations: Sequence[int]) -> int:
    half = (kernel_size - 1) // 2
    return sum(half * d + half for d in dilations)


def _conv_same(x, w, b, dilation, scratch_ref=None):
    """Same-padded conv on a (L, C) VMEM value via unfold + one matmul.

    With a scratch ref, the K taps are STORED side by side into a VMEM
    (L, K*C) buffer (static lane offsets) and contracted in ONE matmul —
    contraction K*C fills the MXU rows even at C=32.  (Mosaic rejects
    lane-CONCAT of values at different sublane offsets, which blocked the
    single-matmul form earlier; stores are the workaround under test.)
    Without scratch: per-tap matmul accumulation (contraction C)."""
    K, C, Cout = w.shape
    L = x.shape[0]
    p = (K - 1) // 2 * dilation
    xp = jnp.pad(x, ((p, p), (0, 0)))
    if scratch_ref is not None:
        for j in range(K):
            scratch_ref[0:L, j * C:(j + 1) * C] = xp[
                j * dilation: j * dilation + L]
        unf = scratch_ref[0:L, 0:K * C]
        return (jnp.dot(unf, w.reshape(K * C, Cout),
                        preferred_element_type=jnp.float32)
                + b.astype(jnp.float32))
    y = jnp.broadcast_to(b, (L, Cout)).astype(jnp.float32)
    for j in range(K):
        tap = xp[j * dilation: j * dilation + L]
        y = y + jnp.dot(tap, w[j], preferred_element_type=jnp.float32)
    return y


def _kernel(x_prev_ref, x_cur_ref, x_next_ref, *refs,
            tile: int, halo: int, dilations: Tuple[int, ...],
            true_len: int):
    n_d = len(dilations)
    w_refs = refs[:2 * n_d]
    b_refs = refs[2 * n_d:4 * n_d]
    o_ref = refs[4 * n_d]
    scratch = refs[4 * n_d + 1] if len(refs) > 4 * n_d + 1 else None
    i = pl.program_id(0)
    n = pl.num_programs(0)

    prev_tail = x_prev_ref[tile - halo:, :].astype(jnp.float32)
    nxt_head = x_next_ref[:halo, :].astype(jnp.float32)
    # zero the halos at sequence edges (first/last tile see themselves)
    prev_tail = jnp.where(i == 0, 0.0, prev_tail)
    nxt_head = jnp.where(i == n - 1, 0.0, nxt_head)
    cur = jnp.concatenate(
        [prev_tail, x_cur_ref[:].astype(jnp.float32), nxt_head], axis=0)

    # rows outside the true sequence must stay exactly zero before every
    # conv (each conv re-zero-pads in the unfused formulation; without this
    # the bias of conv pair m leaks into pair m+1's receptive field)
    grow = (jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * halo, 1), 0)
            + i * tile - halo)
    valid = (grow >= 0) & (grow < true_len)

    for m, d in enumerate(dilations):
        cur = jnp.where(valid, cur, 0.0)
        t = jax.nn.leaky_relu(cur, LRELU_SLOPE)
        t = _conv_same(t, w_refs[2 * m][:].astype(jnp.float32),
                       b_refs[2 * m][:].astype(jnp.float32), d,
                       scratch_ref=scratch)
        t = jnp.where(valid, t, 0.0)
        t = jax.nn.leaky_relu(t, LRELU_SLOPE)
        t = _conv_same(t, w_refs[2 * m + 1][:].astype(jnp.float32),
                       b_refs[2 * m + 1][:].astype(jnp.float32), 1,
                       scratch_ref=scratch)
        cur = cur + t
    o_ref[:] = cur[halo:halo + tile].astype(o_ref.dtype)


def _stage_kernel(x_prev_ref, x_cur_ref, x_next_ref, *refs,
                  tile: int, halo: int, kernel_sizes: Tuple[int, ...],
                  dilations: Tuple[int, ...], true_len: int,
                  scratch_ks: Tuple[int, ...]):
    """Whole upsample-stage kernel: N parallel ResBlock1s (different K,
    same dilations) + their average, one VMEM residency for the tile.

    Per-resblock swaps did not compose in the full graph (the custom-call
    boundary cost more than the kernels saved, round-1 measurement); this
    amortizes ONE boundary over all 3*6 convs + the average."""
    nrb = len(kernel_sizes)
    n_d = len(dilations)
    w_refs = refs[: 2 * n_d * nrb]
    b_refs = refs[2 * n_d * nrb: 4 * n_d * nrb]
    o_ref = refs[4 * n_d * nrb]
    scratch = refs[4 * n_d * nrb + 1] if len(refs) > 4 * n_d * nrb + 1 \
        else None
    i = pl.program_id(0)
    n = pl.num_programs(0)

    prev_tail = x_prev_ref[tile - halo:, :].astype(jnp.float32)
    nxt_head = x_next_ref[:halo, :].astype(jnp.float32)
    prev_tail = jnp.where(i == 0, 0.0, prev_tail)
    nxt_head = jnp.where(i == n - 1, 0.0, nxt_head)
    base = jnp.concatenate(
        [prev_tail, x_cur_ref[:].astype(jnp.float32), nxt_head], axis=0)

    grow = (jax.lax.broadcasted_iota(jnp.int32, (tile + 2 * halo, 1), 0)
            + i * tile - halo)
    valid = (grow >= 0) & (grow < true_len)

    acc = None
    for r, K in enumerate(kernel_sizes):
        cur = base
        use_scr = scratch if K in scratch_ks else None
        for m, d in enumerate(dilations):
            cur = jnp.where(valid, cur, 0.0)
            t = jax.nn.leaky_relu(cur, LRELU_SLOPE)
            t = _conv_same(
                t, w_refs[2 * n_d * r + 2 * m][:].astype(jnp.float32),
                b_refs[2 * n_d * r + 2 * m][:].astype(jnp.float32), d,
                scratch_ref=use_scr)
            t = jnp.where(valid, t, 0.0)
            t = jax.nn.leaky_relu(t, LRELU_SLOPE)
            t = _conv_same(
                t, w_refs[2 * n_d * r + 2 * m + 1][:].astype(jnp.float32),
                b_refs[2 * n_d * r + 2 * m + 1][:].astype(jnp.float32), 1,
                scratch_ref=use_scr)
            cur = cur + t
        acc = cur if acc is None else acc + cur
    out = acc * (1.0 / nrb)
    o_ref[:] = out[halo:halo + tile].astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("kernel_sizes", "dilations",
                                              "tile", "interpret",
                                              "scratch_ks"))
def fused_stage(x, weights, biases, *, kernel_sizes: Tuple[int, ...],
                dilations: Tuple[int, ...] = (1, 3, 5), tile: int = 1024,
                interpret: bool = False, scratch_ks=None):
    """mean_r(ResBlock1_{K_r}(x)) — the whole resblock stage of one
    HiFiGAN upsample level (reference nsf.py:145 inner loop + average) as
    ONE pallas_call.  x: (T, C); weights/biases: per resblock r the 6
    tensors [c1_0, c2_0, c1_1, c2_1, c1_2, c2_2], concatenated in r order
    (so 6*len(kernel_sizes) each).

    Scratch-im2col policy per the round-1 per-K measurements: k=7 via the
    in-VMEM (L, 7C) scratch (1.84 ms vs 4.04 XLA at C=64), k=3/k=11 via
    per-tap matmuls (the k=11/C=64 scratch variant crashes the TPU
    compiler).  tile defaults to 1024: the 3-resblock stage's live state
    at tile 2048 exceeds the 16 MB scoped-VMEM limit (21.07 MB measured
    on v5e); larger tiles are opt-in for A/B only."""
    T, C = x.shape
    nrb = len(kernel_sizes)
    assert len(weights) == 6 * nrb and len(biases) == 6 * nrb
    halo = max(_halo(k, dilations) for k in kernel_sizes)
    assert halo <= tile, (halo, tile)
    if scratch_ks is None:
        # measured on v5e (benchmarks/stage_ab.py): the all-per-tap stage
        # kernel (no VMEM-scratch unfold) is fastest at C=128 — 40.72 vs
        # 41.41 (scratch k=7) vs 42.84 ms (pure XLA) per decoder pass.
        scratch_ks = ()
    else:
        scratch_ks = tuple(k for k in scratch_ks if k in kernel_sizes)
    n = -(-T // tile)
    T_pad = n * tile
    xp = jnp.pad(x, ((0, T_pad - T), (0, 0)))

    def imap_prev(i):
        return (jnp.maximum(i - 1, 0), 0)

    def imap_cur(i):
        return (i, 0)

    def imap_next(i):
        return (jnp.minimum(i + 1, n - 1), 0)

    in_specs = [
        pl.BlockSpec((tile, C), imap_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C), imap_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C), imap_next, memory_space=pltpu.VMEM),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    for b in biases:
        in_specs.append(pl.BlockSpec(b.shape, lambda i: (0,),
                                     memory_space=pltpu.VMEM))
    scratch_shapes = []
    if scratch_ks:
        scratch_shapes = [pltpu.VMEM(
            (tile + 2 * halo, max(scratch_ks) * C), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_stage_kernel, tile=tile, halo=halo,
                          kernel_sizes=tuple(kernel_sizes),
                          dilations=tuple(dilations), true_len=T,
                          scratch_ks=scratch_ks),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, C), imap_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, C), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(xp, xp, xp, *weights, *biases)
    return out[:T]


@functools.partial(jax.jit, static_argnames=("kernel_size", "dilations",
                                              "tile", "interpret",
                                              "use_scratch"))
def fused_resblock(x, weights, biases, *, kernel_size: int,
                   dilations: Tuple[int, ...] = (1, 3, 5), tile: int = 2048,
                   interpret: bool = False, use_scratch=None):
    """Fused ResBlock1.  x: (T, C); weights: 6 tensors (K, C, C) ordered
    [c1_0, c2_0, c1_1, c2_1, c1_2, c2_2]; biases: 6 x (C,).

    use_scratch=None picks the measured policy: the in-VMEM im2col scratch
    wins at k=7 but the k=11/C=64 combination crashes the TPU compiler
    (remote-service HTTP 500), so k!=7 uses per-tap matmuls."""
    T, C = x.shape
    if use_scratch is None:
        use_scratch = kernel_size == 7
    if use_scratch and kernel_size == 11 and C >= 64 and not interpret:
        raise ValueError(
            "fused_resblock: use_scratch with kernel_size=11 and C>=64 is a "
            "known TPU compiler crash; use use_scratch=False (per-tap)")
    halo = _halo(kernel_size, dilations)
    assert halo <= tile, (halo, tile)
    n = -(-T // tile)
    T_pad = n * tile
    xp = jnp.pad(x, ((0, T_pad - T), (0, 0)))

    def imap_prev(i):
        return (jnp.maximum(i - 1, 0), 0)

    def imap_cur(i):
        return (i, 0)

    def imap_next(i):
        return (jnp.minimum(i + 1, n - 1), 0)

    in_specs = [
        pl.BlockSpec((tile, C), imap_prev, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C), imap_cur, memory_space=pltpu.VMEM),
        pl.BlockSpec((tile, C), imap_next, memory_space=pltpu.VMEM),
    ]
    K = kernel_size
    for _ in range(6):
        in_specs.append(pl.BlockSpec((K, C, C), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
    for _ in range(6):
        in_specs.append(pl.BlockSpec((C,), lambda i: (0,),
                                     memory_space=pltpu.VMEM))

    scratch_shapes = []
    if use_scratch:
        # in-VMEM im2col buffer: (L, K*C) built by K static stores, then
        # ONE matmul with contraction K*C (full MXU rows at C=32)
        scratch_shapes = [pltpu.VMEM((tile + 2 * halo, K * C), jnp.float32)]
    out = pl.pallas_call(
        functools.partial(_kernel, tile=tile, halo=halo,
                          dilations=tuple(dilations), true_len=T),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile, C), imap_cur,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T_pad, C), x.dtype),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
    )(xp, xp, xp, *weights, *biases)
    return out[:T]
