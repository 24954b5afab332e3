"""Numeric tests for tpu_rvc.nn modules, with torch oracles for the
attention rel/abs shuffles and module-level shape/finite checks."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from tpu_rvc.nn.attention import (
    relative_to_absolute,
    absolute_to_relative,
    window_relative_embeddings,
    MultiHeadRelAttention,
    Encoder,
)
from tpu_rvc.nn.modules import WN, ResBlock1, LayerNorm1d
from tpu_rvc.nn.encoders import TextEncoder, PosteriorEncoder
from tpu_rvc.nn.flows import ResidualCouplingBlock
from tpu_rvc.nn.generators import f0_to_sine_phases, NSFGenerator


def torch_rel_to_abs(x):
    batch, heads, length, _ = x.size()
    x = F.pad(x, [0, 1, 0, 0, 0, 0, 0, 0])
    x_flat = x.view([batch, heads, length * 2 * length])
    x_flat = F.pad(x_flat, [0, length - 1, 0, 0, 0, 0])
    return x_flat.view([batch, heads, length + 1, 2 * length - 1])[
        :, :, :length, length - 1:]


def torch_abs_to_rel(x):
    batch, heads, length, _ = x.size()
    x = F.pad(x, [0, length - 1, 0, 0, 0, 0, 0, 0])
    x_flat = x.view([batch, heads, length**2 + length * (length - 1)])
    x_flat = F.pad(x_flat, [length, 0, 0, 0, 0, 0])
    return x_flat.view([batch, heads, length, 2 * length])[:, :, :, 1:]


def test_rel_abs_shuffles_match_torch(rng):
    B, H, L = 2, 2, 13
    x = rng.standard_normal((B, H, L, 2 * L - 1)).astype(np.float32)
    ref = torch_rel_to_abs(torch.from_numpy(x))
    np.testing.assert_allclose(np.asarray(relative_to_absolute(jnp.asarray(x))),
                               ref.numpy(), atol=1e-6)
    y = rng.standard_normal((B, H, L, L)).astype(np.float32)
    ref2 = torch_abs_to_rel(torch.from_numpy(y))
    np.testing.assert_allclose(np.asarray(absolute_to_relative(jnp.asarray(y))),
                               ref2.numpy(), atol=1e-6)


def test_window_relative_embeddings_long_and_short(rng):
    w = 10
    emb = rng.standard_normal((1, 2 * w + 1, 8)).astype(np.float32)
    # long sequence: pads
    out = window_relative_embeddings(jnp.asarray(emb), 50, w)
    assert out.shape == (1, 99, 8)
    # center of window lands at relative position 0
    np.testing.assert_allclose(np.asarray(out)[0, 49], emb[0, w])
    # short sequence: slices
    out2 = window_relative_embeddings(jnp.asarray(emb), 5, w)
    assert out2.shape == (1, 9, 8)
    np.testing.assert_allclose(np.asarray(out2)[0, 4], emb[0, w])


def test_attention_softmax_rows_and_mask(rng):
    B, T, C = 1, 24, 64
    m = MultiHeadRelAttention(C, C, 2, 10)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    mask = np.ones((B, 1, T, T), np.float32)
    mask[:, :, :, 16:] = 0  # mask out tail keys
    params = m.init(jax.random.PRNGKey(0), x, jnp.asarray(mask))
    y = m.apply(params, x, jnp.asarray(mask))
    assert y.shape == (B, T, C)
    assert np.isfinite(np.asarray(y)).all()
    # changing masked-out keys must not change output (beyond -1e4 leakage)
    x2 = np.asarray(x).copy()
    x2[:, 16:, :] += 100.0
    y2 = m.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(y[:, :10]), np.asarray(y2[:, :10]),
                               atol=2e-2)


def test_wn_shapes_and_mask(rng):
    B, T, H = 2, 32, 16
    wn = WN(H, 5, 1, 4, gin_channels=8)
    x = jnp.asarray(rng.standard_normal((B, T, H)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, 1, 8)).astype(np.float32))
    mask = np.ones((B, T, 1), np.float32)
    mask[:, 28:] = 0
    params = wn.init(jax.random.PRNGKey(0), x, jnp.asarray(mask), g)
    y = wn.apply(params, x, jnp.asarray(mask), g)
    assert y.shape == (B, T, H)
    assert np.abs(np.asarray(y)[:, 28:]).max() == 0  # masked out


def test_flow_roundtrip(rng):
    """reverse(forward(z)) == z — the core flow invariant."""
    B, T, C = 2, 40, 192
    flow = ResidualCouplingBlock(C, 192, 5, 1, 3, gin_channels=256)
    z = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((B, 1, 256)).astype(np.float32))
    mask = jnp.ones((B, T, 1), jnp.float32)
    params = flow.init(jax.random.PRNGKey(0), z, mask, g)
    z_p = flow.apply(params, z, mask, g)
    z_rec = flow.apply(params, z_p, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(z_rec), np.asarray(z),
                               rtol=1e-3, atol=1e-4)


def test_f0_to_sine_phase_continuity():
    """Phase must be continuous across frame boundaries (no clicks)."""
    sr, upp = 40000, 400
    f0 = np.full((1, 10), 220.0, np.float32)
    ph = np.asarray(f0_to_sine_phases(jnp.asarray(f0), upp, sr, 1, None))[0, :, 0]
    # constant f0 -> phase increments constant everywhere incl. frame joins
    d = np.diff(ph)
    d = np.mod(d + 0.5, 1.0) - 0.5  # unwrap
    np.testing.assert_allclose(d, 220.0 / sr, atol=1e-4)


def test_f0_to_sine_matches_torch_reference_formula():
    """Against the reference _f02sine recurrence computed in numpy."""
    sr, upp = 16000, 160
    rng = np.random.default_rng(0)
    f0 = (rng.uniform(80, 400, (1, 8))).astype(np.float32)
    # numpy oracle of generators.py:148-158 (harmonic dim = 1, no rand_ini)
    a = np.arange(1, upp + 1, dtype=np.float64)
    rad = f0[:, :, None] / sr * a  # (1, L, upp)
    rad2 = np.mod(rad[:, :-1, -1] + 0.5, 1.0) - 0.5
    rad_acc = np.mod(np.cumsum(rad2, axis=1), 1.0)
    rad += np.pad(rad_acc, ((0, 0), (1, 0)))[:, :, None]
    oracle = np.sin(2 * np.pi * rad.reshape(1, -1))
    ph = np.asarray(f0_to_sine_phases(jnp.asarray(f0), upp, sr, 1, None))
    ours = np.sin(2 * np.pi * ph[0, :, 0])
    np.testing.assert_allclose(ours, oracle[0], atol=1e-3)


def test_text_encoder_skip_head(rng):
    B, T, D = 1, 32, 256
    enc = TextEncoder(192, 192, 768, 2, 2, 3, 0.0, f0=True)
    phone = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    pitch = jnp.asarray(rng.integers(1, 255, (B, T)).astype(np.int32))
    lengths = jnp.asarray([T])
    params = enc.init(jax.random.PRNGKey(0), phone, pitch, lengths)
    m, logs, mask = enc.apply(params, phone, pitch, lengths)
    m2, logs2, mask2 = enc.apply(params, phone, pitch, lengths, skip_head=8)
    assert m2.shape == (B, T - 8, 192)
    np.testing.assert_allclose(np.asarray(m[:, 8:]), np.asarray(m2),
                               rtol=1e-4, atol=1e-5)


def test_banded_rel_attention_matches_padded_path(rng):
    """The banded scatter/gather fast path must equal the Shaw pad/reshape
    formulation bit-for-bit (the padded table is zero outside the band)."""
    import flax.linen as fnn
    B, T, C, W = 1, 50, 64, 10
    m = MultiHeadRelAttention(C, C, 2, W)
    x = jnp.asarray(rng.standard_normal((B, T, C)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), x)
    y_banded = m.apply(params, x)

    # padded-path oracle computed by hand from the same params
    p = params["params"]
    def conv1x1(t, name):
        return t @ p[name]["kernel"][0] + p[name]["bias"]
    q = conv1x1(x, "conv_q").reshape(B, T, 2, 32).transpose(0, 2, 1, 3)
    k = conv1x1(x, "conv_k").reshape(B, T, 2, 32).transpose(0, 2, 1, 3)
    v = conv1x1(x, "conv_v").reshape(B, T, 2, 32).transpose(0, 2, 1, 3)
    scale = 1 / np.sqrt(32)
    scores = jnp.einsum("bhtd,bhsd->bhts", q * scale, k)
    kr = window_relative_embeddings(p["emb_rel_k"], T, W)
    scores = scores + relative_to_absolute(
        jnp.einsum("bhtd,gmd->bhtm", q * scale, kr))
    pr = jax.nn.softmax(scores, -1)
    out = jnp.einsum("bhts,bhsd->bhtd", pr, v)
    vr = window_relative_embeddings(p["emb_rel_v"], T, W)
    out = out + jnp.einsum("bhtm,gmd->bhtd", absolute_to_relative(pr), vr)
    out = out.transpose(0, 2, 1, 3).reshape(B, T, C)
    y_oracle = conv1x1(out, "conv_o")
    np.testing.assert_allclose(np.asarray(y_banded), np.asarray(y_oracle),
                               rtol=1e-4, atol=1e-5)


def test_pallas_attention_matches_xla(rng):
    """Fused Pallas kernel (interpret mode on CPU) vs the XLA banded path,
    end to end through TextEncoder with mixed lengths."""
    import tpu_rvc.nn.attention as attn_mod
    import tpu_rvc.ops.pallas.rel_attention as pk

    orig = pk.banded_rel_attention

    def interp(*a, **k):
        k["interpret"] = True
        return orig.__wrapped__(*a, **k)

    B, T, D = 2, 60, 256
    enc = TextEncoder(192, 192, 768, 2, 2, 3, 0.0, f0=True)
    phone = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    pitch = jnp.asarray(rng.integers(1, 255, (B, T)).astype(np.int32))
    lengths = jnp.asarray([T, T - 13])
    params = enc.init(jax.random.PRNGKey(0), phone, pitch, lengths)
    m1, _, _ = enc.apply(params, phone, pitch, lengths)
    pk.banded_rel_attention = interp
    attn_mod.PALLAS_ATTENTION = True
    try:
        m2, _, _ = enc.apply(params, phone, pitch, lengths)
    finally:
        attn_mod.PALLAS_ATTENTION = False
        pk.banded_rel_attention = orig
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                               rtol=1e-4, atol=2e-5)


def test_pallas_resblock_matches_module(rng):
    """Fused resblock kernel (interpret mode) through the ResBlock1 module
    fast path must match the unfused path.  The opt-in path runs the
    measured-best on-chip config — bf16 operands — so the tolerance is
    bf16-level (on-chip validation measured rel err <= 3e-3); exact fp32
    kernel numerics are covered by test_pallas_resblock_kernel_fp32."""
    from tpu_rvc.nn import modules as mods
    import tpu_rvc.ops.pallas.resblock as rk

    orig = rk.fused_resblock

    def interp(*a, **k):
        k["interpret"] = True
        return orig.__wrapped__(*a, **k)

    rb = ResBlock1(64, 7, (1, 3, 5), weight_norm=False)
    x = jnp.asarray(rng.standard_normal((1, 700, 64)).astype(np.float32) * 0.3)
    params = rb.init(jax.random.PRNGKey(0), x)
    ref = rb.apply(params, x)
    rk.fused_resblock = interp
    mods.PALLAS_RESBLOCKS = True
    try:
        got = rb.apply(params, x)
    finally:
        mods.PALLAS_RESBLOCKS = False
        rk.fused_resblock = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=2e-2)


def test_pallas_resblock_kernel_fp32(rng):
    """Direct fp32 kernel parity (interpret) vs an unfused jnp reference,
    both scratch and per-tap variants, k=7 and k=11."""
    from tpu_rvc.ops.pallas.resblock import fused_resblock, LRELU_SLOPE
    from tpu_rvc.ops.conv import conv1d

    for K, use_scratch in ((7, True), (7, False), (11, False)):
        C, T = 64, 700
        x = jnp.asarray(
            rng.standard_normal((T, C)).astype(np.float32) * 0.3)
        ws = tuple(jnp.asarray(
            rng.standard_normal((K, C, C)).astype(np.float32) * 0.05)
            for _ in range(6))
        bs = tuple(jnp.asarray(
            rng.standard_normal((C,)).astype(np.float32) * 0.05)
            for _ in range(6))

        ref = x[None]
        for m, d in enumerate((1, 3, 5)):
            t = jax.nn.leaky_relu(ref, LRELU_SLOPE)
            t = conv1d(t, ws[2 * m], bs[2 * m], dilation=d,
                       padding=(K - 1) // 2 * d)
            t = jax.nn.leaky_relu(t, LRELU_SLOPE)
            t = conv1d(t, ws[2 * m + 1], bs[2 * m + 1], dilation=1,
                       padding=(K - 1) // 2)
            ref = ref + t
        got = fused_resblock.__wrapped__(
            x, ws, bs, kernel_size=K, use_scratch=use_scratch,
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref[0]),
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"K={K} scratch={use_scratch}")


def test_conv1d_packed_parity():
    """conv1d_packed (time-packed exact conv, ops/conv.py) must equal
    conv1d across the vocoder's (C, k, d) combos.  The formulation is
    kept as a documented negative result: measured on TPU it LOSES to
    the measured direct/im2col policy inside the full decoder graph
    (block-sparse packed weights waste 2-5x FLOPs), so ResBlock1 no
    longer auto-selects it."""
    from tpu_rvc.ops.conv import conv1d, conv1d_packed

    rng = np.random.default_rng(0)
    for C, p in ((32, 4), (64, 2), (16, 8)):
        for k in (3, 7, 11):
            for d in (1, 3, 5):
                T = 240
                x = jnp.asarray(rng.standard_normal((2, T, C)), jnp.float32)
                w = jnp.asarray(rng.standard_normal((k, C, C)) * 0.1,
                                jnp.float32)
                b = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
                ref = conv1d(x, w, b, padding=(k - 1) // 2 * d, dilation=d)
                got = conv1d_packed(x, w, b, pack=p, dilation=d)
                np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                           rtol=1e-4, atol=1e-4)


def test_pallas_fused_stage_kernel_fp32(rng):
    """Whole-stage kernel (3 resblocks k=3/7/11 + average, one pallas_call)
    vs the unfused module math, fp32 interpret mode."""
    from tpu_rvc.ops.pallas.resblock import fused_stage

    C, T = 64, 700
    Ks = (3, 7, 11)
    x = jnp.asarray(rng.standard_normal((T, C)).astype(np.float32) * 0.3)
    ws, bs = [], []
    rbs = []
    for K in Ks:
        rb = ResBlock1(C, K, (1, 3, 5), weight_norm=False)
        params = rb.init(jax.random.PRNGKey(K), x[None])
        rbs.append((rb, params))
        for i in range(3):
            for cname in (f"c1_{i}", f"c2_{i}"):
                p = params["params"][cname]
                ws.append(p["kernel"])
                bs.append(p["bias"])
    want = sum(rb.apply(p, x[None]) for rb, p in rbs)[0] / 3
    got = fused_stage.__wrapped__(x, tuple(ws), tuple(bs),
                                  kernel_sizes=Ks, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_stage_through_generator(rng):
    """PALLAS_STAGE_CHANNELS toggle routes the generator's resblock stage
    through fused_stage (interpret mode here) with identical params and
    bf16-level numerics vs the unfused graph."""
    from tpu_rvc.nn import modules as mods
    from tpu_rvc.nn.generators import NSFGenerator
    import tpu_rvc.ops.pallas.resblock as rk

    gen = NSFGenerator(
        initial_channel=32, resblock="1",
        resblock_kernel_sizes=(3, 7, 11),
        resblock_dilation_sizes=((1, 3, 5),) * 3,
        upsample_rates=(10, 16), upsample_initial_channel=64,
        upsample_kernel_sizes=(20, 32), gin_channels=16, sr=16000,
        weight_norm=False)
    T = 12
    x = jnp.asarray(rng.standard_normal((1, T, 32)).astype(np.float32) * 0.3)
    f0 = jnp.full((1, T), 220.0, jnp.float32)
    g = jnp.asarray(rng.standard_normal((1, 1, 16)).astype(np.float32))
    params = gen.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        x, f0, g)
    ref = gen.apply(params, x, f0, g, deterministic=True)

    orig = rk.fused_stage

    def interp(*a, **k):
        k["interpret"] = True
        return orig.__wrapped__(*a, **k)

    rk.fused_stage = interp
    mods.PALLAS_STAGE_CHANNELS = frozenset({16, 32})
    try:
        got = gen.apply(params, x, f0, g, deterministic=True)
    finally:
        mods.PALLAS_STAGE_CHANNELS = frozenset()
        rk.fused_stage = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-2, atol=2e-2)
