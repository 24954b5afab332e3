"""Native FCPE (CFNaiveMelPE) tests: torch-oracle forward parity through
the checkpoint loader, local_argmax decode semantics, estimator fallback."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.models.fcpe import (CFNaiveMelPE, latent2cents_local,
                                 cents_to_f0, fcpe_mel, fcpe_infer)
from tpu_rvc.ckpt.fcpe_loader import fcpe_params_from_torch

torch = pytest.importorskip("torch")
import torch.nn as nn
import torch.nn.functional as F


# -- torch construction of the published torchfcpe conv-only architecture --
# (layer/key layout per the public CFNaiveMelPE; used as numeric oracle for
#  the flax port + state-dict mapping, NOT imported from anywhere)

class _Transpose(nn.Module):
    def forward(self, x):
        return x.transpose(1, 2)


class _DepthWiseConv1d(nn.Module):
    def __init__(self, chan, kernel):
        super().__init__()
        pad = kernel // 2
        self.padding = (pad, pad - (kernel + 1) % 2)
        self.conv = nn.Conv1d(chan, chan, kernel, groups=chan)

    def forward(self, x):
        return self.conv(F.pad(x, self.padding))


class _ConformerConvModule(nn.Module):
    def __init__(self, dim, expansion=2, kernel=31):
        super().__init__()
        inner = dim * expansion
        self.net = nn.Sequential(
            nn.LayerNorm(dim), _Transpose(),
            nn.Conv1d(dim, inner * 2, 1), nn.GLU(dim=1),
            _DepthWiseConv1d(inner, kernel), nn.SiLU(),
            nn.Conv1d(inner, dim, 1), _Transpose())

    def forward(self, x):
        return self.net(x)


class _Layer(nn.Module):
    def __init__(self, dim, kernel):
        super().__init__()
        self.conformer = _ConformerConvModule(dim, kernel=kernel)


class _Encoder(nn.Module):
    def __init__(self, dim, n_layers, kernel):
        super().__init__()
        self.encoder_layers = nn.ModuleList(
            [_Layer(dim, kernel) for _ in range(n_layers)])


class _TorchCFN(nn.Module):
    def __init__(self, in_dims, hidden, out_dims, n_layers, kernel=31):
        super().__init__()
        self.input_stem = nn.Sequential(
            nn.Conv1d(in_dims, hidden, 3, 1, 1),
            nn.GroupNorm(4, hidden), nn.LeakyReLU(),
            nn.Conv1d(hidden, hidden, 3, 1, 1))
        self.net = _Encoder(hidden, n_layers, kernel)
        self.norm = nn.LayerNorm(hidden)
        self.output_proj = nn.utils.weight_norm(nn.Linear(hidden, out_dims))

    def forward(self, mel):  # (B, T, M)
        x = self.input_stem(mel.transpose(1, 2)).transpose(1, 2)
        for l in self.net.encoder_layers:
            x = x + l.conformer(x)
        return torch.sigmoid(self.output_proj(self.norm(x)))


def test_fcpe_forward_parity_vs_torch():
    torch.manual_seed(0)
    in_dims, hidden, out_dims, n_layers, kernel = 16, 32, 24, 2, 7
    ref = _TorchCFN(in_dims, hidden, out_dims, n_layers, kernel).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    params = fcpe_params_from_torch(sd, n_layers)
    ours = CFNaiveMelPE(in_dims=in_dims, hidden_dims=hidden,
                        out_dims=out_dims, n_layers=n_layers, kernel=kernel)
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((2, 50, in_dims)).astype(np.float32)
    with torch.no_grad():
        o_ref = ref(torch.from_numpy(mel)).numpy()
    o_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(mel)))
    assert o_ours.shape == o_ref.shape
    err = np.abs(o_ours - o_ref).max()
    assert err < 2e-5, f"FCPE forward mismatch {err}"


def test_fcpe_local_argmax_decode():
    m = CFNaiveMelPE(out_dims=360)
    table = np.asarray(m.cent_table())
    # a sharp peak at bin 100 must decode to ~cent_table[100]
    y = np.full((1, 3, 360), 1e-4, np.float32)
    y[0, 0, 100] = 0.9
    y[0, 1, 100] = 0.9  # voiced
    y[0, 2, :] = 1e-4   # all below threshold -> unvoiced
    cents = np.asarray(latent2cents_local(jnp.asarray(y), jnp.asarray(table),
                                          threshold=0.006))
    f0 = np.asarray(cents_to_f0(jnp.asarray(cents)))
    expect = 10.0 * 2 ** (table[100] / 1200.0)
    assert abs(f0[0, 0] - expect) / expect < 0.02
    assert f0[0, 2] == 0.0  # -inf cents -> 0 Hz


def test_fcpe_infer_tone_shapes_and_estimator():
    """Random-weight end-to-end chain: shapes, finiteness, estimator API."""
    from tpu_rvc.f0.fcpe import FCPE

    m = CFNaiveMelPE(in_dims=128, hidden_dims=32, out_dims=60, n_layers=1)
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 20, 128), jnp.float32))
    wav = (0.5 * np.sin(2 * np.pi * 220 * np.arange(8000) / 16000)
           ).astype(np.float32)
    f0 = fcpe_infer(m, variables, jnp.asarray(wav[None]))
    assert f0.shape == (1, 51)  # center=True: T//hop + 1
    assert np.isfinite(np.asarray(f0)).all()

    est = FCPE(model=m, variables=variables)
    out = est.compute_f0(wav, p_len=50)
    assert out.shape == (50,) and np.isfinite(out).all()

    # no checkpoint, no injected model -> PM fallback stays functional
    est_fb = FCPE(model_path="/nonexistent/fcpe.pt")
    out_fb = est_fb.compute_f0(wav, p_len=50)
    assert out_fb.shape == (50,)
    voiced = out_fb[out_fb > 0]
    assert len(voiced) and abs(np.median(voiced) - 220) < 15
