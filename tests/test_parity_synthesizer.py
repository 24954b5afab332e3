"""Golden parity: our flax synthesizer vs the reference torch implementation.

The reference repo (read-only at /root/reference) is imported as a test
oracle: we initialize its torch modules, convert the state_dict with
ckpt.convert, run both stacks on identical inputs with all stochastic terms
zeroed, and require waveform-level agreement.  Skipped when the reference
tree is unavailable.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REF = "/root/reference"
ref_available = True
try:
    sys.path.insert(0, REF)
    import torch
    from rvc.layers.synthesizers import SynthesizerTrnMsNSFsid
except Exception:  # pragma: no cover
    ref_available = False

pytestmark = pytest.mark.skipif(not ref_available,
                                reason="reference repo not available")

from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.ckpt.convert import (
    synthesizer_params_from_state_dict,
    state_dict_from_synthesizer_params,
    normalize_weight_norm_keys,
)

# small-but-structured config: 2 attn layers, 2 upsample stages
CFG = dict(
    spec_channels=129, segment_size=640, inter_channels=64,
    hidden_channels=64, filter_channels=128, n_heads=2, n_layers=2,
    kernel_size=3, p_dropout=0.0, resblock="1",
    resblock_kernel_sizes=(3, 7, 11),
    resblock_dilation_sizes=((1, 3, 5), (1, 3, 5), (1, 3, 5)),
    upsample_rates=(4, 4), upsample_initial_channel=128,
    upsample_kernel_sizes=(8, 8), spk_embed_dim=4, gin_channels=32,
    sr=16000, encoder_dim=256, use_f0=True,
)


def build_pair(seed=7):
    torch.manual_seed(seed)
    ref = SynthesizerTrnMsNSFsid(
        CFG["spec_channels"], CFG["segment_size"] // 16,  # seg in frames
        CFG["inter_channels"], CFG["hidden_channels"], CFG["filter_channels"],
        CFG["n_heads"], CFG["n_layers"], CFG["kernel_size"], 0, "1",
        list(CFG["resblock_kernel_sizes"]),
        [list(d) for d in CFG["resblock_dilation_sizes"]],
        list(CFG["upsample_rates"]), CFG["upsample_initial_channel"],
        list(CFG["upsample_kernel_sizes"]), CFG["spk_embed_dim"],
        CFG["gin_channels"], CFG["sr"], CFG["encoder_dim"], True,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = synthesizer_params_from_state_dict(
        sd, n_layers=CFG["n_layers"], n_ups=2, use_f0=True,
        has_enc_q=True, fold_weight_norm=True, strict=True)
    ours = Synthesizer(**{**CFG, "weight_norm": False})
    return ref, ours, {"params": params}


def make_inputs(T=32, B=1, seed=3):
    rng = np.random.default_rng(seed)
    phone = rng.standard_normal((B, T, CFG["encoder_dim"])).astype(np.float32)
    pitch = rng.integers(1, 255, (B, T)).astype(np.int64)
    pitchf = rng.uniform(100, 400, (B, T)).astype(np.float32)
    lengths = np.full((B,), T, np.int64)
    sid = np.zeros((B,), np.int64)
    return phone, pitch, pitchf, lengths, sid


def zero_noise(monkeypatch):
    monkeypatch.setattr(torch, "randn_like", lambda t: torch.zeros_like(t))
    _rand = torch.rand

    def fake_rand(*a, **k):
        return torch.zeros(*a, **k) if a and isinstance(a[0], int) else _rand(*a, **k)

    monkeypatch.setattr(torch, "rand", fake_rand)


def test_infer_full_parity(monkeypatch):
    zero_noise(monkeypatch)
    ref, ours, variables = build_pair()
    phone, pitch, pitchf, lengths, sid = make_inputs()
    with torch.no_grad():
        o_ref = ref.infer(torch.from_numpy(phone), torch.from_numpy(lengths),
                          torch.from_numpy(sid), torch.from_numpy(pitch),
                          torch.from_numpy(pitchf))
    o_ref = o_ref.numpy()[:, 0, :]  # (B, T_audio)
    o_ours = ours.apply(variables, phone, jnp.asarray(lengths),
                        jnp.asarray(sid), jnp.asarray(pitch.astype(np.int32)),
                        jnp.asarray(pitchf), deterministic=True,
                        method=Synthesizer.infer)
    o_ours = np.asarray(o_ours)[:, :, 0]
    assert o_ours.shape == o_ref.shape
    err = np.abs(o_ours - o_ref).max()
    assert err < 5e-4, f"waveform mismatch: max abs err {err}"


def test_infer_streaming_parity(monkeypatch):
    """skip_head / return_length / return_length2 contract."""
    zero_noise(monkeypatch)
    ref, ours, variables = build_pair()
    phone, pitch, pitchf, lengths, sid = make_inputs(T=64)
    skip_head, return_length, return_length2 = 32, 24, 24
    with torch.no_grad():
        o_ref = ref.infer(torch.from_numpy(phone), torch.from_numpy(lengths),
                          torch.from_numpy(sid), torch.from_numpy(pitch),
                          torch.from_numpy(pitchf), skip_head=skip_head,
                          return_length=return_length,
                          return_length2=return_length2)
    o_ref = o_ref.numpy()[:, 0, :]
    o_ours = ours.apply(variables, phone, jnp.asarray(lengths),
                        jnp.asarray(sid), jnp.asarray(pitch.astype(np.int32)),
                        jnp.asarray(pitchf), skip_head=skip_head,
                        return_length=return_length,
                        return_length2=return_length2,
                        deterministic=True, method=Synthesizer.infer)
    o_ours = np.asarray(o_ours)[:, :, 0]
    assert o_ours.shape == o_ref.shape
    err = np.abs(o_ours - o_ref).max()
    assert err < 5e-4, f"streaming waveform mismatch: max abs err {err}"


def test_state_dict_roundtrip():
    """export(import(sd)) == sd for every key (fold-free path)."""
    ref, _, _ = build_pair()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    sd_norm = normalize_weight_norm_keys(sd)
    params = synthesizer_params_from_state_dict(
        sd_norm, n_layers=CFG["n_layers"], n_ups=2, use_f0=True,
        has_enc_q=True, fold_weight_norm=False, strict=True)
    back = state_dict_from_synthesizer_params({"params": params}, use_f0=True)
    missing = set(sd_norm) - set(back) - {k for k in sd_norm if "enc_q" in k}
    assert not missing, f"missing {sorted(missing)[:6]}"
    for k, v in back.items():
        np.testing.assert_allclose(v, sd_norm[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_mcd_vs_reference(monkeypatch):
    """BASELINE acceptance framing: MCD between our output and the
    reference's output on identical inputs/weights must be << 0.1 dB."""
    from tpu_rvc.utils.mcd import mcd
    zero_noise(monkeypatch)
    ref, ours, variables = build_pair()
    phone, pitch, pitchf, lengths, sid = make_inputs(T=120)
    with torch.no_grad():
        o_ref = ref.infer(torch.from_numpy(phone), torch.from_numpy(lengths),
                          torch.from_numpy(sid), torch.from_numpy(pitch),
                          torch.from_numpy(pitchf)).numpy()[0, 0]
    o_ours = np.asarray(ours.apply(
        variables, phone, jnp.asarray(lengths), jnp.asarray(sid),
        jnp.asarray(pitch.astype(np.int32)), jnp.asarray(pitchf),
        deterministic=True, method=Synthesizer.infer))[0, :, 0]
    d = mcd(o_ours, o_ref, CFG["sr"])
    assert d < 0.01, f"MCD {d:.4f} dB"  # target is < 0.1 dB; we are ~0
