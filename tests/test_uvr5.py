"""UVR5 separation tests: CascadedASPPNet parity vs the reference torch
implementation and an end-to-end separation smoke on a synthetic mix."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

ref_available = True
try:
    sys.path.insert(0, "/root/reference")
    import types
    import torch
    # stub numba/librosa (absent here) so the reference lib_v5 imports
    for name in ("numba", "librosa"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            if name == "numba":
                stub.jit = lambda *a, **k: (lambda f: f)
            sys.modules[name] = stub
    from infer.lib.uvr5_pack.lib_v5.nets_123821KB import CascadedASPPNet as RefNet
except Exception:  # pragma: no cover
    ref_available = False

from tpu_rvc.models.uvr5 import CascadedASPPNet
from tpu_rvc.ckpt.uvr5_loader import cascaded_aspp_params_from_torch
from tpu_rvc.pipeline.uvr5 import (ModelParameters, UVR5Separator,
                                   combine_spectrograms, _stft_stereo,
                                   cmb_spectrogram_to_wave)


@pytest.mark.skipif(not ref_available, reason="reference repo not available")
def test_cascaded_aspp_parity():
    n_fft = 256  # small F for speed; bins = 128
    torch.manual_seed(0)
    ref = RefNet(n_fft).eval()
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = cascaded_aspp_params_from_torch(sd)
    ours = CascadedASPPNet(n_fft=n_fft)

    rng = np.random.default_rng(0)
    F, T = n_fft // 2 + 1, 96
    x = np.abs(rng.standard_normal((1, 2, F, T))).astype(np.float32)
    with torch.no_grad():
        o_ref = ref(torch.from_numpy(x),
                    aggressiveness={"value": 0.1, "split_bin": 60}).numpy()
    xin = jnp.asarray(np.transpose(x[0], (1, 2, 0))[None])  # NHWC
    o_ours = ours.apply({"params": params}, xin, aggressiveness=(0.1, 60))
    o_ours = np.transpose(np.asarray(o_ours)[0], (2, 0, 1))[None]
    err = np.abs(o_ours - o_ref).max()
    assert err < 2e-4, f"uvr5 mask mismatch {err}"


def test_band_combine_invertibility():
    """combine -> split -> istft reconstructs audio within filter tolerance."""
    mp = ModelParameters("4band_v2.json")
    rng = np.random.default_rng(1)
    sr = mp.param["sr"]
    t = np.arange(sr) / sr
    wave = np.stack([np.sin(2 * np.pi * 440 * t),
                     np.sin(2 * np.pi * 330 * t)]).astype(np.float32)
    from tpu_rvc.pipeline.uvr5 import _resample
    x_wave, x_spec = {}, {}
    bands_n = len(mp.param["band"])
    for d in range(bands_n, 0, -1):
        bp = mp.param["band"][d]
        if d == bands_n:
            x_wave[d] = wave
        else:
            x_wave[d] = _resample(x_wave[d + 1],
                                  mp.param["band"][d + 1]["sr"], bp["sr"])
        x_spec[d] = _stft_stereo(x_wave[d], bp["n_fft"], bp["hl"])
    spec_m = combine_spectrograms(x_spec, mp)
    assert spec_m.shape[1] == mp.param["bins"] + 1
    out = cmb_spectrogram_to_wave(spec_m, mp)  # (T, 2)
    assert out.shape[1] == 2
    # mid-band content preserved: 440 Hz must dominate channel 0
    seg = out[sr // 4: sr // 2, 0]
    spec = np.abs(np.fft.rfft(seg))
    peak_hz = np.argmax(spec) * sr / len(seg)
    assert abs(peak_hz - 440) < 8


def test_separator_end_to_end(tmp_path):
    """Random-weight separation smoke: shapes and finiteness."""
    mp = ModelParameters("4band_v2.json")
    n_fft = mp.param["bins"] * 2
    model = CascadedASPPNet(n_fft=n_fft, offset=8)  # small offset for speed
    F = mp.param["bins"] + 1
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, F, 32, 2)))
    sep = UVR5Separator(model, variables, mp, agg=10, tta=False,
                        window_size=32)
    sr = mp.param["sr"]
    t = np.arange(sr) / sr
    mix = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    from tpu_rvc.audio.io import save_wav
    p = str(tmp_path / "mix.wav")
    save_wav(p, mix, sr)
    ins, voc, out_sr = sep.separate(p)
    assert out_sr == sr
    assert ins.shape[1] == 2 and voc.shape[1] == 2
    assert np.isfinite(ins).all() and np.isfinite(voc).all()


@pytest.mark.skipif(not ref_available, reason="reference repo not available")
def test_deecho_cascadednet_parity():
    from infer.lib.uvr5_pack.lib_v5.nets import CascadedNet as RefDeEcho
    from tpu_rvc.models.uvr5 import CascadedNetDeEcho
    from tpu_rvc.ckpt.uvr5_loader import deecho_params_from_torch

    n_fft = 256
    torch.manual_seed(1)
    ref = RefDeEcho(n_fft, nout=16, nout_lstm=32).eval()
    for m in ref.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = deecho_params_from_torch(sd)
    ours = CascadedNetDeEcho(n_fft=n_fft, nout=16, nout_lstm=32)

    rng = np.random.default_rng(3)
    F, T = n_fft // 2 + 1, 64
    x = np.abs(rng.standard_normal((1, 2, F, T))).astype(np.float32)
    with torch.no_grad():
        mask_ref = ref(torch.from_numpy(x)).numpy()
    xin = jnp.asarray(np.transpose(x[0], (1, 2, 0))[None])
    out = ours.apply({"params": params}, xin)
    # ours returns mask*mix; reference returns the mask
    mask_ours = np.transpose(np.asarray(out)[0], (2, 0, 1))[None] / \
        np.maximum(x, 1e-9)
    err = np.abs(mask_ours - mask_ref).max()
    assert err < 5e-4, f"DeEcho mask mismatch {err}"


def test_mdxnet_demix_machinery(tmp_path):
    """MDX demix flow with an identity model: STFT<->iSTFT roundtrip through
    the chunk/margin/denoise machinery must approximately reconstruct."""
    from tpu_rvc.pipeline.mdxnet import ConvTDFSpec, MDXPredictor

    spec = ConvTDFSpec(dim_f=1024, dim_t=6, n_fft=2048, hop=512)
    pred = MDXPredictor(lambda s: s, spec, chunks=1, margin=4410,
                        denoise=True)
    sr = 44100
    t = np.arange(2 * sr) / sr
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.5
    out = pred.demix(mix)[0]
    assert out.shape == mix.shape
    # identity model -> output approximates input up to high-freq crop
    interior = slice(sr // 4, -sr // 4)
    err = np.abs(out[:, interior] - mix[:, interior]).max()
    assert err < 0.05, err


def test_mdxnet_demix_through_onnx(tmp_path):
    """Full C44 path: a Conv-TDF-style ONNX graph (written by our own
    exporter) loaded with OnnxModule and driven through demix — the exact
    flow MDXNetDereverb runs on the real vocals.onnx asset
    (reference mdxnet.py:92-105 onnxruntime session -> demix_base)."""
    import jax
    import jax.numpy as jnp
    from tpu_rvc.ckpt.jax2onnx import export_fn_to_onnx
    from tpu_rvc.models.onnx_exec import OnnxModule
    from tpu_rvc.pipeline.mdxnet import ConvTDFSpec, MDXPredictor

    spec = ConvTDFSpec(dim_f=1024, dim_t=6, n_fft=2048, hop=512)
    # tiny conv "denoiser": 4ch spectrogram -> 4ch, near-identity init
    w_np = 0.01 * np.random.RandomState(0).randn(4, 4, 3, 3)
    w_np[:, :, 1, 1] += np.eye(4)  # identity at the center tap
    w = jnp.asarray(w_np, jnp.float32)

    def model(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"))

    # demix of 1 s @44.1k with this spec batches 2 windows per chunk
    sr = 44100
    gen = spec.chunk_size - 2 * spec.trim
    pad = gen - sr % gen
    n_windows = (sr + pad) // gen
    xshape = (n_windows, 4, spec.dim_f, spec.dim_t)
    p = str(tmp_path / "vocals.onnx")
    data = export_fn_to_onnx(model, w, [jnp.zeros(xshape, jnp.float32)],
                             ["input"], ["output"])
    open(p, "wb").write(data)

    pred = MDXPredictor(OnnxModule.from_file(p), spec, chunks=1,
                        margin=4410, denoise=True)
    t = np.arange(sr) / sr
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.5
    out = pred.demix(mix)[0]
    assert out.shape == mix.shape
    assert np.isfinite(out).all()
    # near-identity model -> output close to input away from chunk edges
    interior = slice(sr // 4, -sr // 4)
    err = np.abs(out[:, interior] - mix[:, interior]).max()
    assert err < 0.2, err


def test_load_separator_dispatch(monkeypatch):
    """Model-name routing parity with reference vr.py:22-39 / modules.py:27."""
    import tpu_rvc.pipeline.uvr5 as u
    import tpu_rvc.ckpt.uvr5_loader as ld

    calls = {}

    class _Dummy:
        offset = 8

    def _fake(kind):
        def f(p, n_fft=0):
            calls[kind] = n_fft
            return _Dummy(), {}
        return f

    monkeypatch.setattr(ld, "load_cascaded_aspp", _fake("aspp"))
    monkeypatch.setattr(ld, "load_deecho", _fake("deecho"))

    sep = u.load_separator("/x/HP5_only_main_vocal.pth")
    assert isinstance(sep, u.UVR5Separator) and not sep.is_reverse
    assert calls["aspp"] == 1344  # 4band_v2 bins*2

    sep = u.load_separator("/x/HP3_all_vocals.pth")
    assert sep.is_reverse  # HP3 swaps outputs

    sep = u.load_separator("/x/VR-DeEchoDeReverb.pth")
    assert sep.is_reverse
    assert calls["deecho"] == 1344  # 4band_v3 bins*2
    assert sep.mp.param["bins"] == 672

    with pytest.raises(FileNotFoundError):
        u.load_separator("/x/onnx_dereverb_By_FoxJoy")  # needs vocals.onnx


def _author_conv_tdf_clone(dim_f=3072, dim_t_frames=512, c=8):
    """Hand-author a Conv-TDF UNet ONNX graph with the op inventory of the
    published vocals.onnx (kuielab Conv-TDF exported from torch: Conv /
    BatchNormalization / Relu / MatMul+Add TDF linears / ConvTranspose
    upsample / Concat skips / Transpose+Reshape plumbing) at the EXACT
    ConvTDFNetTrim I/O dims (reference mdxnet.py:15-60, 225-240:
    dim_f=3072, dim_t=9 -> 512 frames, dim_c=4), with thin channels so it
    runs on CPU.  Returns serialized ModelProto bytes."""
    from tpu_rvc.ckpt.jax2onnx import _Builder
    from tpu_rvc.ckpt.onnx_reader import encode_model

    rng = np.random.RandomState(0)
    b = _Builder()

    def conv(x, cin, cout, stride=1):
        w = b.const((0.1 * rng.randn(cout, cin, 3, 3)).astype(np.float32))
        bias = b.const(np.zeros(cout, np.float32))
        return b.node("Conv", [x, w, bias], strides=[stride, stride],
                      pads=[1, 1, 1, 1])[0]

    def bn_relu(x, ch):
        scale = b.const(np.ones(ch, np.float32))
        bias = b.const(np.zeros(ch, np.float32))
        mean = b.const(np.zeros(ch, np.float32))
        var = b.const(np.ones(ch, np.float32))
        y = b.node("BatchNormalization", [x, scale, bias, mean, var],
                   epsilon=1e-5)[0]
        return b.node("Relu", [y])[0]

    def tdf(x, ch, f):
        """Time-Distributed-Fullyconnected over the freq axis: the MDX
        hallmark block (Linear f->f/16->f as MatMul+Add pairs)."""
        t = b.node("Transpose", [x], perm=[0, 1, 3, 2])[0]  # (B,C,T,F)
        w1 = b.const((0.05 * rng.randn(f, f // 16)).astype(np.float32))
        b1 = b.const(np.zeros(f // 16, np.float32))
        h = b.node("MatMul", [t, w1])[0]
        h = b.node("Add", [h, b1])[0]
        h = b.node("Relu", [h])[0]
        w2 = b.const((0.05 * rng.randn(f // 16, f)).astype(np.float32))
        b2 = b.const(np.zeros(f, np.float32))
        h = b.node("MatMul", [h, w2])[0]
        h = b.node("Add", [h, b2])[0]
        h = b.node("Add", [h, t])[0]  # residual
        return b.node("Transpose", [h], perm=[0, 1, 3, 2])[0]

    x0 = "input"
    # encoder level 1
    e1 = bn_relu(conv(x0, 4, c), c)
    e1 = tdf(e1, c, dim_f)
    # downsample
    d1 = bn_relu(conv(e1, c, 2 * c, stride=2), 2 * c)
    d1 = tdf(d1, 2 * c, dim_f // 2)
    # bottleneck
    mid = bn_relu(conv(d1, 2 * c, 2 * c), 2 * c)
    # upsample (ConvTranspose) + skip concat
    wu = b.const((0.1 * rng.randn(2 * c, c, 2, 2)).astype(np.float32))
    up = b.node("ConvTranspose", [mid, wu], strides=[2, 2])[0]
    up = bn_relu(up, c)
    cat = b.node("Concat", [up, e1], axis=1)[0]
    out = conv(cat, 2 * c, 4)
    b.node("Identity", [out], outputs=["output"])

    shape = (1, 4, dim_f, dim_t_frames)
    return encode_model(b.nodes, b.initializers,
                        [("input", 1, shape)], [("output", 1, shape)])


def test_mdxnet_published_dims_and_op_inventory(tmp_path):
    """C44 on its real payload shape: a dimension-exact Conv-TDF clone
    (dim_f=3072, dim_t=2^9, n_fft=6144 — the published vocals.onnx
    contract, reference mdxnet.py:225-240) with the published op
    inventory, executed through onnx_reader -> OnnxModule -> full demix
    with the reference's chunk margins."""
    from tpu_rvc.models.onnx_exec import OnnxModule
    from tpu_rvc.pipeline.mdxnet import ConvTDFSpec, MDXPredictor

    spec = ConvTDFSpec(dim_f=3072, dim_t=9, n_fft=6144, hop=1024)
    assert spec.chunk_size == 1024 * (2 ** 9 - 1)  # reference chunk math

    data = _author_conv_tdf_clone(dim_f=3072,
                                  dim_t_frames=2 ** 9, c=4)
    p = str(tmp_path / "vocals.onnx")
    open(p, "wb").write(data)
    mod = OnnxModule.from_file(p)
    ops = {n.op_type for n in mod.graph.nodes}
    must = {"Conv", "ConvTranspose", "BatchNormalization", "Relu",
            "MatMul", "Add", "Concat", "Transpose"}
    assert must <= ops, f"missing {must - ops}"

    pred = MDXPredictor(mod, spec, chunks=1, margin=44100, denoise=True)
    sr = 44100
    t = np.arange(sr) / sr
    mix = np.stack([np.sin(2 * np.pi * 440 * t),
                    np.sin(2 * np.pi * 330 * t)]).astype(np.float32) * 0.5
    out = pred.demix(mix)[0]
    assert out.shape == mix.shape
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-5  # the net actually produced signal


def test_device_separator_matches_host_path(tmp_path):
    """The fused device-resident separation graph (DeviceSeparator) must
    reproduce the host-orchestrated path (UVR5Separator.separate) on the
    same weights/input.  Residual tolerance covers the two deliberate
    differences: the device windowed-sinc band resampler vs scipy
    resample_poly, and int16 output quantization (reference flow:
    vr.py:51-173)."""
    from tpu_rvc.pipeline.uvr5 import DeviceSeparator

    mp = ModelParameters("4band_v2.json")
    n_fft = mp.param["bins"] * 2
    model = CascadedASPPNet(n_fft=n_fft, offset=8)
    F = mp.param["bins"] + 1
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, F, 32, 2)))
    sep = UVR5Separator(model, variables, mp, agg=10, tta=True,
                        window_size=32)
    sr = mp.param["sr"]
    t = np.arange(sr) / sr
    rng = np.random.default_rng(7)
    mix = (0.4 * np.sin(2 * np.pi * 440 * t)
           + 0.2 * np.sin(2 * np.pi * 1320 * t)
           + 0.05 * rng.standard_normal(sr)).astype(np.float32)
    from tpu_rvc.audio.io import save_wav
    p = str(tmp_path / "mix.wav")
    save_wav(p, mix, sr)

    ins_h, voc_h, sr_h = sep.separate(p)
    dev = DeviceSeparator(sep, bucket_s=1.0)
    ins_d, voc_d, sr_d = dev.separate(p)
    assert sr_d == sr_h
    n = min(len(ins_h), len(ins_d))
    assert n > 0.9 * sr
    for a, b, nm in ((ins_h, ins_d, "ins"), (voc_h, voc_d, "voc")):
        a = a[:n].astype(np.float64)
        b = b[:n].astype(np.float64) / 32768.0
        rel = np.linalg.norm(a - b) / max(np.linalg.norm(a), 1e-9)
        assert rel < 0.05, f"{nm}: rel residual {rel:.4f}"

    # non-fetch mode returns device arrays + true output length
    i2, v2, sr2, n2 = dev.separate(p, fetch=False)
    assert sr2 == sr_d and 0 < n2 <= i2.shape[0]
    np.testing.assert_array_equal(np.asarray(i2)[:n2], ins_d[:n])
