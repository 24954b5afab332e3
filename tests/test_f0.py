"""f0 stack tests: estimators on synthetic tones, post-process parity with
the reference numba kernel's math, and RMVPE model parity vs the reference
torch implementation (random-init, eval mode)."""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.f0.base import interpolate_f0, resize_f0, post_process, coarse_f0
from tpu_rvc.f0.pm import PM
from tpu_rvc.f0.dio import Dio
from tpu_rvc.f0.harvest import Harvest
from tpu_rvc.f0.gen import Generator


def tone(f0_hz, sr=16000, dur=1.0, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * f0_hz * t)).astype(np.float32)


def test_interpolate_f0_gap_fill():
    f0 = np.array([0, 0, 100, 0, 0, 0, 200, 0, 0], np.float32)
    out, uv = interpolate_f0(f0)
    assert out[0] == out[1] == 100          # leading edge-hold
    np.testing.assert_allclose(out[2:7], [100, 125, 150, 175, 200])
    assert out[7] == out[8] == 200          # trailing edge-hold
    np.testing.assert_array_equal(uv, f0 > 0)


def test_resize_f0_matches_reference_formula():
    x = np.array([100.0, 0.0, 200.0, 300.0], np.float32)
    # oracle: reference f0.py:69
    source = x.copy().astype(np.float64)
    source[source < 0.001] = np.nan
    target = np.interp(
        np.arange(0, len(source) * 7, len(source)) / 7,
        np.arange(0, len(source)), source)
    oracle = np.nan_to_num(target)
    np.testing.assert_allclose(resize_f0(x, 7), oracle, rtol=1e-6)


def test_coarse_f0_range_and_monotonicity():
    f0 = np.linspace(0, 1200, 500)
    c = coarse_f0(f0)
    assert c.min() >= 1 and c.max() <= 255
    assert (np.diff(c[f0 > 50]) >= 0).all()
    # reference formula check at a known point
    mel = 1127 * np.log(1 + 440.0 / 700)
    mel_min = 1127 * np.log(1 + 50.0 / 700)
    mel_max = 1127 * np.log(1 + 1100.0 / 700)
    expect = np.rint((mel - mel_min) * 254 / (mel_max - mel_min) + 1)
    assert coarse_f0(np.array([440.0]))[0] == expect


def test_post_process_transpose():
    f0 = np.full(100, 220.0)
    _, f0_out = post_process(100, f0, 12, 0)  # +1 octave
    np.testing.assert_allclose(f0_out, 440.0, rtol=1e-6)


@pytest.mark.parametrize("est_cls,tol_hz", [(PM, 3.0), (Dio, 3.0), (Harvest, 3.0)])
@pytest.mark.parametrize("hz", [110.0, 220.0, 440.0])
def test_estimators_recover_tone(est_cls, tol_hz, hz):
    est = est_cls(160, 50, 1100, 16000)
    f0 = est.compute_f0(tone(hz), p_len=100)
    assert f0.shape == (100,)
    mid = f0[20:80]
    assert np.abs(np.median(mid) - hz) < tol_hz, \
        f"{est_cls.__name__} got {np.median(mid)} for {hz}"


def test_estimator_silence_is_unvoiced():
    est = PM(160, 50, 1100, 16000)
    f0 = est.compute_f0(np.zeros(16000, np.float32), p_len=100)
    assert np.all(f0 == 0)


def test_generator_dispatch_pm():
    gen = Generator(window=160, sr=16000)
    coarse, f0 = gen.calculate(tone(220.0), 100, 0, "pm", None)
    assert coarse.shape == (100,) and f0.shape == (100,)
    assert coarse.dtype == np.int32
    assert 1 <= coarse.min() and coarse.max() <= 255
    assert abs(np.median(f0[20:80]) - 220) < 3


# ---------------------------------------------------------------------------
# RMVPE parity vs the reference torch implementation
# ---------------------------------------------------------------------------

ref_available = True
try:
    sys.path.insert(0, "/root/reference")
    import torch
    # stub numba (absent in this env) so the reference f0 package imports;
    # we only need its torch E2E module, not the numba kernels
    import types
    if "numba" not in sys.modules:
        numba_stub = types.ModuleType("numba")
        numba_stub.jit = lambda *a, **k: (lambda f: f)
        sys.modules["numba"] = numba_stub
    from rvc.f0.e2e import E2E as RefE2E
except Exception:  # pragma: no cover
    ref_available = False


@pytest.mark.skipif(not ref_available, reason="reference repo not available")
def test_rmvpe_e2e_parity():
    torch.manual_seed(0)
    ref = RefE2E(4, 1, (2, 2)).eval()
    # randomize BN running stats so folding is actually exercised
    for m in ref.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    from tpu_rvc.ckpt.rmvpe_loader import rmvpe_params_from_torch
    from tpu_rvc.models.rmvpe import E2E

    params = rmvpe_params_from_torch(sd)
    ours = E2E()
    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 128, 64)).astype(np.float32)
    with torch.no_grad():
        o_ref = ref(torch.from_numpy(mel)).numpy()
    o_ours = np.asarray(ours.apply({"params": params}, jnp.asarray(mel)))
    assert o_ours.shape == o_ref.shape
    err = np.abs(o_ours - o_ref).max()
    assert err < 2e-4, f"RMVPE mismatch {err}"


@pytest.mark.skipif(not ref_available, reason="reference repo not available")
def test_rmvpe_estimator_end_to_end_tone():
    """Full estimator path with random weights: shapes + decode mechanics."""
    from tpu_rvc.models.rmvpe import E2E
    from tpu_rvc.f0.rmvpe import RMVPE, rmvpe_mel

    mel = rmvpe_mel(jnp.zeros((1, 16000)))
    assert mel.shape == (1, 128, 101)  # center=True: T//hop + 1

    m = E2E()
    variables = m.init(jax.random.PRNGKey(0),
                       jnp.zeros((1, 128, 32), jnp.float32))
    est = RMVPE(variables=variables)
    f0 = est.compute_f0(tone(220.0), p_len=100)
    assert f0.shape == (100,)
    assert np.isfinite(f0).all()


def test_device_f0_matches_host_path():
    """pm_f0_device must reproduce the host pm -> interpolate ->
    post_process chain."""
    import jax.numpy as jnp
    from tpu_rvc.f0.device import (pm_f0_device, interpolate_f0_jax,
                                   post_process_jax)

    # interpolation parity on a gappy track
    f0 = np.array([0, 0, 100, 0, 0, 0, 200, 0, 150, 0], np.float32)
    host, _ = interpolate_f0(f0)
    dev = np.asarray(interpolate_f0_jax(jnp.asarray(f0)))
    np.testing.assert_allclose(dev, host, rtol=1e-6)
    # all-unvoiced passthrough
    assert np.all(np.asarray(interpolate_f0_jax(jnp.zeros(8))) == 0)

    # quantization parity
    f0c = np.linspace(0, 900, 64).astype(np.float32)
    c_host, f_host = post_process(100, f0c.copy(), 5, 0)
    c_dev, f_dev = post_process_jax(jnp.asarray(f0c), jnp.asarray(5.0))
    np.testing.assert_array_equal(np.asarray(c_dev), c_host)
    np.testing.assert_allclose(np.asarray(f_dev), f_host, rtol=1e-5)

    # full device chain vs host chain on a real tone
    wav = tone(220.0)
    p_len = 100
    gen = Generator(window=160, sr=16000)
    c_h, f_h = gen.calculate(wav, p_len, 2, "pm", None)
    c_d, f_d = pm_f0_device(jnp.asarray(wav), p_len, jnp.asarray(2.0))
    c_d, f_d = np.asarray(c_d), np.asarray(f_d)
    assert c_d.shape == (p_len,)
    # voiced interior must agree closely (edges may differ by a frame)
    np.testing.assert_allclose(f_d[10:90], f_h[10:90], rtol=2e-3)
    assert (np.abs(c_d[10:90].astype(int) - c_h[10:90].astype(int)) <= 1).all()


def test_world_dio_harmonic_rich_and_vibrato():
    """WORLD-style DIO: correct on harmonic-rich sources (where naive
    autocorrelation octave-errors), unvoiced on silence/noise, vibrato
    tracked."""
    from tpu_rvc.f0.world import dio as world_dio, stonemask, harvest

    sr = 16000
    t = np.arange(sr) / sr
    for hz in (110.0, 233.7, 391.1):
        saw = (2 * ((hz * t) % 1.0) - 1).astype(np.float32)
        f0, times = world_dio(saw, sr)
        v = f0[20:80]
        assert (v > 0).all()
        assert abs(np.median(v) - hz) < 3.0, (hz, np.median(v))
        refined = stonemask(saw, sr, f0, times)
        assert abs(np.median(refined[20:80]) - hz) < 3.0

    # silence and white noise must be unvoiced almost everywhere
    f0s, _ = world_dio(np.zeros(sr, np.float32), sr)
    assert (f0s > 0).sum() == 0
    rng_l = np.random.default_rng(0)
    f0n, _ = world_dio(rng_l.standard_normal(sr).astype(np.float32), sr)
    assert (f0n > 0).mean() < 0.2

    # vibrato: phase 220t + sin(2pi 5t) -> inst freq 220 +- 10pi Hz
    vib = np.sin(2 * np.pi * (220 * t + 1.0 * np.sin(2 * np.pi * 5 * t))
                 ).astype(np.float32)
    f0v, _ = harvest(vib, sr)
    voiced = f0v[f0v > 0]
    assert 180 < voiced.min() and voiced.max() < 260
    assert voiced.max() - voiced.min() > 30  # modulation tracked


def test_rmvpe_device_decode_matches_host():
    """Device-side RMVPE decode/resize parity vs the host numpy path."""
    from tpu_rvc.f0.device import to_local_average_cents_jax, resize_f0_jax
    from tpu_rvc.f0.rmvpe import to_local_average_cents

    rng_l = np.random.default_rng(7)
    sal = rng_l.uniform(0, 1, (40, 360)).astype(np.float32)
    sal[5] *= 0.01  # below-threshold frame
    host = to_local_average_cents(sal, threshold=0.05)
    dev = np.asarray(to_local_average_cents_jax(jnp.asarray(sal), 0.05))
    np.testing.assert_allclose(dev, host, rtol=1e-5)

    f0 = np.array([100.0, 0.0, 200.0, 300.0, 250.0], np.float32)
    host_r = resize_f0(f0, 12)
    dev_r = np.asarray(resize_f0_jax(jnp.asarray(f0), 12))
    np.testing.assert_allclose(dev_r, host_r, rtol=1e-4, atol=1e-3)


def test_rmvpe_f0_device_full_chain_matches_host():
    """rmvpe_f0_device (mel -> E2E -> decode -> resize -> interpolate ->
    post_process, all in-graph) vs the host RMVPE estimator + gen chain,
    sharing one set of random E2E weights."""
    from tpu_rvc.models.rmvpe import E2E
    from tpu_rvc.f0.rmvpe import RMVPE
    from tpu_rvc.f0.device import rmvpe_f0_device

    m = E2E()
    variables = m.init(jax.random.PRNGKey(3),
                       jnp.zeros((1, 128, 32), jnp.float32))
    est = RMVPE(variables=variables)

    wav = tone(196.0, dur=1.0)
    p_len = 100
    f0_host = est.compute_f0(wav, p_len=p_len)
    c_h, f_h = post_process(100, f0_host.copy(), 2, 0)

    c_d, f_d = jax.jit(
        lambda v, w: rmvpe_f0_device(w, p_len, jnp.asarray(2.0), m, v)
    )(variables, jnp.asarray(wav))
    c_d, f_d = np.asarray(c_d), np.asarray(f_d)
    assert c_d.shape == (p_len,)
    np.testing.assert_allclose(f_d, f_h, rtol=1e-3, atol=0.5)
    assert (np.abs(c_d.astype(int) - c_h.astype(int)) <= 1).all()


# ---------------------------------------------------------------------------
# Quantitative dio/harvest accuracy on speech-like audio (VERDICT r1 #7).
# The reference leans on pyworld's C++ (rvc/f0/dio.py:9, harvest.py:10);
# these tests hold the native ports to a numeric standard on a formant-rich
# synthetic voice with an analytically known f0 track.
# ---------------------------------------------------------------------------

def _speech_like(sr=16000, dur=2.0, f0_lo=110.0, f0_hi=180.0,
                 vib_hz=5.0, vib_depth=0.02, noise_db=-30.0, seed=0):
    """Formant-rich voiced 'speech': band-limited sawtooth source with a
    gliding + vibrato f0 track, shaped by three formant resonators
    (700/1200/2600 Hz), plus noise; leading/trailing silence for UV
    checks.  Returns (audio, gt_f0_per_sample)."""
    n = int(sr * dur)
    t = np.arange(n) / sr
    # instantaneous f0: linear glide + vibrato
    f0 = (f0_lo + (f0_hi - f0_lo) * t / dur) * \
        (1.0 + vib_depth * np.sin(2 * np.pi * vib_hz * t))
    phase = 2 * np.pi * np.cumsum(f0) / sr
    # band-limited sawtooth: harmonics to 6 kHz with 1/k rolloff
    x = np.zeros(n)
    k = 1
    while k * f0.max() < 6000:
        x += np.sin(k * phase) / k
        k += 1
    # formant shaping: three biquad resonators in parallel
    y = np.zeros(n)
    for fc, bw, g in ((700, 130, 1.0), (1200, 180, 0.7), (2600, 300, 0.4)):
        r = np.exp(-np.pi * bw / sr)
        th = 2 * np.pi * fc / sr
        b0 = (1 - r) * np.sqrt(1 - 2 * r * np.cos(2 * th) + r * r)
        a1, a2 = -2 * r * np.cos(th), r * r
        z1 = z2 = 0.0
        out = np.empty(n)
        for i in range(n):  # tiny IIR, host-side fixture generation only
            w = x[i] - a1 * z1 - a2 * z2
            out[i] = b0 * w
            z2, z1 = z1, w
        y += g * out
    y /= np.abs(y).max()
    rng = np.random.default_rng(seed)
    y += 10 ** (noise_db / 20) * rng.standard_normal(n)
    # 150 ms silence head/tail (UV ground truth)
    sil = int(0.15 * sr)
    y[:sil] = 10 ** (noise_db / 20) * rng.standard_normal(sil)
    y[-sil:] = 10 ** (noise_db / 20) * rng.standard_normal(sil)
    gt = f0.copy()
    gt[:sil] = 0.0
    gt[-sil:] = 0.0
    return y.astype(np.float32), gt


def _cents_errors(f0_est, times_s, gt_per_sample, sr):
    """Per-frame cents error on frames voiced in BOTH est and truth."""
    idx = np.clip((times_s * sr).astype(int), 0, len(gt_per_sample) - 1)
    gt = gt_per_sample[idx]
    both = (f0_est > 0) & (gt > 0)
    cents = 1200 * np.abs(np.log2(f0_est[both] / gt[both]))
    return cents, gt, both


@pytest.mark.parametrize("method", ["dio", "harvest"])
def test_world_f0_accuracy_on_speech(method):
    """dio/harvest on formant-rich speech-like audio: median voiced-frame
    error < 10 cents vs the analytic f0 track, high voiced recall, and
    UV agreement on the silent head/tail (reference accuracy standard:
    pyworld C++, rvc/f0/{dio,harvest}.py:9)."""
    from tpu_rvc.f0.world import dio as world_dio, harvest, stonemask

    sr = 16000
    audio, gt = _speech_like(sr=sr)
    if method == "dio":
        f0, times = world_dio(audio, sr)
        f0 = stonemask(audio, sr, f0, times)
    else:
        f0, times = harvest(audio, sr)
        f0 = stonemask(audio, sr, f0, times)
    cents, gt_frames, both = _cents_errors(f0, times, gt, sr)

    voiced_truth = gt_frames > 0
    recall = both.sum() / voiced_truth.sum()
    assert recall > 0.85, f"{method}: voiced recall {recall:.2f}"
    assert np.median(cents) < 10.0, \
        f"{method}: median {np.median(cents):.1f} cents"
    # octave errors must be rare (gross error = off by > 1/2 semitone)
    assert (cents > 50).mean() < 0.1, \
        f"{method}: {100 * (cents > 50).mean():.0f}% gross errors"
    # UV agreement: silence must not be called voiced
    sil_frames = gt_frames == 0
    fa = (f0[sil_frames] > 0).mean() if sil_frames.any() else 0.0
    assert fa < 0.25, f"{method}: {100 * fa:.0f}% false voicing in silence"


def test_pm_f0_accuracy_on_speech():
    """Same quantitative standard for the PM (Praat autocorrelation) port
    on the voiced core of the fixture (reference rvc/f0/pm.py:9 wraps
    parselmouth)."""
    from tpu_rvc.f0.pm import PM

    sr = 16000
    audio, gt = _speech_like(sr=sr)
    est = PM(160, 50.0, 1100.0, sr)
    p_len = len(audio) // 160
    f0 = est.compute_f0(audio, p_len)  # interpolated track
    times = np.arange(p_len) * 160 / sr
    # compare the voiced core only (interpolation fills the silent ends)
    core = slice(int(0.3 * sr / 160), int(1.7 * sr / 160))
    idx = np.clip((times[core] * sr).astype(int), 0, len(gt) - 1)
    gtc = gt[idx]
    ok = gtc > 0
    cents = 1200 * np.abs(np.log2(f0[core][ok] / gtc[ok]))
    assert np.median(cents) < 10.0, f"pm median {np.median(cents):.1f} cents"
