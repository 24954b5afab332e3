"""End-to-end offline pipeline tests with small random-weight models,
plus retrieval, slicer, audio io, small-model ops and hashing utilities."""

import os
import tempfile

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.models.hubert import Hubert
from tpu_rvc.pipeline.vc import Pipeline, VC
from tpu_rvc.retrieval import FeatureIndex, build_index, knn_blend
from tpu_rvc.audio.io import load_wav, save_wav, load_audio
from tpu_rvc.audio.slicer import Slicer, get_rms
from tpu_rvc.audio.dsp import change_rms, highpass_filter


SMALL_HUBERT = dict(output_layer=2, final_proj=False, embed=64, ffn_dim=128,
                    n_heads=2, pos_conv_k=16, pos_conv_groups=2,
                    conv_layers=((32, 10, 5), (32, 4, 4), (32, 4, 4),
                                 (32, 2, 2), (32, 2, 2)))  # 320x downsample

SMALL_SYNTH = dict(
    spec_channels=129, segment_size=640, inter_channels=32,
    hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
    kernel_size=3, p_dropout=0.0, resblock="1",
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    upsample_rates=(10, 16), upsample_initial_channel=64,
    upsample_kernel_sizes=(20, 32), spk_embed_dim=2, gin_channels=16,
    sr=16000, encoder_dim=64, use_f0=True, weight_norm=False,
)


@pytest.fixture(scope="module")
def small_pipeline():
    hub = Hubert(**SMALL_HUBERT)
    hub_vars = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = Synthesizer(**SMALL_SYNTH)
    T = 20
    syn_vars = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 64)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    return Pipeline(16000, hubert=hub, hubert_vars=hub_vars, synth=syn,
                    synth_vars=syn_vars, version="v2", x_pad=0.5,
                    x_query=2.0, x_center=5.0, x_max=6.0)


def tone(hz=220.0, sr=16000, dur=2.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def test_pipeline_end_to_end(small_pipeline):
    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, tone(), times, 0, "pm", None, 0.0, 1, 3, 0, 0.25, 0.33)
    assert out.dtype == np.int16
    # output is tgt_sr/16k times the input length, minus nothing (same sr)
    assert abs(len(out) - 32000) < 1600
    assert times[2] > 0  # infer time accounted


def test_pipeline_long_audio_chunks(small_pipeline):
    """Audio over x_max seconds goes through the silence-split path."""
    audio = tone(dur=7.0)
    audio[3 * 16000: 3 * 16000 + 800] = 0  # a quiet notch for the splitter
    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, audio, times, 0, "pm", None, 0.0, 1, 3, 0, 1.0, 0.5)
    assert abs(len(out) - 7 * 16000) < 3200


def test_pipeline_short_clip(small_pipeline):
    """A clip much shorter than t_pad still converts: numpy's reflect pad
    extends by repeated reflection (the torch reference would crash here —
    F.pad reflect requires pad < length)."""
    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, tone(dur=0.3), times, 0, "pm", None, 0.0, 1, 3, 0, 0.25, 0.33)
    assert out.dtype == np.int16
    assert abs(len(out) - int(0.3 * 16000)) < 1600
    assert np.isfinite(out.astype(np.float32)).all()


def test_vc_single_empty_audio_clear_error(tmp_path):
    """Empty input surfaces a clear ValueError, not a numpy internals
    crash."""
    from tpu_rvc.audio.io import save_wav

    p = str(tmp_path / "empty.wav")
    save_wav(p, np.zeros(0, np.float32), 16000)
    vc = VC.__new__(VC)
    vc.pipeline = object()  # past the get_vc guard; load happens first
    with pytest.raises(ValueError, match="empty audio"):
        vc.vc_single(0, p)


def test_pipeline_with_retrieval(small_pipeline, rng):
    idx = build_index(rng.standard_normal((100, 64)).astype(np.float32))
    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, tone(), times, 0, "pm", idx, 0.75, 1, 3, 0, 0.25, 0.33)
    assert out.dtype == np.int16 and len(out) > 0


def test_knn_blend_exact(rng):
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    sq = (vecs ** 2).sum(1)
    q = vecs[7:9] + 1e-4  # near rows 7, 8
    out = np.asarray(knn_blend(jnp.asarray(q), jnp.asarray(vecs),
                               jnp.asarray(sq), jnp.asarray(1.0), k=8))
    # with index_rate 1 the result must be dominated by the nearest row
    np.testing.assert_allclose(out[0], vecs[7], atol=1e-2)
    # index_rate 0 returns the query untouched
    out0 = np.asarray(knn_blend(jnp.asarray(q), jnp.asarray(vecs),
                                jnp.asarray(sq), jnp.asarray(0.0), k=8))
    np.testing.assert_allclose(out0, q, atol=1e-6)


def test_feature_index_roundtrip(tmp_path, rng):
    idx = build_index(rng.standard_normal((64, 16)).astype(np.float32))
    p = str(tmp_path / "test.tpuidx.npz")
    idx.save(p)
    idx2 = FeatureIndex.load(p)
    np.testing.assert_array_equal(idx.vectors, idx2.vectors)


def test_wav_io_roundtrip(tmp_path):
    x = tone(dur=0.5)
    p = str(tmp_path / "t.wav")
    save_wav(p, x, 16000)
    y, sr = load_wav(p)
    assert sr == 16000
    np.testing.assert_allclose(y, x, atol=1.5 / 32768 + 1e-4)  # 16-bit quantization
    # load_audio with resample
    z = load_audio(p, 8000)
    assert abs(len(z) - 4000) < 10


def test_slicer_splits_on_silence():
    sr = 16000
    seg = tone(dur=6.0, sr=sr)
    silence = np.zeros(sr, np.float32)
    audio = np.concatenate([seg, silence, seg])
    sl = Slicer(sr, threshold=-40, min_length=3000, min_interval=300,
                hop_size=20, max_sil_kept=300)
    chunks = sl.slice(audio)
    assert len(chunks) == 2
    assert all(len(c) > sr for c in chunks)
    # short audio passes through
    assert len(sl.slice(tone(dur=1.0))) == 1


def test_change_rms_envelope():
    src = tone() * 0.9
    tgt = tone() * 0.1
    out = change_rms(src, 16000, tgt.copy(), 16000, 0.0)  # full source env
    assert np.abs(out).max() > np.abs(tgt).max() * 3


def test_highpass_removes_dc():
    x = tone() + 0.5
    y = highpass_filter(x)
    assert abs(y.mean()) < 0.01


def test_base16384_roundtrip(rng):
    from tpu_rvc.utils.base16384 import encode_to_string, decode_from_string
    for n in [1, 2, 3, 6, 7, 8, 13, 14, 100, 1024]:
        b = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        assert decode_from_string(encode_to_string(b)) == b


def test_hash_similarity_and_id(rng):
    from tpu_rvc.ckpt.hash import wave_hash, hash_similarity, hash_id
    w1 = rng.standard_normal(48000).astype(np.float64)
    w2 = w1 + rng.standard_normal(48000) * 0.01
    h1 = wave_hash(w1.copy())
    h2 = wave_hash(w2.copy())
    assert hash_similarity(h1, h1) == 1.0
    assert hash_similarity(h1, h2) > 0.5
    i1 = hash_id(h1)
    assert isinstance(i1, str) and len(i1) > 4


def test_small_model_save_load_merge(tmp_path):
    from tpu_rvc.core.config import hparams_for
    from tpu_rvc.ckpt.small_model import save_small_model, merge
    from tpu_rvc.ckpt.convert import state_dict_from_synthesizer_params
    from tpu_rvc.models.loader import load_synthesizer

    hp = hparams_for("v2", 48000)
    syn = Synthesizer(**SMALL_SYNTH)
    T = 20
    v = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 64)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    sd = state_dict_from_synthesizer_params(v, use_f0=True, num_kernels=1)
    # config list matching the small synth (not hp) for loadability
    cfg = [SMALL_SYNTH["spec_channels"], 32, 32, 32, 64, 2, 1, 3, 0.0, "1",
           [3], [[1, 3, 5]], [10, 16], 64, [20, 32], 2, 16, 16000]
    import dataclasses
    p1 = str(tmp_path / "m1.pth")
    from tpu_rvc.ckpt.torch_pth import save_pth
    save_pth({"weight": {k: w.astype(np.float16) for k, w in sd.items()},
              "config": cfg, "sr": "40k", "f0": 1, "version": "v2",
              "info": "test"}, p1)

    mod, variables, meta = load_synthesizer(p1)
    assert meta["version"] == "v2" and mod.use_f0
    out = mod.apply(variables, jnp.zeros((1, T, 64)), jnp.asarray([T]),
                    jnp.asarray([0]), jnp.zeros((1, T), jnp.int32),
                    jnp.zeros((1, T)), deterministic=True,
                    method=Synthesizer.infer)
    assert np.isfinite(np.asarray(out)).all()

    # merge with itself must reproduce the (fp16) weights
    p2 = str(tmp_path / "merged.pth")
    merge(p1, p1, 0.5, "40k", 1, "merged", "m", "v2", out_path=p2)
    from tpu_rvc.ckpt.torch_pth import load_pth
    m = load_pth(p2)
    np.testing.assert_allclose(
        np.asarray(m["weight"]["emb_g.weight"], np.float32),
        np.asarray(sd["emb_g.weight"], np.float32), rtol=1e-2, atol=1e-3)


def test_pipeline_fused_rmvpe_path(small_pipeline):
    """f0_method="rmvpe" takes the fused single-dispatch path with the E2E
    salience net running in-graph (weights as jit arguments)."""
    from tpu_rvc.models.rmvpe import E2E
    from tpu_rvc.f0.rmvpe import RMVPE

    tiny = E2E(n_blocks=1, n_gru=1, en_de_layers=2, inter_layers=1,
               en_out_channels=4)
    variables = tiny.init(jax.random.PRNGKey(5),
                          jnp.zeros((1, 128, 32), jnp.float32))
    est = RMVPE.__new__(RMVPE)  # skip checkpoint loading
    est.model, est.variables = tiny, variables
    est.hop_length, est.sampling_rate = 160, 16000
    small_pipeline.f0_gen._estimators["rmvpe"] = est

    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, tone(), times, 0, "rmvpe", None, 0.0, 1, 3, 0, 0.25, 0.33)
    assert out.dtype == np.int16
    assert abs(len(out) - 32000) < 1600
    assert np.isfinite(out.astype(np.float32)).all()
    # the fused graph must be cached under the rmvpe mode key
    assert any(isinstance(k, tuple) and k and k[0] == "full" and
               k[-1] == "rmvpe" for k in small_pipeline._graphs)


def test_pipeline_fused_fcpe_path(small_pipeline):
    """f0_method="fcpe": fused in-graph when a native model is present,
    silent downgrade to the pm graph when only the fallback exists."""
    from tpu_rvc.models.fcpe import CFNaiveMelPE
    from tpu_rvc.f0.fcpe import FCPE

    tiny = CFNaiveMelPE(in_dims=128, hidden_dims=32, out_dims=60, n_layers=1)
    variables = tiny.init(jax.random.PRNGKey(6),
                          jnp.zeros((1, 20, 128), jnp.float32))
    small_pipeline.f0_gen._estimators["fcpe"] = FCPE(model=tiny,
                                                     variables=variables)
    times = [0.0, 0.0, 0.0]
    out = small_pipeline.pipeline(
        0, tone(), times, 0, "fcpe", None, 0.0, 1, 3, 0, 0.25, 0.33)
    assert out.dtype == np.int16 and abs(len(out) - 32000) < 1600
    assert any(isinstance(k, tuple) and k and k[0] == "full" and
               k[-1] == "fcpe" for k in small_pipeline._graphs)
    assert small_pipeline.last_f0_note is None

    # fallback estimator (no ckpt) -> pm-mode fused graph, still works,
    # and the substitution is SURFACED (not a silent downgrade)
    small_pipeline.f0_gen._estimators["fcpe"] = FCPE(
        model_path="/nonexistent.pt")
    out2 = small_pipeline.pipeline(
        0, tone(), times, 0, "fcpe", None, 0.0, 1, 3, 0, 0.25, 0.33)
    assert out2.dtype == np.int16 and abs(len(out2) - 32000) < 1600
    assert small_pipeline.last_f0_note == "fcpe->pm (no checkpoint)"

    # the non-fused (chunked / manual-f0) path surfaces the downgrade too
    manual = np.asarray([[0.0, 220.0], [2.0, 220.0]], np.float32)
    out3 = small_pipeline.pipeline(
        0, tone(), times, 0, "fcpe", None, 0.0, 1, 3, 0, 0.25, 0.33,
        f0_file=manual)
    assert out3.dtype == np.int16
    assert small_pipeline.last_f0_note == "fcpe->pm (no checkpoint)"


def test_vc_facade_single_and_multi(tmp_path):
    """VC facade end-to-end (reference modules.py:117/201): load a small
    model .pth, convert one file and a batch (pipelined fetch)."""
    from tpu_rvc.ckpt.convert import state_dict_from_synthesizer_params
    from tpu_rvc.ckpt.torch_pth import save_pth

    cfg = {**SMALL_SYNTH, "encoder_dim": 768}
    syn = Synthesizer(**cfg)
    T = 20
    v = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 768)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    sd = state_dict_from_synthesizer_params(v, use_f0=True, num_kernels=1)
    mp = str(tmp_path / "m.pth")
    save_pth({"weight": {k: w.astype(np.float16) for k, w in sd.items()},
              "config": [129, 32, 32, 32, 64, 2, 1, 3, 0.0, "1",
                         [3], [[1, 3, 5]], [10, 16], 64, [20, 32], 2, 16,
                         16000],
              "sr": "40k", "f0": 1, "version": "v2", "info": "t"}, mp)
    wavs = []
    for i, hz in enumerate((220.0, 330.0)):
        p = str(tmp_path / f"in{i}.wav")
        save_wav(p, tone(hz, dur=1.0), 16000)
        wavs.append(p)

    vc = VC(hubert_path="random", x_pad=0.5)
    meta = vc.get_vc(mp)
    assert meta["version"] == "v2" and vc.tgt_sr == 16000
    info, (sr, out) = vc.vc_single(0, wavs[0], f0_method="pm",
                                   rms_mix_rate=1.0)
    assert sr == 16000 and np.asarray(out).dtype == np.int16
    assert abs(len(np.asarray(out)) - 16000) < 1600

    report = vc.vc_multi(0, wavs, str(tmp_path / "out"), f0_method="pm",
                         rms_mix_rate=1.0)
    assert report.count("Success") == 2, report
    import os
    outs = sorted(os.listdir(tmp_path / "out"))
    assert outs == ["in0.wav.wav", "in1.wav.wav"]
    y, sr2 = load_wav(str(tmp_path / "out" / outs[0]))
    assert sr2 == 16000 and np.isfinite(y).all()


def _mk_small_pipeline(aot_cache=None):
    hub = Hubert(**SMALL_HUBERT)
    hub_vars = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = Synthesizer(**SMALL_SYNTH)
    T = 20
    syn_vars = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 64)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    return Pipeline(16000, hubert=hub, hubert_vars=hub_vars, synth=syn,
                    synth_vars=syn_vars, version="v2", x_pad=0.5,
                    x_query=2.0, x_center=5.0, x_max=6.0,
                    aot_cache=aot_cache)


def test_aot_warm_start_roundtrip(tmp_path):
    """StableHLO export -> fresh-process-style reload -> numerically equal
    output (reference rvc/jit/jit.py:58 get_jit_model role).  The second
    Pipeline instance simulates a new process: same cache dir, no shared
    jit cache, and its graph must come from the serialized export."""
    from tpu_rvc.utils.aot import AOTGraphCache

    cache1 = AOTGraphCache(str(tmp_path), platform="cpu")
    pipe1 = _mk_small_pipeline(cache1)
    audio = tone(dur=1.5)
    times = [0.0, 0.0, 0.0]
    out1 = pipe1.pipeline(0, audio, times, 0, "pm", None, 0.0, 1, 0,
                          0, 0.25, 0.33)
    assert cache1.misses == 1 and cache1.hits == 0
    files = [p for p in os.listdir(tmp_path) if p.endswith(".stablehlo")]
    assert len(files) == 1, files

    cache2 = AOTGraphCache(str(tmp_path), platform="cpu")
    pipe2 = _mk_small_pipeline(cache2)
    out2 = pipe2.pipeline(0, audio, times, 0, "pm", None, 0.0, 1, 0,
                          0, 0.25, 0.33)
    assert cache2.hits == 1 and cache2.misses == 0
    key = next(k for k in pipe2._graphs if k[0] == "full")
    assert getattr(pipe2._graphs[key], "aot_cache_status", "") == "hit"
    assert out1.shape == out2.shape
    # int16 output: identical graph + weights + noise key -> bit-equal
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_aot_cache_corrupt_entry_recovers(tmp_path):
    """A truncated/corrupt cache entry must fall back to tracing and
    overwrite the bad file, never fail the conversion."""
    from tpu_rvc.utils.aot import AOTGraphCache

    cache = AOTGraphCache(str(tmp_path), platform="cpu")
    pipe = _mk_small_pipeline(cache)
    audio = tone(dur=1.5)
    out1 = pipe.pipeline(0, audio, [0, 0, 0], 0, "pm", None, 0.0, 1, 0,
                         0, 0.25, 0.33)
    fname = next(p for p in os.listdir(tmp_path) if p.endswith(".stablehlo"))
    with open(os.path.join(str(tmp_path), fname), "wb") as f:
        f.write(b"corrupt garbage")
    cache2 = AOTGraphCache(str(tmp_path), platform="cpu")
    pipe2 = _mk_small_pipeline(cache2)
    out2 = pipe2.pipeline(0, audio, [0, 0, 0], 0, "pm", None, 0.0, 1, 0,
                          0, 0.25, 0.33)
    assert cache2.hits == 0 and cache2.misses == 1
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


def test_aot_stale_entry_falls_back_and_self_heals(tmp_path):
    """A cache hit whose recorded avals no longer match the call (e.g. the
    user swapped to a different-size retrieval index under an identical
    key) must fall back to live tracing, return the right answer, and
    overwrite the entry with the current shapes."""
    from tpu_rvc.utils.aot import AOTGraphCache

    def f(x):
        return x * 2.0 + 1.0

    cache1 = AOTGraphCache(str(tmp_path), platform="cpu")
    g1 = cache1.wrap("stale_demo", jax.jit(f))
    np.testing.assert_allclose(
        np.asarray(g1(jnp.arange(4.0))), np.arange(4.0) * 2 + 1)
    assert cache1.misses == 1

    # new process, SAME key, different arg shape -> hit is stale
    cache2 = AOTGraphCache(str(tmp_path), platform="cpu")
    g2 = cache2.wrap("stale_demo", jax.jit(f))
    assert cache2.hits == 1
    out = np.asarray(g2(jnp.arange(8.0)))
    np.testing.assert_allclose(out, np.arange(8.0) * 2 + 1)

    # the entry self-healed: a third reload at the NEW shape hits cleanly
    cache3 = AOTGraphCache(str(tmp_path), platform="cpu")
    g3 = cache3.wrap("stale_demo", jax.jit(f))
    assert cache3.hits == 1
    np.testing.assert_allclose(
        np.asarray(g3(jnp.arange(8.0))), np.arange(8.0) * 2 + 1)


def test_aot_cache_keyed_by_source_fingerprint(tmp_path, monkeypatch):
    """Cache keys carry a hash of the package sources: a code edit that
    keeps shapes identical (e.g. changing a loss weight) must NOT replay
    the old exported graph on the next warm start."""
    from tpu_rvc.utils import aot

    def f(x):
        return x * 2.0

    cache1 = aot.AOTGraphCache(str(tmp_path), platform="cpu")
    g1 = cache1.wrap("fp_demo", jax.jit(f))
    np.asarray(g1(jnp.arange(4.0)))
    assert cache1.misses == 1

    # same source -> warm hit
    cache2 = aot.AOTGraphCache(str(tmp_path), platform="cpu")
    g2 = cache2.wrap("fp_demo", jax.jit(f))
    np.asarray(g2(jnp.arange(4.0)))
    assert cache2.hits == 1

    # simulate a package source edit -> the stored entry is unreachable
    monkeypatch.setattr(aot, "_SRC_FINGERPRINT", "deadbeef0000")
    cache3 = aot.AOTGraphCache(str(tmp_path), platform="cpu")
    g3 = cache3.wrap("fp_demo", jax.jit(f))
    np.asarray(g3(jnp.arange(4.0)))
    assert cache3.misses == 1 and cache3.hits == 0


def test_tree_shape_sig_does_not_materialize_leaves():
    """_tree_shape_sig must read only (shape, dtype) metadata: on a
    remote-attached device an np.asarray per weight leaf would fetch
    hundreds of MB through the host link just to compute a cache key."""
    from tpu_rvc.utils.aot import _tree_shape_sig

    class Spy:
        shape = (3, 4)
        dtype = np.dtype("float32")

        def __array__(self, *a, **k):
            raise AssertionError("leaf was materialized")

    sig1 = _tree_shape_sig({"a": Spy(), "b": 1.0})
    sig2 = _tree_shape_sig({"a": jnp.zeros((3, 4)), "b": 1.0})
    assert sig1 == sig2  # metadata-equal trees agree
    assert sig1 != _tree_shape_sig({"a": jnp.zeros((4, 3)), "b": 1.0})
