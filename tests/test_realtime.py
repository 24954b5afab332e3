"""Realtime engine tests: block contract, pitch-cache rolling, SOLA
continuity of the stream session."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.models.hubert import Hubert
from tpu_rvc.pipeline.rt import RealtimeVC, StreamSession, phase_vocoder

SMALL_HUBERT = dict(output_layer=1, final_proj=False, embed=64, ffn_dim=64,
                    n_heads=2, pos_conv_k=16, pos_conv_groups=2,
                    conv_layers=((32, 10, 5), (32, 4, 4), (32, 4, 4),
                                 (32, 2, 2), (32, 2, 2)))

SMALL_SYNTH = dict(
    spec_channels=129, segment_size=640, inter_channels=32,
    hidden_channels=32, filter_channels=64, n_heads=2, n_layers=1,
    kernel_size=3, p_dropout=0.0, resblock="1",
    resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3, 5),),
    upsample_rates=(10, 16), upsample_initial_channel=32,
    upsample_kernel_sizes=(20, 32), spk_embed_dim=2, gin_channels=16,
    sr=16000, encoder_dim=64, use_f0=True, weight_norm=False,
)


@pytest.fixture(scope="module")
def engine():
    hub = Hubert(**SMALL_HUBERT)
    hv = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    syn = Synthesizer(**SMALL_SYNTH)
    T = 20
    sv = syn.init(
        {"params": jax.random.PRNGKey(1), "noise": jax.random.PRNGKey(2)},
        jnp.zeros((1, T, 64)), jnp.asarray([T]), jnp.asarray([0]),
        jnp.zeros((1, T), jnp.int32), jnp.zeros((1, T)),
        method=Synthesizer.infer)
    return RealtimeVC(hubert=hub, hubert_vars=hv, synth=syn, synth_vars=sv,
                      version="v2", if_f0=1)


def tone(hz=220.0, sr=16000, dur=1.0, phase0=0.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t + phase0)).astype(np.float32)


def test_realtime_infer_block_contract(engine):
    # window: 1 s of 16k context; block 160 ms; return 28 frames
    win = tone(dur=1.0)
    block_16k = 2560  # 160 ms
    out = engine.infer(win, block_16k, skip_head=64, return_length=28,
                       f0method="pm")
    assert out.shape == (28 * 160,)  # tgt 16k: 160 samples/frame
    assert np.isfinite(out).all()
    # pitch cache rolled in (one call fills len(f0)-4 tail frames)
    assert engine.cache_pitchf[-16:].min() > 0


def test_batched_realtime_matches_single(engine):
    """BatchedRealtimeVC (vmapped block graph) must reproduce per-stream
    single-engine outputs given the same pitch inputs and noise keys."""
    from tpu_rvc.pipeline.rt import BatchedRealtimeVC

    batched = BatchedRealtimeVC(
        n_streams=2, hubert=engine.hubert, hubert_vars=engine.hubert_vars,
        synth=engine.synth, synth_vars=engine.synth_vars, version="v2",
        if_f0=1)
    win0 = tone(220.0, dur=1.0)
    win1 = tone(330.0, dur=1.0)
    block_16k = 2560
    p_len = len(win0) // 160
    # fixed pitch for exact comparability (noise keys differ per stream
    # in the batched engine, so compare the deterministic f0/feature path
    # by pinning the same pitch and checking stream independence)
    pitch = np.full((2, p_len), 120, np.int32)
    pitchf = np.full((2, p_len), 220.0, np.float32)

    out_b = batched.infer(np.stack([win0, win1]), block_16k, skip_head=64,
                          return_length=28, f0method=(pitch, pitchf))
    assert out_b.shape == (2, 28 * 160)
    assert np.isfinite(out_b).all()
    # streams are independent: different inputs -> different outputs
    assert np.abs(out_b[0] - out_b[1]).max() > 1e-4

    # exact parity of the vmapped graph vs the single-stream graph: same
    # inputs + same noise key -> same samples, per stream
    run = engine._make_run(len(win0), 64, 28, 28, True, False, False)
    d = 64
    vecs, sq = jnp.zeros((1, d), jnp.float32), jnp.zeros((1,), jnp.float32)
    keys = jnp.stack([jax.random.PRNGKey(7), jax.random.PRNGKey(8)])
    wavs = jnp.asarray(np.stack([win0, win1]))
    single = [np.asarray(run(
        engine.hubert_vars, engine.synth_vars, wavs[b],
        jnp.asarray(pitch[b]), jnp.asarray(pitchf[b]), vecs, sq,
        jnp.asarray(0.0), jnp.asarray(1.0), keys[b])) for b in range(2)]
    vmapped = np.asarray(jax.vmap(
        run, in_axes=(None, None, 0, 0, 0, None, None, None, None, 0))(
        engine.hubert_vars, engine.synth_vars, wavs, jnp.asarray(pitch),
        jnp.asarray(pitchf), vecs, sq, jnp.asarray(0.0), jnp.asarray(1.0),
        keys))
    for b in range(2):
        np.testing.assert_allclose(vmapped[b], single[b], atol=2e-5)


def test_fused_stream_graph_batched(engine):
    """Multi-stream FusedStreamGraph: one dispatch advances N sessions;
    per-stream results equal the unbatched _run with matched keys."""
    from tpu_rvc.pipeline.rt import FusedStreamGraph

    sr = 16000
    zc = sr // 100
    block = 16 * zc           # 160 ms
    total = 100 * zc          # 1 s rolling window
    fused = FusedStreamGraph(engine, stream_sr=sr, block_frame=block,
                             ctx_frame=2 * zc, total_len=total,
                             skip_head=64, return_length=28,
                             f0method="pm", n_streams=2)
    state = fused.init_state()
    assert state["wav16"].shape[0] == 2
    seg = np.stack([tone(220.0, dur=(block + 2 * zc) / sr),
                    tone(330.0, dur=(block + 2 * zc) / sr)])
    out, state = fused(state, seg)
    assert out.shape == (2, 28 * 160)
    assert np.isfinite(out).all()
    out2, state = fused(state, seg)  # state rolls forward per stream
    assert np.abs(out2[0] - out2[1]).max() > 1e-4  # independent streams

    # exact parity: vmapped _run row vs single _run with the same inputs
    key = jax.random.PRNGKey(123)
    d = 64
    vecs, sq = jnp.zeros((1, d), jnp.float32), jnp.zeros((1,), jnp.float32)
    args = (engine.hubert_vars, engine.synth_vars, {},
            jax.tree.map(lambda x: x[0], state), jnp.asarray(seg[0]),
            vecs, sq, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
            key)
    out_s, st_s = fused._run(*args)
    out_v, st_v = jax.vmap(
        fused._run, in_axes=(None, None, None, 0, 0, None, None, None,
                             None, None, 0))(
        engine.hubert_vars, engine.synth_vars, {}, state, jnp.asarray(seg),
        vecs, sq, jnp.asarray(0.0), jnp.asarray(0.0), jnp.asarray(1.0),
        jnp.stack([key, jax.random.PRNGKey(7)]))
    np.testing.assert_allclose(np.asarray(out_v[0]), np.asarray(out_s),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(st_v["wav16"][0]),
                               np.asarray(st_s["wav16"]), atol=1e-6)


def test_realtime_formant_shift_resamples(engine):
    win = tone(dur=1.0)
    engine.set_formant(2.0)
    out = engine.infer(win, 2560, skip_head=64, return_length=28,
                       f0method="pm")
    engine.set_formant(0.0)
    # output resampled back to return_length * tgt_sr/100 samples
    assert abs(len(out) - 28 * 160) <= 160


def test_phase_vocoder_blend_endpoints():
    n = 64
    fade_in = np.sin(0.5 * np.pi * np.linspace(0, 1, n)) ** 2
    fade_out = 1.0 - fade_in
    a = tone(dur=n / 16000)
    b = tone(dur=n / 16000, phase0=0.3)
    out = phase_vocoder(a[:n].astype(np.float64), b[:n].astype(np.float64),
                        fade_out, fade_in)
    assert out.shape == (n,)
    assert np.isfinite(out).all()


def test_stream_session_continuity(engine):
    """Feeding a steady tone must produce a steady output stream without
    NaNs or gross discontinuities at block joins."""
    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         rms_mix_rate=1.0)
    sr = 16000
    audio = tone(dur=2.0, sr=sr)
    outs = []
    for i in range(0, len(audio) - sess.block_frame + 1, sess.block_frame):
        outs.append(sess.feed(audio[i: i + sess.block_frame]))
    out = np.concatenate(outs)
    assert np.isfinite(out).all()
    assert out.shape[0] == len(outs) * sess.block_frame
    # block joins: no sample-to-sample jump larger than the global max swing
    d = np.abs(np.diff(out[sess.block_frame:]))
    assert d.max() < 1.0


def test_stream_session_with_noise_reduce(engine):
    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         input_noise_reduce=True, output_noise_reduce=True)
    audio = tone(dur=1.0, sr=16000)
    outs = []
    for i in range(0, len(audio) - sess.block_frame + 1, sess.block_frame):
        outs.append(sess.feed(audio[i: i + sess.block_frame]))
    out = np.concatenate(outs)
    assert np.isfinite(out).all()
    assert out.shape[0] == len(outs) * sess.block_frame


def test_stream_session_fused_rmvpe(engine):
    """f0method="rmvpe" rides the fused single-dispatch stream graph with
    the E2E salience net in-graph (tiny random weights injected)."""
    from tpu_rvc.models.rmvpe import E2E
    from tpu_rvc.f0.rmvpe import RMVPE

    tiny = E2E(n_blocks=1, n_gru=1, en_de_layers=2, inter_layers=1,
               en_out_channels=4)
    variables = tiny.init(jax.random.PRNGKey(5),
                          jnp.zeros((1, 128, 32), jnp.float32))
    est = RMVPE.__new__(RMVPE)  # skip checkpoint loading
    est.model, est.variables = tiny, variables
    est.hop_length, est.sampling_rate = 160, 16000
    engine.f0_gen._estimators["rmvpe"] = est

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5,
                         f0method="rmvpe", rms_mix_rate=1.0)
    assert sess._fused is not None  # took the fused path
    audio = tone(dur=1.0, sr=16000)
    outs = []
    for i in range(0, len(audio) - sess.block_frame + 1, sess.block_frame):
        outs.append(sess.feed(audio[i: i + sess.block_frame]))
    out = np.concatenate(outs)
    assert np.isfinite(out).all()
    assert out.shape[0] == len(outs) * sess.block_frame


# ---------------------------------------------------------------------------
# Live duplex loop (C6/C34 live path, reference audio.py:206-376 +
# gui.py:1099-1126) — exercised hardware-free with a fake stream thread.
# ---------------------------------------------------------------------------

def test_live_loop_duplex_fake_stream(engine):
    """Device-callback <-> model-loop coupling through the ring buffers:
    a fake stream thread drives LiveLoop.callback exactly like PortAudio
    would; the model loop converts queued blocks.  A deliberately late
    model turn must surface as output-ring underruns (silence emitted,
    stream keeps running), and the loop must recover."""
    from tpu_rvc.pipeline.live import LiveLoop

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         rms_mix_rate=1.0)
    loop = LiveLoop(sess, ring_blocks=8)
    bf = loop.block_frame
    audio = tone(dur=2.0, sr=16000)
    n_blocks = len(audio) // bf
    outs = []

    # block 0: callback before any model work -> output ring is empty,
    # the device still gets a full (silent) block = underrun recovery
    outdata = np.empty(bf, np.float32)
    loop.callback(audio[:bf], outdata)
    assert np.all(outdata == 0.0)
    assert loop.out_ring.stats()["underruns"] >= 1
    outs.append(outdata.copy())

    done = loop.process_available()
    assert done == 1 and loop.blocks_processed == 1

    # blocks 1..2 arrive while the model is "stuck" (no process calls):
    # both queue in the input ring; output underruns again
    for i in (1, 2):
        outdata = np.empty(bf, np.float32)
        loop.callback(audio[i * bf:(i + 1) * bf], outdata)
        outs.append(outdata.copy())
    # model catches up: both queued blocks convert in one turn
    assert loop.process_available() == 2
    # steady state: model keeps up, every output block is real audio
    for i in range(3, n_blocks):
        outdata = np.empty(bf, np.float32)
        loop.callback(audio[i * bf:(i + 1) * bf], outdata)
        outs.append(outdata.copy())
        loop.process_available()
        assert np.isfinite(outdata).all()
    out = np.concatenate(outs)
    assert np.abs(out[3 * bf:]).max() > 0  # caught-up stream carries audio
    s = loop.stats()
    assert s["blocks_processed"] == n_blocks
    assert s["out"]["underruns"] >= 2  # the two deliberate stalls


def test_live_loop_midstream_controls(engine):
    """set_key / set_index_rate / set_formant driven MID-STREAM (the
    reference GUI slider events, gui.py:518-592) take effect without
    breaking the stream; set_formant drops the fused graph (its
    return_length2 is baked in) and the host path continues."""
    from tpu_rvc.pipeline.live import LiveLoop

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         rms_mix_rate=1.0)
    had_fused = sess._fused is not None
    loop = LiveLoop(sess)
    bf = loop.block_frame
    audio = tone(dur=2.0, sr=16000)
    outdata = np.empty(bf, np.float32)
    for i in range(3):
        loop.callback(audio[i * bf:(i + 1) * bf], outdata)
        loop.process_available()
    loop.set_key(5.0)
    loop.set_index_rate(0.0)
    assert engine.f0_up_key == 5.0
    loop.callback(audio[3 * bf:4 * bf], outdata)
    loop.process_available()
    assert np.isfinite(outdata).all()
    loop.set_formant(1.0)
    assert engine.formant_shift == 1.0
    if had_fused:
        assert sess._fused is None  # formant forces the host block path
    loop.callback(audio[4 * bf:5 * bf], outdata)
    loop.process_available()
    assert np.isfinite(outdata).all()
    # returning the slider to neutral RESTORES the fused fast path (the
    # graph was parked, not discarded) and the stream keeps flowing
    loop.set_formant(0.0)
    assert engine.formant_shift == 0.0
    if had_fused:
        assert sess._fused is not None
    loop.callback(audio[5 * bf:6 * bf], outdata)
    loop.process_available()
    assert np.isfinite(outdata).all()
    engine.set_key(0.0)


def test_live_loop_threaded_model_loop(engine):
    """LiveLoop.run in a real worker thread while the 'audio thread'
    (main) paces callbacks — the actual live-mode topology of
    apps/gui.py run_live."""
    import threading
    import time as _time
    from tpu_rvc.pipeline.live import LiveLoop

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         rms_mix_rate=1.0)
    # ring sized to hold the whole clip: the first block compiles the
    # graph (~tens of s on CPU), so the input ring must absorb the burst
    # without overrun-dropping (live overrun behavior is covered by
    # test_live_loop_duplex_fake_stream)
    loop = LiveLoop(sess, ring_blocks=16)
    bf = loop.block_frame
    audio = tone(dur=1.6, sr=16000)
    stop = threading.Event()
    worker = threading.Thread(target=loop.run, args=(stop,), daemon=True)
    worker.start()
    n_blocks = len(audio) // bf
    outdata = np.empty(bf, np.float32)
    for i in range(n_blocks):
        loop.callback(audio[i * bf:(i + 1) * bf], outdata)
        _time.sleep(0.01)
    deadline = _time.time() + 30
    while loop.blocks_processed < n_blocks and _time.time() < deadline:
        _time.sleep(0.01)
    stop.set()
    worker.join(timeout=5)
    assert loop.blocks_processed == n_blocks


def test_live_loop_threshold_gate(engine):
    """Input dB gate (reference gui.py:950-963): sub-threshold 10 ms
    frames are ZEROED but the block is still fed — the rolling windows
    and SOLA seam keep advancing across silence (the reference zeroes
    samples; it does not skip the pipeline)."""
    from tpu_rvc.pipeline.live import LiveLoop

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5, f0method="pm",
                         rms_mix_rate=1.0)
    loop = LiveLoop(sess, threshold_db=-20.0)
    bf = loop.block_frame
    zc = sess.zc
    # half loud / half quiet block: only the quiet frames are muted
    blk = tone(dur=1.0, sr=16000)[:bf].copy()
    blk[bf // 2:] = 1e-4
    g = loop._gate(blk.copy())
    np.testing.assert_array_equal(g[: bf // 4], blk[: bf // 4])  # loud kept
    assert np.all(g[-bf // 4:] == 0.0)  # quiet tail muted
    # the gate has ~3 frames of release (40 ms RMS window history)
    assert np.any(g[bf // 2: bf // 2 + 3 * zc] != 0.0)
    # gated blocks still FEED the session: window advances, output flows
    quiet = np.full(bf, 1e-4, np.float32)
    outdata = np.empty(bf, np.float32)
    loop.callback(quiet, outdata)
    assert loop.process_available() == 1
    assert loop.blocks_processed == 1
    assert np.all(sess.input_wav[-bf:] == 0.0)  # muted frames were fed
    # a loud block goes through the model unmuted
    loop.callback(tone(dur=1.0, sr=16000)[:bf], outdata)
    loop.process_available()
    assert loop.blocks_processed == 2
    assert np.abs(sess.input_wav[-bf:]).max() > 0.1


def test_live_config_persistence(tmp_path):
    """LiveConfig round-trips its settings and survives corrupt files
    (reference gui.py:176-247 config.json load with defaults)."""
    from tpu_rvc.pipeline.live import LiveConfig

    p = str(tmp_path / "inuse" / "gui.json")
    cfg = LiveConfig(pth_path="m.pth", pitch=7.0, formant=0.5,
                     index_rate=0.4, block_time=0.5, f0method="fcpe")
    cfg.save(p)
    back = LiveConfig.load(p)
    assert back == cfg
    # unknown keys ignored, missing keys default
    import json as _json
    _json.dump({"pitch": 3.0, "bogus": 1}, open(p, "w"))
    part = LiveConfig.load(p)
    assert part.pitch == 3.0 and part.block_time == 0.25
    # corrupt file -> pure defaults
    open(p, "w").write("{not json")
    assert LiveConfig.load(p) == LiveConfig()
    # valid JSON of the wrong shape (non-dict) -> pure defaults, no crash
    open(p, "w").write("[1, 2, 3]")
    assert LiveConfig.load(p) == LiveConfig()
    open(p, "w").write('"oops"')
    assert LiveConfig.load(p) == LiveConfig()


def test_list_audio_devices_gated():
    """Without sounddevice the enumeration degrades to empty lists
    instead of raising (reference needs PortAudio; we must not)."""
    from tpu_rvc.pipeline.live import list_audio_devices

    devs = list_audio_devices()
    assert set(devs) == {"hostapis", "input", "output"}
    assert all(isinstance(v, list) for v in devs.values())
