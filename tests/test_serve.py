"""Multi-client streaming server tests: SlotScheduler batched serving
core and the TCP framing front end (apps/serve.py), hardware-free.

The reference has no serving surface (rtrvc is one process per user);
these tests cover the beyond-reference batched path: N sessions advanced
by one dispatch, per-slot SOLA seams, underrun accounting, and the wire
protocol end-to-end over a real socket."""

import os
import sys
import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_rvc.models.synthesizer import Synthesizer
from tpu_rvc.models.hubert import Hubert
from tpu_rvc.pipeline.rt import RealtimeVC
from tpu_rvc.pipeline.serve import SlotScheduler

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "apps"))

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


class FakeClock:
    """Hand-advanced monotonic clock: CPU ticks here are far slower than
    the 160 ms block, so wall time would fake starvation; tests advance
    time explicitly to exercise the underrun cadence."""

    def __init__(self):
        self.t = 0.0

    def __call__(self) -> float:
        return self.t


@pytest.fixture(scope="module")
def sched(engine):
    """Shared 2-slot scheduler (one CPU compile for the whole module):
    16 kHz, 160 ms blocks, 0.64 s extra context -> skip_head 64."""
    clk = FakeClock()
    s = SlotScheduler(engine, n_slots=2, samplerate=16000,
                      block_time=0.16, crossfade_time=0.04,
                      extra_time=0.64, f0method="pm", clock=clk)
    s.test_clock = clk
    return s


def tone(hz, sr=16000, dur=1.0):
    t = np.arange(int(sr * dur)) / sr
    return (0.5 * np.sin(2 * np.pi * hz * t)).astype(np.float32)


def drain(sched, slot, want, max_ticks=50):
    got = np.zeros(0, np.float32)
    ticks = 0
    while len(got) < want and ticks < max_ticks:
        if sched.ready():
            sched.tick()
        got = np.concatenate([got, sched.collect(slot)])
        ticks += 1
    return got


def test_two_streams_one_dispatch(sched):
    bf = sched.block_frame
    assert bf == 2560  # 160 ms at 16 kHz
    s0, s1 = sched.attach(), sched.attach()
    n = 4
    sched.submit(s0, tone(220.0, dur=n * bf / 16000))
    sched.submit(s1, tone(330.0, dur=n * bf / 16000))
    out0 = np.zeros(0, np.float32)
    out1 = np.zeros(0, np.float32)
    while sched.ready():
        sched.tick()
        out0 = np.concatenate([out0, sched.collect(s0)])
        out1 = np.concatenate([out1, sched.collect(s1)])
    assert len(out0) == n * bf and len(out1) == n * bf
    assert np.isfinite(out0).all() and np.isfinite(out1).all()
    # both streams produced audio, and they differ (independent inputs)
    assert np.abs(out0[bf:]).max() > 1e-4
    assert np.abs(out0[bf:] - out1[bf:]).max() > 1e-4
    st = sched.stats()
    assert st["underruns"] == [0, 0] and st["blocks"] == [n, n]
    # continuity across SOLA seams: no pathological step at block joins
    for k in range(2, n):
        seam = abs(float(out0[k * bf]) - float(out0[k * bf - 1]))
        assert seam < 0.5, f"discontinuity {seam} at block {k}"
    sched.detach(s0)
    sched.detach(s1)


def test_underrun_accounting_and_recovery(sched):
    bf = sched.block_frame
    s = sched.attach()
    # no underrun before the first submit: tick is a no-op for this slot
    assert not sched.ready()
    sched.submit(s, tone(220.0, dur=bf / 16000))  # exactly one block
    while sched.ready():
        sched.tick()
    assert sched.stats()["underruns"][s] == 0
    # starve: a slot is only silence-fed once it is a full block_time
    # past its last feed (phase-offset clients must not starve each
    # other), so advance the clock past the block period, then force the
    # tick that another slot's readiness would normally trigger
    assert not sched.ready()  # not overdue yet -> no underrun pressure
    sched.test_clock.t += sched.block_time + 0.01
    assert sched.ready()  # overdue now
    sched.tick()
    st = sched.stats()
    assert st["underruns"][s] == 1
    out = sched.collect(s)
    assert len(out) == 2 * bf  # silence block still emitted (cadence)
    # recovery: feeding again keeps converting
    sched.submit(s, tone(220.0, dur=bf / 16000))
    while sched.ready():
        sched.tick()
    assert len(sched.collect(s)) == bf
    assert sched.stats()["blocks"][s] == 3
    sched.detach(s)


def test_chunk_queue_pop_edge_cases():
    from tpu_rvc.pipeline.serve import _ChunkQueue
    q = _ChunkQueue()
    assert len(q.pop(0)) == 0 and len(q.pop()) == 0
    q.push(np.arange(5, dtype=np.float32))
    q.push(np.arange(5, 9, dtype=np.float32))
    assert len(q.pop(0)) == 0 and len(q) == 9  # pop(0) is a no-op
    np.testing.assert_array_equal(q.pop(7), np.arange(7, dtype=np.float32))
    np.testing.assert_array_equal(q.pop(), np.asarray([7.0, 8.0]))


def test_reattach_during_dispatch_gets_no_foreign_audio(sched):
    """A detach+attach while the (unlocked) device dispatch is in flight
    must NOT deliver the previous occupant's converted audio to the new
    client (the generation check in tick)."""
    bf = sched.block_frame
    s = sched.attach()
    sched.submit(s, tone(220.0, dur=bf / 16000))
    orig = sched.fused
    took_over = []

    def hijack(state, seg, fed=None, fetch=True):
        out, st = orig(state, seg, fed=fed, fetch=fetch)
        # simulate the race: the old client leaves and a new one claims
        # the same slot while the dispatch is still in flight
        sched.detach(s)
        took_over.append(sched.attach())
        return out, st

    sched.fused = hijack
    try:
        sched.tick()
    finally:
        sched.fused = orig
    assert took_over == [s]  # same slot was reclaimed
    assert len(sched.collect(s)) == 0  # new occupant got NO foreign audio
    assert sched.stats()["blocks"][s] == 0
    sched.detach(s)


def test_attach_detach_capacity(sched):
    a = sched.attach()
    b = sched.attach()
    with pytest.raises(RuntimeError, match="server full"):
        sched.attach()
    sched.detach(a)
    c = sched.attach()  # freed slot is reusable, state reset
    assert c == a
    assert sched.stats()["blocks"][c] == 0
    sched.detach(b)
    sched.detach(c)


def test_tcp_server_end_to_end(sched, tmp_path):
    """Full wire-protocol drive: spin the TCP server on an ephemeral
    port, stream a wav through it with the bundled client, check the
    converted file and the stats reply."""
    from serve import VCServer, stream_file
    from tpu_rvc.audio.io import load_wav, save_wav

    srv = VCServer(("127.0.0.1", 0), sched)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        bf = sched.block_frame
        in_path = str(tmp_path / "in.wav")
        out_path = str(tmp_path / "out.wav")
        save_wav(in_path, tone(220.0, dur=4 * bf / 16000), 16000)
        stats = stream_file("127.0.0.1", port, in_path, out_path,
                            timeout=120.0)
        assert stats["blocks"][0] >= 4 and stats["samplerate"] == 16000
        y, sr = load_wav(out_path)
        assert sr == 16000 and len(y) == 4 * bf
        assert np.isfinite(y).all() and np.abs(y[bf:]).max() > 1e-4
    finally:
        srv.shutdown()
        srv.server_close()


@pytest.mark.slow
def test_scheduler_soak_sustained_churn(sched):
    """Endurance: hundreds of ticks at capacity with random attach/detach,
    late submits (deliberate starvation), and per-slot phase-continuous
    input.  Invariants checked EVERY tick: bounded input/output queues,
    underruns only on deliberately starved slots.  At the end: SOLA seam
    continuity — block-boundary sample jumps must look like within-block
    jumps, not discontinuities (reference gui.py:1057-1090 SOLA role)."""
    rng = np.random.default_rng(2024)
    clk = sched.test_clock
    bf = sched.block_frame
    sr = sched.sr
    n_ticks = 320
    max_queue = 6 * bf

    class Client:
        def __init__(self, slot, hz):
            self.slot = slot
            self.hz = hz
            self.sent = 0          # samples submitted (phase-continuous)
            self.got = np.zeros(0, np.float32)
            self.starved_ticks = 0
            self.fed_blocks = 0
            self.late = False

        def chunk(self, n):
            t = (np.arange(self.sent, self.sent + n)) / sr
            self.sent += n
            return (0.5 * np.sin(2 * np.pi * self.hz * t)).astype(np.float32)

    clients = {}
    finished = []
    clean = None
    attach_fail_ok = 0
    for tick in range(n_ticks):
        # churn: sometimes detach, sometimes attach (target: at capacity);
        # slot of the first-ever client ("clean") is exempt from detach
        # and starvation so the seam check always has a long clean stream
        churnable = [s for s in clients
                     if clients[s] is not clean or tick > n_ticks - 40]
        if churnable and rng.random() < 0.03:
            slot = rng.choice(churnable)
            finished.append(clients.pop(slot))
            sched.detach(slot)
        while len(clients) < sched.n_slots and rng.random() < 0.7:
            try:
                slot = sched.attach()
            except RuntimeError:
                attach_fail_ok += 1
                break
            clients[slot] = Client(slot, hz=float(rng.integers(150, 400)))
            if clean is None:
                clean = clients[slot]
        # feed at exact realtime rate: normally one block per tick; a
        # "late submit" skips a tick and catches up with 2 blocks on the
        # next (models client latency without exceeding realtime rate)
        for c in clients.values():
            if c.late:
                sched.submit(c.slot, c.chunk(2 * bf))
                c.fed_blocks += 2
                c.late = False
            elif c is not clean and rng.random() < 0.10:
                c.starved_ticks += 1          # late submit: starve this tick
                c.late = True
            else:
                sched.submit(c.slot, c.chunk(bf))
                c.fed_blocks += 1
        clk.t += sched.block_time            # realtime cadence
        if sched.ready():
            sched.tick()
        for c in clients.values():
            c.got = np.concatenate([c.got, sched.collect(c.slot)])
        # ---- invariants every tick ----
        for s in range(sched.n_slots):
            assert len(sched._in_buf[s]) < max_queue, \
                f"tick {tick}: slot {s} input queue grew to " \
                f"{len(sched._in_buf[s])}"
            assert len(sched._out_buf[s]) < max_queue
        st = sched.stats()
        for s in range(sched.n_slots):
            if s in clients and clients[s].starved_ticks == 0:
                assert st["underruns"][s] == 0, \
                    f"tick {tick}: underrun on never-starved slot {s}"

    # drain + release
    for c in list(clients.values()):
        finished.append(c)
        sched.detach(c.slot)
    # long-lived, never-starved clients: output flows and seams are smooth
    checked = 0
    for c in finished:
        if c.fed_blocks < 20 or c.starved_ticks or len(c.got) < 10 * bf:
            continue
        out = c.got
        assert np.isfinite(out).all()
        assert np.abs(out[5 * bf:]).max() > 0   # stream actually carried
        d = np.abs(np.diff(out))
        idx = np.arange(len(d))
        at_seam = (idx + 1) % bf == 0
        within = d[~at_seam & (idx > 2 * bf)]
        seams = d[at_seam & (idx > 2 * bf)]
        if len(seams) < 5:
            continue
        p99_within = np.quantile(within, 0.99)
        # SOLA + crossfade: a seam jump must look like an ordinary jump
        assert seams.max() <= max(6 * p99_within, 1e-3), \
            f"seam discontinuity: {seams.max():.4f} vs within-p99 " \
            f"{p99_within:.4f}"
        checked += 1
    assert checked >= 1, "soak never produced a checkable long stream"
    # scheduler is reusable after the soak (no leaked slot state)
    s2 = sched.attach()
    sched.detach(s2)


@pytest.mark.slow
def test_stream_session_soak_slider_churn(engine):
    """StreamSession endurance under park/restore churn: ~100 blocks with
    periodic mid-stream slider changes (key, index_rate, formant on/off —
    formant parks the fused graph, neutral restores it).  The stream must
    stay finite and flowing through every transition (reference
    gui.py:518-592 slider events)."""
    from tpu_rvc.pipeline.rt import StreamSession

    sess = StreamSession(engine, samplerate=16000, block_time=0.16,
                         crossfade_time=0.04, extra_time=0.5,
                         f0method="pm", rms_mix_rate=1.0)
    had_fused = sess._fused is not None
    bf = sess.block_frame
    rng = np.random.default_rng(7)
    n_blocks = 100
    t = np.arange(n_blocks * bf) / 16000.0
    audio = (0.5 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    park_cycles = 0
    outs = []
    for i in range(n_blocks):
        if i and i % 10 == 0:
            r = rng.random()
            if r < 0.4:
                sess.set_key(float(rng.integers(-6, 7)))
            elif r < 0.7:
                sess.set_formant(1.0)      # parks the fused graph
                park_cycles += 1
            else:
                sess.set_formant(0.0)      # restores it
        out = sess.feed(audio[i * bf:(i + 1) * bf])
        assert out.shape[0] == bf
        assert np.isfinite(out).all(), f"block {i} not finite"
        outs.append(out)
    sess.set_formant(0.0)
    out = sess.feed(audio[:bf])
    assert np.isfinite(out).all()
    if had_fused:
        assert sess._fused is not None    # restored after churn
    assert park_cycles >= 2
    full = np.concatenate(outs)
    assert np.abs(full[10 * bf:]).max() > 0
    engine.set_key(0.0)
    engine.set_formant(0.0)


def test_fused_stream_graph_aot_roundtrip(tmp_path, engine):
    """The serving graph (FusedStreamGraph) warm-starts from the AOT
    cache: a fresh engine + graph in the same cache dir must reload the
    StableHLO export (no retrace) and produce identical audio for the
    same state/input/step (reference jit-cache role, rvc/jit/jit.py:58).
    If jax.export cannot serialize the donated-state graph the wrapper
    falls back to plain jit — the test then only asserts functionality."""
    from tpu_rvc.pipeline.rt import FusedStreamGraph
    from tpu_rvc.utils.aot import AOTGraphCache

    sr = 16000
    zc = sr // 100
    geo = dict(stream_sr=sr, block_frame=16 * zc, ctx_frame=2 * zc,
               total_len=(50 + 16 + 5 + 1) * zc, skip_head=50,
               return_length=16 + 5 + 1, f0method="pm")
    t = np.arange(16 * zc + 2 * zc) / sr
    seg = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)

    engine.aot_cache = AOTGraphCache(str(tmp_path), platform="cpu")
    fused1 = FusedStreamGraph(engine, **geo)
    s1 = fused1.init_state()
    out1, s1 = fused1(s1, seg)
    exported = [p for p in os.listdir(tmp_path) if p.endswith(".stablehlo")]

    cache2 = AOTGraphCache(str(tmp_path), platform="cpu")
    engine.aot_cache = cache2
    fused2 = FusedStreamGraph(engine, **geo)
    s2 = fused2.init_state()
    out2, s2 = fused2(s2, seg)
    engine.aot_cache = None
    assert out1.shape == out2.shape
    assert np.isfinite(out2).all()
    if exported:  # export succeeded -> reload must hit and match
        assert cache2.hits == 1 and cache2.misses == 0
        np.testing.assert_allclose(out1, out2, atol=1e-6)
    else:  # donated-arg export unsupported: fallback path must still work
        assert cache2.misses >= 1


def test_pipelined_tick_parity_and_delay(engine):
    """pipelined=True overlaps tick k's fetch with tick k+1's dispatch:
    the first tick delivers nothing (its block is in flight), every
    later tick delivers the previous tick's block, flush() drains the
    final one, and the total stream content is identical to the serial
    scheduler (in-order drain keeps SOLA seams consistent)."""
    kw = dict(n_slots=2, samplerate=16000, block_time=0.16,
              crossfade_time=0.04, extra_time=0.64, f0method="pm",
              clock=FakeClock())
    n = 4
    results = {}
    for pipelined in (False, True):
        s = SlotScheduler(engine, pipelined=pipelined, **kw)
        bf = s.block_frame
        s0, s1 = s.attach(), s.attach()
        s.submit(s0, tone(220.0, dur=n * bf / 16000))
        s.submit(s1, tone(330.0, dur=n * bf / 16000))
        got0, got1, per_tick = [], [], []
        while s.ready():
            s.tick()
            a, b = s.collect(s0), s.collect(s1)
            per_tick.append(len(a))
            got0.append(a)
            got1.append(b)
        s.flush()
        flushed = s.collect(s0)
        got0.append(flushed)
        got1.append(s.collect(s1))
        st = s.stats()
        assert st["underruns"] == [0, 0]
        assert st["blocks"] == [n, n], (pipelined, st)
        results[pipelined] = (np.concatenate(got0), np.concatenate(got1),
                              per_tick, len(flushed))

    ser0, ser1, ser_ticks, ser_flush = results[False]
    pip0, pip1, pip_ticks, pip_flush = results[True]
    bf = 2560
    assert len(ser0) == n * bf and len(pip0) == n * bf
    # serial: every tick delivers its own block, nothing left to flush
    assert ser_ticks == [bf] * n and ser_flush == 0
    # pipelined: first tick delivers nothing, flush drains the last block
    assert pip_ticks == [0] + [bf] * (n - 1) and pip_flush == bf
    # identical audio (same graphs, same per-dispatch noise keys)
    np.testing.assert_allclose(pip0, ser0, atol=1e-6)
    np.testing.assert_allclose(pip1, ser1, atol=1e-6)
