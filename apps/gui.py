#!/usr/bin/env python
"""Realtime voice changer app (reference gui.py role, C34).

Two modes:
  --input/--output FILE : stream a file through the realtime engine block by
                          block (exactly the live DSP path: rolling windows,
                          SOLA, crossfade) and write the result — also the
                          reproducible latency harness (prints per-block p50).
  --live                : duplex audio devices via sounddevice when installed
                          (not bundled in this environment), using the native
                          ring buffer (native/ringbuffer.cpp) between the
                          device callback and the model loop.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_session(args):
    from tpu_rvc.models.loader import load_synthesizer
    from tpu_rvc.pipeline.rt import RealtimeVC, StreamSession
    from tpu_rvc.retrieval.index import FeatureIndex

    synth, synth_vars, meta = load_synthesizer(args.model)
    if args.hubert == "random":
        import jax
        import jax.numpy as jnp
        from tpu_rvc.models.hubert import hubert_for_version
        hub = hubert_for_version(meta.get("version", "v2"))
        hub_vars = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 16000)))
    else:
        from tpu_rvc.ckpt.hubert_loader import load_hubert_base
        hub, hub_vars = load_hubert_base(args.hubert,
                                         meta.get("version", "v2"))
    index = FeatureIndex.load(args.index) if args.index else None
    engine = RealtimeVC(
        hubert=hub, hubert_vars=hub_vars, synth=synth, synth_vars=synth_vars,
        version=meta.get("version", "v2"), if_f0=int(meta.get("f0", 1)),
        index=index, index_rate=args.index_rate, f0_up_key=args.f0_up_key,
        formant_shift=args.formant, rmvpe_root=args.rmvpe_root)
    sess = StreamSession(
        engine, samplerate=args.samplerate, block_time=args.block_time,
        crossfade_time=args.crossfade_time, extra_time=args.extra_time,
        f0method=args.f0_method, rms_mix_rate=args.rms_mix_rate,
        protect=args.protect, use_phase_vocoder=args.use_pv)
    return sess


def run_file(args):
    from tpu_rvc.audio.io import load_audio, save_wav

    sess = build_session(args)
    audio = load_audio(args.input, args.samplerate)
    bf = sess.block_frame
    n_blocks = len(audio) // bf
    outs, lat = [], []
    for i in range(n_blocks):
        t0 = time.perf_counter()
        outs.append(sess.feed(audio[i * bf:(i + 1) * bf]))
        lat.append(time.perf_counter() - t0)
    out = np.concatenate(outs) if outs else np.zeros(0, np.float32)
    save_wav(args.output, out, args.samplerate)
    lat_ms = np.asarray(lat[1:]) * 1000  # skip the compile block
    budget = args.block_time * 1000
    print(f"wrote {args.output}: {len(out) / args.samplerate:.2f}s, "
          f"{n_blocks} blocks")
    if len(lat_ms):
        print(f"block latency p50={np.percentile(lat_ms, 50):.1f}ms "
              f"p90={np.percentile(lat_ms, 90):.1f}ms "
              f"(budget {budget:.0f}ms, realtime: "
              f"{'YES' if np.percentile(lat_ms, 50) < budget else 'NO'})")


def run_live(args):  # pragma: no cover - needs audio hardware
    try:
        import sounddevice as sd
    except ImportError:
        print("live mode requires the sounddevice package (PortAudio); "
              "use --input/--output for file streaming")
        sys.exit(1)
    from tpu_rvc.audio.native_ring import NativeRingBuffer

    sess = build_session(args)
    bf = sess.block_frame
    in_ring = NativeRingBuffer(bf * 8)
    out_ring = NativeRingBuffer(bf * 8)

    def callback(indata, outdata, frames, t, status):
        in_ring.write(indata[:, 0].astype(np.float32))
        outdata[:, 0] = out_ring.read(frames)

    with sd.Stream(samplerate=args.samplerate, blocksize=bf,
                   channels=1, callback=callback):
        print("live voice changer running; ctrl-c to stop "
              f"(algorithmic delay ~{args.block_time + args.crossfade_time + 0.01:.2f}s)")
        while True:
            if in_ring.readable() >= bf:
                out_ring.write(sess.feed(in_ring.read(bf)))
            else:
                time.sleep(0.002)


def main():
    p = argparse.ArgumentParser(description="tpu_rvc realtime voice changer")
    p.add_argument("--model", required=True)
    p.add_argument("--index", default="")
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    p.add_argument("--input", help="input file (file mode)")
    p.add_argument("--output", default="rt_out.wav")
    p.add_argument("--live", action="store_true")
    p.add_argument("--samplerate", type=int, default=48000)
    p.add_argument("--block-time", type=float, default=0.25)
    p.add_argument("--crossfade-time", type=float, default=0.05)
    p.add_argument("--extra-time", type=float, default=2.5)
    p.add_argument("--f0-method", default="rmvpe")
    p.add_argument("--f0-up-key", type=float, default=0)
    p.add_argument("--formant", type=float, default=0)
    p.add_argument("--index-rate", type=float, default=0.0)
    p.add_argument("--rms-mix-rate", type=float, default=1.0)
    p.add_argument("--protect", type=float, default=0.33)
    p.add_argument("--use-pv", action="store_true",
                   help="phase vocoder crossfade instead of linear")
    args = p.parse_args()
    if args.live:
        run_live(args)
    elif args.input:
        run_file(args)
    else:
        p.error("need --input FILE or --live")


if __name__ == "__main__":
    main()
