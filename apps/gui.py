#!/usr/bin/env python
"""Realtime voice changer app (reference gui.py role, C34).

Modes:
  --input/--output FILE : stream a file through the realtime engine block by
                          block (exactly the live DSP path: rolling windows,
                          SOLA, crossfade) and write the result — also the
                          reproducible latency harness (prints per-block p50).
  --live                : duplex audio devices via sounddevice when installed
                          (not bundled in this environment), coupling the
                          device callback to the model loop through
                          LiveLoop's ring buffers (native/ringbuffer.cpp).
  --list-devices        : enumerate audio devices (reference gui.py:252-294).

Settings persist across sessions in a JSON config (reference
gui.py:176-247,650-651 configs/inuse/config.json), loaded as flag defaults
and saved on every run.  In live and file modes an interactive control
thread reads stdin commands that drive the engine mid-stream — the role of
the reference GUI's live sliders (gui.py:518-592):

    key <semitones> | formant <shift> | index <rate> | rms <rate> | quit
"""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

# anchored at the repo root (not the cwd) so persisted settings
# round-trip regardless of the launch directory
CONFIG_PATH = os.environ.get(
    "TPU_RVC_GUI_CONFIG",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 "configs", "inuse", "gui.json"))


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


def control_thread(target, stop_event):  # pragma: no cover - stdin driven
    """Read live-control commands from stdin (the reference GUI's slider
    events, gui.py:518-592) and apply them mid-stream."""
    print("controls: key <n> | formant <f> | index <r> | rms <r> | quit")
    try:
        for line in sys.stdin:
            parts = line.split()
            if not parts:
                continue
            cmd, val = parts[0], (float(parts[1]) if len(parts) > 1 else 0.0)
            if cmd == "key":
                target.set_key(val)
            elif cmd == "formant":
                target.set_formant(val)
            elif cmd == "index":
                target.set_index_rate(val)
            elif cmd == "rms":
                target.set_rms_mix_rate(val)
            elif cmd in ("quit", "exit", "stop"):
                stop_event.set()
                return
            else:
                print(f"unknown command {cmd}")
    except (OSError, ValueError):  # captured/closed stdin (test harnesses)
        return


def run_file(args):
    from tpu_rvc.audio.io import load_audio, save_wav

    sess = build_session(args)
    audio = load_audio(args.input, args.samplerate)
    bf = sess.block_frame
    n_blocks = len(audio) // bf
    # same stdin control surface as live mode (docstring contract): a
    # daemon reader applies key/formant/index/rms mid-stream; 'quit'
    # stops after the current block
    stop = threading.Event()
    threading.Thread(target=control_thread, args=(sess, stop),
                     daemon=True).start()
    outs, lat = [], []
    for i in range(n_blocks):
        if stop.is_set():
            n_blocks = i
            break
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
    from tpu_rvc.pipeline.live import LiveLoop

    sess = build_session(args)
    loop = LiveLoop(sess, threshold_db=args.threshold)
    stop = threading.Event()
    threading.Thread(target=control_thread, args=(loop, stop),
                     daemon=True).start()
    kw = {}
    if args.input_device:
        kw["device"] = (args.input_device, args.output_device
                        or args.input_device)
    with sd.Stream(samplerate=args.samplerate, blocksize=loop.block_frame,
                   channels=1, callback=loop.callback, **kw):
        delay = args.block_time + args.crossfade_time + 0.01
        print(f"live voice changer running; algorithmic delay ~{delay:.2f}s")
        try:
            loop.run(stop)
        except KeyboardInterrupt:
            pass
    print("stats:", loop.stats())


def main(argv=None):
    from tpu_rvc.pipeline.live import LiveConfig, list_audio_devices

    cfg = LiveConfig.load(CONFIG_PATH)
    p = argparse.ArgumentParser(description="tpu_rvc realtime voice changer")
    p.add_argument("--model", default=cfg.pth_path)
    p.add_argument("--index", default=cfg.index_path)
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    p.add_argument("--input", help="input file (file mode)")
    p.add_argument("--output", default="rt_out.wav")
    p.add_argument("--live", action="store_true")
    p.add_argument("--list-devices", action="store_true")
    p.add_argument("--input-device", default=cfg.sg_input_device)
    p.add_argument("--output-device", default=cfg.sg_output_device)
    p.add_argument("--samplerate", type=int, default=cfg.samplerate)
    p.add_argument("--block-time", type=float, default=cfg.block_time)
    p.add_argument("--crossfade-time", type=float,
                   default=cfg.crossfade_length)
    p.add_argument("--extra-time", type=float, default=cfg.extra_time)
    p.add_argument("--threshold", type=float, default=cfg.threhold,
                   help="input dB gate")
    p.add_argument("--f0-method", default=cfg.f0method)
    p.add_argument("--f0-up-key", type=float, default=cfg.pitch)
    p.add_argument("--formant", type=float, default=cfg.formant)
    p.add_argument("--index-rate", type=float, default=cfg.index_rate)
    p.add_argument("--rms-mix-rate", type=float, default=cfg.rms_mix_rate)
    p.add_argument("--protect", type=float, default=0.33)
    p.add_argument("--use-pv", action=argparse.BooleanOptionalAction,
                   default=cfg.use_pv,
                   help="phase vocoder crossfade instead of linear "
                        "(--no-use-pv turns a persisted setting off)")
    p.add_argument("--no-save-config", action="store_true")
    args = p.parse_args(argv)

    if args.list_devices:
        devs = list_audio_devices()
        for kind in ("hostapis", "input", "output"):
            print(f"{kind}:")
            for n in devs[kind]:
                print(f"  {n}")
        return

    if not args.no_save_config:
        # persist the effective settings (reference gui.py:650-651)
        cfg = LiveConfig(
            pth_path=args.model or "", index_path=args.index or "",
            sg_input_device=args.input_device or "",
            sg_output_device=args.output_device or "",
            threhold=args.threshold, pitch=args.f0_up_key,
            formant=args.formant, index_rate=args.index_rate,
            rms_mix_rate=args.rms_mix_rate, block_time=args.block_time,
            crossfade_length=args.crossfade_time, extra_time=args.extra_time,
            f0method=args.f0_method, use_pv=args.use_pv,
            samplerate=args.samplerate)
        cfg.save(CONFIG_PATH)

    if not args.model:
        p.error("need --model (or a persisted pth_path in the config)")
    if args.live:
        run_live(args)
    elif args.input:
        run_file(args)
    else:
        p.error("need --input FILE, --live, or --list-devices")


if __name__ == "__main__":
    main()
