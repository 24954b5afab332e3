#!/usr/bin/env python
"""Vocal/instrument separation CLI (reference infer/modules/uvr5/modules.py
`uvr` flow, minus the gradio plumbing).

Example:
  python apps/cli/separate.py --model assets/uvr5_weights/HP5.pth \
      --input song.wav --vocal-dir opt/voc --ins-dir opt/ins --agg 10
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description="tpu_rvc source separation")
    p.add_argument("--model", required=True,
                   help=".pth VR checkpoint (HP2/HP3/HP5/DeEcho/DeReverb) "
                        "or onnx_dereverb_By_FoxJoy directory")
    p.add_argument("--input", action="append", default=[],
                   help="input audio file (repeatable)")
    p.add_argument("--input-dir", default="",
                   help="directory of input files (reference inp_root)")
    p.add_argument("--vocal-dir", default="opt_vocal")
    p.add_argument("--ins-dir", default="opt_ins")
    p.add_argument("--agg", type=float, default=10.0,
                   help="vocal aggressiveness 0..20")
    p.add_argument("--tta", action="store_true")
    p.add_argument("--engine", choices=["auto", "device", "host"],
                   default="auto",
                   help="'device' = one fused on-chip graph per length "
                        "bucket (fast on TPU); 'host' = per-band/"
                        "per-window orchestration; auto picks by backend")
    args = p.parse_args()

    paths = list(args.input)
    if args.input_dir:
        paths += [os.path.join(args.input_dir, n)
                  for n in sorted(os.listdir(args.input_dir))]
    if not paths:
        p.error("give --input and/or --input-dir")

    from tpu_rvc.pipeline.uvr5 import load_separator
    from tpu_rvc.audio.io import save_audio

    sep = load_separator(args.model, agg=args.agg, tta=args.tta)
    runner = sep
    if not hasattr(sep, "_path_audio_"):
        use_device = args.engine == "device"
        if args.engine == "auto":
            import jax
            use_device = jax.devices()[0].platform != "cpu"
        if use_device:
            from tpu_rvc.pipeline.uvr5 import DeviceSeparator
            from tpu_rvc.utils.aot import AOTGraphCache
            # AOT cache warm-starts the fused per-bucket graphs across
            # process invocations (compiles cost minutes on the TPU)
            runner = DeviceSeparator(sep, aot_cache=AOTGraphCache())
    os.makedirs(args.vocal_dir, exist_ok=True)
    os.makedirs(args.ins_dir, exist_ok=True)
    for path in paths:
        name = os.path.basename(path)
        try:
            if hasattr(sep, "_path_audio_"):  # MDXNetDereverb interface
                sep._path_audio_(path, args.vocal_dir, args.ins_dir)
            else:
                ins, voc, sr = runner.separate(path)
                save_audio(os.path.join(args.ins_dir,
                                        f"instrument_{name}.wav"), ins, sr)
                save_audio(os.path.join(args.vocal_dir,
                                        f"vocal_{name}.wav"), voc, sr)
            print(f"{name} -> Success")
        except Exception as e:  # keep batch going (reference yields infos)
            print(f"{name} -> {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
