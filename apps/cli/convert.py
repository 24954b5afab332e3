#!/usr/bin/env python
"""Single-file conversion CLI (reference tools/cmd/infer_cli.py:20-62).

Example:
  python apps/cli/convert.py --input in.wav --output out.wav \
      --model assets/weights/voice.pth --index voice.tpuidx.npz \
      --f0-up-key 0 --f0-method rmvpe --index-rate 0.75
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description="tpu_rvc voice conversion")
    p.add_argument("--input", required=True, help="input audio file")
    p.add_argument("--output", required=True, help="output wav path")
    p.add_argument("--model", required=True, help="RVC small model .pth")
    p.add_argument("--index", default="", help="feature index (.npz or .npy)")
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    p.add_argument("--sid", type=int, default=0, help="speaker id")
    p.add_argument("--f0-up-key", type=int, default=0,
                   help="transpose in semitones")
    p.add_argument("--f0-method", default="rmvpe",
                   choices=["pm", "dio", "harvest", "crepe", "rmvpe", "fcpe"])
    p.add_argument("--f0-file", default="", help="manual f0 curve file")
    p.add_argument("--index-rate", type=float, default=0.66)
    p.add_argument("--filter-radius", type=int, default=3)
    p.add_argument("--resample-sr", type=int, default=0)
    p.add_argument("--rms-mix-rate", type=float, default=1.0)
    p.add_argument("--protect", type=float, default=0.33)
    p.add_argument("--fp32", action="store_true",
                   help="disable bfloat16 compute")
    p.add_argument("--chunk-parallel", action="store_true",
                   help="shard a long file's chunks over all devices")
    p.add_argument("--aot-cache", default=".jax_cache", metavar="DIR",
                   help="warm-start cache dir for compiled graphs "
                        "(persistent XLA executable cache + StableHLO "
                        "exports); pass '' to disable")
    args = p.parse_args()

    import numpy as np
    from tpu_rvc.pipeline.vc import VC
    from tpu_rvc.retrieval.index import FeatureIndex
    from tpu_rvc.audio.io import save_audio

    if args.aot_cache:
        from tpu_rvc.utils.aot import enable_persistent_compilation_cache
        enable_persistent_compilation_cache(args.aot_cache)

    vc = VC(is_half=not args.fp32, rmvpe_root=args.rmvpe_root,
            hubert_path=args.hubert, aot_dir=args.aot_cache or None)
    meta = vc.get_vc(args.model)
    print(f"loaded {args.model}: sr={vc.tgt_sr}, version={vc.version}, "
          f"f0={vc.if_f0}, speakers={vc.n_spk}")
    index = None
    if args.index and os.path.exists(args.index):
        index = FeatureIndex.load(args.index)
        print(f"index: {index.vectors.shape[0]} x {index.dim}")

    f0_file = None
    if args.f0_file and os.path.exists(args.f0_file):
        rows = [line.split(",") for line in
                open(args.f0_file).read().strip().split("\n")]
        f0_file = np.asarray([[float(x) for x in r] for r in rows],
                             np.float32)

    info, (sr, audio) = vc.vc_single(
        args.sid, args.input, args.f0_up_key, args.f0_method, index,
        args.index_rate, args.filter_radius, args.resample_sr,
        args.rms_mix_rate, args.protect, f0_file,
        chunk_parallel=args.chunk_parallel)
    save_audio(args.output, audio, sr)
    print(f"{info}\nwrote {args.output} ({len(audio) / sr:.2f}s @ {sr} Hz)")


if __name__ == "__main__":
    main()
