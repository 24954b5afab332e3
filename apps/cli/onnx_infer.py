#!/usr/bin/env python
"""Convert audio through exported ONNX graphs (reference tools/cmd/onnx
demo + rvc/onnx/infer.py): a synthesizer .onnx (see `model_tools
export-onnx`) plus an optional ContentVec .onnx (see
tpu_rvc.ckpt.jax2onnx.export_hubert_onnx)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", required=True, help="synthesizer .onnx")
    p.add_argument("--vec", default="", help="ContentVec/HuBERT .onnx")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="onnx_out.wav")
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--f0-method", default="dio")
    p.add_argument("--f0-up-key", type=int, default=0)
    p.add_argument("--hop", type=int, default=512)
    p.add_argument("--sr", type=int, default=40000,
                   help="model output sample rate")
    args = p.parse_args()

    import numpy as np
    from tpu_rvc.audio.io import load_audio, save_audio
    from tpu_rvc.pipeline.onnx_infer import OnnxRVC

    wav = load_audio(args.input, args.sr)
    rvc = OnnxRVC(args.model, hop_len=args.hop, model_sr=args.sr,
                  vec_path=args.vec or None)
    out = rvc.infer(wav, args.sr, sid=args.sid, f0_method=args.f0_method,
                    f0_up_key=args.f0_up_key)
    save_audio(args.output, out.astype(np.float32) / 32768.0, args.sr)
    print(f"wrote {args.output} ({len(out) / args.sr:.2f}s)")


if __name__ == "__main__":
    main()
