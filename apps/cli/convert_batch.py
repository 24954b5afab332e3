#!/usr/bin/env python
"""Batch folder conversion CLI (reference tools/cmd/infer_batch_rvc.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description="tpu_rvc batch conversion")
    p.add_argument("--input-dir", required=True)
    p.add_argument("--output-dir", required=True)
    p.add_argument("--model", required=True)
    p.add_argument("--index", default="")
    p.add_argument("--hubert", default="assets/hubert/hubert_base.pt")
    p.add_argument("--rmvpe-root", default="assets/rmvpe")
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--f0-up-key", type=int, default=0)
    p.add_argument("--f0-method", default="rmvpe")
    p.add_argument("--index-rate", type=float, default=0.66)
    p.add_argument("--filter-radius", type=int, default=3)
    p.add_argument("--resample-sr", type=int, default=0)
    p.add_argument("--rms-mix-rate", type=float, default=1.0)
    p.add_argument("--protect", type=float, default=0.33)
    args = p.parse_args()

    from tpu_rvc.pipeline.vc import VC
    from tpu_rvc.retrieval.index import FeatureIndex

    vc = VC(rmvpe_root=args.rmvpe_root, hubert_path=args.hubert)
    vc.get_vc(args.model)
    index = FeatureIndex.load(args.index) if args.index else None
    paths = [os.path.join(args.input_dir, n)
             for n in sorted(os.listdir(args.input_dir))]
    report = vc.vc_multi(
        args.sid, paths, args.output_dir, f0_up_key=args.f0_up_key,
        f0_method=args.f0_method, index=index, index_rate=args.index_rate,
        filter_radius=args.filter_radius, resample_sr=args.resample_sr,
        rms_mix_rate=args.rms_mix_rate, protect=args.protect)
    print(report)


if __name__ == "__main__":
    main()
