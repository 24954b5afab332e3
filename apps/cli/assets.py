#!/usr/bin/env python
"""Asset management CLI (reference rvcmd / infer/lib/rvcmd.py roles):
verify sha256.env integrity, download missing assets, regenerate checksums
(native/checksum for the C++ path)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    p = argparse.ArgumentParser(description="tpu_rvc asset tools")
    sub = p.add_subparsers(dest="cmd", required=True)

    sc = sub.add_parser("check", help="verify all assets in sha256.env")
    sc.add_argument("--root", default=".")

    sd = sub.add_parser("download", help="fetch missing/corrupt assets")
    sd.add_argument("--root", default=".")
    sd.add_argument("--mirror",
                    default="https://huggingface.co/lj1995/"
                            "VoiceConversionWebUI/resolve/main")

    sg = sub.add_parser("gen", help="regenerate sha256.env for files")
    sg.add_argument("--out", default="sha256.env")
    sg.add_argument("files", nargs="+")

    args = p.parse_args()
    from tpu_rvc.utils import assets

    if args.cmd == "check":
        ok = assets.check_all_assets(args.root)
        print("all assets OK" if ok else "missing or corrupt assets")
        sys.exit(0 if ok else 1)
    elif args.cmd == "download":
        assets.download_all_assets(args.root, args.mirror)
        print("done")
    elif args.cmd == "gen":
        # prefer the native C++ tool when built
        native = os.path.join(os.path.dirname(__file__), "..", "..",
                              "native", "checksum")
        if os.path.exists(native):
            os.execv(native, [native, args.out] + args.files)
        with open(args.out, "w") as f:
            for path in args.files:
                h = assets.sha256_file(path)
                f.write(f"sha256_{os.path.basename(path)}={h}\n")
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
