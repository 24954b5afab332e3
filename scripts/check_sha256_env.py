#!/usr/bin/env python
"""sha256.env consistency check for CI.

The reference regenerates sha256.env in CI by hashing freshly downloaded
assets with its Go tool (/root/reference/.github/workflows/checksum.yml,
tools/checksum/main.go:11).  Offline, this script checks everything that
can be checked without the payloads:

  1. sha256.env parses, every value is a 64-hex digest, names are unique;
  2. every CORE_ASSETS entry the downloader knows has a checksum line
     (a new asset must never ship without an integrity hash);
  3. the native C++ checksum tool produces byte-identical lines to
     hashlib for repo-local fixture files (tool parity, the role of the
     reference's checksum.yml regeneration step);
  4. any asset file already present under assets/ verifies.

Exit 0 on success; prints the failing check otherwise.
"""

import os
import re
import subprocess
import sys
import tempfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from tpu_rvc.utils.assets import (  # noqa: E402
    CORE_ASSETS, asset_relpath, load_checksums, sha256_file)


def main() -> int:
    sums = load_checksums(os.path.join(ROOT, "sha256.env"))
    if not sums:
        print("FAIL: sha256.env empty or missing")
        return 1
    for name, hexd in sums.items():
        if not re.fullmatch(r"[0-9a-f]{64}", hexd):
            print(f"FAIL: sha256_{name} is not a 64-hex digest: {hexd!r}")
            return 1
    print(f"ok: {len(sums)} digests parse")

    expected = {asset_relpath(k) for k in sums}
    missing = [rel for rel, _ in CORE_ASSETS if rel not in expected]
    if missing:
        print(f"FAIL: core assets without a sha256.env line: {missing}")
        return 1
    print(f"ok: all {len(CORE_ASSETS)} core assets have checksum lines")

    tool = os.path.join(ROOT, "native", "checksum")
    if not os.path.exists(tool):
        print("FAIL: native/checksum not built (run `make -C native`)")
        return 1
    fixtures = [
        os.path.join(ROOT, "tpu_rvc", "assets", "lgdsng.npz"),
        os.path.join(ROOT, "tpu_rvc", "assets", "mute", "0_gt_wavs",
                     "mute48k.wav"),
    ]
    with tempfile.NamedTemporaryFile("r", suffix=".env") as out:
        subprocess.run([tool, out.name, *fixtures], check=True)
        got = load_checksums(out.name)
    for path in fixtures:
        name = os.path.basename(path)
        want = sha256_file(path)
        if got.get(name) != want:
            print(f"FAIL: native tool vs hashlib mismatch for {path}: "
                  f"{got.get(name)} != {want}")
            return 1
    print(f"ok: native checksum tool parity on {len(fixtures)} fixtures")

    by_rel = {asset_relpath(k): v for k, v in sums.items()}
    verified = 0
    for rel, _ in CORE_ASSETS:
        dest = os.path.join(ROOT, "assets", rel)
        if os.path.exists(dest):
            want = by_rel.get(rel)
            have = sha256_file(dest)
            if want and have != want:
                print(f"FAIL: {dest} present but sha256 mismatch")
                return 1
            verified += 1
    print(f"ok: {verified} local asset payload(s) verified")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
