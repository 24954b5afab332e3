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
    out = {}
    if not os.path.exists(env_path):
        return out
    for line in open(env_path):
        line = line.strip()
        if "=" in line and line.startswith("sha256_"):
            k, v = line.split("=", 1)
            out[k[len("sha256_"):]] = v
    return out


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
        # names like "hubert_base.pt" map into assets/<kind>/<file>
        found = False
        for sub in ("hubert", "rmvpe", "pretrained", "pretrained_v2",
                    "uvr5_weights", "weights", ""):
            p = Path(root) / "assets" / sub / name
            if p.exists():
                found = True
                if sha256_file(str(p)) != hexhash:
                    ok = False
                break
        if not found:
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
        sub = ("hubert" if "hubert" in name else
               "rmvpe" if "rmvpe" in name else
               "uvr5_weights" if name.startswith(("HP", "VR", "De")) else
               "pretrained_v2" if name.endswith("_v2") else "pretrained")
        dest = os.path.join(root, "assets", sub, name)
        if os.path.exists(dest) and sha256_file(dest) == hexhash:
            continue
        download_file(f"{mirror}/{name}", dest, hexhash)
