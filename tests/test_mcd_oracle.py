"""Full-pipeline oracle MCD in CI form: benchmarks/mcd_oracle.py --small
runs the SAME code path as the full-size MCD_r03.json artifact (reference
torch Pipeline end-to-end vs tpu_rvc Pipeline on identical seeded weights,
shared f0, zeroed stochastics) with a shrunk model.

Run as a subprocess: the script forces the CPU platform and chdirs into
/root/reference, both of which must not leak into this pytest process."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_mcd_oracle_small(tmp_path):
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference repo not available")
    out = str(tmp_path / "mcd.json")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "benchmarks", "mcd_oracle.py"),
         "--small", "--out", out],
        capture_output=True, text=True, timeout=1500)
    assert proc.returncode == 0, proc.stderr[-2000:]
    rep = json.load(open(out))
    assert rep["len_ref"] == rep["len_ours"]
    # BASELINE acceptance framing: MCD <= 0.1 dB on speech frames
    assert rep["mcd_db"] <= 0.1, rep
    # and the waveforms agree to ~1 int16 LSB
    assert rep["max_abs_sample_diff"] < 1e-4, rep
