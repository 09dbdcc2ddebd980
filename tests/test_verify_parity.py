"""Smoke test for the real-data parity runbook (scripts/verify_parity.py):
the fixture dry-run must execute BOTH frameworks end to end on the generated
LLFF scene + random reference-format checkpoint and report clean-metric parity
within the ±0.2 dB / 0.005 SSIM verdict thresholds (PARITY.md runbook section).
"""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference checkout not available"
)


@pytest.mark.slow
@needs_ref
def test_verify_parity_fixture_clean_dry_run(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("CUDA_VISIBLE_DEVICES", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_parity.py"),
         "--fixture", "--runs", "clean", "--workdir", str(tmp_path / "vp")],
        capture_output=True, text=True, timeout=3000, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    assert "PASS (clean parity within tolerance)" in res.stdout
