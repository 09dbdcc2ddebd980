"""Smoke tests for the real-data parity runbook (scripts/verify_parity.py):
the fixture dry-run must execute BOTH frameworks end to end on the generated
LLFF scene + random reference-format checkpoint and report clean-metric parity
within the ±0.2 dB / 0.005 SSIM verdict thresholds (PARITY.md runbook section).

Covers the paths that will produce the headline parity table: the clean AND
view-specific-attack runs on the IBRNet stack, plus the GNT-backbone fixture
run — not just the clean half (attacked rows are seed-sensitive across
frameworks, so the runbook reports rather than gates them; the smoke asserts
the clean gate and that the attacked rows executed and printed).
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


def _run(tmp_path, *extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("CUDA_VISIBLE_DEVICES", "")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "verify_parity.py"),
         "--fixture", "--workdir", str(tmp_path / "vp"), *extra],
        capture_output=True, text=True, timeout=3000, env=env, cwd=str(tmp_path),
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-2000:]
    return res.stdout


@pytest.mark.slow
@needs_ref
def test_verify_parity_fixture_clean_and_attacked(tmp_path):
    out = _run(tmp_path, "--runs", "clean,view_specific")
    assert "PASS (clean parity within tolerance)" in out
    # the attacked rows must have executed and been reported (gated as
    # seed-sensitive, not hard-failed: different RNG streams drive delta
    # init / ray selection across frameworks at fixture iteration counts)
    assert "view_specific" in out
    lines = [ln for ln in out.splitlines()
             if ln.strip().startswith("view_specific") and "psnr" in ln]
    assert len(lines) == 1, out
    assert ("PASS" in lines[0]) or ("SEED-SENSITIVE" in lines[0]), lines[0]


@pytest.mark.slow
@needs_ref
def test_verify_parity_fixture_gnt(tmp_path):
    out = _run(tmp_path, "--backbone", "gnt", "--runs", "clean,view_specific")
    assert "PASS (clean parity within tolerance)" in out
    assert "gnt/fixscene" in out
