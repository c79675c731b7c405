"""Smoke-run every hermetic debug script end to end (subprocess).

The debug harness (reference ``debug/``, SURVEY §2.18) is user-facing
tooling; each script must keep running standalone with its synthetic-
fixture default and exit 0 with a SUCCESS verdict. Scripts that build a
full model (detailed_coordinate_check, test_visualization) are covered by
their own slow markers elsewhere and skipped here.
"""

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent

# (script, extra args) — data-path-only tools, no model compile
FAST_SCRIPTS = [
    ("debug_data_loading.py", ["--synthetic"]),
    ("verify_camera_projection.py", []),
    ("verify_bev_classes.py", []),
    ("check_raw_vs_processed.py", ["--samples", "4"]),
    ("simple_flip_test.py", ["--samples", "4"]),
    ("compare_raw_flipud.py", []),
    ("verify_flipud_fix.py", ["--max-batches", "12"]),
    ("final_check_with_raw.py", []),
    ("final_coordinate_verification.py", ["--batches", "12"]),
    ("verify_label_distribution.py", ["--samples", "40"]),
    ("find_vehicle_samples.py", []),
]


@pytest.mark.parametrize("script,args",
                         FAST_SCRIPTS, ids=[s for s, _ in FAST_SCRIPTS])
def test_debug_script_smoke(script, args, tmp_path):
    proc = subprocess.run(
        [sys.executable, str(REPO / "debug" / script), *args],
        capture_output=True, text=True, timeout=600, cwd=tmp_path)
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout:\n{proc.stdout[-2000:]}\nstderr:\n{proc.stderr[-2000:]}")
