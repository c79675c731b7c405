"""Device-backend availability probe.

The remote TPU transport can be transiently UNAVAILABLE — or hang on init —
for minutes after a killed client's session (observed twice; see CLAUDE.md).
Entry points whose output is a recorded artifact (bench, driver compile
checks) probe in a fresh subprocess first: a failed in-process init can
poison the backend state for the rest of the process, a subprocess cannot.
"""

from __future__ import annotations

import subprocess
import sys
import time


def wait_for_backend(attempts: int = 6, sleep_s: float = 75.0,
                     probe_timeout_s: float = 240.0) -> bool:
    """Block until `jax.devices()` answers in a subprocess; True if it did."""
    for i in range(attempts):
        try:
            r = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, text=True, timeout=probe_timeout_s)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass  # an init attempt can HANG, not just fail — count it
        print(f"backend unavailable (attempt {i + 1}/{attempts}); "
              f"retrying in {sleep_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(sleep_s)
    print("backend never came up; proceeding (will fail loudly)",
          file=sys.stderr, flush=True)
    return False
