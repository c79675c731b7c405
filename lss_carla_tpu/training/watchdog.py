"""Stall watchdog: detect a frozen training step and surface diagnostics.

The reference has no failure detection of any kind (SURVEY.md §5.3). On
remote-device runtimes a hang mode exists where a dispatched step never
completes (observed once on the axon tunnel: step loop frozen, loader
threads idle, process alive busy-waiting — see CLAUDE.md). Recovery is
kill + ``--resume`` from the last checkpoint; what is missing without a
watchdog is *detection*: an unattended run can sit hung for hours.

``StallWatchdog`` is a daemon thread fed a heartbeat (``beat()``) after
every completed step. If no beat arrives for ``timeout_s`` it dumps every
thread's stack (``faulthandler``) and warns; if ``abort_after`` is set and
the stall persists that long, it hard-exits the process (``os._exit``)
with code 42 so a supervisor (shell loop, k8s, slurm) restarts the run
with ``--resume``. A graceful exit is deliberately NOT attempted: saving a
checkpoint needs the same wedged device transport, so the last periodic
checkpoint is the recovery point.

Enabled in the trainer with ``--watchdog_secs N`` (0 = off, the default).
The watchdog only arms after the first step completes — the first step
includes an XLA compile that can legitimately take many minutes.
"""

from __future__ import annotations

import faulthandler
import os
import sys
import threading
import time
from typing import Callable, Optional


class StallWatchdog:
    """Daemon thread that trips when ``beat()`` stops arriving."""

    def __init__(self, timeout_s: float,
                 abort_after: Optional[float] = None,
                 abort_fn: Callable[[int], None] = os._exit,
                 warn_fn: Callable[[str], None] = None):
        if abort_after is not None and abort_after < timeout_s:
            raise ValueError("abort_after must be >= timeout_s")
        self.timeout_s = float(timeout_s)
        self.abort_after = abort_after
        self._abort_fn = abort_fn
        self._warn_fn = warn_fn or (lambda msg: print(msg, file=sys.stderr,
                                                      flush=True))
        self._last_beat = None          # None until armed
        self._warned = False
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="stall-watchdog")

    def start(self):
        self._thread.start()
        return self

    def beat(self):
        """Record progress; the first beat arms the watchdog."""
        self._last_beat = time.monotonic()
        self._warned = False

    def pause(self):
        """Disarm during legitimately slow phases (checkpoint saves stream
        minutes over remote transports; an abort mid-write would abandon
        the write recovery depends on). Re-arm with ``beat()``.

        With ``--async_save`` the periodic write continues in a background
        thread after ``beat()`` re-arms, so a later hard-exit CAN land
        mid-write. That is safe — orbax commits atomically (an uncommitted
        step directory is ignored on restore) and older periodic steps
        survive (max_to_keep) — but the newest in-flight save may be lost;
        recovery then resumes from the previous checkpoint."""
        self._last_beat = None

    def stop(self):
        self._stop.set()

    # internal -----------------------------------------------------------
    def _run(self):
        poll = max(min(self.timeout_s / 4.0, 30.0), 0.05)
        while not self._stop.wait(poll):
            if self._last_beat is None:     # not armed yet (first compile)
                continue
            stalled = time.monotonic() - self._last_beat
            if stalled >= self.timeout_s and not self._warned:
                self._warned = True
                self._warn_fn(
                    f"[watchdog] no step progress for {stalled:.0f}s "
                    f"(timeout {self.timeout_s:.0f}s) — device transport "
                    f"may be wedged. Thread stacks follow; recovery: kill "
                    f"this process and restart with --resume.")
                try:
                    faulthandler.dump_traceback(file=sys.stderr)
                except Exception:
                    pass
            if (self.abort_after is not None
                    and stalled >= self.abort_after):
                self._warn_fn(
                    f"[watchdog] stall exceeded {self.abort_after:.0f}s — "
                    f"hard-exiting (code 42) for supervisor restart; a "
                    f"graceful checkpoint would hang on the same wedged "
                    f"transport.")
                self._abort_fn(42)
                return   # reachable only with an injected abort_fn (tests)
