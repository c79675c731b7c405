"""Self-supervised restart for flaky-transport training runs.

The stall watchdog (``training/watchdog.py``, ``--watchdog_secs N``)
hard-exits with code 42 after 2N seconds of no step progress — the
remote-TPU tunnel has been observed to hang mid-run (CLAUDE.md, twice).
The restart half of that contract used to live in per-experiment bash
loops; ``--supervise R`` makes it first-class: the CLI process becomes a
tiny supervisor that re-runs itself (same argv, ``--supervise`` stripped)
up to R times, appending ``--resume <logdir>/ckpts`` once a checkpoint
exists, so a hung run resumes from its last save with best-IoU tracking
intact.

Only exit code 42 triggers a restart: a crash (traceback), SIGTERM
preemption (graceful checkpoint-and-exit), or clean completion must NOT
loop. No reference equivalent (the reference has no failure handling,
SURVEY §5.3).
"""

from __future__ import annotations

import os
import subprocess
import sys

WATCHDOG_EXIT = 42


def strip_flag(argv, flag, has_value=True):
    """argv without ``flag`` (and its value — either '--f V' or '--f=V')."""
    out, skip = [], False
    for a in argv:
        if skip:
            skip = False
            continue
        if a == flag:
            skip = has_value
            continue
        if a.startswith(flag + "="):
            continue
        out.append(a)
    return out


def child_argv(argv, attempt, ckpt_dir):
    """Child arguments for restart ``attempt`` (0 = first run).

    Retries point ``--resume`` at ``ckpt_dir`` when it holds a checkpoint
    (a step directory or best/); before any save the child starts fresh
    (resuming an empty dir would fail the restore)."""
    out = strip_flag(argv, "--supervise")
    if attempt == 0:
        return out
    has_ckpt = os.path.isdir(ckpt_dir) and any(
        e.isdigit() or e == "best" for e in os.listdir(ckpt_dir))
    if not has_ckpt:
        return out
    out = strip_flag(out, "--resume")
    return out + ["--resume", ckpt_dir]


def run_supervised(retries: int, logdir: str, argv=None,
                   script=None) -> int:
    """Run ``script argv`` as a child, restarting on exit 42 up to
    ``retries`` times. Returns the final child's exit code."""
    argv = sys.argv[1:] if argv is None else argv
    script = os.path.abspath(sys.argv[0]) if script is None else script
    ckpt_dir = os.path.join(logdir, "ckpts")
    rc = WATCHDOG_EXIT
    for attempt in range(retries + 1):
        cmd = [sys.executable, script] + child_argv(argv, attempt, ckpt_dir)
        print(f"[supervise] attempt {attempt + 1}/{retries + 1}: "
              + " ".join(cmd), flush=True)
        rc = subprocess.call(cmd)
        print(f"[supervise] child exited rc={rc}", flush=True)
        if rc != WATCHDOG_EXIT:
            return rc
    print(f"[supervise] giving up after {retries + 1} watchdog exits",
          flush=True)
    return rc
