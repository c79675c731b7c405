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

SIGTERM/SIGINT sent to the *supervisor* (e.g. by ``timeout``, slurm, or
k8s) are forwarded to the training child so it performs its graceful
checkpoint-and-exit, and the supervisor then stops retrying — without
this, ``timeout N python train.py --supervise R`` killed only the
supervisor and orphaned a child that kept holding the TPU chip (round-4
advisor finding).
"""

from __future__ import annotations

import os
import signal
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

    # Forward termination signals to the live child (it owns the graceful
    # SIGTERM checkpoint-and-exit) and stop retrying once one arrived —
    # even if the child's exit races the signal and still reads 42.
    child = None
    terminated = False

    def _forward(signum, _frame):
        nonlocal terminated
        terminated = True
        if child is not None and child.poll() is None:
            print(f"[supervise] forwarding signal {signum} to child "
                  f"pid {child.pid}", flush=True)
            try:
                child.send_signal(signum)
            except OSError:
                pass

    prev = {}
    try:
        for sig in (signal.SIGTERM, signal.SIGINT):
            prev[sig] = signal.signal(sig, _forward)
    except ValueError:
        prev = {}  # not in the main thread (test runners)

    rc = WATCHDOG_EXIT
    try:
        for attempt in range(retries + 1):
            cmd = [sys.executable, script] + child_argv(argv, attempt,
                                                        ckpt_dir)
            print(f"[supervise] attempt {attempt + 1}/{retries + 1}: "
                  + " ".join(cmd), flush=True)
            child = subprocess.Popen(cmd)
            rc = child.wait()
            print(f"[supervise] child exited rc={rc}", flush=True)
            if terminated:
                print("[supervise] termination signal received — "
                      "not restarting", flush=True)
                return rc
            if rc != WATCHDOG_EXIT:
                return rc
        print(f"[supervise] giving up after {retries + 1} watchdog exits",
              flush=True)
        return rc
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)
