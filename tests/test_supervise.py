"""--supervise: the in-CLI restart half of the watchdog contract
(``utils/supervise.py``). Pure-arg tests plus a real child-process loop
with a stub script (no jax involved)."""

import os
import subprocess
import sys
import textwrap

from lss_carla_tpu.utils.supervise import (WATCHDOG_EXIT, child_argv,
                                           run_supervised, strip_flag)


def test_strip_flag_forms():
    argv = ["--a", "1", "--supervise", "3", "--b", "--supervise=2", "--c", "x"]
    assert strip_flag(argv, "--supervise") == ["--a", "1", "--b", "--c", "x"]


def test_first_attempt_keeps_user_resume(tmp_path):
    argv = ["--logdir", "L", "--supervise", "2", "--resume", "/old/ckpts"]
    assert child_argv(argv, 0, str(tmp_path / "ckpts")) == \
        ["--logdir", "L", "--resume", "/old/ckpts"]


def test_retry_points_resume_at_logdir_ckpts(tmp_path):
    ckpts = tmp_path / "ckpts"
    (ckpts / "100").mkdir(parents=True)
    argv = ["--logdir", "L", "--supervise", "2", "--resume", "/old/ckpts"]
    got = child_argv(argv, 1, str(ckpts))
    assert got == ["--logdir", "L", "--resume", str(ckpts)]


def test_retry_without_checkpoint_starts_fresh(tmp_path):
    # crash before the first save: resuming an empty dir would fail restore
    ckpts = tmp_path / "ckpts"  # does not exist
    argv = ["--logdir", "L", "--supervise", "2"]
    assert child_argv(argv, 1, str(ckpts)) == ["--logdir", "L"]
    ckpts.mkdir()
    (ckpts / "metrics.txt").touch()  # exists but holds no step dir
    assert child_argv(argv, 1, str(ckpts)) == ["--logdir", "L"]


STUB = textwrap.dedent("""\
    import os, sys
    marker = sys.argv[sys.argv.index("--marker") + 1]
    n = len(open(marker).readlines()) if os.path.exists(marker) else 0
    with open(marker, "a") as f:
        f.write(" ".join(sys.argv[1:]) + "\\n")
    sys.exit(42 if n < %d else %d)
""")


def _run_stub(tmp_path, fail_times, final_rc, retries):
    script = tmp_path / "stub.py"
    script.write_text(STUB % (fail_times, final_rc))
    marker = tmp_path / "marker.txt"
    logdir = tmp_path / "log"
    (logdir / "ckpts" / "best").mkdir(parents=True)
    rc = run_supervised(
        retries, str(logdir),
        argv=["--marker", str(marker), "--supervise", str(retries)],
        script=str(script))
    lines = marker.read_text().splitlines() if marker.exists() else []
    return rc, lines


def test_run_supervised_restarts_on_42_then_succeeds(tmp_path):
    rc, lines = _run_stub(tmp_path, fail_times=2, final_rc=0, retries=3)
    assert rc == 0
    assert len(lines) == 3
    assert "--supervise" not in lines[0]
    assert "--resume" not in lines[0]
    # retries resume from the logdir checkpoints
    assert lines[1].endswith(os.path.join("log", "ckpts"))
    assert "--resume" in lines[1] and "--resume" in lines[2]


def test_run_supervised_does_not_restart_on_crash(tmp_path):
    rc, lines = _run_stub(tmp_path, fail_times=0, final_rc=7, retries=3)
    assert rc == 7
    assert len(lines) == 1


def test_run_supervised_gives_up(tmp_path):
    rc, lines = _run_stub(tmp_path, fail_times=99, final_rc=0, retries=2)
    assert rc == WATCHDOG_EXIT
    assert len(lines) == 3  # 1 first run + 2 retries


SUPERVISE_PATH = os.path.join(os.path.dirname(__file__), os.pardir,
                              "lss_carla_tpu", "utils", "supervise.py")

TERM_CHILD = textwrap.dedent("""\
    import signal, sys, time
    marker = sys.argv[sys.argv.index("--marker") + 1]
    def on_term(s, f):
        with open(marker, "a") as fh:
            fh.write("child-sigterm\\n")
        sys.exit(42)  # even a 42 must not restart after a forwarded signal
    signal.signal(signal.SIGTERM, on_term)
    with open(marker, "a") as fh:
        fh.write("child-started\\n")
    time.sleep(120)
""")

TERM_RUNNER = textwrap.dedent("""\
    import importlib.util, sys
    spec = importlib.util.spec_from_file_location("sup", sys.argv[1])
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sys.exit(m.run_supervised(3, sys.argv[2],
                              argv=["--marker", sys.argv[3]],
                              script=sys.argv[4]))
""")


def test_sigterm_forwards_to_child_and_stops_retrying(tmp_path):
    """timeout/slurm SIGTERM the *supervisor*: the child must receive it
    (graceful checkpoint-and-exit) and no restart may follow — without
    forwarding, the child was orphaned holding the TPU chip (round-4
    advisor finding)."""
    import signal as _signal
    import time
    runner = tmp_path / "runner.py"
    runner.write_text(TERM_RUNNER)
    child = tmp_path / "child.py"
    child.write_text(TERM_CHILD)
    marker = tmp_path / "marker.txt"
    logdir = tmp_path / "log"
    (logdir / "ckpts" / "best").mkdir(parents=True)
    proc = subprocess.Popen(
        [sys.executable, str(runner), os.path.abspath(SUPERVISE_PATH),
         str(logdir), str(marker), str(child)])
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if marker.exists() and "child-started" in marker.read_text():
            break
        time.sleep(0.1)
    else:
        proc.kill()
        raise AssertionError("child never started")
    proc.send_signal(_signal.SIGTERM)
    rc = proc.wait(timeout=30)
    lines = marker.read_text().splitlines()
    assert "child-sigterm" in lines           # signal was forwarded
    assert lines.count("child-started") == 1  # and nothing restarted
    assert rc == 42                           # child's own exit code
