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
