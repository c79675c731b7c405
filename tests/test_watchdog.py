"""Stall watchdog (training/watchdog.py): warn, abort, and no-false-trigger
behavior. The reference has no failure detection (SURVEY.md §5.3)."""

import time

import pytest

from lss_carla_tpu.training.watchdog import StallWatchdog


def _collector():
    msgs = []
    return msgs, msgs.append


def test_not_armed_until_first_beat():
    msgs, warn = _collector()
    wd = StallWatchdog(0.2, warn_fn=warn).start()
    time.sleep(0.7)      # far past timeout, but no beat ever arrived
    wd.stop()
    assert msgs == []    # first compile can take minutes: silent until armed


def test_warns_on_stall_and_recovers_on_beat():
    msgs, warn = _collector()
    # generous threshold/heartbeat ratio (~7x): a loaded CI box can stall
    # the test thread for hundreds of ms between beats, which a tight
    # margin misreads as a stall (observed flake during a parallel suite)
    wd = StallWatchdog(1.0, warn_fn=warn).start()
    wd.beat()
    for _ in range(4):          # steady heartbeats: no warning
        time.sleep(0.15)
        wd.beat()
    assert msgs == []
    time.sleep(2.2)             # stall
    assert len(msgs) == 1 and "no step progress" in msgs[0]
    wd.beat()                   # progress resumes
    time.sleep(1.8)             # stall again -> warns again (flag reset)
    wd.stop()
    assert len(msgs) == 2


def test_abort_fires_after_threshold():
    msgs, warn = _collector()
    codes = []
    wd = StallWatchdog(0.2, abort_after=0.4, abort_fn=codes.append,
                       warn_fn=warn).start()
    wd.beat()
    time.sleep(1.2)
    wd.stop()
    assert codes and codes[0] == 42
    assert any("hard-exiting" in m for m in msgs)


def test_pause_disarms_until_next_beat():
    """pause() must silence the watchdog through a slow checkpoint save."""
    msgs, warn = _collector()
    codes = []
    wd = StallWatchdog(0.3, abort_after=2.0, abort_fn=codes.append,
                       warn_fn=warn).start()
    wd.beat()
    wd.pause()              # entering a multi-minute save
    time.sleep(1.0)         # far past the warn timeout
    assert msgs == [] and codes == []
    wd.beat()               # save done, re-armed
    time.sleep(0.7)         # past warn, below abort
    wd.stop()
    assert len(msgs) == 1 and codes == []   # detection works after re-arm


def test_abort_after_must_cover_timeout():
    with pytest.raises(ValueError):
        StallWatchdog(10.0, abort_after=5.0)


@pytest.mark.slow
def test_loop_accepts_watchdog_kwarg(tmp_path):
    """e2e: 2 tiny steps with the watchdog enabled (beats at the sync
    points; clean shutdown at the end of training)."""
    from lss_carla_tpu.data.fixtures import generate_fixture
    from lss_carla_tpu.training.loop import train

    root = generate_fixture(str(tmp_path / "fix"), num_scenes=2,
                            samples_per_scene=4, H=64, W=128, grid=64)
    out = train(root, nepochs=1, bsz=2, nworkers=0, H=64, W=128,
                final_dim=(32, 64), logdir=str(tmp_path / "run"),
                val_step=0, save_step=0, viz_step=0, max_steps=2,
                n_devices=1, watchdog_secs=600, variant="slim",
                xbound=(-50.0, 50.0, 1.5625), ybound=(-50.0, 50.0, 1.5625),
                zbound=(-10.0, 10.0, 20.0), dbound=(4.0, 45.0, 8.0))
    assert out["counter"] == 2
