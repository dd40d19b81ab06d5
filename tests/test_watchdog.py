"""Watchdog supervision semantics (scripts/train_watchdog.py)."""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WD = os.path.join(REPO, "scripts", "train_watchdog.py")


def run_wd(*wd_args, child):
    return subprocess.run(
        [sys.executable, WD, *wd_args, "--", sys.executable, "-c", child],
        capture_output=True, text=True, timeout=120,
    )


def test_clean_exit_passthrough():
    r = run_wd("--stall-timeout", "30", child="print('hello'); ")
    assert r.returncode == 0
    assert "hello" in r.stdout
    assert "run completed" in r.stdout


def test_stall_restarts_then_gives_up():
    # child prints once then sleeps forever -> startup grace satisfied by the
    # print, then stall timeout fires; with 1 restart budget it retries once
    child = "import time; print('tick', flush=True); time.sleep(999)"
    r = run_wd("--stall-timeout", "10", "--startup-grace", "30",
               "--max-restarts", "1", "--restart-delay", "0", child=child)
    assert r.returncode == 17
    assert r.stdout.count("tick") == 2  # original + one restart
    assert "wedged" in r.stdout


def test_nonzero_exit_restarts():
    # fails once, then a marker file makes the second attempt succeed
    import tempfile
    marker = tempfile.mktemp()
    child = (
        "import os, sys\n"
        f"m = {marker!r}\n"
        "if os.path.exists(m): print('second-ok'); sys.exit(0)\n"
        "open(m, 'w').close(); print('first-fail'); sys.exit(3)\n"
    )
    r = run_wd("--stall-timeout", "30", "--max-restarts", "2",
               "--restart-delay", "0", child=child)
    assert r.returncode == 0
    assert "first-fail" in r.stdout and "second-ok" in r.stdout


def test_usage_error_not_restarted():
    """rc=2 (argparse usage error) is deterministic — propagate immediately
    instead of burning the restart budget holding the device."""
    r = run_wd("--stall-timeout", "30", "--max-restarts", "3",
               "--restart-delay", "0",
               child="import sys; print('boom'); sys.exit(2)")
    assert r.returncode == 2
    assert r.stdout.count("boom") == 1
    assert "not restarting" in r.stdout


def test_exhausted_budget_propagates_child_rc():
    """When the child keeps crashing, the final exit code is the child's,
    not the stall sentinel 17 (documented contract)."""
    r = run_wd("--stall-timeout", "30", "--max-restarts", "1",
               "--restart-delay", "0",
               child="import sys; print('crashmark'); sys.exit(5)")
    assert r.returncode == 5
    assert r.stdout.count("crashmark") == 2  # original + one restart


def test_sigterm_reaps_child():
    """An outer TERM (e.g. `timeout`) must not orphan the supervised child."""
    import signal
    import tempfile
    import time

    marker = tempfile.mktemp()
    child = (
        "import time, os\n"
        f"open({marker!r}, 'w').write(str(os.getpid()))\n"
        "print('up', flush=True)\n"
        "time.sleep(120)\n"
    )
    proc = subprocess.Popen(
        [sys.executable, WD, "--stall-timeout", "60", "--startup-grace",
         "60", "--", sys.executable, "-c", child],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
    )
    deadline = time.time() + 60
    while not os.path.exists(marker) and time.time() < deadline:
        time.sleep(0.3)
    assert os.path.exists(marker), "child never started"
    child_pid = int(open(marker).read())
    time.sleep(0.5)
    proc.send_signal(signal.SIGTERM)
    proc.wait(timeout=30)
    # child must be gone shortly after
    for _ in range(40):
        try:
            os.kill(child_pid, 0)
        except ProcessLookupError:
            break
        time.sleep(0.25)
    else:
        os.kill(child_pid, 9)
        raise AssertionError("watchdog orphaned its child on SIGTERM")
    os.remove(marker)
