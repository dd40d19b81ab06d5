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
