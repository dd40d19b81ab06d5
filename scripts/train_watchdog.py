"""Stall watchdog for long training runs on fragile transports.

Launches a training CLI as a child process group, tees its output, and
restarts it from the latest checkpoint when it stops making progress —
the observed production failure mode on relayed/preemptible device links is
a dispatch that BLOCKS FOREVER (worker wedged mid-execute), which no
in-process timeout can interrupt.  Process-level supervision is the only
robust recovery: kill the group, let the CLI's ``--ckpt latest`` resolution
(with corrupt-file fallback, ``train/checkpoint.py``) resume.

The reference has no equivalent (local CUDA doesn't wedge this way); this
fills SURVEY §5's failure-detection/recovery row for real TPU deployments.

Usage:
    python scripts/train_watchdog.py [--stall-timeout 900] \
        [--startup-grace 1800] [--max-restarts 5] -- \
        python main_nerf.py /data/scene --workspace /tmp/ws ...

Progress = any line on the child's stdout/stderr (trainers log every
dispatch).  ``--startup-grace`` covers the silent resume window (checkpoint
upload + first compile).  Exit code: the child's final exit code, or 17 if
the restart budget is exhausted while stalled.
"""

import argparse
import os
import selectors
import signal
import subprocess
import sys
import time


def _install_term_handler():
    """Kill the supervised process group when the watchdog itself is
    terminated (e.g. an outer ``timeout``): without this the child — in its
    own session — would be orphaned and keep holding the device."""
    def _on_term(signum, _frame):
        pgid = _CURRENT_CHILD.get("pgid")
        if pgid:
            try:
                os.killpg(pgid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        sys.exit(128 + signum)

    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGINT, _on_term)


_CURRENT_CHILD = {}


def run_once(cmd, stall_timeout, startup_grace):
    """Run cmd until exit or stall.  Returns ('exit', rc) or ('stall', None)."""
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        start_new_session=True,  # own process group: killpg reaps jax too
    )
    _CURRENT_CHILD["pgid"] = proc.pid
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    start = time.time()
    last_output = start
    try:
        while True:
            budget = startup_grace if last_output == start else stall_timeout
            timeout = budget - (time.time() - last_output)
            if timeout <= 0:
                return "stall", None
            events = sel.select(timeout=min(timeout, 30))
            for _key, _ in events:
                line = proc.stdout.readline()
                if line:
                    last_output = time.time()
                    sys.stdout.buffer.write(line)
                    sys.stdout.buffer.flush()
            if proc.poll() is not None:
                rest = proc.stdout.read()
                if rest:
                    sys.stdout.buffer.write(rest)
                    sys.stdout.buffer.flush()
                return "exit", proc.returncode
    finally:
        _CURRENT_CHILD.pop("pgid", None)
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()


def main():
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--stall-timeout", type=float, default=900,
                    help="seconds without output before a restart")
    ap.add_argument("--startup-grace", type=float, default=1800,
                    help="silent-start allowance (ckpt upload + compile)")
    ap.add_argument("--max-restarts", type=int, default=5)
    ap.add_argument("--restart-delay", type=float, default=60,
                    help="cooldown before relaunch (lets the worker reset)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the training command")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd[:1] == ["--"] else args.cmd
    if not cmd:
        ap.error("no command given (use: train_watchdog.py [opts] -- cmd ...)")
    _install_term_handler()

    last_kind, last_rc = None, None
    for attempt in range(args.max_restarts + 1):
        if attempt:
            print(f"[watchdog] restart {attempt}/{args.max_restarts} after "
                  f"{args.restart_delay:.0f}s cooldown", flush=True)
            time.sleep(args.restart_delay)
        kind, rc = run_once(cmd, args.stall_timeout, args.startup_grace)
        last_kind, last_rc = kind, rc
        if kind == "exit":
            if rc == 0:
                print("[watchdog] run completed", flush=True)
                return 0
            if rc == 2:
                # argparse usage error: deterministic, a restart can't fix
                # it — propagate instead of burning the budget holding the
                # device for max_restarts cooldowns.  (Other nonzero codes
                # DO restart: relay crashes exit fast with rc=1 too.)
                print(f"[watchdog] usage error (rc={rc}); not restarting",
                      flush=True)
                return rc
            print(f"[watchdog] run exited rc={rc}; restarting", flush=True)
        else:
            print(f"[watchdog] no output for {args.stall_timeout:.0f}s — "
                  f"killing the wedged run", flush=True)
    print("[watchdog] restart budget exhausted", flush=True)
    # the child's final exit code when it kept crashing; 17 only for stalls
    return last_rc if last_kind == "exit" and last_rc else 17


if __name__ == "__main__":
    sys.exit(main())
