"""Guards the driver entry points.

Round-1 regression: ``dryrun_multichip`` ran in-process and inherited the
axon TPU backend registered by this image's ``sitecustomize``
(``MULTICHIP_r01.json`` rc=1, libtpu mismatch).  The fix re-execs the body in
a subprocess with the axon hook neutralised and a virtual CPU mesh forced —
these tests pin that env contract and exercise the body on a small mesh.
"""

import subprocess
import sys

import __graft_entry__ as ge


def test_dryrun_child_env_neutralises_axon():
    base = {
        "PALLAS_AXON_POOL_IPS": "10.0.0.1",
        "JAX_PLATFORMS": "axon",
        "XLA_FLAGS": "--foo --xla_force_host_platform_device_count=3 --bar",
        "PATH": "/usr/bin",
    }
    env = ge._dryrun_child_env(8, base)
    assert "PALLAS_AXON_POOL_IPS" not in env
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["XLA_FLAGS"].count("xla_force_host_platform_device_count") == 1
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--foo" in env["XLA_FLAGS"] and "--bar" in env["XLA_FLAGS"]
    assert env["PATH"] == "/usr/bin"  # rest of the env passes through


def test_dryrun_body_runs_on_two_device_mesh():
    # full subprocess round trip exactly as the driver triggers it, on the
    # smallest mesh that still exercises every sharded path
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        capture_output=True, text=True, timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = proc.stdout
    assert "n_devices=2" in out
    assert "wm step" in out and "clean scan loop" in out
    assert "wm scan loop" in out
