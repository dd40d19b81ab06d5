"""Multi-process (multi-host) scale-out validation — SURVEY.md §2.8.

Launches TWO real OS processes, each owning 4 virtual CPU devices, forms the
JAX process group over the loopback coordinator (CPU collectives ride Gloo —
the test-environment stand-in for DCN), builds ONE global 8-device mesh, and
runs the actual sharded train step from ``parallel/mesh.py`` with inputs
placed via ``multihost.put_global``.  Both processes must agree on the
(globally psum-reduced) loss — that agreement IS the all-reduce working
across process boundaries.

The reference has no working distributed path at all (its DDP scaffolding is
never launched; ``nerf/utils_wtmk_disen.py:374-375,430-432``), so this is an
exceeds-parity subsystem: the test pins the multi-host contract the docs
promise (same program, ``NGP_COORDINATOR``-driven init).
"""

import os
import re
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
from nerf_signature_tpu.parallel import multihost

assert multihost.maybe_initialize(), "NGP_COORDINATOR must trigger init"
assert jax.process_count() == 2
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 8
assert multihost.is_multiprocess()
assert multihost.is_primary() == (int(os.environ["NGP_PROCESS_ID"]) == 0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from nerf_signature_tpu.models.ngp import NGPConfig, init_ngp_params
from nerf_signature_tpu.ops.grid import init_occupancy_grid
from nerf_signature_tpu.parallel.mesh import make_mesh, make_sharded_train_step
from nerf_signature_tpu.render.renderer import RenderConfig
from nerf_signature_tpu.train.trainer import make_optimizer

cfg = NGPConfig(bound=1.0, n_levels=2, log2_hashmap_size=8,
                finest_resolution=32, compute_dtype=jnp.float32)
rc = RenderConfig(bound=1.0, grid_size=16, max_steps=32)
mesh = make_mesh()  # all 8 GLOBAL devices
repl = NamedSharding(mesh, P())
shrd = NamedSharding(mesh, P("rays"))
optimizer = make_optimizer(1e-2, 10)

params = init_ngp_params(jax.random.PRNGKey(0), cfg)
opt_state = optimizer.init(params)
occupancy = init_occupancy_grid(1.0, 16).occupancy.at[:].set(True)

# every process generates the SAME logical batch (process-independent seed);
# put_global materialises only the locally-owned shards
rng = np.random.default_rng(0)
n = 16
rays_o = np.asarray(rng.normal(0, 0.1, (n, 3)) - [2.0, 0, 0], np.float32)
rays_d = np.asarray(rng.normal([1.0, 0, 0], 0.05, (n, 3)), np.float32)
rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
gt = np.full((n, 3), 0.5, np.float32)

put_r = lambda t: jax.tree_util.tree_map(
    lambda x: multihost.put_global(x, repl), t)
params, opt_state, occupancy = put_r(params), put_r(opt_state), put_r(occupancy)
ro = multihost.put_global(rays_o, shrd)
rd = multihost.put_global(rays_d, shrd)
g = multihost.put_global(gt, shrd)

step = make_sharded_train_step(mesh, cfg, rc, 8, optimizer)
for i in range(2):
    params, opt_state, loss = step(
        params, opt_state, occupancy, ro, rd, g, jax.random.PRNGKey(i))
loss_h = float(multihost.fetch_replicated(loss))
# a replicated PARAM leaf must also fetch cleanly (the checkpoint path)
leaf = multihost.fetch_replicated(
    jax.tree_util.tree_leaves(params)[0])
assert np.isfinite(leaf).all()
print(f"MHLOSS {loss_h:.8f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)  # axon hook off in children
        env["JAX_PLATFORMS"] = "cpu"
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", "",
                       env.get("XLA_FLAGS", ""))
        env["XLA_FLAGS"] = \
            (flags + " --xla_force_host_platform_device_count=4").strip()
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        env["NGP_COORDINATOR"] = f"localhost:{port}"
        env["NGP_NUM_PROCESSES"] = "2"
        env["NGP_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        ))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(out)
    losses = [float(o.split("MHLOSS")[1].split()[0]) for o in outs]
    assert np.isfinite(losses).all()
    # the psum-reduced loss must be IDENTICAL on both processes — that
    # agreement is the cross-process all-reduce actually running
    assert losses[0] == losses[1]
