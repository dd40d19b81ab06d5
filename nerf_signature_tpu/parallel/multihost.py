"""Multi-host (multi-process) scale-out over DCN.

The reference's distributed story is vestigial DDP scaffolding that is never
launched (no ``init_process_group`` exists anywhere; SURVEY.md §2.8,
``nerf/utils_wtmk_disen.py:374-375,430-432``) plus shell-level job
parallelism.  The TPU-native completion is JAX's single-program multi-host
model: every process runs the SAME program, ``jax.distributed.initialize``
forms the process group (DCN for the host dimension, ICI within a host), and
GSPMD treats the union of all processes' chips as one device mesh — the
sharded train step in ``parallel/mesh.py`` runs unchanged.

Launch contract (one process per host, e.g. under your cluster runner):

    NGP_COORDINATOR=host0:29500 NGP_NUM_PROCESSES=4 NGP_PROCESS_ID=$i \
        python main_nerf.py ... --devices 0

On TPU pods set ``NGP_MULTIHOST=1`` alone — ``jax.distributed`` then auto-
detects the topology from the TPU runtime environment; set all three
variables explicitly for CPU/GPU clusters (CPU processes form collectives
over Gloo, which is how ``tests/test_multihost.py`` validates this path
without TPUs).

Data contract: batches are generated host-side with a process-independent
seed, so every process holds the same logical global batch; ``put_global``
materialises only the shards a process actually owns (via
``jax.make_array_from_callback``), so per-process host->device traffic is
1/num_processes of the batch.  Replicated trees (params, optimizer state)
are addressable on every process, so checkpointing/eval fetch them anywhere;
``is_primary()`` gates the actual file writes to process 0.
"""

import os

import jax
import numpy as np


def maybe_initialize():
    """Initialise the JAX process group when launched multi-process.

    Reads ``NGP_COORDINATOR`` / ``NGP_NUM_PROCESSES`` / ``NGP_PROCESS_ID``;
    a no-op (returns False) when unset so single-process runs pay nothing.
    Must be called before the first device query (the CLIs call it right
    after argument parsing).
    """
    coord = os.environ.get("NGP_COORDINATOR")
    if not coord:
        if os.environ.get("NGP_MULTIHOST") == "1":
            # TPU-pod path: the TPU runtime environment carries the
            # topology, so jax.distributed auto-detects everything —
            # opt in explicitly since initialize() hangs on lone hosts.
            jax.distributed.initialize()
            return True
        return False
    nproc = os.environ.get("NGP_NUM_PROCESSES")
    pid = os.environ.get("NGP_PROCESS_ID")
    if nproc is None or pid is None:
        raise RuntimeError(
            "NGP_COORDINATOR is set but NGP_NUM_PROCESSES / NGP_PROCESS_ID "
            "are not — all three are required for explicit multi-process "
            "launch (or set NGP_MULTIHOST=1 alone on TPU pods for "
            "auto-detection)"
        )
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(nproc),
        process_id=int(pid),
    )
    return True


def is_multiprocess():
    return jax.process_count() > 1


def is_primary():
    """True on the process that should write checkpoints/logs/artifacts."""
    return jax.process_index() == 0


def put_global(x, sharding):
    """Place a host-resident array onto a (possibly multi-process) sharding.

    Single-process: plain ``device_put`` (zero behaviour change).
    Multi-process: every process passes the same full logical array; each
    materialises only its addressable shards.
    """
    if not is_multiprocess():
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def fetch_replicated(x):
    """Bring a (replicated-sharded) device value to the host on any process.

    Multi-process jax refuses ``np.asarray`` on arrays that are not fully
    addressable; replicated values ARE fully addressable per process, but
    fetching via the first local shard keeps this safe for values produced
    with any replicated layout.
    """
    if not is_multiprocess():
        return np.asarray(x)
    if hasattr(x, "addressable_shards"):
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)
