"""Per-dispatch program-size limits for fragile transports.

Measured failure mode (PERF.md "Operational notes"): under the tunneled
``axon`` relay a 32-step training scan or a 16-chunk budget-256 staged
render reproducibly hangs/crashes the remote worker, while 8-step scans and
4-chunk maps are stable.  The limit is a property of the transport, not of
XLA — direct TPU/CPU backends run arbitrarily long scans fine — so the cap
keys on the platform name and the loops SPLIT oversized requests into safe
dispatches with identical semantics (the host while-loop re-dispatches; the
staged render concatenates super-chunk results).  ``scripts_dev/
worker_limits_probe.py`` measures the actual ceiling; override with
``NGP_MAX_DISPATCH_STEPS`` / ``NGP_MAX_DISPATCH_CHUNK_BUDGET`` when the
transport changes.

Reference scope: the reference has no equivalent (CUDA is local), but its
``--max_ray_batch`` chunking (nerf/renderer.py) is the same idea for OOM.
"""

import os
import warnings

import jax

# scan steps per device_train_loop / wm-loop dispatch
_SAFE_SCAN_STEPS = {"axon": 8}
# chunks*budget work units per fused staged-render program
# (4 chunks x budget 128 = 512 measured stable; 16 x 256 = 4096 hangs)
_SAFE_CHUNK_BUDGET = {"axon": 1024}

_warned = set()


def _platform():
    try:
        return jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return "cpu"


def _warn_once(tag, msg):
    if tag not in _warned:
        _warned.add(tag)
        warnings.warn(msg, stacklevel=3)


def max_scan_steps(requested):
    """Clamp a K-steps-per-dispatch request to the transport-safe maximum.

    Semantics are unchanged — callers' host loops keep dispatching until the
    step budget is spent — only the per-program scan length shrinks."""
    env = os.environ.get("NGP_MAX_DISPATCH_STEPS")
    cap = int(env) if env else _SAFE_SCAN_STEPS.get(_platform())
    if cap is not None and requested > cap:
        _warn_once(
            ("steps", cap),
            f"steps_per_dispatch={requested} exceeds the safe per-dispatch "
            f"scan length for the '{_platform()}' transport; splitting into "
            f"dispatches of {cap} (see PERF.md operational notes; override "
            f"with NGP_MAX_DISPATCH_STEPS)",
        )
        return cap
    return requested


def max_fused_chunks(n_chunks, budget):
    """Clamp the chunk count of one fused staged-render ``lax.map`` program.

    Returns how many ray chunks may share a single program at this march
    budget; the renderer loops over super-chunks of that size."""
    env = os.environ.get("NGP_MAX_DISPATCH_CHUNK_BUDGET")
    cap_wu = int(env) if env else _SAFE_CHUNK_BUDGET.get(_platform())
    if cap_wu is None:
        return n_chunks
    cap = max(1, cap_wu // max(budget, 1))
    if n_chunks > cap:
        _warn_once(
            ("chunks", cap, budget),
            f"staged render of {n_chunks} chunks at budget {budget} exceeds "
            f"the safe fused-program size for the '{_platform()}' transport; "
            f"dispatching {cap} chunks per program (override with "
            f"NGP_MAX_DISPATCH_CHUNK_BUDGET)",
        )
        return cap
    return n_chunks
