"""Multi-chip scale-out: 1-D device mesh over the ray axis.

The reference ships only vestigial DDP scaffolding that is never launched
(SURVEY.md §2.8: ``utils_wtmk_disen.py:374-375,430-432`` — no process group is
ever initialised).  The TPU-native design is single-program data parallelism:

  * a 1-D ``jax.sharding.Mesh`` with axis ``"rays"``,
  * ray batches sharded over the axis, params/optimizer state replicated,
  * ``jax.jit`` + GSPMD inserts the gradient all-reduce (``psum`` over ICI)
    automatically from the output sharding of the parameter update,
  * multi-host: ``parallel/multihost.py`` forms the process group
    (``NGP_COORDINATOR``-driven ``jax.distributed.initialize``; DCN for the
    host dimension) before the mesh is built — the same program runs
    unchanged, with ``multihost.put_global`` placing host data onto global
    shardings (validated by ``tests/test_multihost.py``, 2 real processes).

Sample-dimension note (the reference's "long context" analogue, SURVEY.md §5):
sharding rays automatically shards the flattened sample dimension
(rays x budget) since samples are per-ray — per-ray scans stay device-local
and no ring machinery is needed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.ngp import ngp_field
from ..render.renderer import render_rays_occ


def make_mesh(n_devices=None, axis="rays"):
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_rays(mesh, tree, axis="rays"):
    """Place arrays with their leading dim sharded over the mesh axis."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def make_sharded_train_step(mesh, cfg, rc, budget, optimizer, axis="rays"):
    """Build a jitted SPMD train step: params replicated, rays sharded.

    Returns step(params, opt_state, occupancy, rays_o, rays_d, gt, key)
      -> (params, opt_state, loss).
    """
    repl = NamedSharding(mesh, P())
    shrd = NamedSharding(mesh, P(axis))

    @functools.partial(
        jax.jit,
        in_shardings=(repl, repl, repl, shrd, shrd, shrd, repl),
        out_shardings=(repl, repl, repl),
        donate_argnums=(0, 1),
    )
    def step(params, opt_state, occupancy, rays_o, rays_d, gt, key):
        def loss_fn(p):
            field = lambda x, d: ngp_field(p, cfg, x, d)
            out = render_rays_occ(
                field, occupancy, rays_o, rays_d, rc, budget=budget,
                bg_color=1.0, perturb_key=key,
            )
            return jnp.mean((out["image"] - gt) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step


def sharded_train_step(*args, **kwargs):  # convenience alias
    return make_sharded_train_step(*args, **kwargs)
