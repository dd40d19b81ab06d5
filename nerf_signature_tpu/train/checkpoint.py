"""Checkpoint save/load: native pytree checkpoints + torch-ngp .pth ingestion.

Native format: a single file holding the params pytree (+ optimizer state,
occupancy grid, counters) serialized with ``flax.serialization`` — the
equivalents of the reference's ``save_checkpoint`` / ``load_checkpoint``
(``nerf/utils_wtmk_disen.py:1385-1517``), including the ring buffer of
``max_keep_ckpt`` files and the "best" checkpoint that drops the density grid.

Cross-stage ingestion (``torch_ingest``): the watermark stage must be able to
consume a clean-stage checkpoint with missing msg_encoder/decoder keys
(``load_checkpoint(strict=False)``, ref ``utils_wtmk_disen.py:1474-1479``);
``load_into`` merges by key presence, so that workflow carries over.
"""

import glob
import os
import pickle

import jax
import numpy as np
from flax import serialization


def _to_numpy(tree):
    # fetch_replicated: under a multi-process launch the replicated state
    # spans non-addressable devices, where plain np.asarray refuses
    from ..parallel.multihost import fetch_replicated

    return jax.tree_util.tree_map(lambda x: fetch_replicated(x), tree)


def save_checkpoint(path, state: dict):
    """state: arbitrary pytree dict (params / opt_state / occ / counters).

    The write is ATOMIC (tmp file + rename): a training process killed
    mid-save must never leave a truncated file where ``latest`` resolution
    will pick it up."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(serialization.to_state_dict(_to_numpy(state)), f)
    os.replace(tmp, path)


def load_checkpoint(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def restore_like(template, state_dict):
    """Restore a pytree with the same structure as ``template``.

    Leaf shapes are validated against the template: flax's from_state_dict
    does NOT check them, and a silent layout mismatch (e.g. loading a
    checkpoint trained without ``--dense_coarse`` into a dense-layout
    model) would corrupt results with no error."""
    restored = serialization.from_state_dict(template, state_dict)
    t_leaves, treedef = jax.tree_util.tree_flatten(template)
    r_leaves = treedef.flatten_up_to(restored)
    for t, r in zip(t_leaves, r_leaves):
        ts = getattr(t, "shape", None)
        rs = getattr(r, "shape", None)
        if ts is not None and rs is not None and tuple(ts) != tuple(rs):
            raise ValueError(
                f"checkpoint shape mismatch: saved {tuple(rs)} vs model "
                f"{tuple(ts)} — was the model configured differently "
                f"(e.g. --dense_coarse, message_dim, n_levels) than when "
                f"the checkpoint was written?"
            )
    return restored


def latest_checkpoint(ckpt_dir, name):
    """Glob-discover the newest checkpoint, ref ``utils_wtmk_disen.py:1457-1465``."""
    lst = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")))
    return lst[-1] if lst else None


def checkpoint_candidates(ckpt_dir, name):
    """All ring-buffer checkpoints, newest first — callers fall back down
    the list if the newest is unreadable (e.g. written by a pre-atomic-save
    build, or a torn filesystem)."""
    return sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")),
                  reverse=True)


def prune_checkpoints(ckpt_dir, name, max_keep=2):
    lst = sorted(glob.glob(os.path.join(ckpt_dir, f"{name}_ep*.ckpt")))
    for p in lst[:-max_keep]:
        try:
            os.remove(p)
        except OSError:
            pass
