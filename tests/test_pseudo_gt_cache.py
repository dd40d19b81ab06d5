"""Pseudo-GT disk cache (--pseudo_gt_cache): hit, miss, and stale-fingerprint
re-render behaviour."""

import types

import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.data.provider_wtmk import NeRFDatasetDisen


def _ds(cache_path):
    ds = NeRFDatasetDisen.__new__(NeRFDatasetDisen)
    ds.opt = types.SimpleNamespace(pseudo_gt_cache=cache_path)
    ds.model = types.SimpleNamespace(
        backbone={"t": jnp.ones((4, 2))}, infer_budget=96
    )
    ds.poses = np.eye(4, dtype=np.float32)[None]
    ds.intrinsics = np.array([10.0, 10.0, 4.0, 4.0])
    ds.H = ds.W = 8
    ds._calls = []
    ds._render_poses = lambda poses, desc="": (
        ds._calls.append(1),
        np.full((len(poses), 8, 8, 3), 0.25, np.float32),
    )[1]
    return ds


def test_cache_roundtrip_and_staleness(tmp_path):
    cache = str(tmp_path / "pgt.npz")
    ds = _ds(cache)
    img1 = ds._pseudo_gt_cached()
    assert len(ds._calls) == 1 and img1.shape == (1, 8, 8, 3)

    # second call: cache hit, no render
    img2 = ds._pseudo_gt_cached()
    assert len(ds._calls) == 1
    np.testing.assert_array_equal(img1, img2)

    # fingerprint change (different backbone) -> stale -> re-render
    ds.model.backbone = {"t": jnp.full((4, 2), 2.0)}
    ds._pseudo_gt_cached()
    assert len(ds._calls) == 2

    # no cache configured -> always renders
    ds2 = _ds(None)
    ds2._pseudo_gt_cached()
    ds2._pseudo_gt_cached()
    assert len(ds2._calls) == 2
