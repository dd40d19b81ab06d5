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


def test_corrupt_cache_falls_back_to_render(tmp_path):
    """A truncated/garbage cache file (e.g. a watchdog SIGKILL mid-save)
    must re-render, not crash every subsequent start."""
    cache = str(tmp_path / "pgt.npz")
    with open(cache, "wb") as f:
        f.write(b"PK\x03\x04 this is not a real zip")
    ds = _ds(cache)
    img = ds._pseudo_gt_cached()
    assert len(ds._calls) == 1 and img.shape == (1, 8, 8, 3)
    # and the fallback re-save repaired the cache: next call is a hit
    img2 = ds._pseudo_gt_cached()
    assert len(ds._calls) == 1
    np.testing.assert_array_equal(img, img2)


def test_cache_write_is_atomic(tmp_path, monkeypatch):
    """The savez tmp file is renamed into place — a crash mid-save leaves
    the old cache intact, never a truncated one at the final path."""
    import nerf_signature_tpu.data.provider_wtmk as pw

    cache = str(tmp_path / "pgt.npz")
    seen = {}
    real = np.savez_compressed

    def spy(path, **kw):
        seen["path"] = path
        real(path, **kw)

    monkeypatch.setattr(pw.np, "savez_compressed", spy)
    ds = _ds(cache)
    ds._pseudo_gt_cached()
    assert seen["path"] != cache and seen["path"].endswith(".npz")
    import os
    assert os.path.exists(cache) and not os.path.exists(seen["path"])
