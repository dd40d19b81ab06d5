"""Tests for the occupancy grid + static-budget marcher against a tiny
hand-constructed "2-voxel scene" (SURVEY.md §4 test plan)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_signature_tpu.ops import (
    OccupancyGrid,
    composite_rays,
    init_occupancy_grid,
    march_rays,
    mark_untrained_grid,
    near_far_from_aabb,
    packbits,
    update_occupancy_grid,
)
from nerf_signature_tpu.ops.marching import _candidate_ts, dt_bounds


class TestCandidateTs:
    def test_uniform_when_gamma_zero(self):
        t0 = jnp.array([0.5, 1.0])
        ts, dts = _candidate_ts(t0, 8, 0.01, 0.1, 0.0)
        assert ts.shape == (2, 8)
        np.testing.assert_allclose(np.diff(np.asarray(ts), axis=-1), 0.01, rtol=1e-4)
        np.testing.assert_allclose(dts, 0.01, rtol=1e-6)

    def test_matches_cuda_recurrence_gamma(self):
        """t_{i+1} = t_i + clamp(t_i*gamma, dt_min, dt_max), ref cu:365,397."""
        t0 = jnp.array([0.3])
        gamma, dt_min, dt_max = 1 / 128, 0.01, 0.2
        ts, dts = _candidate_ts(t0, 32, dt_min, dt_max, gamma)
        t = 0.3
        for i in range(32):
            dt = min(max(t * gamma, dt_min), dt_max)
            np.testing.assert_allclose(float(ts[0, i]), t, rtol=1e-5)
            np.testing.assert_allclose(float(dts[0, i]), dt, rtol=1e-5)
            t += dt


def _single_voxel_grid(H=32, lo=12, hi=20):
    """Occupancy grid with one solid cube in cell-space [lo, hi)^3."""
    occ = np.zeros((1, H, H, H), dtype=bool)
    occ[0, lo:hi, lo:hi, lo:hi] = True
    return OccupancyGrid(
        density=jnp.asarray(occ.reshape(1, -1).astype(np.float32)),
        occupancy=jnp.asarray(occ),
        mean_density=jnp.float32(0.1),
        iter_density=jnp.int32(1),
    )


class TestMarchRays:
    def test_samples_only_in_occupied_region(self):
        H = 32
        grid = _single_voxel_grid(H)
        # cell [12, 20) of 32 maps to world approx [-0.25, 0.25] for bound=1
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb)
        out = march_rays(
            o, d, grid.occupancy, near, far,
            bound=1.0, dt_gamma=0.0, max_steps=512, budget=128, grid_size=H,
        )
        m = np.asarray(out["mask"][0])
        xs = np.asarray(out["xyzs"][0, :, 0])[m]
        assert m.sum() > 0
        # all sampled x must be within the solid cube (+ one cell tolerance)
        cell = 2.0 / H
        assert xs.min() > -0.25 - 2 * cell and xs.max() < 0.25 + 2 * cell

    def test_budget_truncates_farthest(self):
        H = 32
        grid = _single_voxel_grid(H, lo=0, hi=32)  # fully occupied
        o = jnp.array([[-2.0, 0.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb)
        out = march_rays(
            o, d, grid.occupancy, near, far,
            bound=1.0, dt_gamma=0.0, max_steps=512, budget=16, grid_size=H,
        )
        m = np.asarray(out["mask"][0])
        assert m.sum() == 16  # budget saturated
        ts = np.asarray(out["ts"][0])[m]
        assert np.all(np.diff(ts) > 0)  # in order, nearest first
        # first sample at the near plane
        np.testing.assert_allclose(ts[0], float(near[0]), rtol=1e-5)

    def test_miss_ray_has_no_samples(self):
        H = 32
        grid = _single_voxel_grid(H)
        o = jnp.array([[-2.0, 5.0, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb)
        out = march_rays(
            o, d, grid.occupancy, near, far,
            bound=1.0, dt_gamma=0.0, max_steps=512, budget=16, grid_size=H,
        )
        assert int(out["mask"].sum()) == 0

    def test_end_to_end_solid_cube_renders_opaque(self):
        """March + composite a solid high-density cube: weights_sum -> 1."""
        H = 32
        grid = _single_voxel_grid(H)
        o = jnp.array([[-2.0, 0.0, 0.0], [-2.0, 0.9, 0.0]])
        d = jnp.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0]])
        aabb = jnp.array([-1.0, -1.0, -1.0, 1.0, 1.0, 1.0])
        near, far = near_far_from_aabb(o, d, aabb)
        out = march_rays(
            o, d, grid.occupancy, near, far,
            bound=1.0, dt_gamma=0.0, max_steps=512, budget=128, grid_size=H,
        )
        sigmas = jnp.where(out["mask"], 100.0, 0.0)
        rgbs = jnp.ones(out["xyzs"].shape) * 0.5
        res = composite_rays(sigmas, rgbs, out["deltas"], out["ts"], mask=out["mask"])
        assert float(res["weights_sum"][0]) > 0.99  # ray 0 hits the cube
        assert float(res["weights_sum"][1]) < 0.01  # ray 1 passes above it
        np.testing.assert_allclose(res["image"][0], [0.5, 0.5, 0.5], atol=1e-3)


class TestOccupancyGridUpdate:
    def test_update_thresholds_density(self):
        H = 16
        grid = init_occupancy_grid(bound=1.0, grid_size=H)

        def density_fn(x):
            # solid ball of density 50 at origin, radius 0.3
            return jnp.where(jnp.linalg.norm(x, axis=-1) < 0.3, 50.0, 0.0)

        g = update_occupancy_grid(
            grid, jax.random.PRNGKey(0), density_fn,
            bound=1.0, grid_size=H, density_thresh=0.01, full=True,
        )
        occ = np.asarray(g.occupancy[0])
        # center occupied, corners not
        assert occ[H // 2, H // 2, H // 2]
        assert not occ[0, 0, 0]
        assert float(g.mean_density) > 0

    def test_ema_decay(self):
        H = 8
        grid = init_occupancy_grid(bound=1.0, grid_size=H)
        hi = lambda x: jnp.full(x.shape[:-1], 10.0)
        lo = lambda x: jnp.zeros(x.shape[:-1])
        g1 = update_occupancy_grid(grid, jax.random.PRNGKey(0), hi,
                                   bound=1.0, grid_size=H, full=True)
        g2 = update_occupancy_grid(g1, jax.random.PRNGKey(1), lo,
                                   bound=1.0, grid_size=H, full=True)
        # density decays by 0.95, not resets
        np.testing.assert_allclose(np.asarray(g2.density), 9.5, rtol=1e-5)

    def test_partial_update_static_shapes(self):
        H = 8
        grid = init_occupancy_grid(bound=1.0, grid_size=H)
        fn = lambda x: jnp.full(x.shape[:-1], 5.0)
        g1 = update_occupancy_grid(grid, jax.random.PRNGKey(0), fn,
                                   bound=1.0, grid_size=H, full=True)
        g2 = update_occupancy_grid(g1, jax.random.PRNGKey(1), fn,
                                   bound=1.0, grid_size=H, full=False)
        assert g2.density.shape == g1.density.shape
        assert int(g2.iter_density) == 2


class TestMarkUntrained:
    def test_unseen_cells_marked(self):
        H = 16
        grid = init_occupancy_grid(bound=1.0, grid_size=H)
        # one camera at +z looking toward -z (ngp convention: z is forward)
        pose = jnp.eye(4).at[2, 3].set(2.0)[None]  # cam at (0,0,2)
        # camera looks along -z in world: R = diag(1, -1, -1)
        pose = pose.at[0, 1, 1].set(-1.0).at[0, 2, 2].set(-1.0)
        intr = (1000.0, 1000.0, 50.0, 50.0)  # narrow fov (~5.7 deg full width)
        g = mark_untrained_grid(grid, pose, intr, bound=1.0, grid_size=H)
        d = np.asarray(g.density.reshape(1, H, H, H))
        # cells behind the camera (z > 2) impossible here; cells far off-axis
        # in x at z=0 plane are outside the frustum -> -1
        assert d[0, 0, H // 2, H // 2] == -1 or d[0, -1, H // 2, H // 2] == -1
        # some cells on the optical axis are seen -> stay 0
        assert (d == 0).any()


class TestPackbits:
    def test_roundtrip_bit_order(self):
        bits = jnp.array([1, 0, 0, 0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 1], bool)
        packed = packbits(bits)
        np.testing.assert_array_equal(np.asarray(packed), [1, 0b10000011])
