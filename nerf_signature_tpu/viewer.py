"""Offline interactive-style viewer: orbit camera + turntable rendering +
timed train/render hooks.

Replaces the reference's dearpygui GUI (``nerf/gui.py``) with a headless,
scriptable equivalent (SURVEY.md §7 step 6: offline orbit renderer first):
  * ``OrbitCamera`` — same orbit/pan/scale controls and pose math as
    ``nerf/gui.py:10-53``,
  * ``Viewer.train_steps`` ~ ``Trainer.train_gui`` (``nerf/utils.py:719-777``):
    a timed K-step training slice, with the adaptive step count that keeps a
    ~500 ms frame budget (``nerf/gui.py:106-111``),
  * ``Viewer.render_view`` ~ ``Trainer.test_gui`` (``nerf/utils.py:781-830``):
    single-pose render with adaptive downscale for a ~200 ms budget
    (``nerf/gui.py:134-140``),
  * ``Viewer.turntable`` — renders an orbit trajectory to PNG frames / mp4.
"""

import os
import time

import numpy as np

from .data.rays import get_rays


class OrbitCamera:
    """Orbit camera with the reference's pose convention (``nerf/gui.py:10-53``)."""

    def __init__(self, W, H, r=2.0, fovy=60.0):
        self.W, self.H = W, H
        self.radius = r
        self.fovy = fovy
        self.center = np.zeros(3, np.float32)
        # rotation as a 3x3 (identity = looking down +z in camera space;
        # see the pose property for the +z-forward convention)
        self.rot = np.eye(3, dtype=np.float32)
        self.up = np.array([0, 1, 0], np.float32)

    @property
    def pose(self):
        # this framework's ``get_rays`` is +z-forward (``data/rays.py``): the
        # camera sits at -radius*z in camera axes so the central ray points
        # at the orbit center (the reference's OpenGL convention is -z
        # forward, ``nerf/gui.py:27-33`` — sign flipped here on purpose)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = self.rot
        pose[:3, 3] = self.rot @ np.array([0, 0, -self.radius], np.float32) \
            + self.center
        return pose

    @property
    def intrinsics(self):
        focal = self.H / (2 * np.tan(np.radians(self.fovy) / 2))
        return np.array([focal, focal, self.W // 2, self.H // 2])

    def _axis_angle(self, axis, angle):
        axis = axis / (np.linalg.norm(axis) + 1e-12)
        K = np.array([
            [0, -axis[2], axis[1]],
            [axis[2], 0, -axis[0]],
            [-axis[1], axis[0], 0],
        ], np.float32)
        return np.eye(3, dtype=np.float32) + np.sin(angle) * K \
            + (1 - np.cos(angle)) * (K @ K)

    def orbit(self, dx, dy):
        side = self.rot[:, 0]
        self.rot = (
            self._axis_angle(self.up, -0.01 * dx)
            @ self._axis_angle(side, -0.01 * dy)
            @ self.rot
        )

    def scale(self, delta):
        self.radius *= 1.1**-delta

    def pan(self, dx, dy, dz=0):
        self.center += 5e-4 * self.rot[:3, :3] @ np.array([dx, dy, dz], np.float32)


class Viewer:
    def __init__(self, trainer, train_loader=None, W=800, H=800, radius=2.0,
                 fovy=60.0, train_budget_ms=500.0, render_budget_ms=200.0,
                 max_spp=1):
        self.trainer = trainer
        self.model = trainer.model
        self.train_loader = train_loader
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy)
        self.train_budget_ms = train_budget_ms
        self.render_budget_ms = render_budget_ms
        self.train_steps_per_frame = 16
        self.downscale = 1
        # panel state (ref gui.py:156-427: mode selector + bg color picker)
        self.mode = "rgb"           # 'rgb' | 'depth'
        self.bg_color = 1.0
        # progressive supersampling while the camera is static
        # (ref gui.py: spp accumulates jittered renders up to max_spp)
        self.max_spp = int(max_spp)
        self.spp = 0                # samples accumulated in self._accum
        self._accum = None          # running mean image [H, W, 3]
        self._accum_key = None      # (pose bytes, ds, mode, bg) of the accum
        self._jitter_rng = np.random.default_rng(0)

    def reset_accum(self):
        """Invalidate the supersampling accumulator (call when the scene
        changes under a static camera, e.g. between training slices)."""
        self._accum, self.spp, self._accum_key = None, 0, None

    # -- training slice (adaptive like gui.py:106-111) -----------------------
    def train_steps(self):
        if self.train_loader is None:
            return {}
        # one-time + periodic occupancy-grid maintenance: the GUI loop drives
        # train_step_data directly, so it must do what Trainer.train does
        # (ref train_gui also updates the grid, nerf/utils.py:735-737)
        if not getattr(self, "_grid_marked", False):
            ld = self.train_loader
            if getattr(ld, "poses", None) is not None:
                self.model.mark_untrained_grid(ld.poses, ld.intrinsics)
            self._grid_marked = True
        interval = getattr(self.trainer.opt, "update_extra_interval", 16)
        t0 = time.perf_counter()
        it = iter(self.train_loader)
        loss = 0.0
        for _ in range(self.train_steps_per_frame):
            if self.trainer.global_step % interval == 0:
                self.model.update_extra_state()
            try:
                data = next(it)
            except StopIteration:
                it = iter(self.train_loader)
                data = next(it)
            step_loss = self.trainer.train_step_data(data)[0]
            self.trainer.global_step += 1
            loss = float(step_loss)
        dt_ms = (time.perf_counter() - t0) * 1e3
        full_t = dt_ms / self.train_steps_per_frame
        self.train_steps_per_frame = int(
            np.clip(self.train_budget_ms / max(full_t, 1e-3), 1, 64)
        )
        return {"loss": loss, "ms": dt_ms,
                "next_steps": self.train_steps_per_frame}

    # -- single-view render (adaptive downscale like gui.py:134-140) ---------
    def render_view(self, pose=None, downscale=None):
        """One frame; with ``max_spp > 1``, repeated calls at a static camera
        accumulate sub-pixel-jittered renders into a running mean (the
        reference GUI's progressive supersampling, ``nerf/gui.py`` spp loop).
        Any pose / downscale / mode / bg change resets the accumulator."""
        import jax.numpy as jnp

        pose = pose if pose is not None else self.cam.pose
        ds = downscale or self.downscale
        H, W = int(self.cam.H // ds), int(self.cam.W // ds)
        intr = self.cam.intrinsics / ds
        key = (pose.astype(np.float32).tobytes(),
               np.asarray(intr, np.float32).tobytes(), H, W, self.mode,
               float(self.bg_color))
        if key != self._accum_key:
            self._accum, self.spp, self._accum_key = None, 0, key
        if self.spp >= self.max_spp and self._accum is not None:
            return self._accum, 0.0  # converged — free frame
        t0 = time.perf_counter()
        # first sample at pixel centers (crisp preview), then jittered
        jit = self._jitter_rng if self.spp > 0 else None
        rays = get_rays(pose[None], intr, H, W, -1, jitter_rng=jit)
        out = self.model.render(
            jnp.asarray(rays["rays_o"]), jnp.asarray(rays["rays_d"]),
            staged=True, max_ray_batch=4096,
            bg_color=np.full((1, 3), self.bg_color, np.float32),
        )
        if self.mode == "depth":
            d = np.asarray(out["depth"]).reshape(H, W)
            d = d / max(float(d.max()), 1e-6)
            img = np.repeat(d[..., None], 3, axis=-1)
        else:
            img = np.clip(np.asarray(out["image"]).reshape(H, W, 3), 0, 1)
        # running mean over spp samples
        if self._accum is None:
            self._accum = img
        else:
            self._accum = self._accum + (img - self._accum) / (self.spp + 1)
        self.spp += 1
        img = self._accum
        dt_ms = (time.perf_counter() - t0) * 1e3
        # adapt resolution toward the frame budget (only while not refining —
        # refinement frames should keep the resolution that converged).
        # 20% hysteresis: a changed downscale changes the accumulator key and
        # restarts accumulation, so frame-time noise must not thrash it.
        if self.spp <= 1:
            ratio = np.sqrt(dt_ms / self.render_budget_ms)
            if ratio > 1.2 or ratio < 0.8:
                self.downscale = float(np.clip(ds * ratio, 1, 8))
        return img, dt_ms

    # -- offline turntable ----------------------------------------------------
    def turntable(self, n_frames=60, save_dir=None, fps=25, write_video=True):
        frames = []
        for i in range(n_frames):
            self.cam.orbit(2 * np.pi / n_frames / 0.01, 0)
            img, _ = self.render_view(downscale=1)
            frames.append((img * 255).astype(np.uint8))
            if save_dir:
                os.makedirs(save_dir, exist_ok=True)
                try:
                    import cv2
                    cv2.imwrite(os.path.join(save_dir, f"frame_{i:04d}.png"),
                                cv2.cvtColor(frames[-1], cv2.COLOR_RGB2BGR))
                except Exception:
                    pass
        if write_video and save_dir:
            try:
                import imageio
                imageio.mimwrite(os.path.join(save_dir, "turntable.mp4"),
                                 np.stack(frames), fps=fps, quality=8,
                                 macro_block_size=1)
            except Exception:
                pass
        return frames
