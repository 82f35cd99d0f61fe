"""Synthetic scene simulator: ground-truth world -> feature tracks / images.

The reference has no test suite (SURVEY.md §4); its behavior spec is a
rosbag replay judged by eye. This simulator is our replacement: a known 3D
point cloud + camera trajectory rendered to either
  * oracle ORB features (projected keypoints + stable synthetic descriptors
    with controllable bit noise) — for fast deterministic pipeline tests, or
  * actual grayscale images (textured square billboards) — for end-to-end
    tests through the real extractor."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from orb_slam_tpu.geometry import se3_from_rt
import jax.numpy as jnp


@dataclass
class SyntheticScene:
    n_points: int = 600
    width: int = 640
    height: int = 480
    fx: float = 500.0
    fy: float = 500.0
    cx: float = 320.0
    cy: float = 240.0
    seed: int = 0
    extent: tuple = (8.0, 5.0, 4.0)   # x/y spread, z depth range start
    depth_range: tuple = (4.0, 12.0)

    ring: bool = False  # points on a cylindrical ring around the origin
                        # (gives view separation for loop-closing tests)

    # radial-tangential lens distortion (k1, k2, p1, p2) applied when
    # RENDERING (projection through the distorted model, the same
    # convention as geometry/camera.py::distort / the reference's
    # Data/Settings.yaml camera block) — the pipeline must undistort
    # (Frame::UndistortKeyPoints, src/Frame.cc:289-319) to track correctly
    dist: tuple = (0.0, 0.0, 0.0, 0.0)

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        if self.ring:
            theta = rng.uniform(0, 2 * np.pi, self.n_points)
            radius = rng.uniform(*self.depth_range, self.n_points)
            self.points = np.stack(
                [
                    radius * np.sin(theta),
                    rng.uniform(-self.extent[1], self.extent[1], self.n_points),
                    radius * np.cos(theta),
                ],
                1,
            ).astype(np.float32)
        else:
            self.points = np.stack(
                [
                    rng.uniform(-self.extent[0], self.extent[0], self.n_points),
                    rng.uniform(-self.extent[1], self.extent[1], self.n_points),
                    rng.uniform(*self.depth_range, self.n_points),
                ],
                1,
            ).astype(np.float32)
        # stable random descriptor per point
        self.descriptors = rng.integers(
            0, 2 ** 32, (self.n_points, 8), dtype=np.uint32
        )
        self.rng = rng

    @property
    def K(self):
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]],
            np.float32,
        )

    def camera_model(self):
        """The matching pipeline CameraModel (incl. distortion)."""
        from orb_slam_tpu.geometry import CameraModel
        k1, k2, p1, p2 = self.dist
        return CameraModel.create(self.fx, self.fy, self.cx, self.cy,
                                  k1=k1, k2=k2, p1=p1, p2=p2,
                                  width=self.width, height=self.height)

    def _project_px(self, pc):
        """Camera-frame points [N,3] -> DISTORTED pixel coords [N,2]
        (numpy mirror of geometry/camera.py::project(with_distortion));
        zero coefficients reduce to the pinhole projection."""
        z = np.maximum(pc[:, 2], 1e-6)
        x = pc[:, 0] / z
        y = pc[:, 1] / z
        k1, k2, p1, p2 = self.dist
        if any(c != 0.0 for c in self.dist):
            r2 = x * x + y * y
            radial = 1.0 + k1 * r2 + k2 * r2 * r2
            xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
            yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
            x, y = xd, yd
        return np.stack([self.fx * x + self.cx, self.fy * y + self.cy], 1)

    def observe(self, T_cw, n_slots=256, pix_noise=0.3, desc_bit_noise=6,
                drop_frac=0.05):
        """Render oracle features for camera pose T_cw [4,4] (numpy).

        Returns dict(xy [n,2], desc [n,8] u32, octave [n], angle [n],
        valid [n]) padded/truncated to n_slots, plus ground-truth point ids
        [n] (for debugging only — the pipeline never sees them)."""
        R, t = T_cw[:3, :3], T_cw[:3, 3]
        pc = self.points @ R.T + t
        z = pc[:, 2]
        uv = np.where((z > 0.1)[:, None], self._project_px(pc), -1000.0)
        vis = (
            (z > 0.5)
            & (uv[:, 0] >= 8) & (uv[:, 0] < self.width - 8)
            & (uv[:, 1] >= 8) & (uv[:, 1] < self.height - 8)
        )
        vis &= self.rng.random(self.n_points) > drop_frac
        ids = np.where(vis)[0]
        self.rng.shuffle(ids)
        ids = ids[:n_slots]
        n = len(ids)
        xy = uv[ids] + self.rng.normal(0, pix_noise, (n, 2))
        desc = self.descriptors[ids].copy()
        # flip random bits
        for _ in range(desc_bit_noise):
            w = self.rng.integers(0, 8, n)
            b = self.rng.integers(0, 32, n)
            desc[np.arange(n), w] ^= (np.uint32(1) << b.astype(np.uint32))
        # octave from depth (nearer -> finer): map z to [0,3]
        octave = np.clip(
            (3 - 3 * (z[ids] - self.depth_range[0])
             / (self.depth_range[1] - self.depth_range[0])).astype(np.int32),
            0, 7)
        out = dict(
            xy=np.zeros((n_slots, 2), np.float32),
            desc=np.zeros((n_slots, 8), np.uint32),
            octave=np.zeros(n_slots, np.int32),
            angle=np.zeros(n_slots, np.float32),
            valid=np.zeros(n_slots, bool),
            ids=np.full(n_slots, -1, np.int64),
        )
        out["xy"][:n] = xy
        out["desc"][:n] = desc
        out["octave"][:n] = octave
        out["valid"][:n] = True
        out["ids"][:n] = ids
        return out

    def render_image(self, T_cw, patch=5, exposure=1.0, bias=0.0,
                     vignette=0.0, noise=0.0, quantize=False,
                     photo_seed=None):
        """Rasterize textured square billboards onto a textured background.

        Each billboard carries a UNIQUE deterministic texture (seeded by its
        point id) so rBRIEF descriptors are distinctive across the scene —
        flat uniform squares all look alike and the matcher's ratio test
        correctly rejects them as ambiguous.

        Billboards are placed through the DISTORTED projection (self.dist),
        so a pipeline consuming these frames must undistort keypoints like
        the reference does for a real camera (src/Frame.cc:289-319).

        Photometric nuisance (all off by default, exercised by the
        hardened-eval tests): `exposure`/`bias` = per-frame gain/offset,
        `vignette` = relative corner darkening (cos^4-style radial
        falloff), `noise` = additive Gaussian sigma in intensity levels,
        `quantize` = uint8 rounding (what a real sensor delivers)."""
        rng_local = np.random.default_rng(123)
        img = rng_local.uniform(30, 60, (self.height, self.width)).astype(np.float32)
        R, t = T_cw[:3, :3], T_cw[:3, 3]
        pc = self.points @ R.T + t
        z = pc[:, 2]
        uv_all = self._project_px(pc)
        order = np.argsort(-z)  # far first (painter's algorithm)
        for i in order:
            if z[i] < 0.5:
                continue
            u, v = uv_all[i]
            s = max(3, int(round(patch * 6.0 / z[i])))
            x0, y0 = int(round(u)) - s, int(round(v)) - s
            x1, y1 = x0 + 2 * s, y0 + 2 * s
            if x1 < 0 or y1 < 0 or x0 >= self.width or y0 >= self.height:
                continue
            # unique per-blob texture, rendered at the blob's current size
            # (coarse 4x4 pattern upsampled -> scale-tolerant appearance)
            rng_i = np.random.default_rng(1000 + i)
            base = rng_i.uniform(80, 255, (4, 4)).astype(np.float32)
            tex = np.kron(base, np.ones((max(1, s // 2), max(1, s // 2)),
                                        np.float32))
            tex = tex[: 2 * s, : 2 * s]
            th, tw = tex.shape
            ys0, xs0 = max(0, y0), max(0, x0)
            ys1 = min(self.height, y0 + th)
            xs1 = min(self.width, x0 + tw)
            if ys1 <= ys0 or xs1 <= xs0:
                continue
            img[ys0:ys1, xs0:xs1] = tex[ys0 - y0: ys1 - y0, xs0 - x0: xs1 - x0]
        # soften block edges: raw nearest-neighbor texture is aliased and
        # descriptor bits flip under sub-pixel viewpoint shifts
        k = np.array([0.25, 0.5, 0.25], np.float32)
        p = np.pad(img, ((1, 1), (0, 0)), mode="edge")
        img = k[0] * p[:-2] + k[1] * p[1:-1] + k[2] * p[2:]
        p = np.pad(img, ((0, 0), (1, 1)), mode="edge")
        img = k[0] * p[:, :-2] + k[1] * p[:, 1:-1] + k[2] * p[:, 2:]

        # photometric nuisance chain (sensor order: optics -> gain -> noise
        # -> quantization)
        if vignette:
            yy = (np.arange(self.height, dtype=np.float32)
                  - self.cy)[:, None] / self.fy
            xx = (np.arange(self.width, dtype=np.float32)
                  - self.cx)[None, :] / self.fx
            r2 = xx * xx + yy * yy
            r2 = r2 / max(float(r2.max()), 1e-9)
            img = img * (1.0 - vignette * r2)
        if exposure != 1.0 or bias != 0.0:
            img = img * exposure + bias
        if noise:
            nrng = np.random.default_rng(
                photo_seed if photo_seed is not None else 7)
            img = img + nrng.normal(0.0, noise, img.shape)
        img = np.clip(img, 0.0, 255.0)
        if quantize:
            img = np.round(img)
        return img.astype(np.float32)


def ring_trajectory(n_frames, orbit_radius=2.0, total_angle=2.0 * np.pi,
                    center=(0.0, 0.0, 0.0)):
    """Ground-truth world->camera poses for a camera orbiting the origin and
    looking radially OUTWARD at a cylindrical ring of points
    (SyntheticScene(ring=True)). A full orbit revisits the start — the
    organic loop-closure scenario (the reference's Example.bag contains
    'a loop closure', README.md:151)."""
    poses = []
    c = np.asarray(center, np.float32)
    for i in range(n_frames):
        phi = total_angle * i / n_frames
        d = np.array([np.sin(phi), 0.0, np.cos(phi)], np.float32)  # outward
        x_cam = np.array([np.cos(phi), 0.0, -np.sin(phi)], np.float32)
        y_cam = np.array([0.0, 1.0, 0.0], np.float32)
        R_wc = np.stack([x_cam, y_cam, d], 1)   # columns = camera axes
        R_cw = R_wc.T
        C = c + orbit_radius * d
        t = -R_cw @ C
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = R_cw
        T[:3, 3] = t
        poses.append(T)
    return np.stack(poses)


def lateral_trajectory(n_frames, step=0.08, yaw_rate=0.0):
    """Ground-truth world->camera poses for a sideways-translating camera."""
    poses = []
    for i in range(n_frames):
        yaw = yaw_rate * i
        R = np.array(
            [[np.cos(yaw), 0, np.sin(yaw)], [0, 1, 0], [-np.sin(yaw), 0, np.cos(yaw)]],
            np.float32,
        )
        C = np.array([step * i, 0.02 * np.sin(i * 0.3), 0.0], np.float32)
        t = -R @ C
        poses.append(np.asarray(se3_from_rt(jnp.asarray(R), jnp.asarray(t))))
    return np.stack(poses)
