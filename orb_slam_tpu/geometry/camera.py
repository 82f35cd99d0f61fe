"""Pinhole camera with radial-tangential distortion.

Replaces the reference's cv::undistortPoints usage (src/Frame.cc:289-319)
and the K-matrix projections scattered through Tracking/ORBmatcher.
Distortion model matches OpenCV: k1, k2 radial + p1, p2 tangential.

`CameraModel` is a NamedTuple of scalars so it is a static-friendly pytree
that can be closed over or passed through jit."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import jax


class CameraModel(NamedTuple):
    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    k1: jnp.ndarray
    k2: jnp.ndarray
    p1: jnp.ndarray
    p2: jnp.ndarray
    width: int  # static
    height: int  # static

    @staticmethod
    def create(fx, fy, cx, cy, k1=0.0, k2=0.0, p1=0.0, p2=0.0, width=640, height=480):
        f = lambda v: jnp.asarray(v, jnp.float32)
        return CameraModel(f(fx), f(fy), f(cx), f(cy), f(k1), f(k2), f(p1), f(p2),
                           int(width), int(height))

    @property
    def K(self):
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )


def distort(cam: CameraModel, xn):
    """Apply distortion to normalized coords xn: (...,2) -> (...,2)."""
    x, y = xn[..., 0], xn[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
    xd = x * radial + 2.0 * cam.p1 * x * y + cam.p2 * (r2 + 2.0 * x * x)
    yd = y * radial + cam.p1 * (r2 + 2.0 * y * y) + 2.0 * cam.p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def project(cam: CameraModel, p_cam, with_distortion=False):
    """Camera-frame 3D points (...,3) -> pixel coords (...,2).

    Division is depth-safe (clamped); callers must mask by z>0 themselves
    (same contract as Frame::isInFrustum, reference src/Frame.cc:137-198)."""
    z = p_cam[..., 2]
    zsafe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    xn = p_cam[..., :2] / zsafe[..., None]
    if with_distortion:
        xn = distort(cam, xn)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def unproject(cam: CameraModel, uv):
    """Pixel coords (...,2) -> normalized image-plane coords (...,2) (no
    distortion removal — use undistort_points for distorted pixels)."""
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def undistort_points(cam: CameraModel, uv, iters: int = 8):
    """Iteratively undistort pixel coords (matches cv::undistortPoints'
    fixed-point iteration). Returns *pixel* coords through K (like the
    reference's Frame::UndistortKeyPoints with P=K, src/Frame.cc:289-319).

    When the camera is a closed-over constant with ZERO distortion, the
    whole fixed-point loop is the identity — return the input directly
    (the reference skips undistortion entirely in that case,
    src/Frame.cc:291-297; this also spares the per-frame loop on the
    tracking hot path)."""
    try:
        if (float(cam.k1) == 0.0 and float(cam.k2) == 0.0
                and float(cam.p1) == 0.0 and float(cam.p2) == 0.0):
            return uv
    except Exception:
        pass  # traced coefficients: run the general path
    xd = unproject(cam, uv)

    def body(_, x):
        xx, yy = x[..., 0], x[..., 1]
        r2 = xx * xx + yy * yy
        radial = 1.0 + cam.k1 * r2 + cam.k2 * r2 * r2
        dx = 2.0 * cam.p1 * xx * yy + cam.p2 * (r2 + 2.0 * xx * xx)
        dy = cam.p1 * (r2 + 2.0 * yy * yy) + 2.0 * cam.p2 * xx * yy
        xu = (xd[..., 0] - dx) / radial
        yu = (xd[..., 1] - dy) / radial
        return jnp.stack([xu, yu], axis=-1)

    xn = jax.lax.fori_loop(0, iters, body, xd)
    u = cam.fx * xn[..., 0] + cam.cx
    v = cam.fy * xn[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def undistorted_bounds(cam: CameraModel):
    """Undistorted image bounds from the 4 corners (reference:
    src/Frame.cc:321-349). Returns (min_x, max_x, min_y, max_y) arrays."""
    corners = jnp.array(
        [[0.0, 0.0], [cam.width, 0.0], [0.0, cam.height], [cam.width, cam.height]],
        jnp.float32,
    )
    und = undistort_points(cam, corners)
    return (
        jnp.minimum(und[0, 0], und[2, 0]),
        jnp.maximum(und[1, 0], und[3, 0]),
        jnp.minimum(und[0, 1], und[1, 1]),
        jnp.maximum(und[2, 1], und[3, 1]),
    )
