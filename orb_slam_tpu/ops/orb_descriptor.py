"""Intensity-centroid orientation + rotated-BRIEF (rBRIEF) descriptors.

Replaces IC_Angle and computeOrbDescriptor (reference:
src/ORBextractor.cc:124-194, 709-716). TPU-first: orientation moments are a
single [K, 31, 31] patch-gather followed by two weighted reductions;
descriptor sampling is one flat gather of [K, 512] pixels from the blurred
level image — no per-keypoint loops."""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.ops.orb_pattern import ORB_PATTERN

HALF_PATCH = 15
PATCH = 31


def _umax() -> np.ndarray:
    """Circular-patch row bounds, computed with the standard symmetric
    construction (reference: src/ORBextractor.cc:493-510) so the patch is
    exactly symmetric under 90-degree rotation."""
    umax = np.zeros(HALF_PATCH + 1, np.int32)
    vmax = int(math.floor(HALF_PATCH * math.sqrt(2.0) / 2 + 1))
    vmin = int(math.ceil(HALF_PATCH * math.sqrt(2.0) / 2))
    hp2 = HALF_PATCH * HALF_PATCH
    for v in range(vmax + 1):
        umax[v] = int(round(math.sqrt(hp2 - v * v)))
    v0 = 0
    for v in range(HALF_PATCH, vmin - 1, -1):
        while umax[v0] == umax[v0 + 1]:
            v0 += 1
        umax[v] = v0
        v0 += 1
    return umax


def _moment_weights():
    """[31,31] x/y moment weights over the circular patch."""
    um = _umax()
    dy, dx = np.mgrid[-HALF_PATCH : HALF_PATCH + 1, -HALF_PATCH : HALF_PATCH + 1]
    mask = np.abs(dx) <= um[np.abs(dy)]
    return (dx * mask).astype(np.float32), (dy * mask).astype(np.float32)


_WX, _WY = _moment_weights()


def gather_patches(img, xy, size: int):
    """Gather [K, size, size] patches centered at integer xy (x, y).
    Clamped at borders (keypoints live >= EDGE_THRESHOLD from the edge)."""
    half = size // 2

    def one(p):
        return jax.lax.dynamic_slice(
            img, (p[1] - half, p[0] - half), (size, size)
        )

    return jax.vmap(one)(xy)


def ic_angles(img, xy):
    """Intensity-centroid orientation.

    img: [H, W] float32 (UNblurred level image — the reference computes
    orientation on the raw pyramid level, src/ORBextractor.cc:718-744).
    xy: [K, 2] int32. Returns angles [K] float32 in radians, (-pi, pi]."""
    patches = gather_patches(img, xy, PATCH)
    m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_WX))
    m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_WY))
    return jnp.arctan2(m01, m10)


# Pattern as float32 [256, 2 points, 2 coords (x, y)]
_PAT = ORB_PATTERN.astype(np.float32).reshape(256, 2, 2)


def rbrief_descriptors(blurred, xy, angles):
    """256-bit rBRIEF.

    blurred: [H, W] float32 (7x7 sigma=2 Gaussian-blurred level image).
    xy: [K, 2] int32 keypoint centers. angles: [K] radians.
    Returns [K, 32] uint8, bit layout identical to OpenCV ORB
    (byte i, bit j <=> pattern pair 8i+j; bit set iff I(pA) < I(pB))."""
    H, W = blurred.shape
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [K]
    px = jnp.asarray(_PAT[:, :, 0])  # [256, 2]
    py = jnp.asarray(_PAT[:, :, 1])
    # rotated integer offsets, same rounding as the reference's cvRound
    # (round-half-to-even == jnp.round)
    col = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    row = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    rows = jnp.clip(xy[:, 1:2, None] + row.astype(jnp.int32), 0, H - 1)
    cols = jnp.clip(xy[:, 0:1, None] + col.astype(jnp.int32), 0, W - 1)
    flat_idx = (rows * W + cols).reshape(xy.shape[0], 512)
    vals = jnp.take(blurred.reshape(-1), flat_idx, axis=0)  # [K, 512]
    va = vals[:, 0::2]
    vb = vals[:, 1::2]
    bits = (va < vb).astype(jnp.uint8).reshape(-1, 32, 8)  # [K, byte, bit]
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint8)


def pack_u32(desc_u8):
    """[K, 32] uint8 -> [K, 8] uint32 (little-endian within each word) for
    fast XOR+popcount Hamming matching."""
    d = desc_u8.astype(jnp.uint32).reshape(-1, 8, 4)
    shifts = jnp.asarray([0, 8, 16, 24], jnp.uint32)
    return jnp.sum(d << shifts[None, None, :], axis=-1, dtype=jnp.uint32)
