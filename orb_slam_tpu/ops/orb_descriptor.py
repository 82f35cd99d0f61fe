"""Intensity-centroid orientation + rotated-BRIEF (rBRIEF) descriptors.

Replaces IC_Angle and computeOrbDescriptor (reference:
src/ORBextractor.cc:124-194, 709-716). TPU-first: orientation moments are a
single [K, 31, 31] patch-gather followed by two weighted reductions;
descriptor sampling is one flat gather of [K, 512] pixels from the blurred
level image — no per-keypoint loops."""

from __future__ import annotations

import math

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

    TPU-first: raw gathers lower to slow scalar loads on TPU; instead the
    patch extraction is TWO MXU matmuls against one-hot row/column selectors
    (gather-as-matmul). Exact for integer-valued images (bf16 represents
    ints <= 256 exactly; accumulation is f32). Border indices clamp
    (edge-replicate)."""
    K = xy.shape[0]
    H, W = img.shape
    half = size // 2
    offs = jnp.arange(size, dtype=jnp.int32) - half
    rows = jnp.clip(xy[:, 1:2] + offs[None, :], 0, H - 1)  # [K, size]
    cols = jnp.clip(xy[:, 0:1] + offs[None, :], 0, W - 1)
    row_oh = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)   # [K, size, H]
    col_oh = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)   # [K, size, W]
    strips = jnp.einsum(
        "ksh,hw->ksw", row_oh, img.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [K, size, W]
    patches = jnp.einsum(
        "ksw,kcw->ksc", strips.astype(jnp.bfloat16), col_oh,
        preferred_element_type=jnp.float32,
    )  # [K, size(row), size(col)]
    return patches


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


_RB_HALF = 19  # max rotated pattern offset: ceil(13 * sqrt(2)) = 19
_RB_SIZE = 2 * _RB_HALF + 1  # 39


def rbrief_descriptors(blurred, xy, angles):
    """256-bit rBRIEF.

    blurred: [H, W] float32 (7x7 sigma=2 Gaussian-blurred level image,
    rounded to integers upstream for cv2 bit-exactness).
    xy: [K, 2] int32 keypoint centers. angles: [K] radians.
    Returns [K, 32] uint8, bit layout identical to OpenCV ORB
    (byte i, bit j <=> pattern pair 8i+j; bit set iff I(pA) < I(pB)).

    TPU-first: one MXU patch extraction per keyframe ([K, 39, 39] covers
    every rotated offset), then the 512 samples per keypoint index WITHIN
    the small flattened patch (take_along_axis over 1521 elements — cheap
    compared to a global [H*W] gather)."""
    ca, sa = jnp.cos(angles), jnp.sin(angles)  # [K]
    px = jnp.asarray(_PAT[:, :, 0])  # [256, 2]
    py = jnp.asarray(_PAT[:, :, 1])
    # rotated integer offsets, same rounding as the reference's cvRound
    # (round-half-to-even == jnp.round)
    col = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    row = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    r_in = jnp.clip(row.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    c_in = jnp.clip(col.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    flat_idx = (r_in * _RB_SIZE + c_in).reshape(xy.shape[0], 512)
    patches = gather_patches(blurred, xy, _RB_SIZE)  # [K, 39, 39]
    flat = patches.reshape(xy.shape[0], _RB_SIZE * _RB_SIZE)
    vals = jnp.take_along_axis(flat, flat_idx, axis=1)  # [K, 512]
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
