"""Level-stacked orientation + rBRIEF: all keypoints of all levels at once.

Op-count-minimal formulation (see ops/fast_stack.py for why): the pyramid
stack is viewed as one tall [L*H, W] image; per-keypoint patch rows come
from ONE row-gather (row index = level*H + y + offset, clamped within the
level's true rows), columns from ONE take_along_axis; orientation moments
and descriptor sampling then run over the whole keypoint set in a handful
of batched ops."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.ops.orb_descriptor import (
    _WX, _WY, _PAT, _RB_HALF, _RB_SIZE, PATCH,
)


def extract_patches_stack(stack, level, xy, shapes, size: int):
    """stack: [L, H, W]; level: [K] i32; xy: [K, 2] level-local coords.
    shapes: static ((h, w), ...) true level sizes.
    Returns [K, size, size] f32 patches (edge-replicated within each level).
    """
    Lv, H, W = stack.shape
    half = size // 2
    flat = stack.reshape(Lv * H, W)
    offs = jnp.arange(size, dtype=jnp.int32) - half
    hs = jnp.asarray([h for h, w in shapes], jnp.int32)[level]  # [K]
    ws = jnp.asarray([w for h, w in shapes], jnp.int32)[level]
    rows_local = jnp.clip(xy[:, 1:2] + offs[None, :], 0, hs[:, None] - 1)
    rows = level[:, None] * H + rows_local                     # [K, size]
    cols = jnp.clip(xy[:, 0:1] + offs[None, :], 0, ws[:, None] - 1)
    strips = flat[rows]                                        # [K, size, W]
    patches = jnp.take_along_axis(
        strips, cols[:, None, :].repeat(size, 1), axis=2
    )                                                          # [K, size, size]
    return patches


def ic_angles_stack(stack, level, xy, shapes):
    """Orientation for all keypoints from the raw pyramid stack."""
    patches = extract_patches_stack(stack, level, xy, shapes, PATCH)
    m10 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_WX))
    m01 = jnp.einsum("kij,ij->k", patches, jnp.asarray(_WY))
    return jnp.arctan2(m01, m10)


def rbrief_stack(blurred_stack, level, xy, angles, shapes):
    """Descriptors for all keypoints from the blurred pyramid stack.
    Returns [K, 32] u8 (OpenCV bit layout)."""
    patches = extract_patches_stack(
        blurred_stack, level, xy, shapes, _RB_SIZE)
    flat = patches.reshape(xy.shape[0], _RB_SIZE * _RB_SIZE)
    ca, sa = jnp.cos(angles), jnp.sin(angles)
    px = jnp.asarray(_PAT[:, :, 0])
    py = jnp.asarray(_PAT[:, :, 1])
    col = jnp.round(px[None] * ca[:, None, None] - py[None] * sa[:, None, None])
    row = jnp.round(px[None] * sa[:, None, None] + py[None] * ca[:, None, None])
    r_in = jnp.clip(row.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    c_in = jnp.clip(col.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    idx = (r_in * _RB_SIZE + c_in).reshape(xy.shape[0], 512)
    vals = jnp.take_along_axis(flat, idx, axis=1)
    va = vals[:, 0::2]
    vb = vals[:, 1::2]
    bits = (va < vb).astype(jnp.uint8).reshape(-1, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights[None, None, :], axis=-1, dtype=jnp.uint8)


def extract_patches_batch(stack, xy_l, shapes, size: int,
                          mode: str = "rowfirst"):
    """Patch extraction for ALL levels' keypoints in one batched pass.

    stack: [L, H, W]; xy_l: [L, Q, 2] level-local integer coords.
    Returns [L, Q, size, size] bf16.

    Gather-as-matmul over the level axis: one-hot selectors against the
    level canvas — ~8 large MXU ops for the whole pyramid instead of ~130
    per-level ops. Border indices clamp within each level's true region.

    mode selects the measured formulation (scripts/bench_extract_variants):
      rowfirst — row one-hot first ('lqrh,lhw->lqrw'), bf16 end to end:
        every output element is a ONE-HOT selection (no summation), so a
        strip/patch value IS the bf16-rounded canvas value.
      colfirst — column one-hot first ('lqcw,lhw->lqch'): H < W for
        camera images, so the strip intermediate and the second
        contraction are both W/H smaller (25% at 640x480).
      colfirst-int8 — colfirst with canvas biased by -128 into int8 and
        s8xs8->s32 selections (2x MXU rate, half the strip traffic). The
        bias cancels exactly (+128 after the second selection); the only
        precision change is int8's round-to-integer of the fractional
        level>0 pyramid values (<=0.5 intensity) vs bf16's <=0.25 at
        bright pixels."""
    Lv, H, W = stack.shape
    Q = xy_l.shape[1]
    half = size // 2
    offs = jnp.arange(size, dtype=jnp.int32) - half
    hs = jnp.asarray([h for h, w in shapes], jnp.int32)[:, None, None]
    ws = jnp.asarray([w for h, w in shapes], jnp.int32)[:, None, None]
    rows = jnp.clip(xy_l[:, :, 1:2] + offs[None, None, :], 0, hs - 1)
    cols = jnp.clip(xy_l[:, :, 0:1] + offs[None, None, :], 0, ws - 1)
    if mode == "colfirst-int8":
        row_oh = jax.nn.one_hot(rows, H, dtype=jnp.int8)
        col_oh = jax.nn.one_hot(cols, W, dtype=jnp.int8)
        s8 = jnp.round(stack - 128.0).astype(jnp.int8)
        strips = jnp.einsum(
            "lqcw,lhw->lqch", col_oh, s8,
            preferred_element_type=jnp.int32,
        ).astype(jnp.int8)                       # one-hot: values in s8 range
        patches = jnp.einsum(
            "lqrh,lqch->lqrc", row_oh, strips,
            preferred_element_type=jnp.int32,
        )
        return (patches + 128).astype(jnp.bfloat16)
    if mode == "colfirst":
        col_oh = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)
        row_oh = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)
        strips = jnp.einsum(
            "lqcw,lhw->lqch", col_oh, stack.astype(jnp.bfloat16),
            preferred_element_type=jnp.bfloat16,
        )
        return jnp.einsum(
            "lqrh,lqch->lqrc", row_oh, strips,
            preferred_element_type=jnp.bfloat16,
        )
    row_oh = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)   # [L,Q,size,H]
    col_oh = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)   # [L,Q,size,W]
    strips = jnp.einsum(
        "lqrh,lhw->lqrw", row_oh, stack.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )
    patches = jnp.einsum(
        "lqrw,lqcw->lqrc", strips, col_oh,
        preferred_element_type=jnp.bfloat16,
    )
    return patches


def extract_patches_batch_rowgather(stack, xy_l, shapes, size: int):
    """extract_patches_batch via a ROW GATHER + column one-hot matmul.

    The row one-hot einsum ('lqrh,lhw->lqrw') performs O(Q*size*H*W)
    multiply-adds (~42 GFLOP at 1000 feats/39 px) to express what is just
    a row lookup; here rows come from ONE dynamic-gather on the [L*H, W]
    flat canvas (pure data movement, Q*size*W traffic) and only the
    column selection stays a matmul (O(Q*size^2*W) ~ 3 GFLOP)."""
    Lv, H, W = stack.shape
    half = size // 2
    offs = jnp.arange(size, dtype=jnp.int32) - half
    hs = jnp.asarray([h for h, w in shapes], jnp.int32)[:, None, None]
    ws = jnp.asarray([w for h, w in shapes], jnp.int32)[:, None, None]
    rows = jnp.clip(xy_l[:, :, 1:2] + offs[None, None, :], 0, hs - 1)
    cols = jnp.clip(xy_l[:, :, 0:1] + offs[None, None, :], 0, ws - 1)
    lvl = jnp.arange(Lv, dtype=jnp.int32)[:, None, None]
    flat = stack.reshape(Lv * H, W)
    strips = flat[(lvl * H + rows)]                        # [L,Q,size,W]
    col_oh = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)   # [L,Q,size,W]
    patches = jnp.einsum(
        "lqrw,lqcw->lqrc", strips.astype(jnp.bfloat16), col_oh,
        preferred_element_type=jnp.float32,
    )
    return patches


def ic_angles_batch(stack, xy_l, shapes, method: str = "onehot"):
    """[L, Q] orientations for all levels at once."""
    from orb_slam_tpu.ops.orb_descriptor import _WX, _WY

    fn = (extract_patches_batch_rowgather if method == "rowgather"
          else extract_patches_batch)
    patches = fn(stack, xy_l, shapes, PATCH)
    # moment weights are integers in [-15, 15]: bf16 x bf16 products with
    # f32 accumulation are exact on the MXU
    wx = jnp.asarray(_WX, jnp.bfloat16)
    wy = jnp.asarray(_WY, jnp.bfloat16)
    p16 = patches.astype(jnp.bfloat16)
    m10 = jnp.einsum("lqij,ij->lq", p16, wx,
                     preferred_element_type=jnp.float32)
    m01 = jnp.einsum("lqij,ij->lq", p16, wy,
                     preferred_element_type=jnp.float32)
    return jnp.arctan2(m01, m10)


def extract_patches_batch2(raw_stack, blurred_stack, xy_l, shapes,
                           size: int):
    """Fused two-channel patch extraction: ONE pair of gather-as-matmul
    einsums pulls size x size patches around every keypoint from BOTH the
    raw canvas (IC-angle moments) and the blurred canvas (rBRIEF sampling)
    — the row/column one-hot selectors are built once and the strips for
    the two channels ride the same MXU pass.

    MEASURED SLOWER than the two separate extractions on v5e (+0.26
    ms/frame chunk-slope, PERF.md round 3): the fused path moves 2 x 39^2
    elements per keypoint where the split path moves 31^2 (angles) + 39^2
    (descriptor) — fewer einsum launches don't pay for 22% more patch
    traffic. Kept as the measured record; not used by _extract_stacked.

    Returns [2, L, Q, size, size]: channel 0 = raw, 1 = blurred. Strips
    and products accumulate in bfloat16: every output element is a
    ONE-HOT row/column selection (no summation), so integer-valued
    canvases (the blurred stack is rounded; raw level 0 is the original
    image) pass through exactly; upper-level raw bilinear values round to
    bf16 (<=0.5 intensity), inside the noise the 12-degree orientation
    quantization of the LUT descriptor path already accepts."""
    Lv, H, W = raw_stack.shape
    Q = xy_l.shape[1]
    half = size // 2
    offs = jnp.arange(size, dtype=jnp.int32) - half
    hs = jnp.asarray([h for h, w in shapes], jnp.int32)[:, None, None]
    ws = jnp.asarray([w for h, w in shapes], jnp.int32)[:, None, None]
    rows = jnp.clip(xy_l[:, :, 1:2] + offs[None, None, :], 0, hs - 1)
    cols = jnp.clip(xy_l[:, :, 0:1] + offs[None, None, :], 0, ws - 1)
    row_oh = jax.nn.one_hot(rows, H, dtype=jnp.bfloat16)   # [L,Q,size,H]
    col_oh = jax.nn.one_hot(cols, W, dtype=jnp.bfloat16)   # [L,Q,size,W]
    both = jnp.stack([raw_stack, blurred_stack]).astype(jnp.bfloat16)
    strips = jnp.einsum(
        "lqrh,clhw->clqrw", row_oh, both,
        preferred_element_type=jnp.bfloat16,
    )
    patches = jnp.einsum(
        "clqrw,lqkw->clqrk", strips, col_oh,
        preferred_element_type=jnp.bfloat16,
    )
    return patches


def ic_angles_from_patches(patches_raw, size: int):
    """IC-angle moments from pre-extracted raw patches ([L, Q, size, size],
    size >= PATCH): the 31x31 moment window is the center crop, so the
    fused 39x39 extraction serves both orientation and descriptor
    sampling (reference computes them from the same pyramid level,
    src/ORBextractor.cc:467-474)."""
    from orb_slam_tpu.ops.orb_descriptor import _WX, _WY

    m = (size - PATCH) // 2
    center = patches_raw[:, :, m:m + PATCH, m:m + PATCH].astype(jnp.float32)
    m10 = jnp.einsum("lqij,ij->lq", center, jnp.asarray(_WX))
    m01 = jnp.einsum("lqij,ij->lq", center, jnp.asarray(_WY))
    return jnp.arctan2(m01, m10)


def rbrief_batch(blurred_stack, xy_l, angles_l, shapes):
    """[L, Q, 32] u8 descriptors for all levels at once (same bit layout as
    rbrief_descriptors)."""
    Lv, Q = xy_l.shape[0], xy_l.shape[1]
    patches = extract_patches_batch(blurred_stack, xy_l, shapes, _RB_SIZE)
    flat = patches.reshape(Lv, Q, _RB_SIZE * _RB_SIZE)
    ca, sa = jnp.cos(angles_l), jnp.sin(angles_l)        # [L, Q]
    px = jnp.asarray(_PAT[:, :, 0]).reshape(512)         # [512]
    py = jnp.asarray(_PAT[:, :, 1]).reshape(512)
    col = jnp.round(px[None, None] * ca[..., None] - py[None, None] * sa[..., None])
    row = jnp.round(px[None, None] * sa[..., None] + py[None, None] * ca[..., None])
    r_in = jnp.clip(row.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    c_in = jnp.clip(col.astype(jnp.int32) + _RB_HALF, 0, _RB_SIZE - 1)
    idx = r_in * _RB_SIZE + c_in                          # [L, Q, 512]
    vals = jnp.take_along_axis(flat, idx, axis=2)         # [L, Q, 512]
    va = vals[..., 0::2]
    vb = vals[..., 1::2]
    bits = (va < vb).astype(jnp.uint8).reshape(Lv, Q, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights[None, None, None, :], axis=-1,
                   dtype=jnp.uint8)


import functools


@functools.lru_cache(maxsize=4)
def rbrief_lut_table(n_bins: int = 30) -> np.ndarray:
    """[S2, n_bins*256] f32 rotated-pattern comparison table, S2 = 39*39.

    The ORB paper's own formulation (Rublee et al. 2011 §4.1): discretize
    the orientation to 2*pi/n_bins increments (12 degrees at 30 bins) and
    precompute the rotated BRIEF sampling pattern per bin. Column
    (a*256 + p) holds +1 at pair p's second sample and -1 at its first,
    both rotated by bin angle a — so bit = (patch . column) > 0, i.e. the
    whole descriptor is one MXU matmul against the flattened patch instead
    of 512 per-keypoint gathers (measured 11 ms/frame of element-at-a-time
    gather traffic on TPU; the matmul is ~0.3 ms)."""
    idx = lut_sample_indices(n_bins)  # [n_bins, 512]
    D = np.zeros((_RB_SIZE * _RB_SIZE, n_bins * 256), np.float32)
    for a in range(n_bins):
        for p in range(256):
            D[idx[a, 2 * p + 1], a * 256 + p] += 1.0
            D[idx[a, 2 * p], a * 256 + p] -= 1.0
    return D


def lut_sample_indices(n_bins: int = 30) -> np.ndarray:
    """[n_bins, 512] flattened within-patch sample index of each rotated
    pattern point, per orientation bin (samples 2p / 2p+1 = pair p)."""
    px = _PAT[:, :, 0].reshape(512)
    py = _PAT[:, :, 1].reshape(512)
    out = np.zeros((n_bins, 512), np.int64)
    for a in range(n_bins):
        th = 2.0 * np.pi * a / n_bins
        ca, sa = np.cos(th), np.sin(th)
        col = np.round(px * ca - py * sa).astype(np.int64)
        row = np.round(px * sa + py * ca).astype(np.int64)
        r_in = np.clip(row + _RB_HALF, 0, _RB_SIZE - 1)
        c_in = np.clip(col + _RB_HALF, 0, _RB_SIZE - 1)
        out[a] = r_in * _RB_SIZE + c_in
    return out


def quantize_angle(angles, n_bins: int = 30):
    """Angle -> orientation bin in [0, n_bins)."""
    step = 2.0 * np.pi / n_bins
    return jnp.mod(jnp.round(angles / step).astype(jnp.int32), n_bins)


def rbrief_lut_from_patches(patches, angles_l, table, n_bins: int = 30):
    """LUT-matmul rBRIEF from pre-extracted blurred patches
    ([L, Q, S, S], S = _RB_SIZE) — the tail of rbrief_batch_lut for
    callers that share one patch extraction between orientation and
    descriptor sampling (extract_patches_batch2)."""
    Lv, Q = patches.shape[0], patches.shape[1]
    flat = patches.reshape(Lv, Q, _RB_SIZE * _RB_SIZE)
    y = jnp.einsum(
        "lqs,st->lqt", flat.astype(jnp.bfloat16), table.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    ).reshape(Lv, Q, n_bins, 256)
    bin_oh = jax.nn.one_hot(
        quantize_angle(angles_l, n_bins), n_bins, dtype=jnp.float32)
    sel = jnp.einsum("lqab,lqa->lqb", y, bin_oh)
    bits = (sel > 0.0).astype(jnp.uint8).reshape(Lv, Q, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights[None, None, None, :], axis=-1,
                   dtype=jnp.uint8)


def rbrief_batch_lut(blurred_stack, xy_l, angles_l, shapes, table,
                     n_bins: int = 30, method: str = "onehot"):
    """[L, Q, 32] u8 descriptors via the per-orientation-bin LUT matmul.

    Same bit layout as rbrief_batch; the only deviation is the paper's
    orientation discretization (12-degree steps at the default 30 bins)
    in place of OpenCV's continuous rotation. table = rbrief_lut_table(),
    passed as a device argument (23 MB — a jit closure constant would be
    re-hashed per call on the target runtime)."""
    Lv, Q = xy_l.shape[0], xy_l.shape[1]
    fn = (extract_patches_batch_rowgather if method == "rowgather"
          else extract_patches_batch)
    patches = fn(blurred_stack, xy_l, shapes, _RB_SIZE)
    flat = patches.reshape(Lv, Q, _RB_SIZE * _RB_SIZE)
    # int8 MXU path, EXACT: patch values are integers in [0, 255]; biasing
    # by -128 fits int8, and every table column holds one +1 and one -1
    # (sum 0), so the -128 bias cancels: sum (p-128)*t = sum p*t = the
    # second sample minus the first, an integer in [-255, 255]. int8
    # matmuls run 2x bf16 on the MXU and quarter the flat-patch traffic.
    p8 = (flat - 128.0).astype(jnp.int8)
    t8 = table.astype(jnp.int8)
    y = jnp.einsum(
        "lqs,st->lqt", p8, t8, preferred_element_type=jnp.int32,
    ).reshape(Lv, Q, n_bins, 256)
    # |y| <= 255: exact in bf16 for the bin-selection one-hot matmul
    bin_oh = jax.nn.one_hot(
        quantize_angle(angles_l, n_bins), n_bins, dtype=jnp.bfloat16)
    sel = jnp.einsum("lqab,lqa->lqb", y.astype(jnp.bfloat16), bin_oh,
                     preferred_element_type=jnp.float32)
    bits = (sel > 0.0).astype(jnp.uint8).reshape(Lv, Q, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    return jnp.sum(bits * weights[None, None, None, :], axis=-1,
                   dtype=jnp.uint8)


def angles_desc_fused(raw_stack, xy_l, shapes, table, n_bins: int = 30,
                      quotas=None, patch_mode: str = "rowfirst"):
    """(angles [L, Q], desc [L, Q, 32]) from ONE 45x45 patch extraction.

    quotas: optional static per-level feature quotas. When given, levels
    are processed in TWO groups split at L/2, each padded only to ITS
    group's max quota: the per-level quotas fall geometrically
    (ORBextractor.cc:476-487), so one [L, Qmax] layout wastes ~40% of the
    patch/LUT work on padding slots of the upper levels (level 7's quota
    is ~1/4 of level 0's at the reference 1000/8 configuration).

    Replaces three passes of the round-2 design — a 31x31 raw extraction
    (IC angles), a full-canvas 7x7 blur, and a 39x39 blurred extraction
    (rBRIEF sampling) — with a single 45x45 raw extraction: the moment
    window is its center crop (bitwise-identical clamped indices), and the
    7x7 blur runs separably IN-PATCH (45 -> 39 valid), so the canvas never
    round-trips through a blurred copy. ~35% fewer gather-matmul MACs and
    ~35% less strip traffic (PERF.md round 3).

    Deviations vs the split path, both inside the established fast-path
    budget (tests/test_stacked_extractor.py): (1) blur consumes
    bf16-rounded raw samples (<=0.25 intensity pre-round); (2) within ~22
    px of a level's true edge the blur sees clamp-replicated rows instead
    of the canvas blur's zero-bleed (closer to the reference's per-level
    reflect blur, ORBextractor.cc:768-771, than the zero-bleed was)."""
    from orb_slam_tpu.ops.image import gaussian_kernel1d
    from orb_slam_tpu.ops.orb_descriptor import _WX, _WY

    Lv, Q = xy_l.shape[0], xy_l.shape[1]
    if quotas is not None and Lv > 1:
        L2 = Lv // 2
        q_hi = max(quotas[:L2])
        q_lo = max(quotas[L2:])
        if q_lo < Q or q_hi < Q:
            angs, descs = [], []
            for (a, b, qg) in ((0, L2, q_hi), (L2, Lv, q_lo)):
                # crop the canvas to the group's largest level (levels
                # shrink monotonically): the gather-matmul contracts over
                # canvas rows/cols, so the upper group's einsums span
                # ~23% of the full canvas area instead of 100%
                hg, wg = shapes[a]
                ag, dg = angles_desc_fused(
                    raw_stack[a:b, :hg, :wg], xy_l[a:b, :qg],
                    tuple(shapes[a:b]), table, n_bins, quotas=None,
                    patch_mode=patch_mode)
                pad = Q - qg
                angs.append(jnp.pad(ag, ((0, 0), (0, pad))))
                descs.append(jnp.pad(dg, ((0, 0), (0, pad), (0, 0))))
            return (jnp.concatenate(angs, 0), jnp.concatenate(descs, 0))

    S = _RB_SIZE + 6                                    # 45
    p45 = extract_patches_batch(raw_stack, xy_l, shapes, S,
                                mode=patch_mode)        # bf16
    m = (S - PATCH) // 2
    center = p45[:, :, m:m + PATCH, m:m + PATCH]
    wx = jnp.asarray(_WX, jnp.bfloat16)
    wy = jnp.asarray(_WY, jnp.bfloat16)
    m10 = jnp.einsum("lqij,ij->lq", center, wx,
                     preferred_element_type=jnp.float32)
    m01 = jnp.einsum("lqij,ij->lq", center, wy,
                     preferred_element_type=jnp.float32)
    angles = jnp.arctan2(m01, m10)

    k = gaussian_kernel1d(7, 2.0)
    pf = p45.astype(jnp.float32)
    rows = sum(float(k[i]) * pf[:, :, i:i + _RB_SIZE, :] for i in range(7))
    blurred = sum(float(k[i]) * rows[:, :, :, i:i + _RB_SIZE]
                  for i in range(7))
    flat = jnp.round(blurred).reshape(Lv, Q, _RB_SIZE * _RB_SIZE)

    # int8 MXU LUT matmul (see rbrief_batch_lut for the exactness argument)
    p8 = (flat - 128.0).astype(jnp.int8)
    t8 = table.astype(jnp.int8)
    y = jnp.einsum(
        "lqs,st->lqt", p8, t8, preferred_element_type=jnp.int32,
    ).reshape(Lv, Q, n_bins, 256)
    bin_oh = jax.nn.one_hot(
        quantize_angle(angles, n_bins), n_bins, dtype=jnp.bfloat16)
    sel = jnp.einsum("lqab,lqa->lqb", y.astype(jnp.bfloat16), bin_oh,
                     preferred_element_type=jnp.float32)
    bits = (sel > 0.0).astype(jnp.uint8).reshape(Lv, Q, 32, 8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], jnp.uint8)
    desc = jnp.sum(bits * weights[None, None, None, :], axis=-1,
                   dtype=jnp.uint8)
    return angles, desc


def gaussian_blur_stack(stack, ksize: int = 7, sigma: float = 2.0):
    """Separable 7x7 blur over [L, H, W] (reflect padding on the canvas;
    levels occupying the top-left corner see zeros past their true edge —
    only the outermost 3 rows/cols of each level differ from the exact
    per-level blur, outside any keypoint's sampling band in practice)."""
    from orb_slam_tpu.ops.image import gaussian_kernel1d

    k = jnp.asarray(gaussian_kernel1d(ksize, sigma))
    r = ksize // 2
    p = jnp.pad(stack, ((0, 0), (r, r), (0, 0)), mode="reflect")
    out = jnp.zeros_like(stack)
    for i in range(ksize):
        out = out + k[i] * jax.lax.dynamic_slice_in_dim(p, i, stack.shape[1], 1)
    p = jnp.pad(out, ((0, 0), (0, 0), (r, r)), mode="reflect")
    out2 = jnp.zeros_like(stack)
    for i in range(ksize):
        out2 = out2 + k[i] * jax.lax.dynamic_slice_in_dim(p, i, stack.shape[2], 2)
    return out2
