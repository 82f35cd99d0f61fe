"""Dense masked Hamming matching — the TPU replacement for ORBmatcher.

The reference implements nine search entry points as per-feature loops over
grid cells (src/ORBmatcher.cc, include/ORBmatcher.h). On TPU all of them are
ONE parameterized dense kernel: a [N, M] XOR+popcount distance matrix (VPU
work), geometric constraints as additive masks, best/second-best row
reductions, optional mutual-consistency, and the 30-bin rotation-consistency
histogram (src/ORBmatcher.cc:1748-1789) as a one-hot reduction.

Thresholds follow the reference: TH_HIGH=100, TH_LOW=50, HISTO_LENGTH=30
(src/ORBmatcher.cc:40-42)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from orb_slam_tpu.utils.dispatch import fused_jit

TH_HIGH = 100
TH_LOW = 50
HISTO_LENGTH = 30
INVALID_DIST = 512  # > max possible Hamming distance (256)


def hamming_matrix(desc_a, desc_b):
    """[N, 8] u32 x [M, 8] u32 -> [N, M] int32 Hamming distances.

    XOR + popcount on the VPU (replaces the 256-bit parallel popcount at
    src/ORBmatcher.cc:1794-1810). Exact but VPU-bound; prefer
    hamming_matrix_mxu for large N*M."""
    x = desc_a[:, None, :] ^ desc_b[None, :, :]  # [N, M, 8]
    return jnp.sum(jax.lax.population_count(x), axis=-1).astype(jnp.int32)


def unpack_pm1(desc_u32):
    """[N, 8] u32 -> [N, 256] bf16 in {-1, +1}.

    The +-1 unpacking turns Hamming distance into an MXU matmul:
    ham(a, b) = (256 - <a_pm1, b_pm1>) / 2 — EXACT (the dot product is an
    even integer in [-256, 256]; bf16 inputs with f32 accumulation represent
    it exactly). This is the TPU-native form of the reference's popcount."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc_u32[:, :, None] >> shifts[None, None, :]) & jnp.uint32(1)
    bits = bits.reshape(desc_u32.shape[0], 256)
    return (2.0 * bits.astype(jnp.bfloat16) - 1.0)


def hamming_matrix_mxu(pm1_a, pm1_b):
    """[N,256] x [M,256] (+-1 bf16) -> [N, M] i32 exact Hamming distances,
    computed as one MXU matmul: d = (256 - A B^T) / 2."""
    dot = jnp.dot(pm1_a, pm1_b.T, preferred_element_type=jnp.float32)
    return ((256.0 - dot) * 0.5).astype(jnp.int32)


def rotation_consistency_mask(angle_a, angle_b_matched, valid):
    """Keep only matches whose angle difference falls in the top-3 of a
    30-bin rotation histogram (reference: ComputeThreeMaxima + the filter
    loops, src/ORBmatcher.cc:1748-1789). Returns a refined valid mask."""
    rot = angle_a - angle_b_matched
    two_pi = 2.0 * jnp.pi
    rot = jnp.mod(rot, two_pi)  # [0, 2pi)
    bin_f = rot * (HISTO_LENGTH / two_pi)
    bins = jnp.clip(jnp.round(bin_f).astype(jnp.int32), 0, HISTO_LENGTH) % HISTO_LENGTH
    one_hot = jax.nn.one_hot(bins, HISTO_LENGTH, dtype=jnp.int32) * valid[:, None].astype(jnp.int32)
    hist = jnp.sum(one_hot, axis=0)  # [30]
    top3_vals, top3_idx = jax.lax.top_k(hist, 3)
    # reference drops bins 2/3 if below 0.1x the max bin
    max1 = top3_vals[0]
    keep_bin = jnp.zeros(HISTO_LENGTH, bool)
    keep_bin = keep_bin.at[top3_idx[0]].set(True)
    keep_bin = keep_bin.at[top3_idx[1]].set(top3_vals[1] > 0.1 * max1)
    keep_bin = keep_bin.at[top3_idx[2]].set(top3_vals[2] > 0.1 * max1)
    return valid & keep_bin[bins]


def resolve_duplicates(best_idx, best_dist, valid, m_size: int):
    """Enforce one-to-one: if several rows matched the same column, keep the
    row with the smallest distance (replaces the reference's ad-hoc
    overwrite/skip bookkeeping in the Fuse/SearchByProjection loops)."""
    # scatter-min of distance per column
    col_best = jnp.full((m_size,), INVALID_DIST, jnp.int32)
    dist_eff = jnp.where(valid, best_dist, INVALID_DIST)
    col_best = col_best.at[best_idx].min(dist_eff)
    # a row survives iff it achieves its column's min; break remaining ties
    # (equal distances) by row order via a second scatter of row index
    wins_dist = dist_eff == col_best[best_idx]
    n = best_idx.shape[0]
    row_ids = jnp.arange(n, dtype=jnp.int32)
    col_row = jnp.full((m_size,), n, jnp.int32)
    col_row = col_row.at[best_idx].min(jnp.where(wins_dist & valid, row_ids, n))
    return valid & wins_dist & (col_row[best_idx] == row_ids)


@partial(
    fused_jit,
    static_argnames=("max_dist", "nn_ratio", "mutual", "check_rotation", "unique"),
)
def match(
    desc_a,
    desc_b,
    allowed=None,
    valid_a=None,
    valid_b=None,
    angle_a=None,
    angle_b=None,
    max_dist: int = TH_LOW,
    nn_ratio: float = 1.0,
    mutual: bool = False,
    check_rotation: bool = False,
    unique: bool = True,
):
    """The one matching kernel.

    desc_a: [N, 8] u32, desc_b: [M, 8] u32.
    allowed: optional [N, M] bool geometric gate (window / projection radius /
      epipolar / scale masks — built by callers).
    valid_a/valid_b: optional validity masks for padded slots.
    nn_ratio < 1.0 enables the best/second-best ratio test.
    mutual=True additionally requires a to be b's best (SearchForInitialization
      semantics, src/ORBmatcher.cc:598-713).
    Returns (best_idx [N] i32, best_dist [N] i32, matched [N] bool)."""
    N, M = desc_a.shape[0], desc_b.shape[0]
    if N * M >= 1 << 16:
        # large problems: Hamming as an MXU matmul (exact; see unpack_pm1)
        dist = hamming_matrix_mxu(unpack_pm1(desc_a), unpack_pm1(desc_b))
    else:
        dist = hamming_matrix(desc_a, desc_b)
    gate = jnp.ones((N, M), bool)
    if allowed is not None:
        gate &= allowed
    if valid_a is not None:
        gate &= valid_a[:, None]
    if valid_b is not None:
        gate &= valid_b[None, :]
    dist = jnp.where(gate, dist, INVALID_DIST)

    best_idx = jnp.argmin(dist, axis=1).astype(jnp.int32)
    best_dist = jnp.take_along_axis(dist, best_idx[:, None], axis=1)[:, 0]
    # second best: mask out the argmin column per row
    dist2 = dist.at[jnp.arange(N), best_idx].set(INVALID_DIST)
    second_dist = jnp.min(dist2, axis=1)

    matched = best_dist <= max_dist
    if nn_ratio < 1.0:
        matched &= best_dist.astype(jnp.float32) < nn_ratio * second_dist.astype(
            jnp.float32
        )
    if mutual:
        col_best = jnp.argmin(dist, axis=0).astype(jnp.int32)  # [M]
        matched &= col_best[best_idx] == jnp.arange(N, dtype=jnp.int32)
    if check_rotation:
        matched = rotation_consistency_mask(
            angle_a, angle_b[best_idx], matched
        )
    if unique:
        matched = resolve_duplicates(best_idx, best_dist, matched, M)
    return best_idx, best_dist, matched


def window_gate(xy_a, xy_b, radius, octave_b=None,
                min_level=None, max_level=None, per_row_radius=False):
    """[N, M] gate: b within `radius` of a (optionally per-row radii) and
    octave band constraints (covers WindowSearch / SearchForInitialization /
    coarse-to-fine previous-frame search, src/ORBmatcher.cc:409-713).
    min_level/max_level may be scalars or per-row [N] arrays."""
    d = xy_a[:, None, :] - xy_b[None, :, :]
    r = radius[:, None] if per_row_radius else radius
    gate = jnp.sum(d * d, axis=-1) <= r * r

    def _per_row(v):
        v = jnp.asarray(v)
        return v[:, None] if v.ndim == 1 else v

    if octave_b is not None and min_level is not None:
        gate &= octave_b[None, :] >= _per_row(min_level)
    if octave_b is not None and max_level is not None:
        gate &= octave_b[None, :] <= _per_row(max_level)
    return gate
