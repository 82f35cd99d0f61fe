"""Level-stacked FAST detection: all pyramid levels in ONE set of ops.

Motivation (measured, not theoretical): on the target runtime each XLA op
execution carries fixed overhead that dwarfs its compute at SLAM image
sizes — a [480,640] FAST stencil and a [8,512,640] stacked one cost the
same wall clock. Running the 16-offset stencil / NMS / thresholding /
top-k selection ONCE over a padded [L, Hp, Wp] level stack instead of L
times cuts the per-frame op count ~8x. The padding waste (levels occupy
the top-left corner of a level-0-sized canvas) is free compute.

Semantics are identical to ops/fast.py applied per level."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.ops.fast import FAST_CIRCLE
from orb_slam_tpu.ops.image import pyramid_shapes


def _bilinear_matrix(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] bilinear interpolation matrix (half-pixel centers,
    matching jax.image.resize / cv2.INTER_LINEAR alignment)."""
    scale = n_in / n_out
    src = (np.arange(n_out) + 0.5) * scale - 0.5
    i0 = np.clip(np.floor(src).astype(np.int64), 0, n_in - 1)
    i1 = np.clip(i0 + 1, 0, n_in - 1)
    w1 = np.clip(src - i0, 0.0, 1.0)
    M = np.zeros((n_out, n_in), np.float32)
    M[np.arange(n_out), i0] += 1.0 - w1
    M[np.arange(n_out), i1] += w1
    return M


def pyramid_matrices(height: int, width: int, n_levels: int,
                     scale_factor: float):
    """Precompute the zero-padded level-0->level-l bilinear matrices as
    numpy arrays (callers upload once and pass them as ARGUMENTS: on the
    target runtime, jit closure constants are re-hashed per call — a 3.5 MB
    constant costs ~10 ms/frame; an argument costs nothing)."""
    shapes = pyramid_shapes(height, width, n_levels, scale_factor)
    Rs, Cs = [np.eye(height, dtype=np.float32)], [np.eye(width, dtype=np.float32)]
    for lvl in range(1, n_levels):
        h0, w0 = shapes[lvl - 1]
        h1, w1 = shapes[lvl]
        Rs.append(_bilinear_matrix(h0, h1) @ Rs[-1])
        Cs.append(_bilinear_matrix(w0, w1) @ Cs[-1])
    Rp = np.zeros((n_levels - 1, height, height), np.float32)
    Cp = np.zeros((n_levels - 1, width, width), np.float32)
    for lvl in range(1, n_levels):
        Rp[lvl - 1, : Rs[lvl].shape[0]] = Rs[lvl]
        Cp[lvl - 1, : Cs[lvl].shape[0]] = Cs[lvl]
    return Rp.astype(np.float32), Cp.astype(np.float32)


def build_pyramid_stack(img, n_levels: int, scale_factor: float,
                        consts=None):
    """Successive bilinear downscale packed into a [L, H, W] canvas
    (levels occupy [:h_l, :w_l]; the rest is zero). Returns (stack,
    shapes list).

    Resize = two MXU matmuls per level (R_l @ img @ C_l^T with precomputed
    bilinear matrices). Each level resamples DIRECTLY from level 0 — the
    matrices are the composition of the per-step bilinear interpolations,
    so values match successive resizing while all levels compute in
    PARALLEL (a serial 8-level chain pays 8x the op latency on the target
    runtime; jax.image.resize additionally lowers to slow gathers)."""
    H, W = img.shape
    shapes = pyramid_shapes(H, W, n_levels, scale_factor)
    # The whole pyramid (including its zero canvas padding) is TWO batched
    # bf16 matmuls — no pads, no concats, no serial level chain (all
    # measured pathologically slow on the target runtime; f32 matmuls are
    # ~40x slower than bf16 there).
    # bf16 weights with f32 accumulation: the interpolation weights carry
    # <= 2^-8 relative error -> intensity error <~0.5/255, far below the
    # FAST thresholds (the exact per-level extractor remains the oracle).
    # Level 0 bypasses the matmul entirely (bit-exact original image).
    if consts is None:
        consts = pyramid_matrices(H, W, n_levels, scale_factor)
    Rp, Cp = consts[0], consts[1]
    rows = jnp.einsum(
        "lab,bw->law", jnp.asarray(Rp).astype(jnp.bfloat16),
        img.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [L-1, H, W]
    rest = jnp.einsum(
        "law,lvw->lav", rows.astype(jnp.bfloat16),
        jnp.asarray(Cp).astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )  # [L-1, H, W]
    stack = jnp.concatenate([img[None], rest], axis=0)
    return stack, shapes


def fast_score_stack(stack):
    """[L, H, W] -> [L, H, W] FAST scores (same math as fast_score_map,
    batched over the level axis).

    Roll-tree formulation over one [L, 16, H, W] tensor: 12 permutation
    "rolls" along the tiny 16-axis + log-depth min/max. Measured faster
    than an unrolled per-plane list DAG on the target runtime (the ~170
    separate elementwise ops do not fuse there; the rolled tensor form is
    ~14 large ops)."""
    L, H, W = stack.shape
    padded = jnp.pad(stack, ((0, 0), (3, 3), (3, 3)), mode="edge")
    neigh = jnp.stack(
        [padded[:, 3 + dy: 3 + dy + H, 3 + dx: 3 + dx + W]
         for dy, dx in FAST_CIRCLE], 1)
    D = neigh - stack[:, None]

    def run9(op, x):
        r2 = op(x, jnp.roll(x, -1, 1))
        r4 = op(r2, jnp.roll(r2, -2, 1))
        r8 = op(r4, jnp.roll(r4, -4, 1))
        return op(r8, jnp.roll(x, -8, 1))

    bright = jnp.max(run9(jnp.minimum, D), 1)
    dark = -jnp.min(run9(jnp.maximum, D), 1)
    return jnp.maximum(bright, dark)


@partial(jax.jit, static_argnames=("shapes", "quotas", "th_ini", "th_min",
                                   "cell_size", "border", "use_harris"))
def detect_keypoints_stack(
    stack,
    shapes: tuple,          # static ((h,w), ...) true level sizes
    quotas: tuple,          # static per-level feature quotas
    th_ini: float = 20.0,
    th_min: float = 7.0,
    cell_size: int = 32,
    border: int = 16,
    use_harris: bool = False,
):
    """FAST + NMS + per-cell threshold fallback + per-level quota selection
    over the whole stack at once.

    `use_harris` reproduces nScoreType=0: detection/thresholding stays FAST
    but corners are RANKED by Harris response (src/ORBextractor.cc:616-620;
    same policy as ops/fast.detect_fast_keypoints).

    Returns (xy [L, Qmax, 2] i32 level-local coords, score [L, Qmax],
    valid [L, Qmax]) where Qmax = max(quotas); per-level entries beyond the
    level's quota are invalid."""
    Lv, H, W = stack.shape
    score = fast_score_stack(stack)
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    keep = score >= mx
    if use_harris:
        from orb_slam_tpu.ops.fast import harris_score_map
        harris = jax.vmap(harris_score_map)(stack)
        keep = keep & (score > th_min)
        score = jnp.where(
            score > th_min,
            jnp.maximum(harris - jnp.min(harris), 1e-6) + th_ini + 1.0,
            score,
        )
    return select_from_scores(score, keep, shapes, quotas, th_ini=th_ini,
                              th_min=th_min, cell_size=cell_size,
                              border=border)


@partial(jax.jit, static_argnames=("shapes", "quotas", "th_ini", "th_min",
                                   "cell_size", "border", "interpret"))
def detect_keypoints_stack_pallas(
    stack, shapes: tuple, quotas: tuple, th_ini: float = 20.0,
    th_min: float = 7.0, cell_size: int = 32, border: int = 16,
    interpret: bool = False,
):
    """Same as detect_keypoints_stack but with the detection front fused
    into Pallas (ops/pallas_fast.py).

    Uses the packed score kernel + the XLA select_from_scores tail. A
    fully-fused variant that also extracts per-cell top-K candidates
    in-kernel exists (_detect_cells_fused) and matches on evenly-textured
    frames but truncates avail at its per-cell K=4, so its redistribution
    quota diverges on texture-skewed frames; it is also measured SLOWER
    on v5e (1.05 vs 0.62 ms/frame head-to-head: the
    per-cell reductions run at 32-lane occupancy and the in-kernel
    [32,256] transpose serializes — PERF.md round 3); it is kept for
    narrow-VMEM targets and as the measured record."""
    from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed

    base = fast_score_nms_packed(stack, shapes, BH=64, BW=256, tree=True,
                                 interpret=interpret, border=border)
    return _select_from_masked(base, shapes, quotas, th_ini=th_ini,
                               th_min=th_min, cell_size=cell_size,
                               border=border)


@partial(jax.jit, static_argnames=("shapes", "quotas", "K", "th_ini",
                                   "th_min", "border", "interpret"))
def _detect_cells_fused(stack, shapes: tuple, quotas: tuple, K: int = 4,
                        th_ini: float = 20.0, th_min: float = 7.0,
                        border: int = 16, interpret: bool = False):
    """Host tail of the cell-fused detector: per-cell two-tier threshold
    (th_ini with th_min fallback, reference src/ORBextractor.cc:540-563)
    on the kernel's per-cell candidates, then per-level quota top-k.
    Output SHAPE contract identical to detect_keypoints_stack; values
    match it only on evenly-textured frames (per-cell avail is truncated
    at K, see the quota comment below)."""
    from orb_slam_tpu.ops.pallas_fast import (
        fast_cell_topk_packed, cell_block_table,
    )

    Lv, H, W = stack.shape
    BH, BW = 32, 256
    vals, pos = fast_cell_topk_packed(stack, shapes, K=K, BH=BH, BW=BW,
                                      border=border, interpret=interpret)
    lvl, _, _ = cell_block_table(shapes, BH, BW, border)
    n_cells_blk = BW // BH
    counts = [lvl.count(l) for l in range(Lv)]
    starts = np.cumsum([0] + counts)
    maxB = max(counts)
    row_len = maxB * n_cells_blk * K
    q_max = max(quotas)

    v_rows, p_rows = [], []
    for l in range(Lv):
        v_l = vals[int(starts[l]):int(starts[l + 1])]  # [B_l, nc, K]
        p_l = pos[int(starts[l]):int(starts[l + 1])]
        # <=3-corner fallback (src/ORBextractor.cc:607-614); candidates are
        # score-sorted, so the top-K count bounds the cell count (K >= 4)
        n_ini = jnp.sum(v_l > th_ini, axis=2, keepdims=True)
        th = jnp.where(n_ini > 3, th_ini, th_min)
        v_l = jnp.where(v_l > th, v_l, 0.0)
        v_flat = v_l.reshape(-1)
        p_flat = p_l.reshape(-1)
        padn = row_len - v_flat.shape[0]
        v_rows.append(jnp.pad(v_flat, (0, padn)))
        p_rows.append(jnp.pad(p_flat, (0, padn)))
    Vm = jnp.stack(v_rows)                      # [L, row_len]
    Pm = jnp.stack(p_rows)

    # reference redistribution (see _select_from_masked): per-cell
    # retained counts, then global score trim. The kernel's per-cell
    # candidate cap K bounds both avail and the redistribution depth, so
    # this path diverges from detect_keypoints_stack on heavily
    # texture-skewed frames unless K is raised to match its k_cell.
    from orb_slam_tpu.ops.fast import reference_quota
    avail = jnp.sum(
        Vm.reshape(Lv, row_len // K, K) > 0.0, axis=2).astype(jnp.int32)
    # row padding beyond each level's real cell count must not donate quota
    n_real = jnp.asarray([c * n_cells_blk for c in counts], jnp.int32)
    active = jnp.arange(row_len // K)[None, :] < n_real[:, None]
    retain = jax.vmap(reference_quota)(
        avail, jnp.asarray(quotas, jnp.int32), active)   # [L, n_cells]
    rank = jnp.tile(jnp.arange(K), (row_len // K,))[None, :]
    key = jnp.where(rank < jnp.repeat(retain, K, axis=1), Vm, 0.0)
    top_score, sel = jax.lax.top_k(key, q_max)  # [L, q_max]
    psel = jnp.take_along_axis(Pm, sel, 1)
    xy = jnp.stack([psel % 65536, psel // 65536], -1).astype(jnp.int32)
    quota_arr = jnp.asarray(quotas)[:, None]
    valid = (top_score > 0.0) & (
        jnp.arange(q_max)[None, :] < quota_arr
    )
    return xy, top_score, valid


@partial(jax.jit, static_argnames=("shapes", "quotas", "th_ini", "th_min",
                                   "cell_size", "border"))
def select_from_scores(score, keep, shapes, quotas, th_ini=20.0, th_min=7.0,
                       cell_size=32, border=16):
    """Per-cell threshold fallback + per-level quota top-k (shared tail of
    both detection variants).

    Same policy as ops/fast.detect_fast_keypoints (the per-level oracle):
    per-cell threshold fallback (th_ini -> th_min, reference
    src/ORBextractor.cc:540-563), per-cell quota WATER-FILLING with
    starved-cell redistribution (:644-670), then a global per-level
    retainBest cut (:678-702). The per-cell top-k runs as ONE
    hardware-accelerated approx_max_k over the cell rows instead of
    k rounds of full-canvas max/argmax/mask extraction (measured 0.29 ->
    ~0.1 ms/frame, PERF.md round 3)."""
    Lv, H, W = score.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    hs = jnp.asarray([h for h, w in shapes])[:, None, None]
    ws = jnp.asarray([w for h, w in shapes])[:, None, None]
    in_border = (
        (ys >= border) & (ys < hs - border)
        & (xs >= border) & (xs < ws - border)
    )

    base = jnp.where(keep & in_border, score, 0.0)
    return _select_from_masked(base, shapes, quotas, th_ini=th_ini,
                               th_min=th_min, cell_size=cell_size,
                               border=border)


@partial(jax.jit, static_argnames=("shapes", "quotas", "th_ini", "th_min",
                                   "cell_size", "border"))
def _select_from_masked(base, shapes, quotas, th_ini=20.0, th_min=7.0,
                        cell_size=32, border=16):
    """Selection core on a PRE-MASKED score canvas (NMS non-maxima and
    out-of-border pixels already zeroed — the Pallas detector emits this
    form directly). Canvas regions OUTSIDE each level's true [h, w) are
    zeroed here: the packed kernel's block table never writes them, so
    they hold uninitialized memory.

    Selection reproduces the reference per level (src/ORBextractor.cc:
    528-702): the quota-adaptive cell grid (fair share ~5 corners/cell),
    the <=3-corner threshold fallback, the starved-cell redistribution
    loop (ops/fast.reference_quota), and the global retainBest cut.

    Layout-free formulation: the per-cell stats (threshold-fallback
    counts, avail) come from free row-major reshapes of the grid region
    ([rows, cellH, cols, cellW] is a VIEW of [rows*cellH, cols*cellW]) +
    strided reduces — the cell-MAJOR transpose the previous version
    materialized per level never happens. Candidates come from ONE flat
    approx_max_k over the level's region (score-global pool of 8x the
    level quota); per-cell score ranks then cost one small lexicographic
    sort of the pool keyed (cell, -score), with rank = position - segment
    start. The L quota loops still run as ONE vmapped while_loop
    (reference_quota is documented vmap-safe).

    Candidate-capacity note: a cell's retained set clips only if the
    8*quota score-global pool truncates it — i.e. >8x the level quota of
    above-threshold corners level-wide AND the cell's weakest retained
    corner below the pool cutoff (the previous per-cell cap
    k_cell=4*ceil(quota/n_cells) clipped far earlier under redistribution
    skew). `cell_size` is unused (grid is quota-adaptive; kept for
    call-site compatibility)."""
    from orb_slam_tpu.ops.fast import reference_grid, reference_quota

    Lv, H, W = base.shape
    ys = jnp.arange(H)[None, :, None]
    xs = jnp.arange(W)[None, None, :]
    hs = jnp.asarray([h for h, w in shapes])[:, None, None]
    ws = jnp.asarray([w for h, w in shapes])[:, None, None]
    base = jnp.where((ys < hs) & (xs < ws), base, 0.0)

    q_max = max(quotas)
    ratio = shapes[0][1] / shapes[0][0]   # the reference's imageRatio (W0/H0)
    grids = [reference_grid(h, w, q, ratio, border)
             for (h, w), q in zip(shapes, quotas)]
    k_tots = [int(min(rows * cellH * cols * cellW, 2 * q))
              for (rows, cols, cellH, cellW), q in zip(grids, quotas)]
    P = max(k_tots)
    C = max(rows * cols for rows, cols, _, _ in grids)

    vals, pxs, pys, cellids, ranks, avails = [], [], [], [], [], []
    for l, ((h, w), quota, grid, k_tot) in enumerate(
            zip(shapes, quotas, grids, k_tots)):
        rows, cols, cellH, cellW = grid
        RH, RW = rows * cellH, cols * cellW
        region = base[l, border:min(border + RH, H),
                      border:min(border + RW, W)]
        region = jnp.pad(region, ((0, RH - region.shape[0]),
                                  (0, RW - region.shape[1])))
        cells4 = region.reshape(rows, cellH, cols, cellW)  # free reshape
        # threshold fallback: retry a cell at th_min when FAST at th_ini
        # yields <= 3 corners (src/ORBextractor.cc:607-614)
        n_ini = jnp.sum(cells4 > th_ini, axis=(1, 3))
        cell_th = jnp.where(n_ini > 3, th_ini, th_min)     # [rows, cols]
        masked4 = jnp.where(cells4 > cell_th[:, None, :, None], cells4, 0.0)
        avail = jnp.sum(masked4 > 0.0, axis=(1, 3)).astype(jnp.int32)
        val, idx = jax.lax.approx_max_k(
            masked4.reshape(RH * RW), k_tot, recall_target=0.99)
        y = idx // RW
        x = idx % RW
        ci = (y // cellH) * cols + x // cellW
        ci = jnp.where(val > 0.0, ci, rows * cols)  # empty slots group last
        # ONE lexicographic sort: cell-major, score-descending within cell
        ci, nv, x, y = jax.lax.sort((ci, -val, x, y), num_keys=2)
        ar = jnp.arange(k_tot)
        first = jnp.concatenate([jnp.ones((1,), bool), ci[1:] != ci[:-1]])
        rank = ar - jax.lax.cummax(jnp.where(first, ar, 0))
        pad = P - k_tot
        vals.append(jnp.pad(-nv, (0, pad)))
        pxs.append(jnp.pad(x + border, (0, pad)))
        pys.append(jnp.pad(y + border, (0, pad)))
        cellids.append(jnp.pad(jnp.minimum(ci, rows * cols - 1), (0, pad)))
        ranks.append(jnp.pad(rank, (0, pad), constant_values=P))
        avails.append(jnp.pad(avail.reshape(-1), (0, C - rows * cols)))

    # ONE batched redistribution loop over all levels (padded cell dim;
    # padding cells are inactive so they neither donate nor absorb quota)
    av = jnp.stack(avails)
    act = jnp.arange(C)[None, :] < jnp.asarray(
        [r * c for r, c, _, _ in grids])[:, None]
    retain = jax.vmap(reference_quota)(
        av, jnp.asarray(quotas, jnp.int32), act)     # [L, C] per-cell

    pool = jnp.stack(vals)                           # [L, P]
    rank = jnp.stack(ranks)
    cid = jnp.stack(cellids)
    allx = jnp.stack(pxs)
    ally = jnp.stack(pys)
    # candidates are score-sorted per cell, so the reference's per-cell
    # retained count = masking rank >= retain[cell]; the global top-k
    # below is the retainBest trim
    pool = jnp.where(rank < jnp.take_along_axis(retain, cid, 1), pool, 0.0)

    top_score, sel = jax.lax.top_k(pool, q_max)  # [L, q_max] retainBest
    xy = jnp.stack(
        [jnp.take_along_axis(allx, sel, 1),
         jnp.take_along_axis(ally, sel, 1)], -1
    ).astype(jnp.int32)
    quota_arr = jnp.asarray(quotas)[:, None]
    valid = (top_score > 0.0) & (
        jnp.arange(q_max)[None, :] < quota_arr
    )
    return xy, top_score, valid
