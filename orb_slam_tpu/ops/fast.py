"""FAST-9/16 corner detection as whole-image vector ops.

Replaces the per-cell cv::FAST loops of ORBextractor::ComputeKeyPoints
(reference: src/ORBextractor.cc:526-706). TPU-first: the score for every
pixel is computed at once on the VPU (16 shifted image planes + a log-depth
min/max tree), NMS is a reduce_window, and the reference's per-cell
threshold-fallback (th 20 -> 7, src/ORBextractor.cc:607-614) and quota
redistribution become dense per-cell masks + top-k selections — no scalar
loops, one fused XLA program per pyramid level.

Score definition: the exact "maximal threshold for which the segment test
passes" (the same quantity cv::FAST's score computes by bisection):
  score = max( max_k min_{j in arc_k} (p_j - c),  max_k min_{j in arc_k} (c - p_j) )
over all 16 circular arcs of length 9. A pixel is a FAST-9 corner at
threshold t iff score > t."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# Bresenham circle of radius 3, in circular order (dy, dx) — same circle the
# FAST detector uses (reference indirectly via cv::FAST).
FAST_CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)


def fast_score_map(img):
    """img: [H, W] float32 -> score: [H, W] float32 (0 at 3px border)."""
    H, W = img.shape
    padded = jnp.pad(img, 3, mode="edge")
    # D[k] = neighbor_k - center, shape [16, H, W]
    neigh = jnp.stack(
        [padded[3 + dy : 3 + dy + H, 3 + dx : 3 + dx + W] for dy, dx in FAST_CIRCLE]
    )
    D = neigh - img[None]

    def run9(op, x):
        """op-reduce over 9 circularly-consecutive entries along axis 0."""
        r2 = op(x, jnp.roll(x, -1, 0))
        r4 = op(r2, jnp.roll(r2, -2, 0))
        r8 = op(r4, jnp.roll(r4, -4, 0))
        return op(r8, jnp.roll(x, -8, 0))

    bright = jnp.max(run9(jnp.minimum, D), axis=0)   # max over arcs of arc-min
    dark = -jnp.min(run9(jnp.maximum, D), axis=0)    # symmetric for dark arcs
    score = jnp.maximum(bright, dark)
    # zero the 3px ring where the circle leaves the image (edge-padded values
    # there are unreliable)
    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    inner = (ys >= 3) & (ys < H - 3) & (xs >= 3) & (xs < W - 3)
    return jnp.where(inner, score, 0.0)


def harris_score_map(img, k: float = 0.04, block: int = 7):
    """Harris corner response at every pixel (reference option
    nScoreType=0 rescored keypoints with HARRIS_K=0.04,
    src/ORBextractor.cc:73,616-620). Sobel gradients + box-summed structure
    tensor, det - k*trace^2, scaled like OpenCV's HarrisResponses."""
    H, W = img.shape
    p = jnp.pad(img, 1, mode="edge")
    # Sobel
    gx = (
        (p[0:-2, 2:] + 2.0 * p[1:-1, 2:] + p[2:, 2:])
        - (p[0:-2, 0:-2] + 2.0 * p[1:-1, 0:-2] + p[2:, 0:-2])
    )
    gy = (
        (p[2:, 0:-2] + 2.0 * p[2:, 1:-1] + p[2:, 2:])
        - (p[0:-2, 0:-2] + 2.0 * p[0:-2, 1:-1] + p[0:-2, 2:])
    )
    a = gx * gx
    b = gy * gy
    c = gx * gy

    def box(x):
        return jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (block, block), (1, 1), "SAME"
        )

    A, B, C = box(a), box(b), box(c)
    scale = (1.0 / (4 * 255 * block)) ** 4  # OpenCV HarrisResponses scaling
    return (A * B - C * C - k * (A + B) ** 2) * scale


def nms3x3(score):
    """3x3 non-maximum suppression mask (ties keep all — matches cv::FAST's
    strictly-greater check closely enough for float scores)."""
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
    return score >= mx


def reference_quota(avail, max_kp, active=None):
    """Per-cell retained-corner counts of the reference's starved-cell
    redistribution loop (src/ORBextractor.cc:644-670), replicated exactly.
    Semantics of the C++ loop:
      - each pass sets nNewFeaturesCell = nfeaturesCell + ceil(d/u) where
        nfeaturesCell is the CONSTANT initial fair share (:645), d is only
        THIS pass's newly-recorded deficit (reset to 0 at :646), and u is
        the count of not-yet-saturated cells — so the quota can shrink
        between passes and earlier deficits are deliberately dropped
        (the loop under-fills; retainBest never sees max_kp extras);
      - a cell that saturates keeps nToRetain = its full count from that
        pass forever (:660-665), even if a later pass's quota is lower;
      - active cells carry the LAST pass's quota (:657-659).
    A single converged scalar q* cannot represent this (saturated cells
    may retain more than a later, smaller quota), hence the per-cell
    return.

    avail: [n_cells] int32 corner counts (post threshold-fallback).
    max_kp: int32 scalar (or python int).
    active: [n_cells] bool — cells that exist in the level's grid (the
    stacked canvas carries cells beyond a level's extent; the reference's
    grid covers only the image, so phantom cells must not donate quota).
    Returns retain [n_cells] int32 (0 on inactive cells).

    vmap-safe (one while_loop for ALL pyramid levels instead of L
    sequential ones): vmap keeps iterating every batch element until all
    cond's are false, so the body must be a fixed point for converged
    elements. It is: with d == 0 the body keeps q (guarded where) and can
    mark no new cell (every avail <= q cell was marked the pass that set
    q), and in the only other stopped state (d > 0 with every cell
    saturated) q changes but the final retain ignores q on saturated
    cells. The callers rely on this."""
    n_cells_static = avail.shape[0]
    if active is None:
        active = jnp.ones((n_cells_static,), bool)
    max_kp = jnp.asarray(max_kp, jnp.int32)
    n_cells = jnp.sum(active).astype(jnp.int32)
    fair = (-(-max_kp // jnp.maximum(n_cells, 1))).astype(jnp.int32)
    no_more0 = active & (avail <= fair)
    d0 = jnp.sum(jnp.where(no_more0, fair - avail, 0)).astype(jnp.int32)

    def cond(s):
        _, d, no_more = s
        return (d > 0) & (jnp.sum(no_more) < n_cells)

    def body(s):
        q, d, no_more = s
        u = n_cells - jnp.sum(no_more)
        new_q = jnp.where(d > 0, fair + -(-d // jnp.maximum(u, 1)), q)
        newly = active & (~no_more) & (avail <= new_q)
        d2 = jnp.sum(jnp.where(newly, new_q - avail, 0)).astype(jnp.int32)
        return new_q, d2, no_more | newly

    q, _, no_more = jax.lax.while_loop(
        cond, body, (fair, d0, no_more0))
    retain = jnp.where(no_more, avail, q)
    return jnp.where(active, retain, 0)


def reference_grid(h: int, w: int, quota: int, aspect_ratio: float,
                   border: int):
    """The reference's quota-adaptive per-level cell grid
    (src/ORBextractor.cc:528-543, int-truncation quirks preserved):
    levelCols = sqrt(nDesired/(5*imageRatio)), levelRows =
    imageRatio*levelCols, cells of ceil(W/cols) x ceil(H/rows) spanning
    [border, size-border). imageRatio is the LEVEL-0 width/height. Sized so
    the fair share is ~5 corners/cell — at that granularity the global
    retainBest trim barely binds, which is what keeps the reference's
    selection spatially spread. Returns (rows, cols, cellH, cellW)."""
    Wb = max(1, w - 2 * border)
    Hb = max(1, h - 2 * border)
    cols = int(np.sqrt(quota / (5.0 * aspect_ratio)))
    rows = int(aspect_ratio * cols)
    cols = max(1, min(cols, Wb))
    rows = max(1, min(rows, Hb))
    cellW = -(-Wb // cols)
    cellH = -(-Hb // rows)
    return rows, cols, cellH, cellW


def _level_pool(lvl, quota: int, rows: int, cols: int, cellH: int,
                cellW: int, border: int, th_ini: float, th_min: float):
    """Candidate pool for ONE level on a pre-masked score canvas `lvl`
    [H, W] (non-maxima / out-of-border already zeroed): reference
    threshold fallback + per-cell score-sorted top-k. Returns
    (top [n_cells, k_cell], abs_x, abs_y, avail [n_cells]); the caller
    computes the redistribution quota (batched over levels) and masks
    rank >= q*."""
    H, W = lvl.shape
    need_h, need_w = border + rows * cellH, border + cols * cellW
    lvl = jnp.pad(lvl, ((0, max(0, need_h - H)), (0, max(0, need_w - W))))
    n_cells = rows * cols
    area = cellH * cellW
    cells = (
        lvl[border:need_h, border:need_w]
        .reshape(rows, cellH, cols, cellW)
        .transpose(0, 2, 1, 3)
        .reshape(n_cells, area)
    )
    # threshold fallback: the reference retries a cell at th_min when FAST
    # at th_ini yields <= 3 corners (src/ORBextractor.cc:607-614)
    n_ini = jnp.sum(cells > th_ini, axis=1)
    cell_th = jnp.where(n_ini > 3, th_ini, th_min)
    cells = jnp.where(cells > cell_th[:, None], cells, 0.0)
    avail = jnp.sum(cells > 0.0, axis=1).astype(jnp.int32)

    # candidate capacity: 4x the fair share covers the converged quota on
    # all but pathological skew (beyond it the retained set clips here)
    fair = -(-quota // n_cells)
    k_cell = int(min(area, max(16, 4 * fair)))
    top, idx = jax.lax.approx_max_k(cells, k_cell, recall_target=0.99)
    cid = jnp.arange(n_cells)[:, None]
    abs_y = border + (cid // cols) * cellH + idx // cellW
    abs_x = border + (cid % cols) * cellW + idx % cellW
    return top, abs_x, abs_y, avail


def _select_level(lvl, quota: int, rows: int, cols: int, cellH: int,
                  cellW: int, border: int, th_ini: float, th_min: float):
    """Single-level selection: _level_pool + redistribution quota mask.
    Returns (pool [n_cells*k_cell] scores with rank>=q* zeroed, abs_x,
    abs_y)."""
    top, abs_x, abs_y, avail = _level_pool(
        lvl, quota, rows, cols, cellH, cellW, border, th_ini, th_min)
    retain = reference_quota(avail, quota)
    # candidates are score-sorted per cell, so retaining the reference's
    # per-cell count = masking rank >= retain[cell]; the caller's global
    # top-k is the retainBest trim. Only k_cell candidates were
    # materialized: retain > k_cell clips there (documented deviation —
    # k_cell is 4x the fair share, exceeded only under pathological skew).
    k_cell = top.shape[1]
    top = jnp.where(jnp.arange(k_cell)[None, :] < retain[:, None], top, 0.0)
    return top.reshape(-1), abs_x.reshape(-1), abs_y.reshape(-1)


@partial(
    jax.jit,
    static_argnames=("max_kp", "cell_size", "border", "th_ini", "th_min",
                     "use_harris", "aspect_ratio"),
)
def detect_fast_keypoints(
    img,
    max_kp: int,
    th_ini: float = 20.0,
    th_min: float = 7.0,
    cell_size: int = 32,
    border: int = 16,
    use_harris: bool = False,
    aspect_ratio: float = None,
):
    """Full FAST detection for one pyramid level.

    Reproduces the reference's policy (src/ORBextractor.cc:528-702): the
    quota-adaptive cell grid, per-cell threshold fallback (th_ini ->
    th_min when a cell yields <= 3 corners), the starved-cell quota
    redistribution loop, and the final global retainBest cut.

    `use_harris` reproduces nScoreType=0: detection/thresholding stays FAST
    but corners are RANKED by Harris response (src/ORBextractor.cc:616-620).
    `aspect_ratio` is the reference's imageRatio (level-0 W/H; defaults to
    this image's W/H — pass the level-0 ratio when processing upper
    pyramid levels so the grid matches the stacked path exactly).
    `cell_size` is unused (kept for call-site compatibility; the grid is
    quota-adaptive now).

    Returns (xy [max_kp, 2] int32 (x, y), score [max_kp] f32, valid [max_kp]).
    """
    H, W = img.shape
    score = fast_score_map(img)
    keep = nms3x3(score)
    if use_harris:
        harris = harris_score_map(img)
        # rank by (positive-shifted) Harris among FAST-passing pixels; the
        # threshold logic below still gates on the FAST score via `keep`
        keep = keep & (score > th_min)
        score = jnp.where(
            score > th_min,
            jnp.maximum(harris - jnp.min(harris), 1e-6) + th_ini + 1.0,
            score,
        )

    ys = jnp.arange(H)[:, None]
    xs = jnp.arange(W)[None, :]
    in_border = (ys >= border) & (ys < H - border) & (xs >= border) & (xs < W - border)
    base = jnp.where(keep & in_border, score, 0.0)

    ratio = aspect_ratio if aspect_ratio is not None else W / H
    rows, cols, cellH, cellW = reference_grid(H, W, max_kp, ratio, border)
    pool, abs_x, abs_y = _select_level(
        base, max_kp, rows, cols, cellH, cellW, border, th_ini, th_min)
    top_score, sel = jax.lax.top_k(pool, max_kp)  # global retainBest
    xy = jnp.stack([abs_x[sel], abs_y[sel]], axis=-1).astype(jnp.int32)
    valid = top_score > 0.0
    return xy, top_score, valid
