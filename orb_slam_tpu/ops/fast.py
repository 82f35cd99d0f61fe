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


@partial(
    jax.jit,
    static_argnames=("max_kp", "cell_size", "border", "th_ini", "th_min",
                     "use_harris"),
)
def detect_fast_keypoints(
    img,
    max_kp: int,
    th_ini: float = 20.0,
    th_min: float = 7.0,
    cell_size: int = 32,
    border: int = 16,
    use_harris: bool = False,
):
    """Full FAST detection for one pyramid level.

    Reproduces the reference's policy (src/ORBextractor.cc:536-676): grid
    cells tried at th_ini first, falling back to th_min in cells with no
    corner, then keep the strongest `max_kp` overall with per-cell caps
    providing spatial spread.

    `use_harris` reproduces nScoreType=0: detection/thresholding stays FAST
    but corners are RANKED by Harris response (src/ORBextractor.cc:616-620).

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

    # pad to cell multiples
    nCy = -(-H // cell_size)
    nCx = -(-W // cell_size)
    Hp, Wp = nCy * cell_size, nCx * cell_size
    pad_spec = ((0, Hp - H), (0, Wp - W))

    base = jnp.where(keep & in_border, score, 0.0)
    base = jnp.pad(base, pad_spec)
    cells = (
        base.reshape(nCy, cell_size, nCx, cell_size)
        .transpose(0, 2, 1, 3)
        .reshape(nCy * nCx, cell_size * cell_size)
    )
    # per-cell threshold fallback: if any corner above th_ini, demand th_ini,
    # else accept th_min
    cell_has_ini = jnp.max(cells, axis=1) > th_ini
    cell_th = jnp.where(cell_has_ini, th_ini, th_min)
    cells = jnp.where(cells > cell_th[:, None], cells, 0.0)

    # per-cell cap: top-k inside each cell for spatial spread
    n_cells = nCy * nCx
    k_cell = int(min(max(4, -(-2 * max_kp // n_cells)), cell_size * cell_size))
    cell_top, cell_idx = jax.lax.top_k(cells, k_cell)  # [n_cells, k_cell]

    # recover absolute coordinates
    cid = jnp.arange(n_cells)[:, None]
    cy, cx = cid // nCx, cid % nCx
    iy, ix = cell_idx // cell_size, cell_idx % cell_size
    abs_y = (cy * cell_size + iy).reshape(-1)
    abs_x = (cx * cell_size + ix).reshape(-1)
    cand_score = cell_top.reshape(-1)

    top_score, sel = jax.lax.top_k(cand_score, max_kp)
    xy = jnp.stack([abs_x[sel], abs_y[sel]], axis=-1).astype(jnp.int32)
    valid = top_score > 0.0
    return xy, top_score, valid
