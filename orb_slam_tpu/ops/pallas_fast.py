"""Pallas TPU kernel: fused FAST-9/16 score over the level stack.

One kernel instance per pyramid level (grid=(L,)): the (pre-padded) level
image loads into VMEM once; the 16-offset segment test and arc min/max
reduction happen entirely in VMEM without materializing the [16, H, W]
difference planes in HBM (the XLA version's main bandwidth cost), and the
whole stencil collapses to ONE device op.

Mosaic constraints honored: the image arrives PRE-PADDED (edge-mode pad
lowers to concats Mosaic rejects); all slices are static; the cheap 3x3
NMS stays outside in XLA (reduce_window).

Memory budget per instance (518x646 padded level): image 1.3 MB + a few
[H, W] f32 temporaries << 16 MB VMEM.

score(p) = max over the 16 circular 9-arcs of
           min_{j in arc} (bright: I_j - I_p | dark: I_p - I_j)
— identical semantics to ops/fast_stack.fast_score_stack."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from orb_slam_tpu.ops.fast import FAST_CIRCLE


def _make_fast_kernel(BH: int, W: int):
    def kernel(padded_ref, score_ref):
        # padded_ref block: [1, H+6, W+6] (whole level); this instance
        # computes rows [rb*BH, rb*BH + BH)
        rb = pl.program_id(1)
        row0 = rb * BH
        window = padded_ref[0, pl.ds(row0, BH + 6), :]  # [BH+6, W+6]
        img = window[3:3 + BH, 3:3 + W]

        def neighbor(k):
            dy, dx = int(FAST_CIRCLE[k][0]), int(FAST_CIRCLE[k][1])
            return window[3 + dy: 3 + dy + BH, 3 + dx: 3 + dx + W]

        # VMEM-lean sequential arcs (a log-depth tree keeps ~80 temporaries
        # live and spills out of VMEM; recomputing neighbor slices keeps ~6)
        score = None
        for s in range(16):
            d0 = neighbor(s) - img
            mb = d0
            md = -d0
            for j in range(1, 9):
                d = neighbor((s + j) % 16) - img
                mb = jnp.minimum(mb, d)
                md = jnp.minimum(md, -d)
            arc = jnp.maximum(mb, md)
            score = arc if score is None else jnp.maximum(score, arc)
        score_ref[0] = score

    return kernel


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms_pallas(stack, interpret: bool = False):
    """stack: [L, H, W] f32 -> (score [L, H, W] f32, keep [L, H, W] bool).
    Score via the fused Pallas kernel (row-tiled grid to bound VMEM);
    NMS via XLA reduce_window."""
    L, H, W = stack.shape
    BH = 24 if H % 24 == 0 else (20 if H % 20 == 0 else 16)
    pad_h = (-H) % BH
    padded = jnp.pad(stack, ((0, 0), (3, 3 + pad_h), (3, 3)), mode="edge")
    Hp = H + pad_h
    n_rb = Hp // BH
    score = pl.pallas_call(
        _make_fast_kernel(BH, W),
        grid=(L, n_rb),
        in_specs=[pl.BlockSpec((1, Hp + 6, W + 6), lambda l, rb: (l, 0, 0))],
        out_specs=pl.BlockSpec((1, BH, W), lambda l, rb: (l, rb, 0)),
        out_shape=jax.ShapeDtypeStruct((L, Hp, W), jnp.float32),
        interpret=interpret,
    )(padded)
    score = score[:, :H, :]
    mx = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
    return score, score >= mx


def _circ9_minmax(d):
    """All 16 circular sliding-window-9 minima AND maxima of the 16 planes
    d[k], via two-block prefix/suffix (van Herk / Gil-Werman on the circle):
    window [s, s+8] spans a suffix of one 8-block and a prefix of the other,
    so all 16 minima cost 2x(7+7) prefix/suffix + 16 combines = 44 ops vs
    the log-doubling tree's 64. Returns (mn[16], mx[16])."""
    out = []
    for op in (jnp.minimum, jnp.maximum):
        # P[b][i] = op over d[8b .. 8b+i]; S[b][i] = op over d[8b+i .. 8b+7]
        P = [[d[0]], [d[8]]]
        S0, S1 = [None] * 8, [None] * 8
        for i in range(1, 8):
            P[0].append(op(P[0][i - 1], d[i]))
            P[1].append(op(P[1][i - 1], d[8 + i]))
        S0[7], S1[7] = d[7], d[15]
        for i in range(6, -1, -1):
            S0[i] = op(d[i], S0[i + 1])
            S1[i] = op(d[8 + i], S1[i + 1])
        w = []
        for s in range(16):
            e = (s + 8) % 16  # window [s, s+8] (9 elements), wraps
            if s == 0:
                w.append(op(S0[0], P[1][0]))
            elif s < 8:
                w.append(op(S0[s], P[1][s]))
            elif s == 8:
                w.append(op(S1[0], P[0][0]))
            else:
                w.append(op(S1[s - 8], P[0][s - 8]))
        out.append(w)
    return out[0], out[1]


def _make_packed_kernel(BH: int, BW: int, tree: bool = False,
                        border: int = 0):
    """Score + 3x3 NMS for one (level, row-block, col-block) tile. The
    score is computed with a 1-pixel halo so the NMS needs no second pass
    over HBM (the XLA reduce_window it replaces re-reads the full score
    canvas).

    tree=True uses the circular prefix/suffix sliding min/max (_circ9_minmax,
    ~30% fewer VPU ops than the round-2 log-doubling tree, which itself was
    ~2.3x leaner than 16 sequential arcs); ~32 live [BH+2, BW+2] planes of
    VMEM.

    border > 0: the kernel additionally ZEROES scores outside each level's
    detectable interior ([border, h-border) x [border, w-border), true level
    sizes h/w scalar-prefetched per block) and folds the NMS keep mask into
    the score plane (non-maxima -> 0), so callers get ONE masked score
    canvas instead of (score, keep) + a separate border pass."""
    Hh, Wh = BH + 2, BW + 2  # score extent incl. NMS halo

    def kernel(lvl_ref, r0_ref, c0_ref, h_ref, w_ref, img_ref, score_ref,
               *maybe_keep_ref):
        b = pl.program_id(0)
        r0 = pl.multiple_of(r0_ref[b], BH)
        c0 = pl.multiple_of(c0_ref[b], BW)
        # window incl. stencil(3) + NMS(1) halo; padded coords: level pixel
        # (y, x) lives at (y + 4, x + 4)
        win = img_ref[0, pl.ds(r0, BH + 8), pl.ds(c0, BW + 8)]
        img = win[3:3 + Hh, 3:3 + Wh]

        def neighbor(k):
            dy, dx = int(FAST_CIRCLE[k][0]), int(FAST_CIRCLE[k][1])
            return win[3 + dy: 3 + dy + Hh, 3 + dx: 3 + dx + Wh]

        if tree:
            d = [neighbor(k) - img for k in range(16)]
            mn, mx9 = _circ9_minmax(d)
            bright = mn[0]
            dark_mx = mx9[0]
            for s in range(1, 16):
                bright = jnp.maximum(bright, mn[s])
                dark_mx = jnp.minimum(dark_mx, mx9[s])
            score = jnp.maximum(bright, -dark_mx)
        else:
            # VMEM-lean sequential arcs (see _make_fast_kernel)
            score = None
            for s in range(16):
                d0 = neighbor(s) - img
                mb = d0
                md = -d0
                for j in range(1, 9):
                    dj = neighbor((s + j) % 16) - img
                    mb = jnp.minimum(mb, dj)
                    md = jnp.minimum(md, -dj)
                arc = jnp.maximum(mb, md)
                score = arc if score is None else jnp.maximum(score, arc)

        mx = None
        for dy in range(3):
            for dx in range(3):
                n = score[dy:dy + BH, dx:dx + BW]
                mx = n if mx is None else jnp.maximum(mx, n)
        center = score[1:1 + BH, 1:1 + BW]
        keep = center >= mx
        if border:
            h = h_ref[b]
            w = w_ref[b]
            y_abs = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0) + r0
            x_abs = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1) + c0
            keep = keep & ((y_abs >= border) & (y_abs < h - border)
                           & (x_abs >= border) & (x_abs < w - border))
            score_ref[0] = jnp.where(keep, center, 0.0)
        else:
            score_ref[0] = center
            maybe_keep_ref[0][0] = keep

    return kernel


@partial(jax.jit, static_argnames=("shapes", "BH", "BW", "tree", "interpret",
                                   "border"))
def fast_score_nms_packed(stack, shapes: tuple, BH: int = 48, BW: int = 256,
                          tree: bool = False, interpret: bool = False,
                          border: int = 0):
    """stack: [L, H, W] f32 level canvas (levels in the top-left corner,
    true sizes in static `shapes`).

    border=0: -> (score [L, H, W], keep [L, H, W]) — raw scores + NMS mask.
    border>0: -> masked score [L, H, W] ONLY: non-maxima and pixels outside
    each level's [border, h-border) x [border, w-border) interior are
    zeroed in-kernel, so the detection tail needs no separate keep/border
    passes and the bool canvas never exists.

    Packed grid: ONE 1-D grid enumerating only the row/col blocks that
    cover real level pixels (a scalar-prefetched block table), instead of
    a rectangular (L, H/BH) grid that spends ~55% of its blocks on canvas
    padding (levels shrink geometrically but the canvas does not). NMS is
    fused in-kernel via a 1-pixel score halo. Regions covered by no block
    are NOT written — callers must mask by the true level shapes."""
    from jax.experimental.pallas import tpu as pltpu

    L, H, W = stack.shape
    Hr = -(-H // BH) * BH
    Wr = -(-W // BW) * BW
    padded = jnp.pad(
        stack, ((0, 0), (4, 4 + (Hr - H)), (4, 4 + (Wr - W))), mode="edge")

    lvl, r0s, c0s = [], [], []
    for l, (h, w) in enumerate(shapes):
        for r in range(0, h, BH):
            for c in range(0, w, BW):
                lvl.append(l)
                r0s.append(r)
                c0s.append(c)
    n_blocks = len(lvl)
    hs = [shapes[l][0] for l in lvl]
    ws = [shapes[l][1] for l in lvl]
    lvl = jnp.asarray(lvl, jnp.int32)
    r0s = jnp.asarray(r0s, jnp.int32)
    c0s = jnp.asarray(c0s, jnp.int32)
    hs = jnp.asarray(hs, jnp.int32)
    ws = jnp.asarray(ws, jnp.int32)

    out_spec = pl.BlockSpec(
        (1, BH, BW),
        lambda b, lvl_r, r0_r, c0_r, h_r, w_r:
            (lvl_r[b], r0_r[b] // BH, c0_r[b] // BW))
    n_outs = 1 if border else 2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(
            (1, Hr + 8, Wr + 8),
            lambda b, lvl_r, r0_r, c0_r, h_r, w_r: (lvl_r[b], 0, 0))],
        out_specs=[out_spec] * n_outs,
    )
    out_shape = [jax.ShapeDtypeStruct((L, Hr, Wr), jnp.float32)]
    if not border:
        out_shape.append(jax.ShapeDtypeStruct((L, Hr, Wr), jnp.bool_))
    outs = pl.pallas_call(
        _make_packed_kernel(BH, BW, tree=tree, border=border),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(lvl, r0s, c0s, hs, ws, padded)
    if border:
        return outs[0][:, :H, :W]
    score, keep = outs
    return score[:, :H, :W], keep[:, :H, :W]


def cell_block_table(shapes: tuple, BH: int, BW: int, border: int):
    """Static (level, r0, c0) block enumeration for the cell-fused kernel:
    only blocks intersecting a level's detectable interior
    ([border, h-border) x [border, w-border)) are listed."""
    lvl, r0s, c0s = [], [], []
    for l, (h, w) in enumerate(shapes):
        for r in range(0, h - border, BH):
            if r + BH <= border:
                continue
            for c in range(0, w - border, BW):
                lvl.append(l)
                r0s.append(r)
                c0s.append(c)
    return lvl, r0s, c0s


def _make_cell_topk_kernel(BH: int, BW: int, K: int, border: int):
    """FAST score + fused 3x3 NMS + border mask + per-cell top-K for one
    (level, row-strip) tile, BH = cell size (one cell row of BW//BH cells).

    Emits per-cell candidate values and packed positions (y * 2^16 + x)
    directly — the full score/keep canvases are never written to HBM, and
    the host-side quota selection shrinks from ~30 full-image passes (the
    k-round max/argmax/where extraction in select_from_scores) to a single
    tiny top_k over these candidates. Replaces the quota stage of
    reference src/ORBextractor.cc:476-487 (grid-cell threshold fallback +
    retention by response)."""
    Hh, Wh = BH + 2, BW + 2  # score extent incl. NMS halo
    n_cells = BW // BH
    SENTINEL = 2 ** 30  # python literal: a jnp constant would be captured

    def kernel(lvl_ref, r0_ref, c0_ref, h_ref, w_ref, img_ref,
               vals_ref, pos_ref):
        b = pl.program_id(0)
        r0 = pl.multiple_of(r0_ref[b], BH)
        c0 = pl.multiple_of(c0_ref[b], BW)
        h = h_ref[b]
        w = w_ref[b]
        win = img_ref[0, pl.ds(r0, BH + 8), pl.ds(c0, BW + 8)]
        img = win[3:3 + Hh, 3:3 + Wh]

        def neighbor(k):
            dy, dx = int(FAST_CIRCLE[k][0]), int(FAST_CIRCLE[k][1])
            return win[3 + dy: 3 + dy + Hh, 3 + dx: 3 + dx + Wh]

        # circular sliding-window min/max tree (see _make_packed_kernel)
        d = [neighbor(k) - img for k in range(16)]
        mn = [jnp.minimum(d[s], d[(s + 1) % 16]) for s in range(16)]
        mn = [jnp.minimum(mn[s], mn[(s + 2) % 16]) for s in range(16)]
        mn = [jnp.minimum(mn[s], mn[(s + 4) % 16]) for s in range(16)]
        mn = [jnp.minimum(mn[s], d[(s + 8) % 16]) for s in range(16)]
        mx9 = [jnp.maximum(d[s], d[(s + 1) % 16]) for s in range(16)]
        mx9 = [jnp.maximum(mx9[s], mx9[(s + 2) % 16]) for s in range(16)]
        mx9 = [jnp.maximum(mx9[s], mx9[(s + 4) % 16]) for s in range(16)]
        mx9 = [jnp.maximum(mx9[s], d[(s + 8) % 16]) for s in range(16)]
        bright = mn[0]
        dark_mx = mx9[0]
        for s in range(1, 16):
            bright = jnp.maximum(bright, mn[s])
            dark_mx = jnp.minimum(dark_mx, mx9[s])
        score = jnp.maximum(bright, -dark_mx)

        mx = None
        for dy in range(3):
            for dx in range(3):
                n = score[dy:dy + BH, dx:dx + BW]
                mx = n if mx is None else jnp.maximum(mx, n)
        center = score[1:1 + BH, 1:1 + BW]
        keep = center >= mx

        y_abs = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 0) + r0
        x_abs = jax.lax.broadcasted_iota(jnp.int32, (BH, BW), 1) + c0
        inb = ((y_abs >= border) & (y_abs < h - border)
               & (x_abs >= border) & (x_abs < w - border))
        s = jnp.where(keep & inb, center, 0.0)

        # per-cell top-K: transpose so the BW axis (cells) becomes the
        # leading/sublane axis, then split it into (n_cells, BH)
        st3 = s.T.reshape(n_cells, BH, BH)          # [cell, x_in, y]
        ci = jax.lax.broadcasted_iota(jnp.int32, (n_cells, BH, BH), 0)
        xi = jax.lax.broadcasted_iota(jnp.int32, (n_cells, BH, BH), 1)
        yi = jax.lax.broadcasted_iota(jnp.int32, (n_cells, BH, BH), 2)
        enc = (yi + r0) * 65536 + (xi + ci * BH + c0)

        vals, poss = [], []
        work = st3
        for _ in range(K):
            m2 = jnp.max(work, axis=2)              # [cell, x_in]
            mk = jnp.max(m2, axis=1)                # [cell]
            eq = (work == mk[:, None, None]) & (work > 0.0)
            ce = jnp.where(eq, enc, SENTINEL)
            p2 = jnp.min(ce, axis=2)
            pk = jnp.min(p2, axis=1)                # [cell]
            work = jnp.where(enc == pk[:, None, None], 0.0, work)
            vals.append(mk)
            poss.append(pk)
        out_v = jnp.stack(vals, axis=1)             # [n_cells, K]
        out_p = jnp.stack(poss, axis=1)
        vals_ref[0] = out_v
        pos_ref[0] = out_p

    return kernel


@partial(jax.jit, static_argnames=("shapes", "K", "BH", "BW", "border",
                                   "interpret"))
def fast_cell_topk_packed(stack, shapes: tuple, K: int = 4, BH: int = 32,
                          BW: int = 256, border: int = 16,
                          interpret: bool = False):
    """stack: [L, H, W] f32 level canvas -> per-cell top-K FAST corners.

    ONE kernel for score + NMS + border mask + per-cell candidate
    extraction (cell = BH x BH, BW//BH cells per block). Returns
    (vals [n_blocks, n_cells, K] f32, pos [n_blocks, n_cells, K] i32
    packed y*65536+x, block level table [n_blocks] static list) — empty
    cells hold value 0 / sentinel positions."""
    from jax.experimental.pallas import tpu as pltpu

    L, H, W = stack.shape
    Hr = -(-H // BH) * BH
    Wr = -(-W // BW) * BW
    padded = jnp.pad(
        stack, ((0, 0), (4, 4 + (Hr - H)), (4, 4 + (Wr - W))), mode="edge")

    lvl, r0s, c0s = cell_block_table(shapes, BH, BW, border)
    n_blocks = len(lvl)
    hs = [shapes[l][0] for l in lvl]
    ws = [shapes[l][1] for l in lvl]
    n_cells = BW // BH

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(
            (1, Hr + 8, Wr + 8),
            lambda b, lvl_r, r0_r, c0_r, h_r, w_r: (lvl_r[b], 0, 0))],
        out_specs=[
            pl.BlockSpec(
                (1, n_cells, K),
                lambda b, lvl_r, r0_r, c0_r, h_r, w_r: (b, 0, 0)),
            pl.BlockSpec(
                (1, n_cells, K),
                lambda b, lvl_r, r0_r, c0_r, h_r, w_r: (b, 0, 0)),
        ],
    )
    vals, pos = pl.pallas_call(
        _make_cell_topk_kernel(BH, BW, K, border),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_blocks, n_cells, K), jnp.float32),
            jax.ShapeDtypeStruct((n_blocks, n_cells, K), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.asarray(lvl, jnp.int32), jnp.asarray(r0s, jnp.int32),
      jnp.asarray(c0s, jnp.int32), jnp.asarray(hs, jnp.int32),
      jnp.asarray(ws, jnp.int32), padded)
    return vals, pos


def default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)
