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


def default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)
