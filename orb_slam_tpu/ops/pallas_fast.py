"""Pallas TPU kernel: fused FAST-9/16 score + 3x3 NMS over the level stack.

One kernel instance per pyramid level (grid=(L,)): the level image loads
into VMEM once; the 16-offset segment test, arc min/max reduction, score
and non-max suppression all happen in-register/VMEM without ever
materializing the [16, H, W] difference planes in HBM (the XLA version's
main bandwidth cost) — and the whole detection collapses to ONE device op.

Memory budget per instance (512x640 level): image 1.25 MB + score/NMS
buffers ~4 MB << 16 MB VMEM.

Algorithm (identical semantics to ops/fast.fast_score_map + nms3x3):
  score(p) = max over the 16 circular 9-arcs of
             min_{j in arc} (bright: I_j - I_p | dark: I_p - I_j)
  keep(p)  = score(p) >= max 3x3 neighborhood."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from orb_slam_tpu.ops.fast import FAST_CIRCLE


def _fast_nms_kernel(img_ref, score_ref, keep_ref):
    img = img_ref[0]  # block [1, H, W] -> [H, W] f32 in VMEM
    H, W = img.shape

    # neighbor planes via static shifted slices of an edge-padded image
    padded = jnp.pad(img, 3, mode="edge")

    def neighbor(k):
        # static slices: Mosaic TPU lowering has no dynamic_slice
        dy, dx = int(FAST_CIRCLE[k][0]), int(FAST_CIRCLE[k][1])
        return padded[3 + dy: 3 + dy + H, 3 + dx: 3 + dx + W]

    diffs = [neighbor(k) - img for k in range(16)]

    # run-of-9 min (bright) / max (dark) over circular windows:
    # log-depth tree per start via precombined pairs
    def run9(op, xs):
        # r2[k] = op(x[k], x[k+1]) ... circular
        r2 = [op(xs[k], xs[(k + 1) % 16]) for k in range(16)]
        r4 = [op(r2[k], r2[(k + 2) % 16]) for k in range(16)]
        r8 = [op(r4[k], r4[(k + 4) % 16]) for k in range(16)]
        r9 = [op(r8[k], xs[(k + 8) % 16]) for k in range(16)]
        out = r9[0]
        for k in range(1, 16):
            out = jnp.maximum(out, r9[k]) if op is jnp.minimum else jnp.minimum(out, r9[k])
        return out

    bright = run9(jnp.minimum, diffs)          # max over arcs of arc-min
    dark = -run9(jnp.maximum, diffs)           # symmetric
    score = jnp.maximum(bright, dark)
    # (no border zeroing here: selection masks a >=16px border anyway,
    # keeping exact parity with ops/fast_stack.fast_score_stack)

    # 3x3 NMS via shifted maxima
    spad = jnp.pad(score, 1, mode="constant", constant_values=-jnp.inf)
    mx = score
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            mx = jnp.maximum(mx, spad[1 + dy: 1 + dy + H, 1 + dx: 1 + dx + W])
    score_ref[0] = score
    keep_ref[0] = (score >= mx).astype(jnp.float32)


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_nms_pallas(stack, interpret: bool = False):
    """stack: [L, H, W] f32 -> (score [L, H, W] f32, keep [L, H, W] bool).
    Set interpret=True on CPU (tests)."""
    L, H, W = stack.shape
    score, keep = pl.pallas_call(
        _fast_nms_kernel,
        grid=(L,),
        in_specs=[pl.BlockSpec((1, H, W), lambda l: (l, 0, 0))],
        out_specs=(
            pl.BlockSpec((1, H, W), lambda l: (l, 0, 0)),
            pl.BlockSpec((1, H, W), lambda l: (l, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((L, H, W), jnp.float32),
            jax.ShapeDtypeStruct((L, H, W), jnp.float32),
        ),
        interpret=interpret,
    )(stack)
    return score, keep > 0.5


def default_interpret() -> bool:
    return jax.default_backend() not in ("tpu",)
