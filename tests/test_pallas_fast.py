"""Pallas fused FAST kernel must match the XLA implementation exactly
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from orb_slam_tpu.ops.fast_stack import (
    build_pyramid_stack, fast_score_stack, detect_keypoints_stack,
    detect_keypoints_stack_pallas,
)
from orb_slam_tpu.ops.pallas_fast import fast_score_nms_pallas


def textured(rng, h=128, w=256):
    img = rng.uniform(30, 70, (h, w)).astype(np.float32)
    for _ in range(60):
        y, x = rng.integers(8, h - 8), rng.integers(8, w - 8)
        s = int(rng.integers(2, 6))
        img[y - s:y + s, x - s:x + s] = float(rng.uniform(100, 255))
    return img


class TestPallasFast:
    def test_score_and_nms_match_xla(self, rng):
        img = textured(rng)
        stack, shapes = build_pyramid_stack(jnp.asarray(img), 4, 1.2)
        score_p, keep_p = fast_score_nms_pallas(stack, interpret=True)
        score_x = fast_score_stack(stack)
        mx = jax.lax.reduce_window(
            score_x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
        keep_x = score_x >= mx
        np.testing.assert_allclose(
            np.asarray(score_p), np.asarray(score_x), atol=1e-5)
        # NMS masks agree wherever the score is above any usable threshold
        sp = np.asarray(score_p)
        significant = sp > 7.0
        np.testing.assert_array_equal(
            np.asarray(keep_p)[significant], np.asarray(keep_x)[significant])

    @pytest.mark.parametrize("tree", [False, True])
    def test_packed_kernel_matches_xla(self, rng, tree):
        from orb_slam_tpu.ops.pallas_fast import fast_score_nms_packed
        img = textured(rng)
        stack, shapes = build_pyramid_stack(jnp.asarray(img), 4, 1.2)
        score_p, keep_p = fast_score_nms_packed(
            stack, tuple(shapes), BH=48, BW=256, tree=tree, interpret=True)
        score_x = fast_score_stack(stack)
        mx = jax.lax.reduce_window(
            score_x, -jnp.inf, jax.lax.max, (1, 3, 3), (1, 1, 1), "SAME")
        keep_x = score_x >= mx
        # compare inside each level's interior (the packed kernel leaves
        # out-of-level canvas unwritten by design; canvas-boundary NMS rows
        # are border-masked downstream)
        for l, (h, w) in enumerate(shapes):
            sl = np.s_[l, 1:h - 1, 1:w - 1]
            np.testing.assert_allclose(
                np.asarray(score_p[sl]), np.asarray(score_x[sl]), atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(keep_p[sl]), np.asarray(keep_x[sl]))

    def test_full_detection_path(self, rng):
        img = textured(rng)
        stack, shapes = build_pyramid_stack(jnp.asarray(img), 4, 1.2)
        shapes, quotas = tuple(shapes), (60, 50, 42, 35)
        xy_a, s_a, v_a = detect_keypoints_stack(stack, shapes, quotas)
        xy_b, s_b, v_b = detect_keypoints_stack_pallas(
            stack, shapes, quotas, interpret=True)
        np.testing.assert_array_equal(np.asarray(v_a), np.asarray(v_b))
        np.testing.assert_array_equal(np.asarray(xy_a), np.asarray(xy_b))
