"""Stacked extractor must agree with the per-level reference pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam_tpu.frontend import ORBExtractor
from orb_slam_tpu.frontend.orb_extractor import ORBConfig


def synthetic_image(rng, h=480, w=640, n_blobs=350):
    img = rng.uniform(40, 80, size=(h, w)).astype(np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        s = int(rng.integers(2, 8))
        img[max(0, y - s):y + s, max(0, x - s):x + s] = float(rng.uniform(0, 255))
    return cv2.GaussianBlur(img, (3, 3), 0.8).astype(np.float32)


class TestStackedVsPerLevel:
    def test_same_keypoints_and_descriptors(self, rng):
        img = jnp.asarray(synthetic_image(rng))
        # desc_lut_bins=0: continuous-rotation descriptors, directly
        # comparable to the exact per-level path (the default LUT path
        # discretizes orientation; see test_lut_matches_quantized_gather)
        cfg = ORBConfig(n_features=600, desc_lut_bins=0)
        f_ref = ORBExtractor(cfg, stacked=False)(img)
        f_stk = ORBExtractor(cfg, stacked=True)(img)

        v_ref = np.asarray(f_ref.valid)
        v_stk = np.asarray(f_stk.valid)
        # same per-level slot layout -> masks must be identical
        np.testing.assert_array_equal(v_ref, v_stk)

        # detection identical: same coordinates per slot
        # (same scores/top-k math; ties could permute within equal scores,
        # so compare as sets per level block)
        xy_ref = np.asarray(f_ref.xy)
        xy_stk = np.asarray(f_stk.xy)
        oct_ref = np.asarray(f_ref.octave)
        for l in range(cfg.n_levels):
            sel = (oct_ref == l) & v_ref
            a = {tuple(p) for p in xy_ref[sel].round(3).tolist()}
            b = {tuple(p) for p in xy_stk[sel].round(3).tolist()}
            inter = len(a & b)
            # >=90%: the stacked path resizes upper levels with bf16
            # matmuls (documented fast-path approximation); a few marginal
            # FAST detections shift vs the exact f32 per-level resize.
            # Since selection is the reference's coupled redistribution,
            # one flipped marginal corner can shift a cell's converged
            # quota by 1 and swap the boundary candidate in SEVERAL cells
            # (was 95% under the old independent per-cell top-k).
            assert inter >= 0.90 * max(len(a), 1), f"level {l}"

        # angles and descriptors agree on keypoints present in BOTH
        # variants (matched by coordinate+level: tiny bf16 score deltas
        # reorder the top-k slots)
        v_stk_np = np.asarray(f_stk.valid)
        oct_stk = np.asarray(f_stk.octave)
        key_ref = {}
        for i in np.where(v_ref)[0]:
            key_ref[(round(float(xy_ref[i, 0]), 2), round(float(xy_ref[i, 1]), 2),
                     int(oct_ref[i]))] = i
        pairs = []
        for j in np.where(v_stk_np)[0]:
            k = (round(float(xy_stk[j, 0]), 2), round(float(xy_stk[j, 1]), 2),
                 int(oct_stk[j]))
            if k in key_ref:
                pairs.append((key_ref[k], j))
        assert len(pairs) > 0.9 * v_ref.sum()
        ri = np.array([p[0] for p in pairs])
        si = np.array([p[1] for p in pairs])
        ang_d = np.abs(np.asarray(f_ref.angle)[ri] - np.asarray(f_stk.angle)[si])
        assert np.median(ang_d) < 2e-2
        d_ref = np.asarray(f_ref.desc_u8)[ri]
        d_stk = np.asarray(f_stk.desc_u8)[si]
        ham = np.unpackbits(d_ref ^ d_stk, axis=1).sum(1)
        assert np.median(ham) <= 2
        assert ham.mean() < 4.0
        assert np.percentile(ham, 90) <= 12


class TestLUTDescriptors:
    def test_lut_matches_direct_sampling(self, rng):
        """The orientation-bin LUT matmul must reproduce EXACTLY the
        descriptors obtained by directly gathering the rotated pattern
        points (numpy, per keypoint) at the table's own sample indices —
        i.e. the bf16 matmul formulation introduces zero error."""
        import jax.numpy as jnp
        from orb_slam_tpu.ops.descriptor_stack import (
            rbrief_batch_lut, rbrief_lut_table, lut_sample_indices,
            quantize_angle, gaussian_blur_stack, extract_patches_batch,
        )
        from orb_slam_tpu.ops.fast_stack import (
            build_pyramid_stack, detect_keypoints_stack,
        )
        from orb_slam_tpu.ops.orb_descriptor import _RB_SIZE

        img = jnp.asarray(synthetic_image(rng))
        cfg = ORBConfig(n_features=300, n_levels=4)
        quotas = tuple(cfg.level_quotas())
        stack, shapes = build_pyramid_stack(img, cfg.n_levels,
                                            cfg.scale_factor)
        xy_l, _, valid_l = detect_keypoints_stack(
            stack, tuple(shapes), quotas, th_ini=cfg.fast_th_ini,
            th_min=cfg.fast_th_min, cell_size=cfg.cell_size,
            border=cfg.edge_threshold)
        blurred = jnp.round(gaussian_blur_stack(stack))
        angles = jnp.asarray(
            rng.uniform(-np.pi, np.pi, xy_l.shape[:2]).astype(np.float32))

        n_bins = 30
        table = jnp.asarray(rbrief_lut_table(n_bins), jnp.bfloat16)
        d_lut = np.asarray(rbrief_batch_lut(
            blurred, xy_l, angles, tuple(shapes), table, n_bins))

        # expected: numpy per-keypoint gather at the table's indices
        idx = lut_sample_indices(n_bins)                    # [A, 512]
        bins = np.asarray(quantize_angle(angles, n_bins))   # [L, Q]
        patches = np.asarray(extract_patches_batch(
            blurred, xy_l, tuple(shapes), _RB_SIZE))
        flat = patches.reshape(patches.shape[0], patches.shape[1], -1)
        v = np.asarray(valid_l)
        Lv, Q = v.shape
        weights = np.asarray([1, 2, 4, 8, 16, 32, 64, 128], np.uint8)
        for l in range(Lv):
            for q in range(Q):
                if not v[l, q]:
                    continue
                vals = flat[l, q][idx[bins[l, q]]]
                bits = (vals[0::2] < vals[1::2]).astype(np.uint8)
                exp = (bits.reshape(32, 8) * weights).sum(1).astype(np.uint8)
                np.testing.assert_array_equal(d_lut[l, q], exp,
                                              err_msg=f"l={l} q={q}")
