"""ORB extraction tests: FAST corner parity vs cv2, descriptor invariance,
and match-quality under known transformations (the test strategy SURVEY.md §4
prescribes in place of the reference's manual validation)."""

import numpy as np
import jax.numpy as jnp
import pytest

cv2 = pytest.importorskip("cv2")

from orb_slam_tpu.ops.fast import fast_score_map, detect_fast_keypoints
from orb_slam_tpu.ops.image import gaussian_blur, build_pyramid
from orb_slam_tpu.ops.orb_descriptor import ic_angles, rbrief_descriptors, pack_u32
from orb_slam_tpu.frontend import ORBExtractor
from orb_slam_tpu.frontend.orb_extractor import ORBConfig


def synthetic_image(rng, h=240, w=320, n_blobs=150):
    """Textured synthetic image with corners at many scales."""
    img = rng.uniform(40, 80, size=(h, w)).astype(np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 10), rng.integers(10, w - 10)
        s = int(rng.integers(2, 8))
        val = float(rng.uniform(0, 255))
        img[max(0, y - s):y + s, max(0, x - s):x + s] = val
    img = cv2.GaussianBlur(img, (3, 3), 0.8)
    return img.astype(np.float32)


class TestFAST:
    def test_corner_set_parity_vs_cv2(self, rng):
        """Our score>th pixel set must closely match cv2 FAST-9/16 corners."""
        img = synthetic_image(rng)
        th = 20
        score = np.asarray(fast_score_map(jnp.asarray(img)))
        ours = score > th
        fast = cv2.FastFeatureDetector_create(
            threshold=th, nonmaxSuppression=False,
            type=cv2.FastFeatureDetector_TYPE_9_16)
        kps = fast.detect(img.astype(np.uint8))
        theirs = np.zeros_like(ours)
        for kp in kps:
            theirs[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
        # interior only (cv2 applies its own 3px border)
        ours_i = ours[4:-4, 4:-4]
        theirs_i = theirs[4:-4, 4:-4]
        inter = np.sum(ours_i & theirs_i)
        union = np.sum(ours_i | theirs_i)
        assert union > 50, "test image produced too few corners"
        assert inter / union > 0.95, f"FAST IoU too low: {inter/union:.3f}"

    def test_detect_returns_distributed_valid_keypoints(self, rng):
        img = synthetic_image(rng)
        xy, score, valid = detect_fast_keypoints(jnp.asarray(img), max_kp=200)
        xy, score, valid = map(np.asarray, (xy, score, valid))
        n = valid.sum()
        assert n > 100
        assert (score[valid] > 7.0).all()
        # all in border
        assert (xy[valid] >= 16).all()
        assert (xy[valid, 0] < img.shape[1] - 16).all()
        assert (xy[valid, 1] < img.shape[0] - 16).all()
        # no duplicates
        flat = xy[valid, 1] * img.shape[1] + xy[valid, 0]
        assert len(np.unique(flat)) == n

    def test_score_matches_cv2_threshold_semantics(self, rng):
        """A pixel passes cv2 FAST at threshold t iff our score > t (checked
        across several thresholds)."""
        img = synthetic_image(rng)
        score = np.asarray(fast_score_map(jnp.asarray(img)))
        for th in [10, 30, 50]:
            fast = cv2.FastFeatureDetector_create(
                threshold=th, nonmaxSuppression=False,
                type=cv2.FastFeatureDetector_TYPE_9_16)
            kps = fast.detect(img.astype(np.uint8))
            theirs = np.zeros(img.shape, bool)
            for kp in kps:
                theirs[int(round(kp.pt[1])), int(round(kp.pt[0]))] = True
            ours = (score > th)[4:-4, 4:-4]
            theirs = theirs[4:-4, 4:-4]
            union = (ours | theirs).sum()
            if union:
                assert (ours & theirs).sum() / union > 0.93, f"th={th}"


class TestBlur:
    def test_gaussian_blur_matches_cv2(self, rng):
        img = rng.uniform(0, 255, size=(64, 96)).astype(np.float32)
        ours = np.asarray(gaussian_blur(jnp.asarray(img)))
        ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
        np.testing.assert_allclose(ours, ref, atol=1e-2)


def _cv2_keypoints(u8, n=60, margin=20):
    orb = cv2.ORB_create(nfeatures=200, nlevels=1, edgeThreshold=margin,
                         fastThreshold=20)
    kps = orb.detect(u8)
    kps = [k for k in kps
           if margin <= k.pt[0] < u8.shape[1] - margin
           and margin <= k.pt[1] < u8.shape[0] - margin][:n]
    kps, desc = orb.compute(u8, kps)
    xy = np.array([[int(round(k.pt[0])), int(round(k.pt[1]))] for k in kps],
                  np.int32)
    angles = np.array([k.angle for k in kps], np.float32)
    return xy, angles, desc


class TestOrientation:
    def test_ic_angle_matches_cv2_orb(self, rng):
        """Direct oracle: our IC angles vs cv2 ORB's keypoint angles."""
        img = synthetic_image(rng)
        u8 = img.astype(np.uint8)
        xy, theirs, _ = _cv2_keypoints(u8)
        assert len(xy) > 20
        ours = np.rad2deg(np.asarray(
            ic_angles(jnp.asarray(u8.astype(np.float32)), jnp.asarray(xy))))
        diff = np.abs((ours % 360 - theirs + 180) % 360 - 180)
        assert np.median(diff) < 0.2
        assert np.percentile(diff, 90) < 1.0


class TestDescriptors:
    def test_bit_exact_vs_cv2(self, rng):
        """BASELINE.json fidelity target: bit-exact rBRIEF descriptors vs
        OpenCV ORB for identical keypoints and angles."""
        img = synthetic_image(rng)
        u8 = img.astype(np.uint8)
        xy, angles_deg, desc_cv = _cv2_keypoints(u8)
        assert len(xy) > 20
        imgf = jnp.asarray(u8.astype(np.float32))
        blurred = jnp.round(gaussian_blur(imgf))
        ours = np.asarray(rbrief_descriptors(
            blurred, jnp.asarray(xy), jnp.asarray(np.deg2rad(angles_deg))))
        ham = np.unpackbits(ours ^ desc_cv, axis=1).sum(1)
        assert (ham == 0).mean() == 1.0, f"non-exact descriptors: {ham}"

    def test_descriptor_repeatability_under_rotation(self, rng):
        """End-to-end rBRIEF invariance: descriptors of the same physical
        corner before/after 25-degree rotation must be close in Hamming
        distance (ORB's entire point)."""
        img = synthetic_image(rng, 320, 320, n_blobs=250)
        ext = ORBExtractor(ORBConfig(n_features=300, n_levels=1))
        f0 = ext(jnp.asarray(img))
        deg = 25.0
        M = cv2.getRotationMatrix2D((160, 160), deg, 1.0)
        rot = cv2.warpAffine(img, M, (320, 320))
        f1 = ext(jnp.asarray(rot))
        xy0 = np.asarray(f0.xy)[np.asarray(f0.valid)]
        d0 = np.asarray(f0.desc_u8)[np.asarray(f0.valid)]
        xy1 = np.asarray(f1.xy)[np.asarray(f1.valid)]
        d1 = np.asarray(f1.desc_u8)[np.asarray(f1.valid)]
        # ground-truth correspondence by warped position
        ones = np.concatenate([xy0, np.ones((len(xy0), 1))], 1)
        warped = ones @ M.T  # [N, 2]
        dists = np.linalg.norm(warped[:, None] - xy1[None], axis=-1)
        gt = dists.argmin(1)
        close = dists[np.arange(len(gt)), gt] < 2.0
        assert close.sum() > 40
        ham = np.unpackbits(d0[close] ^ d1[gt[close]], axis=-1).sum(-1)
        frac_good = (ham < 64).mean()
        assert frac_good > 0.7, f"rotation repeatability too low: {frac_good:.2f}"

    def test_pack_u32_preserves_hamming(self, rng):
        d = rng.integers(0, 256, size=(10, 32)).astype(np.uint8)
        packed = np.asarray(pack_u32(jnp.asarray(d)))
        for i in range(9):
            h8 = np.unpackbits(d[i] ^ d[i + 1]).sum()
            h32 = bin(int.from_bytes((packed[i] ^ packed[i + 1]).tobytes(), "little")).count("1")
            assert h8 == h32


class TestExtractor:
    def test_full_pipeline_shapes_and_masks(self, rng):
        img = synthetic_image(rng, 480, 640, n_blobs=400)
        cfg = ORBConfig(n_features=500)
        ext = ORBExtractor(cfg)
        f = ext(jnp.asarray(img))
        N = cfg.n_features
        assert f.xy.shape == (N, 2)
        assert f.desc_u8.shape == (N, 32)
        assert f.desc_u32.shape == (N, 8)
        valid = np.asarray(f.valid)
        assert valid.sum() > 200
        oct_ = np.asarray(f.octave)[valid]
        assert oct_.max() >= 2, "higher pyramid levels produced no keypoints"
        xy = np.asarray(f.xy)[valid]
        assert (xy[:, 0] < 640).all() and (xy[:, 1] < 480).all()

    def test_deterministic(self, rng):
        img = synthetic_image(rng)
        ext = ORBExtractor(ORBConfig(n_features=200, n_levels=3))
        f1 = ext(jnp.asarray(img))
        f2 = ext(jnp.asarray(img))
        np.testing.assert_array_equal(np.asarray(f1.desc_u8), np.asarray(f2.desc_u8))
        np.testing.assert_array_equal(np.asarray(f1.xy), np.asarray(f2.xy))
