"""ORB feature extraction: the TPU replacement for ORBextractor.

Reference behavior reproduced (src/ORBextractor.cc:718-779):
  image -> n-level pyramid (scale 1.2) -> per-level FAST with grid-cell
  threshold fallback + quota -> intensity-centroid orientation -> 7x7
  Gaussian blur -> rotated-BRIEF 256-bit descriptors -> coordinates
  scaled back to level 0.

TPU-first differences (deliberate, see SURVEY.md §7):
  * all per-cell / per-keypoint CPU loops are dense whole-image vector ops
    and batched gathers (ops/fast.py, ops/orb_descriptor.py);
  * output is FIXED SHAPE: exactly `n_features` slots with a validity mask
    (invalid slots padded), so every downstream consumer jits once;
  * per-level quotas follow the reference's geometric series
    (src/ORBextractor.cc:476-487) as static Python ints.

The whole extractor is one jitted function per (H, W) — XLA fuses the
pyramid, 16-plane FAST stencil, NMS, top-k and descriptor gathers.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.ops.fast import detect_fast_keypoints
from orb_slam_tpu.ops.image import build_pyramid, gaussian_blur
from orb_slam_tpu.ops.orb_descriptor import ic_angles, pack_u32, rbrief_descriptors


@dataclass(frozen=True)
class ORBConfig:
    n_features: int = 1000
    n_levels: int = 8
    scale_factor: float = 1.2
    fast_th_ini: float = 20.0
    fast_th_min: float = 7.0
    edge_threshold: int = 16
    cell_size: int = 32
    # reference nScoreType: 1 = FAST score (default), 0 = Harris rescoring
    score_harris: bool = False
    # rBRIEF orientation discretization for the stacked fast path: the ORB
    # paper's precomputed rotated-pattern LUT (2*pi/30 steps, Rublee et al.
    # 2011 §4.1) turns descriptor sampling into one MXU matmul. 0 =
    # OpenCV-style continuous rotation (per-keypoint gathers; the exact
    # per-level path always uses this).
    desc_lut_bins: int = 30
    # keypoint patch extraction strategy for orientation/descriptor
    # sampling: "onehot" = row+column one-hot matmuls (MXU, O(Q*size*H*W)),
    # "rowgather" = dynamic row gather + column one-hot (data movement,
    # O(Q*size*W) + O(Q*size^2*W) MXU). A/B'd on device; see
    # scripts/bench_extract_variants.py and PERF.md.
    patch_method: str = "onehot"

    def level_quotas(self):
        """Geometric per-level feature quotas (reference:
        src/ORBextractor.cc:476-487)."""
        f = 1.0 / self.scale_factor
        n0 = self.n_features * (1.0 - f) / (1.0 - f ** self.n_levels)
        quotas, total = [], 0
        for lvl in range(self.n_levels - 1):
            q = int(round(n0 * f ** lvl))
            quotas.append(q)
            total += q
        quotas.append(max(self.n_features - total, 0))
        return quotas

    def scale_factors(self):
        return [self.scale_factor ** l for l in range(self.n_levels)]

    def sigma2(self):
        return [s * s for s in self.scale_factors()]


class ORBFeatures:
    """Fixed-shape per-frame feature set (the device-side 'Frame' payload).

    Fields (N = config.n_features):
      xy        [N, 2] f32 — keypoint positions at level-0 scale (distorted,
                 i.e. raw image coordinates)
      response  [N]    f32
      angle     [N]    f32 (radians)
      octave    [N]    i32 — pyramid level
      desc_u8   [N, 32] u8 — OpenCV-layout rBRIEF descriptors
      desc_u32  [N, 8]  u32 — packed for XOR+popcount Hamming
      valid     [N]    bool
    """

    def __init__(self, xy, response, angle, octave, desc_u8, desc_u32, valid):
        self.xy = xy
        self.response = response
        self.angle = angle
        self.octave = octave
        self.desc_u8 = desc_u8
        self.desc_u32 = desc_u32
        self.valid = valid

    def tree_flatten(self):
        return (
            (self.xy, self.response, self.angle, self.octave,
             self.desc_u8, self.desc_u32, self.valid),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    ORBFeatures,
    lambda f: f.tree_flatten(),
    ORBFeatures.tree_unflatten,
)


class ORBExtractor:
    """Callable extractor. jit-compiles once per image shape.

    Two implementations with identical outputs (up to the blur boundary
    noted in ops/descriptor_stack.py):
      * stacked=True (default): all pyramid levels processed as ONE padded
        [L, H, W] stack — ~8x fewer ops per frame, which dominates wall
        clock on dispatch-overhead-bound runtimes;
      * stacked=False: straightforward per-level pipeline (the variant the
        cv2 bit-exactness tests exercise)."""

    def __init__(self, config: ORBConfig = ORBConfig(), stacked: bool = True,
                 use_pallas: bool | None = None):
        self.config = config
        self.stacked = stacked
        if use_pallas is None:
            # the fused FAST kernel keeps the 16 difference planes in VMEM
            # (measured 2.1 vs 6.9 ms/frame device-side against the XLA
            # stencil); interpret-mode emulation on CPU is too slow, so
            # default on only where Mosaic compiles natively
            use_pallas = jax.default_backend() == "tpu"
        if use_pallas and config.score_harris:
            # nScoreType=0 (Harris, ORBextractor.cc:616-620): the Pallas
            # FAST kernel ranks candidates by FAST score in-kernel, so
            # Harris rescoring routes to the XLA stacked detector, which
            # computes both maps. Config-time fallback, not a runtime raise.
            import warnings
            warnings.warn(
                "nScoreType=0 (Harris) uses the XLA stacked detector; "
                "the Pallas FAST kernel path is disabled for this run")
            use_pallas = False
        self.use_pallas = use_pallas
        self._jitted = {}

    def pyramid_consts(self, shape):
        """Device-resident constant tensors (bilinear pyramid matrices +
        the rBRIEF orientation-bin LUT), passed as ARGUMENTS (closure
        constants are re-hashed per call on the target runtime)."""
        if not hasattr(self, "_consts"):
            self._consts = {}
        if shape not in self._consts:
            from orb_slam_tpu.ops.fast_stack import pyramid_matrices
            Rp, Cp = pyramid_matrices(shape[0], shape[1],
                                      self.config.n_levels,
                                      self.config.scale_factor)
            lut = None
            if self.config.desc_lut_bins:
                from orb_slam_tpu.ops.descriptor_stack import rbrief_lut_table
                lut = jnp.asarray(
                    rbrief_lut_table(self.config.desc_lut_bins),
                    jnp.bfloat16)
            self._consts[shape] = (jnp.asarray(Rp), jnp.asarray(Cp), lut)
        return self._consts[shape]

    def __call__(self, img) -> ORBFeatures:
        """img: [H, W] float32 grayscale in [0,255] (device array)."""
        shape = tuple(img.shape)
        if shape not in self._jitted:
            if self.stacked:
                fn = partial(_extract_stacked, config=self.config,
                             use_pallas=self.use_pallas)
            else:
                fn = lambda im, consts: _extract(im, config=self.config)
            self._jitted[shape] = jax.jit(fn)
        return self._jitted[shape](img, self.pyramid_consts(shape))


def _extract_stacked(img, pyr_consts=None, *, config: ORBConfig,
                     use_pallas: bool = False) -> ORBFeatures:
    from orb_slam_tpu.ops.fast_stack import (
        build_pyramid_stack, detect_keypoints_stack,
        detect_keypoints_stack_pallas,
    )
    from orb_slam_tpu.ops.descriptor_stack import gaussian_blur_stack

    quotas = tuple(config.level_quotas())
    scales = config.scale_factors()
    stack, shapes = build_pyramid_stack(
        img, config.n_levels, config.scale_factor, consts=pyr_consts)
    shapes_t = tuple(shapes)

    if use_pallas and config.score_harris:
        # defense in depth for direct _extract_stacked callers: the
        # constructor already routes Harris to the XLA path (see
        # ORBExtractor.__init__); honor the same fallback here
        use_pallas = False
    if use_pallas:
        detect = partial(detect_keypoints_stack_pallas, interpret=False)
        xy_l, score_l, valid_l = detect(
            stack, shapes_t, quotas,
            th_ini=config.fast_th_ini, th_min=config.fast_th_min,
            cell_size=config.cell_size, border=config.edge_threshold,
        )  # [L, Qmax, ...]
    else:
        xy_l, score_l, valid_l = detect_keypoints_stack(
            stack, shapes_t, quotas,
            th_ini=config.fast_th_ini, th_min=config.fast_th_min,
            cell_size=config.cell_size, border=config.edge_threshold,
            use_harris=config.score_harris,
        )  # [L, Qmax, ...]

    # orientation + descriptors for ALL levels in one batched pass
    # (gather-as-matmul against the level canvases; ~12 large ops replace
    # ~130 per-level ones — see ops/descriptor_stack.py)
    from orb_slam_tpu.ops.descriptor_stack import (
        angles_desc_fused, ic_angles_batch, rbrief_batch, rbrief_batch_lut,
    )

    lut = pyr_consts[2] if (pyr_consts is not None
                            and len(pyr_consts) > 2) else None
    if config.desc_lut_bins and lut is None:
        from orb_slam_tpu.ops.descriptor_stack import rbrief_lut_table
        lut = jnp.asarray(rbrief_lut_table(config.desc_lut_bins),
                          jnp.bfloat16)
    if config.desc_lut_bins and config.patch_method == "onehot":
        # fast path: ONE 45x45 extraction serves moments + in-patch blur +
        # int8 LUT descriptor sampling (ops/descriptor_stack.py), levels
        # processed in two quota groups to avoid padding every level to
        # level 0's quota
        angle_l, desc_l = angles_desc_fused(stack, xy_l, shapes_t, lut,
                                            config.desc_lut_bins,
                                            quotas=quotas)
    else:
        angle_l = ic_angles_batch(stack, xy_l, shapes_t,
                                  method=config.patch_method)  # [L, Qmax]
        blurred = jnp.round(gaussian_blur_stack(stack))
        if config.desc_lut_bins:
            desc_l = rbrief_batch_lut(blurred, xy_l, angle_l, shapes_t, lut,
                                      config.desc_lut_bins,
                                      method=config.patch_method)
        else:
            desc_l = rbrief_batch(blurred, xy_l, angle_l, shapes_t)

    Lv = config.n_levels
    parts = {k: [] for k in ("xy", "s", "v", "lvl", "ang", "desc")}
    for l in range(Lv):
        q = quotas[l]
        if q == 0:
            continue
        parts["xy"].append(xy_l[l, :q])
        parts["s"].append(score_l[l, :q])
        parts["v"].append(valid_l[l, :q])
        parts["lvl"].append(jnp.full((q,), l, jnp.int32))
        parts["ang"].append(angle_l[l, :q])
        parts["desc"].append(desc_l[l, :q])

    xy = jnp.concatenate(parts["xy"])
    resp = jnp.concatenate(parts["s"])
    valid = jnp.concatenate(parts["v"])
    octave = jnp.concatenate(parts["lvl"])
    angle = jnp.concatenate(parts["ang"])
    desc_u8 = jnp.concatenate(parts["desc"])
    desc_u32 = pack_u32(desc_u8)

    scale_arr = jnp.asarray(scales, jnp.float32)[octave]
    xy_f = xy.astype(jnp.float32) * scale_arr[:, None]
    xy_f = jnp.where(valid[:, None], xy_f, -1.0)
    return ORBFeatures(xy_f, resp, angle, octave, desc_u8, desc_u32, valid)


def _extract(img, *, config: ORBConfig) -> ORBFeatures:
    quotas = config.level_quotas()
    scales = config.scale_factors()
    levels = build_pyramid(img, config.n_levels, config.scale_factor)

    all_xy, all_resp, all_angle, all_oct, all_desc, all_valid = [], [], [], [], [], []
    for lvl, (level_img, quota, scale) in enumerate(zip(levels, quotas, scales)):
        if quota == 0:
            continue
        xy, resp, valid = detect_fast_keypoints(
            level_img,
            max_kp=quota,
            th_ini=config.fast_th_ini,
            th_min=config.fast_th_min,
            cell_size=config.cell_size,
            border=config.edge_threshold,
            use_harris=config.score_harris,
            # the reference's imageRatio is the LEVEL-0 aspect for every
            # level (src/ORBextractor.cc:527); keeps the grid identical to
            # the stacked path
            aspect_ratio=float(img.shape[1]) / float(img.shape[0]),
        )
        angle = ic_angles(level_img, xy)
        # Round the blurred image to integers: this reproduces cv2's uint8
        # rounding after GaussianBlur and makes descriptors BIT-EXACT vs
        # OpenCV ORB for identical keypoints/angles (tests/test_orb_extractor).
        blurred = jnp.round(gaussian_blur(level_img))
        desc = rbrief_descriptors(blurred, xy, angle)
        all_xy.append(xy.astype(jnp.float32) * scale)
        all_resp.append(resp)
        all_angle.append(angle)
        all_oct.append(jnp.full((quota,), lvl, jnp.int32))
        all_desc.append(desc)
        all_valid.append(valid)

    xy = jnp.concatenate(all_xy)
    resp = jnp.concatenate(all_resp)
    angle = jnp.concatenate(all_angle)
    octave = jnp.concatenate(all_oct)
    desc_u8 = jnp.concatenate(all_desc)
    valid = jnp.concatenate(all_valid)
    desc_u32 = pack_u32(desc_u8)
    # zero out invalid slots so downstream masked ops see benign values
    xy = jnp.where(valid[:, None], xy, -1.0)
    return ORBFeatures(xy, resp, angle, octave, desc_u8, desc_u32, valid)
