"""SLAMSystem: host orchestration of the full pipeline.

Maps the reference's process architecture (SURVEY.md §3) onto thin Python
around jitted kernels:
  * Tracking state machine (src/Tracking.cc:206-298) — host branches between
    jitted steps (extraction, initialization, fused track, relocalisation);
  * LocalMapping (src/LocalMapping.cc) — per-keyframe pipeline of jitted
    kernels (triangulate / fuse / BA / cull) with host policy decisions;
  * deterministic sequential mode (default; the reference's poll-loop design
    makes stages pure functions of (queue, map) — SURVEY.md §4) and an async
    mode where mapping runs in a background thread.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.geometry import CameraModel, undistort_points
from orb_slam_tpu.frontend.orb_extractor import ORBConfig, ORBExtractor
from orb_slam_tpu.ops.matching import match, window_gate, TH_LOW, TH_HIGH
from orb_slam_tpu.ops.image import to_grayscale
from orb_slam_tpu.slam_map import MapConfig, MapState, empty_map
from orb_slam_tpu.slam_map.map_state import (
    insert_keyframe, remove_points, remove_keyframe,
)
from orb_slam_tpu.slam_map.covisibility import covisibility_weights
from orb_slam_tpu.slam_map.observations import refresh_point_stats
from orb_slam_tpu.solvers import initialize_two_view
from orb_slam_tpu.solvers.local_ba import bundle_adjust, apply_edge_outliers
from orb_slam_tpu.pipeline.track_kernels import track_frame
from orb_slam_tpu.utils.log import dbg, DEBUG
from orb_slam_tpu.pipeline.mapping_kernels import (
    triangulate_new_points, insert_new_points, fuse_into_keyframe,
    point_cull_stats, keyframe_redundancy,
)

# Tracking states (reference: include/Tracking.h:57-64)
NO_IMAGES_YET = 0
NOT_INITIALIZED = 1
INITIALIZING = 2
WORKING = 3
LOST = 4

STATE_NAMES = {0: "NO_IMAGES_YET", 1: "NOT_INITIALIZED", 2: "INITIALIZING",
               3: "WORKING", 4: "LOST"}


def _np_se3_inverse(T):
    """Analytic SE3 inverse (host mirror of geometry.se3_inverse — the same
    arithmetic keeps chunked and sequential tracking bit-identical)."""
    Rt = T[:3, :3].T
    out = np.eye(4, dtype=np.float32)
    out[:3, :3] = Rt
    out[:3, 3] = -(Rt @ T[:3, 3])
    return out


@dataclass
class SlamConfig:
    camera: CameraModel = None
    orb: ORBConfig = field(default_factory=ORBConfig)
    map: MapConfig = None
    min_init_matches: int = 100       # reference: Tracking.cc:345
    min_init_keypoints: int = 100     # reference: Tracking.cc:322
    min_track_inliers: int = 30       # reference: Tracking.cc:613
    min_frames_between_kf: int = 0    # reference mMinFrames (Tracking.cc:77)
    max_frames_between_kf: int = 18   # reference mMaxFrames at 30fps
    kf_tracked_ratio: float = 0.9     # c2 condition (Tracking.cc:650)
    n_triangulation_neighbors: int = 20  # reference: LocalMapping.cc:213
    n_fuse_neighbors: int = 20           # reference: LocalMapping.cc:379
    n_fuse_second_neighbors: int = 5     # reference: LocalMapping.cc:383-395
    local_ba_window: int = 0          # covisible KFs optimized in local BA;
                                      # 0 = all covisibles (reference
                                      # semantics, Optimizer.cc:289-338; the
                                      # dense solve's cost does not depend
                                      # on the window)
    p_local: int = 4096               # tracking candidate pool
    track_radius: float = 15.0
    kf_cull_redundancy: float = 0.9   # reference: LocalMapping.cc:567
    enable_loop_closing: bool = True
    enable_relocalisation: bool = True
    vocabulary: object = None         # place.Vocabulary; auto-trained if None
    bow_slots: int = 0                # 0 = n_features (every word can be unique)
    min_reloc_inliers: int = 50       # reference: Tracking.cc:948-995
    use_motion_model: bool = True     # reference UseMotionModel setting
    track_local_map: bool = True      # restrict tracking candidates to the
                                      # covisibility-local map (the
                                      # reference's TrackLocalMap semantics,
                                      # Tracking.cc:728-839). False = match
                                      # the whole map — implicitly closes
                                      # small loops in the tracker, which
                                      # starves explicit loop detection
                                      # (covisibility.py::local_point_mask)
    track_chunk_size: int = 8         # frames per device dispatch in
                                      # process_batch (scan-chained tracking;
                                      # 1 = per-frame dispatch)
    mesh: object = None               # optional jax.sharding.Mesh ('data'
                                      # axis): bundle adjustment shards its
                                      # points/edges across the mesh (psum-
                                      # reduced camera system over ICI);
                                      # results identical to single-device
    max_ba_cams: int = 80             # static bound on cameras optimized by
                                      # one local BA: the reduced (Schur)
                                      # camera system is built in a compact
                                      # space of this many slots, so the
                                      # solve cost is independent of
                                      # map.max_keyframes (0 = capacity).
                                      # The strongest covisibles are kept
                                      # when the local set exceeds it.
                                      # Default 80 = the reference's local-
                                      # map size bound (Tracking.cc:814-816)
                                      # so the compact O(edges + Kl^3) mode
                                      # is the production path at any
                                      # max_keyframes.
    max_ba_points: int = 2048         # static bound on points optimized by
                                      # one local BA: edge/Schur passes run
                                      # in a compact [max_ba_points, O]
                                      # space instead of the full point
                                      # capacity (round-3 bottleneck: the
                                      # [16384, 32] edge pass served ~1-2k
                                      # live points). Overflow points stay
                                      # fixed for that solve (mirrors
                                      # max_ba_cams). 0 = full capacity.
    mapper_latency_frames: int = 0    # optional sequential-mode stand-in for
                                      # the reference's AcceptKeyFrames
                                      # backpressure (0 = mapper always idle,
                                      # like an infinitely fast LocalMapping;
                                      # async mode uses real idleness)
    seed: int = 0

    def __post_init__(self):
        if self.camera is None:
            self.camera = CameraModel.create(500.0, 500.0, 320.0, 240.0)
        if self.map is None:
            self.map = MapConfig(n_features=self.orb.n_features,
                                 n_levels=self.orb.n_levels,
                                 scale_factor=self.orb.scale_factor)
        elif self.orb is not None:
            # the extractor settings are authoritative for the pyramid
            # (the reference derives every scale table from them,
            # ORBextractor.cc:476-487, Frame.cc:95-107)
            from dataclasses import replace as _dc_replace
            if (self.map.n_levels != self.orb.n_levels
                    or self.map.scale_factor != self.orb.scale_factor):
                self.map = _dc_replace(
                    self.map, n_levels=self.orb.n_levels,
                    scale_factor=self.orb.scale_factor)
        # the tracking candidate pool cannot exceed the point capacity
        self.p_local = min(self.p_local, self.map.max_points)
        # the compact BA camera space cannot exceed the keyframe capacity
        self.max_ba_cams = min(self.max_ba_cams, self.map.max_keyframes)
        # compact BA point space: bounded by the point capacity; keep it a
        # multiple of 256 so the sharded path divides any small mesh axis
        if self.max_ba_points:
            self.max_ba_points = min(
                max(256, (self.max_ba_points // 256) * 256),
                self.map.max_points)
        if not self.bow_slots:
            # every feature may land on a distinct word; fewer slots would
            # silently drop BoW mass (advisor finding, round 1). Oracle
            # mode (orb=None, features fed directly) sizes off the map.
            self.bow_slots = (self.orb.n_features if self.orb is not None
                              else self.map.n_features)


class FrameData:
    """Per-frame device payload: extracted features + undistorted coords."""

    def __init__(self, xy_und, desc, octave, angle, valid, frame_id,
                 timestamp=0.0):
        self.xy = xy_und
        self.desc = desc
        self.octave = octave
        self.angle = angle
        self.valid = valid
        self.frame_id = frame_id
        self.timestamp = timestamp


class SLAMSystem:
    """The public API mirroring the reference's process (main.cc):
    feed images (or oracle features) -> per-frame camera pose + map."""

    def __init__(self, cfg: SlamConfig = None):
        self.cfg = cfg or SlamConfig()
        if self.cfg.orb is not None:
            self.extractor = ORBExtractor(self.cfg.orb)
            # 2x-feature extractor for initialization (reference builds
            # mpIniORBextractor with 2*nFeatures, Tracking.cc:111,126) —
            # denser features make the two-view bootstrap robust on low
            # texture; the initial keyframes are compacted back to
            # n_features at map creation
            from dataclasses import replace as _dc_replace
            self.init_orb = _dc_replace(
                self.cfg.orb, n_features=2 * self.cfg.orb.n_features)
            self.extractor_init = ORBExtractor(self.init_orb)
        else:
            # oracle-features mode (tests / precomputed pipelines):
            # process(features=...) only
            self.extractor = self.extractor_init = self.init_orb = None
        self.K = np.asarray(self.cfg.camera.K)
        self.K_dev = jnp.asarray(self.K)
        # undistorted image bounds, computed ONCE from the camera model
        # (the reference's mnMinX/mnMaxX/mnMinY/mnMaxY, Frame.cc:321-349):
        # every frustum / fuse / projection gate uses these instead of the
        # raw [0,W)x[0,H) — with barrel distortion (k1<0) undistorted
        # keypoints near the frame edge exceed the raw bounds and edge map
        # points would be wrongly culled
        from orb_slam_tpu.geometry.camera import undistorted_bounds
        _b = undistorted_bounds(self.cfg.camera)
        self.img_bounds = tuple(float(v) for v in _b)
        self._frontend_jit = {}
        self.reset()

    def _frontend(self, gray, init: bool = False):
        """ONE fused device program: extraction + keypoint undistortion
        (per-op dispatch is expensive on the target runtime)."""
        if init not in self._frontend_jit:
            from orb_slam_tpu.utils.dispatch import fused_jit
            from orb_slam_tpu.frontend.orb_extractor import (
                _extract_stacked, _extract,
            )
            cam = self.cfg.camera
            orb_cfg = self.init_orb if init else self.cfg.orb
            extractor = self.extractor_init if init else self.extractor
            if extractor.stacked:
                def fn(img, consts):
                    feats = _extract_stacked(img, consts, config=orb_cfg,
                                             use_pallas=extractor.use_pallas)
                    xy_und = undistort_points(cam, feats.xy)
                    return feats, xy_und
            else:
                def fn(img, consts):
                    feats = _extract(img, config=orb_cfg)
                    xy_und = undistort_points(cam, feats.xy)
                    return feats, xy_und

            self._frontend_jit[init] = fused_jit(fn)
        extractor = self.extractor_init if init else self.extractor
        return self._frontend_jit[init](
            gray, extractor.pyramid_consts(tuple(gray.shape)))

    # ------------------------------------------------------------------ setup

    def reset(self):
        """Full system reset (reference: Tracking::Reset,
        src/Tracking.cc:1026-1094)."""
        cfg = self.cfg
        self.state = NO_IMAGES_YET
        self.map = empty_map(cfg.map)
        self.free_kf = list(range(cfg.map.max_keyframes))
        self.free_pt = list(range(cfg.map.max_points))
        self.kf_order = np.full(cfg.map.max_keyframes, -1, np.int64)
        self.kf_counter = 0
        self.frame_id = 0
        self.last_pose = np.eye(4, dtype=np.float32)
        self.velocity = np.eye(4, dtype=np.float32)
        self.init_ref: Optional[FrameData] = None
        # previous frame + its feature->point bindings, for the
        # TrackPreviousFrame recovery ladder (Tracking.cc:486-552)
        self._prev_frame: Optional[tuple] = None
        self.last_kf_frame = -10**9
        self.last_kf_slot = -1
        self.ref_kf_tracked = 0
        self.trajectory = []  # (frame_id, timestamp, T_cw numpy)
        self.lost_count = 0
        self._rng = jax.random.PRNGKey(cfg.seed)
        self.vocab = cfg.vocabulary
        self.db = None
        self.loop_closer = None
        self.n_loops_closed = 0
        self.n_relocs = 0  # accepted relocalisation events (the reference's
                           # behavioral spec counts these, README.md:150-172)
        # persistent merge-forwarding table (MapPoint::Replace's mpReplaced
        # pointer, MapPoint.cc:124-158): point ids snapshotted OUTSIDE the
        # map (queued async keyframes, buffered counter deltas) are resolved
        # through it at integration time. -1 = id is dead with no successor.
        self.pt_forward = np.arange(self.cfg.map.max_points, dtype=np.int32)
        # local-map candidate mask (UpdateReferencePoints, Tracking.cc:
        # 728-839); None until the first keyframe anchors a local map
        self.local_mask = None

    # --------------------------------------------------------------- frontend

    def make_frame(self, img=None, features=None, timestamp=None) -> FrameData:
        """Build FrameData from an image (full ORB extraction) or from
        oracle features (dict with xy/desc/octave/angle/valid)."""
        ts = self.frame_id / 30.0 if timestamp is None else timestamp
        if features is not None:
            f = FrameData(
                jnp.asarray(features["xy"]),
                jnp.asarray(features["desc"]),
                jnp.asarray(features["octave"]),
                jnp.asarray(features["angle"]),
                jnp.asarray(features["valid"]),
                self.frame_id, ts,
            )
        else:
            gray = to_grayscale(jnp.asarray(img))
            # during initialization extract 2x the features
            # (reference: Tracking.cc:199-202 picks mpIniORBextractor)
            init = self.state in (NO_IMAGES_YET, NOT_INITIALIZED, INITIALIZING)
            feats, xy_und = self._frontend(gray, init=init)
            f = FrameData(xy_und, feats.desc_u32, feats.octave, feats.angle,
                          feats.valid, self.frame_id, ts)
        return f

    # ------------------------------------------------------------------ entry

    def process_batch(self, images, timestamps=None, chunk_size=None):
        """Offline/throughput mode: process frames in fixed-size chunks,
        each chunk ONE device program (vmapped extraction + lax.scan-chained
        tracking — see track_kernels.track_chunk). The host syncs once per
        chunk, inspects per-frame inlier counts, and re-enters mid-chunk
        only at keyframe / lost events (where the reference's tracking loop
        touches shared state, Tracking.cc:168-315). Returns a list of poses
        (None where untracked); results match calling process() per frame.
        Frames before initialization run through the sequential path (they
        use the 2x-feature init extractor, Tracking.cc:199-202)."""
        B = len(images)
        if timestamps is None:
            timestamps = [None] * B
        C = chunk_size or self.cfg.track_chunk_size
        poses = []
        i = 0
        while i < B:
            if self.state != WORKING or C <= 1 or B - i == 1:
                # pre-init / lost / tail: sequential path (init extractor,
                # host-side relocalisation)
                poses.append(self.process(img=images[i],
                                          timestamp=timestamps[i]))
                i += 1
                continue
            n = min(C, B - i)
            feats, xy_und, chunk = self._chunk_extract_track(
                images[i:i + n], C)
            consumed, chunk_poses = self._apply_chunk(
                feats, xy_und, chunk, n, timestamps[i:i + n])
            poses.extend(chunk_poses)
            i += consumed
        return poses

    def _chunk_extract_track(self, images, C):
        """ONE device program: a single lax.scan over frames where each
        step extracts, undistorts AND tracks that frame against the current
        map snapshot. One scan (not vmapped extraction + a tracking scan):
        a vmapped batch streams [C, L, H, W] pyramids through HBM at every
        elementwise op (bandwidth-bound, measured 5.9 ms/frame marginal),
        while the fused scan keeps each frame's pyramid and features hot
        on-chip between extraction and tracking. The image list is padded
        to C by repeating the last frame (fixed compile shape); padded
        outputs are ignored by the caller."""
        from functools import partial as _partial
        from orb_slam_tpu.frontend.orb_extractor import _extract_stacked
        from orb_slam_tpu.pipeline.track_kernels import (
            chunk_track_step, ChunkResult,
        )
        from orb_slam_tpu.utils.dispatch import fused_jit

        imgs_np = [np.asarray(im) for im in images]
        imgs_np += [imgs_np[-1]] * (C - len(imgs_np))
        batch = np.stack(imgs_np)
        shape = tuple(batch.shape[1:])
        key = (shape, C)
        if not hasattr(self, "_chunk_jit"):
            self._chunk_jit = {}
        if key not in self._chunk_jit:
            cfg = self.cfg
            cam = cfg.camera

            def fn(imgs, consts, state, pose0, vel0, pt_mask):
                gray = to_grayscale(imgs)
                extract = _partial(_extract_stacked, config=cfg.orb,
                                   use_pallas=self.extractor.use_pallas)

                # Serial extract-then-track scan. A software-pipelined
                # variant (step i extracts frame i while tracking frame
                # i-1) was measured NEUTRAL on v5e — XLA:TPU executes the
                # fused loop body's ops serially, so there is no
                # coarse-grained extract/track overlap to win (PERF.md
                # round 3) — and it costs extra carry traffic.
                def step(carry, img):
                    f = extract(img, consts)
                    xy_und = undistort_points(cam, f.xy)
                    carry, out = chunk_track_step(
                        state, xy_und, f.desc_u32, f.octave, f.valid,
                        carry, self.K_dev, pt_mask,
                        p_local=cfg.p_local, width=cam.width,
                        height=cam.height, radius=cfg.track_radius,
                        bounds=self.img_bounds,
                        scale_factor=cfg.map.scale_factor,
                        n_levels=cfg.map.n_levels,
                        max_dist=TH_HIGH, min_inliers=cfg.min_track_inliers,
                        use_motion_model=cfg.use_motion_model,
                        retry=False)
                    return carry, (f, xy_und, out)

                _, (feats, xy_und, outs) = jax.lax.scan(
                    step, (pose0, vel0), gray)
                poses, obs, n_in, n_m, vis = outs
                chunk = ChunkResult(poses, obs, n_in, n_m, vis)
                return feats, xy_und, chunk

            self._chunk_jit[key] = fused_jit(fn)
        gray_shape = shape[:2]
        return self._chunk_jit[key](
            jnp.asarray(batch), self.extractor.pyramid_consts(gray_shape),
            self.map, jnp.asarray(self.last_pose), jnp.asarray(self.velocity),
            self._track_mask())

    def _apply_chunk(self, feats, xy_und, chunk, n, ts_list):
        """Host-side replay of the chunk's per-frame results: trajectory,
        velocity, visibility counters, keyframe policy, lost handling —
        byte-for-byte the logic of _track, applied after the fact. Returns
        (frames consumed, poses). Stops early at the first keyframe or lost
        event; the caller re-enters with the updated map."""
        cfg = self.cfg
        cn_in = np.asarray(chunk.n_inliers)
        cposes = np.asarray(chunk.pose)
        cobs = np.asarray(chunk.obs)
        cvis = np.asarray(chunk.visible)
        P = cvis.shape[1]
        vis_sum = np.zeros(P, np.int32)
        found_sum = np.zeros(P, np.int32)
        counters_dirty = False

        def _flush_counters():
            # routed through _apply_counters: AsyncSLAMSystem overrides it
            # to BUFFER deltas for the mapper thread (the sole map writer)
            # instead of mutating self.map from this caller thread
            nonlocal counters_dirty
            if counters_dirty:
                from types import SimpleNamespace
                self._apply_counters(SimpleNamespace(
                    visible_inc=jnp.asarray(vis_sum),
                    found_inc=jnp.asarray(found_sum)))
                counters_dirty = False

        def _frame_data(b, fid, ts):
            return FrameData(
                xy_und[b], feats.desc_u32[b], feats.octave[b],
                feats.angle[b], feats.valid[b], fid, ts)

        poses_out = []
        consumed = n
        for b in range(n):
            fid = self.frame_id
            self.frame_id += 1
            ts = ts_list[b] if ts_list[b] is not None else fid / 30.0
            n_in = int(cn_in[b])
            if n_in < cfg.min_track_inliers:
                # the chunk runs WITHOUT the retry ladder (its cond branch
                # costs ~1.2 ms/frame in-scan even untaken, PERF.md);
                # re-track this frame through the sequential path, which
                # performs the TrackPreviousFrame ladder / LOST /
                # relocalisation / keyframe logic exactly as a non-batched
                # call would (self._prev_frame tracks the replay, so the
                # ladder sees frame b-1)
                _flush_counters()
                T = self._track(_frame_data(b, fid, ts))
                poses_out.append(None if T is None else self.last_pose.copy())
                consumed = b + 1
                return consumed, poses_out

            self.state = WORKING
            T_new = cposes[b]
            vis_sum += cvis[b]
            pids = cobs[b][cobs[b] >= 0]
            np.add.at(found_sum, pids, 1)
            counters_dirty = True
            self._prev_frame = (_frame_data(b, fid, ts), chunk.obs[b])
            self.velocity = (
                T_new @ _np_se3_inverse(self.last_pose)).astype(np.float32)
            self.last_pose = T_new.astype(np.float32)
            self.trajectory.append((fid, ts, self.last_pose.copy()))
            poses_out.append(self.last_pose.copy())

            if self._need_new_keyframe(fid, n_in):
                _flush_counters()
                self._create_keyframe(
                    _frame_data(b, fid, ts), chunk.obs[b], n_in)
                consumed = b + 1
                return consumed, poses_out

        _flush_counters()
        return consumed, poses_out

    def process(self, img=None, features=None, timestamp=None):
        """Process one frame; returns the tracked pose (numpy [4,4]) or
        None while not initialized / lost."""
        frame = self.make_frame(img, features, timestamp)
        self.frame_id += 1

        if self.state in (NO_IMAGES_YET, NOT_INITIALIZED):
            self._first_initialization(frame)
            return None
        if self.state == INITIALIZING:
            ok = self._try_initialize(frame)
            return self.last_pose.copy() if ok else None
        if self.state in (WORKING, LOST):
            return self._track(frame)
        return None

    # --------------------------------------------------------- initialization

    def _first_initialization(self, frame: FrameData):
        """Reference: Tracking::FirstInitialization (src/Tracking.cc:320-338)."""
        if int(jnp.sum(frame.valid)) > self.cfg.min_init_keypoints:
            self.init_ref = frame
            self.state = INITIALIZING

    def _try_initialize(self, frame: FrameData) -> bool:
        """Reference: Tracking::Initialize + CreateInitialMap
        (src/Tracking.cc:341-483)."""
        cfg = self.cfg
        ref = self.init_ref
        if int(jnp.sum(frame.valid)) <= cfg.min_init_keypoints:
            self.state = NOT_INITIALIZED
            self.init_ref = None
            return False

        # SearchForInitialization: 100px window, mutual best, level-0 bias
        # dropped (we match all levels), rotation check on
        gate = window_gate(ref.xy, frame.xy, 100.0)
        idx, dist, ok = match(
            ref.desc, frame.desc, allowed=gate,
            valid_a=ref.valid, valid_b=frame.valid,
            angle_a=ref.angle, angle_b=frame.angle,
            max_dist=TH_LOW, nn_ratio=0.9, mutual=True,
            check_rotation=True, unique=True,
        )
        n_matches = int(jnp.sum(ok))
        if n_matches < cfg.min_init_matches:
            # keep latest frame as new reference (reference resets, we roll)
            self.init_ref = frame
            return False

        self._rng, key = jax.random.split(self._rng)
        res = initialize_two_view(
            ref.xy, frame.xy[idx], ok, self.K_dev, key
        )
        if not bool(res.success):
            return False

        # ---- create initial map ----
        tri = np.asarray(res.is_triangulated)
        pts = np.asarray(res.points3d)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.eye(4, dtype=np.float32)
        T2[:3, :3] = np.asarray(res.R21)
        T2[:3, 3] = np.asarray(res.t21)

        # median-depth scale normalization (Tracking.cc:439-463)
        depths = pts[tri][:, 2]
        if len(depths) < 30:
            return False
        med = float(np.median(depths))
        if med <= 0:
            return False
        inv_med = 1.0 / med
        pts = pts * inv_med
        T2[:3, 3] *= inv_med

        N = cfg.map.n_features
        Nf = int(ref.xy.shape[0])  # 2N with the init extractor
        pt_slots = np.full(Nf, -1, np.int32)
        tri_idx = np.where(tri)[0]
        # cap new points at the free pool and (post-compaction) at N obs/KF
        n_new = min(len(tri_idx), len(self.free_pt), N)
        tri_idx = tri_idx[:n_new]
        slots = [self.free_pt.pop(0) for _ in range(n_new)]
        pt_slots[tri_idx] = slots

        idx_np = np.asarray(idx)
        ok_np = np.asarray(ok)
        point_desc = ref.desc[jnp.asarray(tri_idx)]  # before compaction

        cur_pt = np.full(Nf, -1, np.int32)
        cur_pt[idx_np[tri_idx]] = pt_slots[tri_idx]

        if Nf > N:
            # compact the 2x-feature init frames to the map's N feature
            # slots: keep point-bearing features first, then matched, then
            # any valid detection (Tracking.cc:111,126 builds the init
            # keyframes from the 2x extraction; our fixed-shape keyframe
            # arrays hold the best N of them)
            vr = np.asarray(ref.valid)
            prio_ref = np.where(pt_slots >= 0, 0,
                                np.where(ok_np & vr, 1, np.where(vr, 2, 3)))
            order_ref = np.argsort(prio_ref, kind="stable")[:N]
            vc = np.asarray(frame.valid)
            prio_cur = np.where(cur_pt >= 0, 0, np.where(vc, 2, 3))
            order_cur = np.argsort(prio_cur, kind="stable")[:N]

            def _subset(fr, order):
                o = jnp.asarray(order)
                return FrameData(fr.xy[o], fr.desc[o], fr.octave[o],
                                 fr.angle[o], fr.valid[o], fr.frame_id,
                                 fr.timestamp)

            ref = _subset(ref, order_ref)
            frame = _subset(frame, order_cur)
            obs1 = jnp.asarray(pt_slots[order_ref])
            obs2 = jnp.asarray(cur_pt[order_cur])
        else:
            obs1 = jnp.asarray(pt_slots)
            obs2 = jnp.asarray(cur_pt)

        k1 = self._alloc_kf()
        k2 = self._alloc_kf()
        m = self.map
        m = insert_keyframe(m, k1, jnp.asarray(T1), ref.frame_id, ref.xy,
                            ref.octave, ref.angle, ref.desc, ref.valid,
                            obs1, -1)
        m = insert_keyframe(m, k2, jnp.asarray(T2), frame.frame_id, frame.xy,
                            frame.octave, frame.angle, frame.desc, frame.valid,
                            obs2, k1)
        # add points
        act = jnp.asarray(pt_slots[tri_idx])
        from orb_slam_tpu.slam_map.map_state import add_points
        m = add_points(
            m, act, jnp.asarray(pts[tri_idx]),
            point_desc,
            jnp.full(len(tri_idx), k1, jnp.int32),
            jnp.full(len(tri_idx), k1, jnp.int32),
            jnp.ones(len(tri_idx), bool),
        )
        # global BA on the 2-view map (GlobalBundleAdjustemnt(map, 20))
        cam_opt = jnp.zeros(cfg.map.max_keyframes, bool).at[k2].set(True)
        pt_opt = m.pt_valid
        m, outlier, (okf, ofeat) = bundle_adjust(
            m, self.K_dev, cam_opt, pt_opt, iters1=10, iters2=10,
            mesh=cfg.mesh, max_opt_pts=cfg.max_ba_points or None,
            scale_factor=cfg.map.scale_factor)
        m = apply_edge_outliers(m, outlier, okf, ofeat, kill_starved=False)
        m = refresh_point_stats(m, scale_factor=cfg.map.scale_factor,
                                n_levels=cfg.map.n_levels)
        self.map = m

        self.last_pose = np.asarray(m.kf_pose[k2])
        self.velocity = np.eye(4, dtype=np.float32)
        self.last_kf_frame = frame.frame_id
        self.last_kf_slot = k2
        self.ref_kf_tracked = len(tri_idx)
        self.trajectory.append((ref.frame_id, ref.timestamp, T1.copy()))
        self.trajectory.append(
            (frame.frame_id, frame.timestamp, self.last_pose.copy()))
        self.state = WORKING
        self._refresh_local_mask()
        self._setup_place_recognition(k1, k2, ref, frame)
        return True

    def _setup_place_recognition(self, k1, k2, ref, frame):
        """Build vocabulary (if not provided) + database + loop closer once
        the initial map exists. The reference loads a pre-trained ORBvoc.txt
        (main.cc:94-108); we support that via place.vocabulary.load_text or
        auto-train on the session's first descriptors."""
        cfg = self.cfg
        if not (cfg.enable_loop_closing or cfg.enable_relocalisation):
            return
        from orb_slam_tpu.place import train_vocabulary, KeyFrameDatabase
        from orb_slam_tpu.pipeline.loop_closing import LoopCloser
        if self.vocab is None:
            # the reference loads a pre-trained real-scale vocabulary at
            # startup (main.cc:94-108); ours ships as a compact npz built
            # by scripts/build_vocab.py. Fall back to training a small
            # session vocabulary from the init frames if the artifact is
            # missing.
            from orb_slam_tpu.place.pretrained import load_pretrained
            self.vocab = load_pretrained()
        if self.vocab is None:
            descs = np.concatenate([
                np.asarray(ref.desc)[np.asarray(ref.valid)],
                np.asarray(frame.desc)[np.asarray(frame.valid)],
            ])
            self.vocab = train_vocabulary(descs, k=10, L=3, seed=cfg.seed)
        self.db = KeyFrameDatabase(
            self.vocab, cfg.map.max_keyframes, cfg.bow_slots)
        self.loop_closer = LoopCloser(self.db, cfg)
        for slot, fr in ((k1, ref), (k2, frame)):
            ids, w, _ = self.db.compute_bow(fr.desc, fr.valid)
            self.db.add(slot, ids, w)

    # ---------------------------------------------------------------- tracking

    def _refresh_local_mask(self, ref_kf: int = None):
        """Recompute the local-map candidate mask from the reference KF
        (the last keyframe between keyframe events — the reference votes
        per frame, Tracking.cc:752-757, but the covisible neighborhood of
        the latest KF is the same set until the next map change)."""
        if not self.cfg.track_local_map:
            self.local_mask = None
            return
        ref = self.last_kf_slot if ref_kf is None else ref_kf
        valid = np.asarray(self.map.kf_valid)
        if ref is None or ref < 0 or not valid[ref]:
            # reference was culled/ejected: newest surviving keyframe
            live = np.where(valid)[0]
            if len(live) == 0:
                self.local_mask = None
                return
            ref = int(live[np.argmax(self.kf_order[live])])
        from orb_slam_tpu.slam_map.covisibility import local_point_mask
        self.local_mask = local_point_mask(self.map, jnp.int32(ref))

    def _track_mask(self):
        """Candidate mask for the tracker (pt_valid = unrestricted)."""
        return (self.local_mask if self.local_mask is not None
                else self.map.pt_valid)

    def _track(self, frame: FrameData):
        """Fused motion-model + local-map tracking (SURVEY.md §3.2)."""
        cfg = self.cfg
        # UseMotionModel=0 tracks from the previous pose directly
        # (the reference's TrackPreviousFrame path, Tracking.cc:228-234)
        if cfg.use_motion_model:
            T_pred = (self.velocity @ self.last_pose).astype(np.float32)
        else:
            T_pred = self.last_pose.astype(np.float32)

        res = track_frame(
            self.map, frame.xy, frame.desc, frame.octave, frame.valid,
            jnp.asarray(T_pred), self.K_dev, self._track_mask(),
            p_local=cfg.p_local,
            width=self.cfg.camera.width, height=self.cfg.camera.height,
            radius=cfg.track_radius, bounds=self.img_bounds,
            scale_factor=cfg.map.scale_factor, n_levels=cfg.map.n_levels,
        )
        n_in = int(res.n_inliers)
        if n_in < cfg.min_track_inliers and self._prev_frame is not None:
            # TrackPreviousFrame (Tracking.cc:486-552): recover the pose
            # from frame-to-frame correspondences — works even when the
            # map-side candidate pool is starved — then re-run the fused
            # local-map step from the recovered pose (the reference's
            # TrackLocalMap follow-up, Tracking.cc:245-270)
            from orb_slam_tpu.pipeline.track_kernels import track_prev_frame
            pf, pobs = self._prev_frame
            # bindings were snapshotted before any mapper surgery; route
            # merged/dead ids through the forwarding table (Replace
            # semantics) — rare path, host gather is fine
            pobs_np = np.asarray(pobs)
            live = pobs_np >= 0
            pobs_np = np.where(live, self.pt_forward[np.clip(pobs_np, 0,
                               len(self.pt_forward) - 1)], -1)
            pobs = jnp.asarray(pobs_np)
            coarse = ((cfg.map.n_levels - 1) // 2 + 1
                      if self.n_keyframes > 5 else 0)
            T_rec, _, n_rec = track_prev_frame(
                self.map, pf.xy, pf.desc, pf.octave, pf.angle, pobs,
                frame.xy, frame.desc, frame.octave, frame.angle,
                frame.valid, jnp.asarray(self.last_pose), self.K_dev,
                jnp.int32(coarse),
                width=cfg.camera.width, height=cfg.camera.height,
                scale_factor=cfg.map.scale_factor,
                n_levels=cfg.map.n_levels)
            if int(n_rec) >= 10:
                res = track_frame(
                    self.map, frame.xy, frame.desc, frame.octave,
                    frame.valid, T_rec, self.K_dev, self._track_mask(),
                    p_local=cfg.p_local,
                    width=cfg.camera.width, height=cfg.camera.height,
                    radius=cfg.track_radius, bounds=self.img_bounds,
                    scale_factor=cfg.map.scale_factor,
                    n_levels=cfg.map.n_levels,
                )
                n_in = int(res.n_inliers)
        if n_in < cfg.min_track_inliers:
            # last rung: re-match the MAP with a wider window from the
            # unmoved pose (no reference analog; catches motion-model
            # overshoot when the previous frame itself was weak)
            res = track_frame(
                self.map, frame.xy, frame.desc, frame.octave, frame.valid,
                jnp.asarray(self.last_pose), self.K_dev, self._track_mask(),
                p_local=cfg.p_local,
                width=self.cfg.camera.width, height=self.cfg.camera.height,
                radius=cfg.track_radius * 2.0, bounds=self.img_bounds,
                scale_factor=cfg.map.scale_factor, n_levels=cfg.map.n_levels,
            )
            n_in = int(res.n_inliers)

        if n_in < cfg.min_track_inliers:
            self.state = LOST
            self.lost_count += 1
            self._prev_frame = None
            self.velocity = np.eye(4, dtype=np.float32)
            # auto-reset if lost soon after init (Tracking.cc:272-279)
            if self.n_keyframes <= 5 and self.kf_counter <= 5:
                self.reset()
                return None
            if cfg.enable_relocalisation and self.db is not None:
                if self._relocalize(frame):
                    return self.last_pose.copy()
            return None

        self.state = WORKING
        T_new = np.asarray(res.pose)
        self._apply_counters(res)
        # retain this frame + bindings as mLastFrame for the
        # TrackPreviousFrame ladder
        self._prev_frame = (frame, res.obs)
        # motion model: velocity = T_new @ inv(T_last)  (Tracking.cc:282-295)
        self.velocity = (T_new @ _np_se3_inverse(self.last_pose)).astype(np.float32)
        self.last_pose = T_new
        self.trajectory.append((frame.frame_id, frame.timestamp, T_new.copy()))

        if self._need_new_keyframe(frame.frame_id, n_in):
            self._create_keyframe(frame, res.obs, n_in)
        return T_new

    def _apply_counters(self, res):
        """Visibility statistics (MapPoint::IncreaseVisible/Found). In the
        async pipeline this buffers deltas instead (single map writer)."""
        self.map = self.map._replace(
            pt_visible=self.map.pt_visible + res.visible_inc,
            pt_found=self.map.pt_found + res.found_inc,
        )

    def _mapper_accepting(self) -> bool:
        """SetAcceptKeyFrames backpressure (LocalMapping.cc:507-517). The
        sequential pipeline runs the mapper to completion inside the frame
        step, so the reference's 'busy' signal (which throttles c1b keyframe
        creation for the several frames LocalMapping takes per KF) is modeled
        as a fixed latency after each insertion."""
        return (self.frame_id - self.last_kf_frame
                >= self.cfg.mapper_latency_frames)

    def _need_new_keyframe(self, frame_id: int, n_inliers: int) -> bool:
        """Reference policy c1a/c1b/c2 (src/Tracking.cc:625-663)."""
        cfg = self.cfg
        if not self.free_pt or not self.free_kf:
            return False
        since = frame_id - self.last_kf_frame
        c1a = since >= cfg.max_frames_between_kf
        c1b = since >= cfg.min_frames_between_kf and self._mapper_accepting()
        # c2: tracking degraded vs the reference keyframe
        # (Tracking.cc:650). The reference compares against the ref KF's
        # LIVE bound-point count, which (given its ~90% re-match rate)
        # fires when tracking drops ~10%; our dense one-pass tracker
        # re-matches a smaller fraction of bound points, so the faithful
        # analog is the at-creation inlier count. An absolute low-inlier
        # clause densifies the map before tracking starves (the paper's
        # insert-early/cull-later policy).
        degraded = n_inliers < self.ref_kf_tracked * cfg.kf_tracked_ratio
        starving = n_inliers < 2 * cfg.min_track_inliers
        c2 = (degraded or starving) and n_inliers > 15
        return (c1a or c1b) and c2

    # ----------------------------------------------------------- local mapping

    def _alloc_kf(self) -> int:
        slot = self.free_kf.pop(0)
        self.kf_order[slot] = self.kf_counter
        self.kf_counter += 1
        return slot

    def _create_keyframe(self, frame: FrameData, obs, n_inliers: int):
        """Tracker-side keyframe decision; dispatch to the mapper
        (synchronous in the base system; queued in AsyncSLAMSystem)."""
        self.last_kf_frame = frame.frame_id
        self.ref_kf_tracked = n_inliers
        self._dispatch_keyframe(frame, obs, n_inliers, self.last_pose.copy())

    def _dispatch_keyframe(self, frame: FrameData, obs, n_inliers: int, pose):
        """Sequential mode: run the whole mapping pipeline inline."""
        self._integrate_keyframe(frame, obs, n_inliers, pose)

    def _integrate_keyframe(self, frame: FrameData, obs, n_inliers: int,
                            pose=None, abort=None):
        """KF insertion + the LocalMapping pipeline + loop closing
        (reference: Tracking::CreateNewKeyFrame + LocalMapping::Run body +
        LoopClosing::Run body, SURVEY.md §3.3-3.4). `abort` is an optional
        callable polled between stages — the InterruptBA semantics
        (LocalMapping.cc:519-522)."""
        if pose is None:
            pose = self.last_pose
        obs = self._resolve_obs(obs)
        slot = self._alloc_kf()
        m = insert_keyframe(
            self.map, slot, jnp.asarray(pose), frame.frame_id,
            frame.xy, frame.octave, frame.angle, frame.desc, frame.valid,
            obs, self.last_kf_slot,
        )
        self.map = m
        self.last_kf_slot = slot
        self._local_mapping(slot, abort=abort)
        if (self.cfg.enable_loop_closing and self.loop_closer is not None
                and bool(self.map.kf_valid[slot])):
            # LocalMapping pushes the processed KF to LoopClosing
            # (LocalMapping.cc:87); sequential mode runs it inline, the
            # async system queues it to a dedicated loop thread
            self._run_loop_closing(slot)
        elif self.db is not None and bool(self.map.kf_valid[slot]):
            ids, w, _ = self.db.compute_bow(frame.desc, frame.valid)
            self.db.add(slot, ids, w)
        return slot

    def _run_loop_closing(self, slot: int):
        """Sequential mode: full loop-closing pass inline (detect registers
        the KF's BoW in the database as a side effect)."""
        if self.loop_closer.process(self, slot):
            self.n_loops_closed += 1
            # map deformed: the tracker re-anchors on the corrected local
            # neighborhood (the reference's ForceRelocalisation analog)
            self._refresh_local_mask(slot)

    def _relocalize(self, frame: FrameData) -> bool:
        """Relocalisation ladder (reference: Tracking::Relocalisation,
        src/Tracking.cc:841-1010): BoW candidates -> dense match vs
        candidate KF's bound points -> batched EPnP RANSAC ->
        pose optimization -> accept at >= min_reloc_inliers, then one
        guided track_frame pass re-anchors the tracker."""
        from orb_slam_tpu.solvers.epnp import epnp_ransac
        from orb_slam_tpu.solvers.pose_opt import pose_optimize
        cfg = self.cfg
        m = self.map
        P = m.pt_valid.shape[0]
        ids, w, _ = self.db.compute_bow(frame.desc, frame.valid)
        W_np = np.asarray(covisibility_weights(m))
        cands = self.db.detect_relocalisation_candidates(ids, w, W_np)
        for cand in cands[:5]:
            bound = (m.kf_obs[cand] >= 0) & m.kf_feat_valid[cand]
            idx, dist, ok = match(
                frame.desc, m.kf_desc[cand],
                valid_a=frame.valid, valid_b=bound,
                max_dist=TH_LOW, nn_ratio=0.75, unique=True,
            )
            if int(jnp.sum(ok)) < 15:
                continue
            pids = m.kf_obs[cand][idx]
            ok = ok & (pids >= 0)
            pid_s = jnp.clip(pids, 0, P - 1)
            ok = ok & m.pt_valid[pid_s]
            pw = m.pt_pos[pid_s]
            inv_s2 = 1.0 / (cfg.map.scale_factor
                            ** (2.0 * frame.octave.astype(jnp.float32)))
            self._rng, key = jax.random.split(self._rng)
            R, t, inl, n_in = epnp_ransac(
                pw, frame.xy, ok, inv_s2, self.K_dev, key)
            if int(n_in) < 10:
                continue
            T0 = np.eye(4, dtype=np.float32)
            T0[:3, :3] = np.asarray(R)
            T0[:3, 3] = np.asarray(t)
            T_opt, inlier, n_opt = pose_optimize(
                jnp.asarray(T0), pw, frame.xy, inv_s2, inl, self.K_dev)
            if int(n_opt) < 10:
                continue
            # guided refinement ladder (Tracking.cc:948-995): a wide
            # projection search (window 10, ORBdist 100), and if inliers
            # land in [30, 50) a second narrower+stricter round
            # (window 3, ORBdist 64), each followed by pose optimization
            res = track_frame(
                m, frame.xy, frame.desc, frame.octave, frame.valid,
                T_opt, self.K_dev, p_local=cfg.p_local,
                width=cfg.camera.width, height=cfg.camera.height,
                radius=10.0, max_dist=100, bounds=self.img_bounds,
                scale_factor=cfg.map.scale_factor, n_levels=cfg.map.n_levels)
            n_good = int(res.n_inliers)
            if 30 <= n_good < cfg.min_reloc_inliers:
                res2 = track_frame(
                    m, frame.xy, frame.desc, frame.octave, frame.valid,
                    res.pose, self.K_dev, p_local=cfg.p_local,
                    width=cfg.camera.width, height=cfg.camera.height,
                    radius=3.0, max_dist=64, bounds=self.img_bounds,
                    scale_factor=cfg.map.scale_factor,
                    n_levels=cfg.map.n_levels)
                if int(res2.n_inliers) > n_good:
                    res, n_good = res2, int(res2.n_inliers)
            if n_good >= cfg.min_reloc_inliers:
                self.last_pose = np.asarray(res.pose)
                self.velocity = np.eye(4, dtype=np.float32)
                self.state = WORKING
                self.n_relocs += 1
                # re-anchor the local map on the reloc keyframe's
                # neighborhood (Tracking.cc:851-858)
                self._refresh_local_mask(int(cand))
                self.trajectory.append(
                    (frame.frame_id, frame.timestamp, self.last_pose.copy()))
                return True
        return False

    def _local_mapping(self, new_kf: int, abort=None):
        cfg = self.cfg
        m = self.map
        aborted = lambda: abort is not None and abort()

        # --- covisibility + spanning parent (ProcessNewKeyFrame) ---
        W = covisibility_weights(m)
        W_np = np.asarray(W)
        order = np.argsort(-W_np[new_kf])
        neighbors = [int(k) for k in order if W_np[new_kf, k] >= 15
                     and bool(m.kf_valid[k]) and k != new_kf]
        if neighbors:
            m = m._replace(
                spanning_parent=m.spanning_parent.at[new_kf].set(neighbors[0]))

        # --- MapPointCulling (LocalMapping.cc:175-203) ---
        ratio, n_obs, _ = point_cull_stats(m, self.kf_counter)
        ratio, n_obs = np.asarray(ratio), np.asarray(n_obs)
        first = np.asarray(m.pt_first_kf)
        first_order = np.where(first >= 0, self.kf_order[np.clip(first, 0, None)], -1)
        age = self.kf_counter - first_order
        valid = np.asarray(m.pt_valid)
        # the found-ratio test only applies to RECENT points: the reference
        # erases points from the culling candidate list once they survive
        # ~3 KFs (LocalMapping.cc:175-203), so mature points that go
        # temporarily unmatched (occlusion) are never ratio-culled
        kill = valid & (
            ((age <= 3) & (ratio < 0.25))
            | ((age >= 2) & (age <= 3) & (n_obs <= 2))
        )
        if kill.any():
            dbg(f"kf{new_kf}: point-cull {int(kill.sum())}")
            m = remove_points(m, jnp.asarray(kill))
            self.free_pt.extend(int(i) for i in np.where(kill)[0])
            self.free_pt = sorted(set(self.free_pt))

        # --- CreateNewMapPoints with top covisible neighbors ---
        # Baseline gate (reference: LocalMapping.cc:230-235): skip neighbors
        # whose baseline / median scene depth < 0.01 — they cannot
        # triangulate. Without this, slow motion wastes the whole neighbor
        # budget on zero-parallax pairs.
        poses_np = np.asarray(m.kf_pose)
        pos_np = np.asarray(m.pt_pos)
        obs_new = np.asarray(m.kf_obs[new_kf])
        bound_pts = pos_np[obs_new[obs_new >= 0]]
        if len(bound_pts):
            pc = bound_pts @ poses_np[new_kf][:3, :3].T + poses_np[new_kf][:3, 3]
            median_depth = max(float(np.median(pc[:, 2])), 1e-6)
        else:
            median_depth = 1.0
        C_new = -poses_np[new_kf][:3, :3].T @ poses_np[new_kf][:3, 3]
        tri_neighbors = []
        for nb in neighbors:
            C_nb = -poses_np[nb][:3, :3].T @ poses_np[nb][:3, 3]
            if np.linalg.norm(C_new - C_nb) / median_depth > 0.01:
                tri_neighbors.append(nb)
            if len(tri_neighbors) >= cfg.n_triangulation_neighbors:
                break
        for nb in tri_neighbors:
            if not self.free_pt or aborted():
                break
            cand = triangulate_new_points(
                m, new_kf, nb, self.K_dev,
                scale_factor=cfg.map.scale_factor)
            n_free = min(len(self.free_pt), 512)
            free = np.full(512, -1, np.int32)
            free[:n_free] = self.free_pt[:n_free]
            m, n_created = insert_new_points(
                m, new_kf, nb, cand, jnp.asarray(free))
            n_created = int(n_created)
            if n_created:
                # recycled slots hold NEW points now: forwarding entries
                # still aimed at them are stale and must die, and the slots
                # themselves become live identities again
                reused = np.asarray(self.free_pt[:n_created])
                stale = np.isin(self.pt_forward, reused)
                stale[reused] = False
                self.pt_forward[stale] = -1
                self.pt_forward[reused] = reused
            dbg(f"kf{new_kf}: triangulated {n_created} with kf{nb}")
            if n_created:
                self.free_pt = self.free_pt[n_created:]

        # --- SearchInNeighbors: two-way fuse (LocalMapping.cc:373-450) ---
        # target set = first neighbors + 5 second-order covisibles of each
        # (LocalMapping.cc:379-395), deduplicated
        fuse_targets = []
        seen_t = {new_kf}
        for nb in neighbors[: cfg.n_fuse_neighbors]:
            if nb not in seen_t:
                fuse_targets.append(nb)
                seen_t.add(nb)
            order2 = np.argsort(-W_np[nb])
            n2 = 0
            for k2 in order2:
                if n2 >= cfg.n_fuse_second_neighbors:
                    break
                k2 = int(k2)
                if W_np[nb, k2] < 15 or not bool(m.kf_valid[k2]):
                    continue
                n2 += 1
                if k2 not in seen_t:
                    fuse_targets.append(k2)
                    seen_t.add(k2)
        for nb in fuse_targets:
            m, b1, g1, remap1 = fuse_into_keyframe(
                m, new_kf, nb, self.K_dev,
                width=cfg.camera.width, height=cfg.camera.height,
                scale_factor=cfg.map.scale_factor,
                n_levels=cfg.map.n_levels, bounds=self.img_bounds)
            m, b2, g2, remap2 = fuse_into_keyframe(
                m, nb, new_kf, self.K_dev,
                width=cfg.camera.width, height=cfg.camera.height,
                scale_factor=cfg.map.scale_factor,
                n_levels=cfg.map.n_levels, bounds=self.img_bounds)
            self._compose_forward(remap1)
            self._compose_forward(remap2)
            if DEBUG:
                dbg(f"kf{new_kf}<->kf{nb}: fuse bound {int(b1)}+{int(b2)} "
                    f"merged {int(g1)}+{int(g2)}")
        self._reclaim_points(m)

        m = refresh_point_stats(m, scale_factor=cfg.map.scale_factor,
                                n_levels=cfg.map.n_levels)

        # --- Local BA (Optimizer.cc:287-536) ---
        ba_window = cfg.local_ba_window or len(neighbors)
        if cfg.max_ba_cams:
            ba_window = min(ba_window, cfg.max_ba_cams - 1)
        local = [new_kf] + neighbors[:ba_window]
        cam_opt_np = np.zeros(cfg.map.max_keyframes, bool)
        cam_opt_np[local] = True
        # gauge: keep the two oldest keyframes fixed
        order_vals = self.kf_order.copy()
        fixed_gauge = np.argsort(np.where(order_vals >= 0, order_vals, 10**9))[:2]
        cam_opt_np[fixed_gauge] = False
        cam_opt = jnp.asarray(cam_opt_np) & m.kf_valid
        # points seen by local KFs
        local_pts_mask = np.zeros(cfg.map.max_points, bool)
        obs_np = np.asarray(m.kf_obs[np.asarray(local)])
        bound = obs_np[obs_np >= 0]
        local_pts_mask[bound] = True
        pt_opt = jnp.asarray(local_pts_mask) & m.pt_valid
        # Local BA in two abortable phases (g2o's setForceStopFlag semantics,
        # Optimizer.cc:351-352): a newly queued keyframe interrupts phase 2.
        ba_kl = cfg.max_ba_cams or None
        ba_pl = cfg.max_ba_points or None
        m, outlier, (okf, ofeat) = bundle_adjust(
            m, self.K_dev, cam_opt, pt_opt, iters1=5, iters2=0,
            mesh=cfg.mesh, max_opt_cams=ba_kl, max_opt_pts=ba_pl,
            scale_factor=cfg.map.scale_factor)
        if DEBUG:
            dbg(f"kf{new_kf}: BA1 outlier-edges {int(jnp.sum(outlier))} "
                f"valid {int(jnp.sum(m.pt_valid))}")
        m = apply_edge_outliers(m, outlier, okf, ofeat)
        if DEBUG:
            dbg(f"kf{new_kf}: after BA1 eject valid {int(jnp.sum(m.pt_valid))}")
        if not aborted():
            m, outlier, (okf, ofeat) = bundle_adjust(
                m, self.K_dev, cam_opt, pt_opt, iters1=0, iters2=10,
                mesh=cfg.mesh, max_opt_cams=ba_kl, max_opt_pts=ba_pl,
                scale_factor=cfg.map.scale_factor)
            if DEBUG:
                dbg(f"kf{new_kf}: BA2 outlier-edges {int(jnp.sum(outlier))}")
            m = apply_edge_outliers(m, outlier, okf, ofeat)
            if DEBUG:
                dbg(f"kf{new_kf}: after BA2 eject valid {int(jnp.sum(m.pt_valid))}")
        self._reclaim_points(m)

        # --- KeyFrameCulling (LocalMapping.cc:524-578): the reference
        # scans ALL covisible keyframes of the new KF ---
        for nb in neighbors:
            if self.kf_order[nb] < 2:
                continue  # never cull the gauge keyframes
            red, n_bound = keyframe_redundancy(m, nb)
            if float(red) > cfg.kf_cull_redundancy and int(n_bound) > 20:
                dbg(f"kf{new_kf}: culling redundant kf{nb} (red={float(red):.2f})")
                m = remove_keyframe(m, nb)
                m = self._repair_spanning_tree(m, nb)
                self.free_kf.append(nb)
                self.kf_order[nb] = -1
                if self.db is not None:
                    self.db.erase(nb)

        self.map = refresh_point_stats(m, scale_factor=cfg.map.scale_factor,
                                       n_levels=cfg.map.n_levels)
        self._refresh_local_mask(new_kf if bool(self.map.kf_valid[new_kf])
                                 else None)
        self._publish_mapped_pose(new_kf)

    def _publish_mapped_pose(self, new_kf: int):
        """Sequential mode: the tracker adopts the BA-refined keyframe pose.
        Async mode overrides (the tracker has moved on; corrections flow
        through the shared map like the reference's map-deformation +
        ForceRelocalisation path)."""
        self.last_pose = np.asarray(self.map.kf_pose[new_kf])

    def _compose_forward(self, remap):
        """Fold a fuse merge remap ([P] i32, -1 = dead end) into the
        persistent forwarding table."""
        r = np.asarray(remap)
        f = self.pt_forward
        ok = f >= 0
        f[ok] = r[f[ok]]
        self.pt_forward = f

    def _resolve_obs(self, obs):
        """Resolve possibly-stale feature->point bindings through the
        forwarding table + current validity (the reference's pointer chase
        through mpReplaced followed by isBad(), Tracking.cc:300-317 analog
        for queued keyframes)."""
        obs_np = np.asarray(obs)
        P = self.pt_forward.shape[0]
        tgt = np.where(obs_np >= 0,
                       self.pt_forward[np.clip(obs_np, 0, P - 1)], -1)
        pt_valid = np.asarray(self.map.pt_valid)
        live = (tgt >= 0) & pt_valid[np.clip(tgt, 0, P - 1)]
        return jnp.asarray(np.where(live, tgt, -1).astype(np.int32))

    def _reclaim_points(self, m: MapState):
        """Recompute the point free list from validity (slots freed by
        culling/fuse-merge return to the pool — pt_valid is authoritative)."""
        valid = np.asarray(m.pt_valid)
        self.free_pt = [int(i) for i in np.where(~valid)[0]]

    def _repair_spanning_tree(self, m: MapState, removed_kf: int):
        """Re-parent the children of a culled keyframe with the reference's
        greedy candidate loop (KeyFrame::SetBadFlag, KeyFrame.cc:497-588):
        candidates start as {old parent}; repeatedly attach the child with
        the strongest covisibility link to any candidate, promoting it to a
        candidate; leftovers fall back to the old parent. Inherently
        sequential -> host-side (SURVEY.md §7 hard-part 1)."""
        parent = int(m.spanning_parent[removed_kf])
        sp = np.asarray(m.spanning_parent)
        children = set(int(c) for c in np.where(sp == removed_kf)[0])
        if not children:
            return m
        spn = np.array(sp)
        if parent >= 0:
            W = np.asarray(covisibility_weights(m))
            candidates = {parent}
            while children:
                best_w, best_child, best_parent = 0, -1, -1
                for c in children:
                    for p in candidates:
                        if W[c, p] > best_w:
                            best_w, best_child, best_parent = W[c, p], c, p
                if best_child < 0:
                    break  # no covisibility link left; fall back below
                spn[best_child] = best_parent
                candidates.add(best_child)
                children.remove(best_child)
        for c in children:
            spn[c] = parent
        return m._replace(spanning_parent=jnp.asarray(spn))

    # ------------------------------------------------------------------ output

    def keyframe_trajectory(self):
        """TUM-format keyframe trajectory rows (reference writes
        KeyFrameTrajectory.txt at shutdown, src/main.cc:160-185)."""
        from orb_slam_tpu.geometry import rot_to_quat, se3_inverse
        rows = []
        kf_valid = np.asarray(self.map.kf_valid)
        order = np.argsort(self.kf_order)
        for slot in order:
            if self.kf_order[slot] < 0 or not kf_valid[slot]:
                continue
            T_cw = np.asarray(self.map.kf_pose[slot])
            T_wc = np.asarray(se3_inverse(jnp.asarray(T_cw)))
            q = np.asarray(rot_to_quat(jnp.asarray(T_wc[:3, :3])))
            t = T_wc[:3, 3]
            fid = int(np.asarray(self.map.kf_frame_id[slot]))
            rows.append((fid, t, q))
        return rows

    @property
    def n_keyframes(self):
        return int(jnp.sum(self.map.kf_valid))

    @property
    def n_points(self):
        return int(jnp.sum(self.map.pt_valid))
