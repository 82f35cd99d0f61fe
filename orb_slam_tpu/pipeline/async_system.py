"""AsyncSLAMSystem: the reference's multi-threaded pipeline, lock-light.

The reference runs Tracking / LocalMapping / LoopClosing as 3 OS threads
coordinated by a dozen mutexes, queues and flags (SURVEY.md §2.3). Because
our MapState is an immutable pytree, the same concurrency collapses to a
single-writer design:

  * the TRACKER (caller thread) only READS `self.map` — a plain reference
    read of an immutable snapshot; its side effects (visibility counters)
    are buffered as deltas;
  * the MAPPER thread is the only map writer: it drains the keyframe queue
    (the reference's mlNewKeyFrames, LocalMapping.cc:108-129), runs local
    mapping + loop closing, merges the tracker's counter deltas and
    publishes the new snapshot with one atomic reference assignment.

Reference protocol parity:
  * InterruptBA: enqueueing a keyframe sets an abort event polled between
    local-BA phases (LocalMapping.cc:112,519-522 / Optimizer.cc:351-352);
  * SetAcceptKeyFrames backpressure: _mapper_accepting() is False while the
    queue is non-empty (LocalMapping.cc:507-517) so c1b defers to c1a;
  * Stop/Release: request_stop()/release() park the mapper so an external
    agent may mutate the map exclusively (LocalMapping.cc:471-517) — loop
    closing itself runs inside the mapper thread, so its map surgery is
    naturally exclusive."""

from __future__ import annotations

import queue
import threading
import time

import jax.numpy as jnp
import numpy as np

from orb_slam_tpu.pipeline.system import SLAMSystem, FrameData


class AsyncSLAMSystem(SLAMSystem):
    def __init__(self, cfg=None):
        self._lock = threading.Lock()
        self._kf_queue: queue.Queue = queue.Queue()
        self._abort_ba = threading.Event()
        self._stop_requested = threading.Event()
        self._stopped = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self._pending_deltas = []
        self._shutdown = False
        self._mapper_error = None
        super().__init__(cfg)
        self._thread = threading.Thread(target=self._mapper_loop, daemon=True)
        self._thread.start()

    # ------------------------------------------------------------- overrides

    def _apply_counters(self, res):
        with self._lock:
            self._pending_deltas.append((res.visible_inc, res.found_inc))

    def _mapper_accepting(self) -> bool:
        return self._kf_queue.empty() and self._idle.is_set()

    def _dispatch_keyframe(self, frame: FrameData, obs, n_inliers: int, pose):
        self._abort_ba.set()  # InterruptBA
        self._kf_queue.put((frame, obs, n_inliers, pose))

    def _publish_mapped_pose(self, new_kf: int):
        pass  # tracker owns last_pose in async mode

    # ----------------------------------------------------------- mapper loop

    def _merge_pending(self):
        with self._lock:
            deltas, self._pending_deltas = self._pending_deltas, []
        if not deltas:
            return
        # deltas were snapshotted against an older map: route each point's
        # credit through the merge-forwarding table (IncreaseVisible/Found
        # follow the Replace pointer in the reference, MapPoint.cc:141-148)
        f = self.pt_forward
        ok = f >= 0
        P = f.shape[0]
        vis_sum = np.zeros(P, np.int32)
        fnd_sum = np.zeros(P, np.int32)
        for vis, fnd in deltas:
            v, fd = np.asarray(vis), np.asarray(fnd)
            np.add.at(vis_sum, f[ok], v[ok])
            np.add.at(fnd_sum, f[ok], fd[ok])
        m = self.map
        self.map = m._replace(
            pt_visible=m.pt_visible + jnp.asarray(vis_sum),
            pt_found=m.pt_found + jnp.asarray(fnd_sum))

    def _mapper_loop(self):
        while not self._shutdown:
            if self._stop_requested.is_set():
                self._stopped.set()
                time.sleep(0.02)  # parked; the set event returns immediately
                continue
            self._stopped.clear()
            try:
                item = self._kf_queue.get(timeout=0.02)
            except queue.Empty:
                self._idle.set()
                continue
            self._idle.clear()
            self._abort_ba.clear()
            frame, obs, n_inliers, pose = item
            try:
                self._merge_pending()
                self._integrate_keyframe(
                    frame, obs, n_inliers, pose=pose,
                    abort=lambda: self._abort_ba.is_set(),
                )
            except Exception as e:  # surface in finish()
                self._mapper_error = e
            if self._kf_queue.empty():
                self._idle.set()

    # ---------------------------------------------------------- control plane

    def request_stop(self):
        """Park the mapper (LocalMapping::RequestStop + Stop)."""
        self._stop_requested.set()
        self._stopped.wait(timeout=30.0)

    def release(self):
        """Resume the mapper and drop queued keyframes
        (LocalMapping::Release clears the queue, LocalMapping.cc:507-517)."""
        while not self._kf_queue.empty():
            try:
                self._kf_queue.get_nowait()
            except queue.Empty:
                break
        self._stop_requested.clear()

    def finish(self, timeout: float = 120.0):
        """Drain the queue and wait for the mapper to go idle."""
        import time

        t0 = time.time()
        while not (self._kf_queue.empty() and self._idle.is_set()):
            if time.time() - t0 > timeout:
                raise TimeoutError("mapper did not drain")
            time.sleep(0.01)
        self._merge_pending()
        if self._mapper_error is not None:
            raise self._mapper_error

    def close(self):
        self._shutdown = True
        self._thread.join(timeout=10.0)

    def reset(self):
        """Reset protocol (Tracking::Reset, src/Tracking.cc:1026-1094):
        stop the mapper, clear queues, rebuild state, release."""
        if hasattr(self, "_thread") and self._thread.is_alive():
            self.request_stop()
            self.release()
        with getattr(self, "_lock", threading.Lock()):
            self._pending_deltas = []
        super().reset()
