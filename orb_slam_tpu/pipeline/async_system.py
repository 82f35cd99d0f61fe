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
    agent may mutate the map exclusively (LocalMapping.cc:471-517);
  * LOOP CLOSING runs on its own thread (the reference's thread 3,
    LoopClosing.cc:56-81): the mapper queues processed keyframes to it
    (LocalMapping.cc:87); detection + Sim3 run against immutable map
    snapshots concurrently with mapping; on a verified loop the loop
    thread parks the mapper (RequestStop, LoopClosing.cc:401-406),
    becomes the exclusive writer for CorrectLoop's map surgery, then
    Release()s. The BoW database is shared by both threads under its own
    lock (the reference's KeyFrameDatabase::mMutex)."""

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
        # owner of the stop/release park window: the loop thread's exclusive
        # correction window and tracker-side reset() both park the mapper;
        # without an owner, a reset's release() could un-park the mapper in
        # the middle of a loop correction (two concurrent map writers)
        self._park_lock = threading.Lock()
        self._stopped = threading.Event()
        self._idle = threading.Event()
        self._idle.set()
        self._pending_deltas = []
        self._shutdown = False
        self._mapper_error = None
        self._loop_queue: queue.Queue = queue.Queue()
        self._loop_idle = threading.Event()
        self._loop_idle.set()
        self._loop_wants_park = False
        self._loop_error = None
        super().__init__(cfg)
        self._thread = threading.Thread(target=self._mapper_loop, daemon=True)
        self._thread.start()
        # the loop thread starts immediately and waits on its queue; items
        # only arrive after initialization has built the LoopCloser
        self._loop_thread = None
        if self.cfg.enable_loop_closing:
            self._loop_thread = threading.Thread(
                target=self._loop_loop, daemon=True)
            self._loop_thread.start()

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

    # ------------------------------------------------------------ loop thread

    def _run_loop_closing(self, slot: int):
        """Queue the processed keyframe to the loop thread (the reference's
        LoopClosing::InsertKeyFrame, LocalMapping.cc:87)."""
        self._loop_idle.clear()
        self._loop_queue.put(slot)

    def _loop_loop(self):
        """LoopClosing::Run (LoopClosing.cc:56-81): poll the queue, run
        detection + Sim3 against the current (immutable) map snapshot; on a
        verified loop, park the mapper and perform the correction as the
        exclusive map writer."""
        while not self._shutdown:
            try:
                slot = self._loop_queue.get(timeout=0.02)
            except queue.Empty:
                self._loop_idle.set()
                continue
            try:
                lc = self.loop_closer
                if lc is None or not bool(self.map.kf_valid[slot]):
                    continue
                candidates, ids, w = lc.detect(self, slot)
                if not candidates:
                    continue
                hit = lc.compute_sim3(self, slot, candidates)
                if hit is None:
                    continue
                cand, S12, inl = hit
                # CorrectLoop under an exclusive-writer window
                # (LoopClosing.cc:401-406 stop ... 550 release). The
                # reference spin-waits until LocalMapping actually parks;
                # a long-running integration must complete first. The park
                # window is OWNED (park lock): a concurrent tracker reset()
                # must wait for the correction to finish instead of
                # un-parking the mapper mid-surgery.
                self._loop_wants_park = True
                try:
                    while not self._park_lock.acquire(timeout=0.5):
                        if self._shutdown:
                            break
                finally:
                    self._loop_wants_park = False
                if self._shutdown:
                    break
                self._stop_requested.set()
                while not self._stopped.wait(timeout=1.0):
                    if self._shutdown:
                        break
                if self._shutdown:
                    self._stop_requested.clear()
                    self._park_lock.release()
                    break
                try:
                    if bool(self.map.kf_valid[slot]) and bool(
                            self.map.kf_valid[cand]):
                        if lc.correct(self, slot, cand, S12):
                            self.n_loops_closed += 1
                            # post-correction the loop area is covisible;
                            # re-anchor the tracker's local map there
                            self._refresh_local_mask(slot)
                finally:
                    self._release_parked()
                    self._park_lock.release()
            except Exception as e:  # surface in finish()
                self._loop_error = e
            finally:
                if self._loop_queue.empty():
                    self._loop_idle.set()

    # ---------------------------------------------------------- control plane

    def request_stop(self):
        """Park the mapper (LocalMapping::RequestStop + Stop). Blocks until
        any current park-window owner (e.g. an in-flight loop correction)
        releases — the caller becomes the new owner and must call
        release()."""
        self._park_lock.acquire()
        self._stop_requested.set()
        self._stopped.wait(timeout=30.0)

    def _release_parked(self):
        """Resume the mapper and drop queued keyframes
        (LocalMapping::Release clears the queue, LocalMapping.cc:507-517).
        Caller must own the park window."""
        while not self._kf_queue.empty():
            try:
                self._kf_queue.get_nowait()
            except queue.Empty:
                break
        self._stop_requested.clear()

    def release(self):
        """Public counterpart of request_stop(): resume the mapper and give
        up park-window ownership."""
        self._release_parked()
        try:
            self._park_lock.release()
        except RuntimeError:
            pass  # not owned (defensive: release without request_stop)

    def finish(self, timeout: float = 120.0):
        """Drain both queues and wait for the mapper + loop threads to go
        idle."""
        import time

        t0 = time.time()
        while not (self._kf_queue.empty() and self._idle.is_set()
                   and self._loop_queue.empty()
                   and self._loop_idle.is_set()):
            if time.time() - t0 > timeout:
                raise TimeoutError("mapper/loop thread did not drain")
            time.sleep(0.01)
        self._merge_pending()
        if self._mapper_error is not None:
            raise self._mapper_error
        if self._loop_error is not None:
            raise self._loop_error

    def close(self):
        self._shutdown = True
        self._thread.join(timeout=10.0)
        if self._loop_thread is not None:
            self._loop_thread.join(timeout=10.0)

    def reset(self):
        """Reset protocol (Tracking::Reset, src/Tracking.cc:1026-1094):
        drain the loop thread, stop the mapper, clear queues, rebuild
        state, release. Acquiring the park window (request_stop) blocks
        until an in-flight loop correction finishes, and the loop queue is
        drained BEFORE waiting for idle so no further correction can start
        while state is being rebuilt."""
        if hasattr(self, "_loop_queue"):
            while not self._loop_queue.empty():
                try:
                    self._loop_queue.get_nowait()
                except queue.Empty:
                    break
        if hasattr(self, "_thread") and self._thread.is_alive():
            # ownership: blocks while the loop thread holds the window
            self.request_stop()
            try:
                if (getattr(self, "_loop_thread", None) is not None
                        and self._loop_thread.is_alive()):
                    # a loop-thread correction that is itself waiting for
                    # the park window we now own cannot go idle — let it
                    # through; it will no-op on the rebuilt map (kf_valid
                    # all False, the reference's RequestReset analog)
                    t0 = time.time()
                    while (not self._loop_idle.is_set()
                           and not self._loop_wants_park
                           and time.time() - t0 < 60.0):
                        time.sleep(0.005)
                with self._lock:
                    self._pending_deltas = []
                super().reset()
            finally:
                self.release()
            return
        with getattr(self, "_lock", threading.Lock()):
            self._pending_deltas = []
        super().reset()
