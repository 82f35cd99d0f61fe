"""Datasets: image-directory / video sources with background prefetch.

Replaces the reference's ROS image subscription (src/Tracking.cc:160-166)
with a host-side input pipeline: a reader thread decodes frames ahead of
the device so the TPU never waits on IO (the SLAM equivalent of an input
pipeline feeding an accelerator)."""

from __future__ import annotations

import os
import queue
import threading

import numpy as np


class ImageDirDataset:
    """Sorted image files in a directory (png/jpg/pgm), grayscale float32."""

    EXTS = (".png", ".jpg", ".jpeg", ".pgm", ".bmp", ".tif", ".tiff")

    def __init__(self, path: str, timestamps: str | None = None):
        self.files = sorted(
            os.path.join(path, f) for f in os.listdir(path)
            if f.lower().endswith(self.EXTS)
        )
        self.timestamps = None
        if timestamps and os.path.exists(timestamps):
            self.timestamps = np.loadtxt(timestamps, usecols=0)

    def __len__(self):
        return len(self.files)

    def __iter__(self):
        for i, f in enumerate(self.files):
            img = _load_gray(f)
            ts = (
                float(self.timestamps[i])
                if self.timestamps is not None and i < len(self.timestamps)
                else i / 30.0
            )
            yield ts, img


class VideoDataset:
    """Video file via cv2 (if available)."""

    def __init__(self, path: str, fps: float = 30.0):
        import cv2

        self.cap = cv2.VideoCapture(path)
        self.fps = self.cap.get(cv2.CAP_PROP_FPS) or fps

    def __iter__(self):
        import cv2

        i = 0
        while True:
            ok, frame = self.cap.read()
            if not ok:
                break
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY).astype(np.float32)
            yield i / self.fps, gray
            i += 1


class PrefetchIterator:
    """Wrap any (ts, img) iterable with an N-deep background decode thread."""

    def __init__(self, source, depth: int = 4):
        self.q = queue.Queue(maxsize=depth)
        self.thread = threading.Thread(
            target=self._worker, args=(source,), daemon=True
        )
        self.thread.start()

    def _worker(self, source):
        for item in source:
            self.q.put(item)
        self.q.put(None)

    def __iter__(self):
        while True:
            item = self.q.get()
            if item is None:
                return
            yield item


def _load_gray(path: str) -> np.ndarray:
    try:
        import cv2

        img = cv2.imread(path, cv2.IMREAD_GRAYSCALE)
        if img is not None:
            return img.astype(np.float32)
    except ImportError:
        pass
    from PIL import Image

    return np.asarray(Image.open(path).convert("L"), np.float32)


def open_dataset(path: str, **kw):
    if os.path.isdir(path):
        return ImageDirDataset(path, **kw)
    if path.lower().endswith((".mp4", ".avi", ".mov", ".mkv")):
        return VideoDataset(path)
    raise ValueError(f"unsupported dataset path: {path}")
