"""Lightweight event logging (the reference's ROS_INFO analog).

Set SLAM_DEBUG=1 to stream per-stage mapping/loop events to stderr; the
guards keep the zero-cost path free of device syncs."""

from __future__ import annotations

import os
import sys

DEBUG = bool(os.environ.get("SLAM_DEBUG"))


def dbg(msg: str):
    if DEBUG:
        print(f"[slam] {msg}", file=sys.stderr, flush=True)


def info(msg: str):
    print(f"[slam] {msg}", file=sys.stderr, flush=True)
