"""Utilities: timing/profiling, logging."""

from orb_slam_tpu.utils.timing import StageTimer, trace_to
