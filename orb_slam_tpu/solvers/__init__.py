"""Geometric solvers: batched RANSAC estimators and nonlinear optimizers.

TPU design rule: every "iterate until good enough" loop in the reference
becomes a fixed-budget batched fan-out + argmax (the reference itself
pre-samples its 200 RANSAC sets, src/Initializer.cc:78-95 — we just run all
200 at once), and every Levenberg-Marquardt loop becomes a fixed-iteration
Gauss-Newton/LM with masked outlier gating inside one jitted program."""

from orb_slam_tpu.solvers.two_view import TwoViewResult, initialize_two_view
from orb_slam_tpu.solvers.pose_opt import pose_optimize
