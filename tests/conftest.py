"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware. Must run before any jax import."""

import os

# Force-set: the session env carries JAX_PLATFORMS=axon (remote TPU); tests
# must run on local CPU (fast iteration, f32-exact matmuls, 8 virtual devices).
os.environ["JAX_PLATFORMS"] = "cpu"

# Observation cap 16 for the suite: the production default is 32 (PERF.md
# cap study), but BA's Schur accumulation is O(cap^2) and the 1-CPU CI host
# pays it in every e2e test (~2x suite wall clock). The cap-32 code path is
# shape-identical; tests/test_map_state.py covers it explicitly, and
# scripts/obs_cap_study.py measures its accuracy effect.
os.environ.setdefault("SLAM_OBS_CAP", "16")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers a remote-TPU PJRT plugin at interpreter
# startup and sets jax_platforms="axon,cpu", which silently overrides the env
# var above. Re-override via config so ALL test computation runs on local CPU.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
