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

# Persistent compile cache: the suite compiles hundreds of programs on a
# 1-core host; repeat runs hit the cache. Also keeps the async tests'
# BACKGROUND mapper thread from spending minutes in first-compiles while
# keyframes queue up (tracking would starve against a stale map).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_memory():
    """Free compiled executables between test modules.

    A full-suite session accumulates hundreds of live XLA:CPU executables;
    past a threshold the NEXT LLVM JIT compile (or cache deserialization)
    segfaults inside the backend — reproduced deterministically at the
    same cumulative point across four round-3 suite runs, while every
    module passes standalone. Clearing per module keeps live JIT code
    bounded; the persistent cache (above) makes the re-compiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture
def rng():
    return np.random.default_rng(42)
