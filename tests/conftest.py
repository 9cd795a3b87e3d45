"""Shared test configuration and fixtures.

Tests run on CPU in float64 with an 8-device virtual mesh: physics parity
against the scipy oracle needs f64, and sharding tests need multiple
devices.  TPU float32 behavior is covered by the benchmark harness.

Object/plot/IO tests use synthetic rays built without the solver — a
sinusoidal "fake trajectory" generator (`synthetic_ray`) keeps them fast
and backend-independent.
"""

import os
import tempfile

# The example demos (run in-process by test_examples.py) enable JAX's
# persistent compile cache at import.  Point them at a session-private
# directory: sharing /tmp/pygenray_tpu_jax_cache with concurrently
# running benchmark processes has segfaulted the cache-write path.
os.environ.setdefault(
    "PYGENRAY_JAX_CACHE",
    tempfile.mkdtemp(prefix="pygenray_test_jax_cache_"),
)

# append-if-absent (NOT setdefault): a pre-set XLA_FLAGS (CI dump flags
# etc.) must not silently drop the 8-device virtual mesh the sharding
# tests hard-assert on — same pattern as __graft_entry__.dryrun_multichip
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from pygenray_tpu.ray_objects import Ray, RayFan


def pytest_addoption(parser):
    parser.addoption(
        "--regenerate-physics",
        action="store_true",
        default=False,
        help="Regenerate physics regression fixtures and skip comparison.",
    )


def synthetic_ray(
    launch_angle=-10.0,
    source_depth=100.0,
    n_bottom=0,
    n_surface=0,
    n_points=10,
    max_range=10_000.0,
):
    """A solver-free Ray: gently undulating kinematics in the positive-z
    ODE convention that ``Ray.__init__`` expects (y = [t, z_down, p_down])."""
    r = np.linspace(0.0, max_range, n_points)
    travel = r / 1500.0
    depth_down = source_depth + 0.01 * r + 5.0 * np.sin(r / max_range * np.pi)
    slowness = np.full(
        n_points, np.sin(np.radians(abs(launch_angle) + 1e-3)) / 1500.0
    )
    y = np.stack([travel, depth_down, slowness])
    return Ray(
        r=r,
        y=y,
        n_bottom=n_bottom,
        n_surface=n_surface,
        launch_angle=launch_angle,
        source_depth=source_depth,
    )



@pytest.fixture
def simple_ray():
    return synthetic_ray(launch_angle=-10.0, source_depth=100.0)


@pytest.fixture
def simple_rayfan():
    specs = [(-5.0, 100.0, 0), (5.0, 150.0, 1), (-10.0, 200.0, 0)]
    return RayFan(
        [
            synthetic_ray(launch_angle=a, source_depth=d, n_bottom=nb)
            for a, d, nb in specs
        ]
    )
