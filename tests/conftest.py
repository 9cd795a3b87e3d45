"""Shared test configuration and fixtures.

Tests run on CPU in float64 with an 8-device virtual mesh: physics parity
against the scipy oracle needs f64, and sharding tests need multiple
devices.  TPU float32 behavior is covered by the benchmark harness.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

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


def _make_ray(
    launch_angle: float,
    source_depth: float,
    n_bottom: int = 0,
    n_surface: int = 0,
    N: int = 10,
    R: float = 10000.0,
) -> Ray:
    """Synthetic Ray built without running the solver (straight-line
    kinematics) — object/plot/IO tests never touch the integrator."""
    r = np.linspace(0.0, R, N)
    t = r / 1500.0
    z_ode = np.linspace(source_depth, source_depth + R * 0.01, N)
    p_ode = np.ones(N) * np.sin(np.radians(abs(launch_angle) + 1e-3)) / 1500.0
    y = np.vstack([t, z_ode, p_ode])
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
    return _make_ray(launch_angle=-10.0, source_depth=100.0)


@pytest.fixture
def simple_rayfan():
    rays = [
        _make_ray(launch_angle=-5.0, source_depth=100.0, n_bottom=0),
        _make_ray(launch_angle=5.0, source_depth=150.0, n_bottom=1),
        _make_ray(launch_angle=-10.0, source_depth=200.0, n_bottom=0),
    ]
    return RayFan(rays)
