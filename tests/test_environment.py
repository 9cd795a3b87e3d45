"""Environment-layer contract tests.

These encode the reference package's documented behavioral contract for
`OceanEnvironment2D`, `munk_ssp`, and the WGS-84 flat-earth transforms
(see PARITY.md §2.1); the checks are the same physics/API guarantees, the
code is this project's own.
"""

import numpy as np
import pytest
from matplotlib import pyplot as plt

import pygenray_tpu as pr
from pygenray_tpu import DataArray, OceanEnvironment2D


# ---------------------------------------------------------------------------
# Munk profile
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("zmax,step", [(5000, 10), (6000, 1)])
def test_munk_shape_follows_input(zmax, step):
    depths = np.arange(0, zmax, step)
    assert pr.munk_ssp(depths).shape == depths.shape


def test_munk_channel_axis_properties():
    depths = np.arange(0, 6000, 1)
    profile = pr.munk_ssp(depths, sofar_depth=1300.0)
    axis = depths[np.argmin(profile)]
    assert abs(axis - 1300.0) <= 2.0
    assert pr.munk_ssp(np.array([1300.0]))[0] == pytest.approx(1500.0, abs=5.0)
    # sound speed rises away from the channel axis in both directions
    assert profile[0] > profile.min() and profile[-1] > profile.min()


# ---------------------------------------------------------------------------
# OceanEnvironment2D construction contract
# ---------------------------------------------------------------------------


REQUIRED_ATTRS = ("sound_speed", "bathymetry", "dcdz", "bottom_angle", "bottom_angle_interp")


def test_default_environment_contract():
    env = OceanEnvironment2D()
    missing = [a for a in REQUIRED_ATTRS if not hasattr(env, a)]
    assert not missing, f"missing attributes: {missing}"
    assert env.sound_speed.ndim == 2
    assert {"range", "depth"} == set(env.sound_speed.dims)
    # default applies the flat-earth transform
    assert hasattr(env, "sound_speed_fe") and hasattr(env, "bathymetry_fe")


def test_no_transform_leaves_no_fe_fields():
    env = OceanEnvironment2D(flat_earth_transform=False)
    assert not hasattr(env, "sound_speed_fe")
    assert not hasattr(env, "bathymetry_fe")


def _depth_profile(n=300, zmax=3000.0):
    depths = np.linspace(0.0, zmax, n)
    return DataArray(pr.munk_ssp(depths), dims=["depth"], coords={"depth": depths})


def _bathy(n=20, depth=4000.0, rmax=50e3):
    ranges = np.linspace(0.0, rmax, n)
    return DataArray(np.full(n, depth), dims=["range"], coords={"range": ranges})


def test_accepts_1d_profile():
    env = OceanEnvironment2D(
        sound_speed=_depth_profile(), bathymetry=_bathy(), flat_earth_transform=False
    )
    assert env.sound_speed.ndim == 1
    assert "depth" in env.sound_speed.dims


def test_accepts_2d_field_and_stores_bathymetry():
    ranges = np.linspace(0.0, 50e3, 20)
    depths = np.arange(0.0, 3000.0, 50.0)
    field = DataArray(
        np.outer(np.ones(20), pr.munk_ssp(depths)),
        dims=["range", "depth"],
        coords={"range": ranges, "depth": depths},
    )
    env = OceanEnvironment2D(
        sound_speed=field, bathymetry=_bathy(depth=3500.0), flat_earth_transform=False
    )
    assert env.sound_speed.ndim == 2
    np.testing.assert_array_equal(env.bathymetry.values, np.full(20, 3500.0))


@pytest.mark.parametrize(
    "kwargs,exc",
    [
        # non-DataArray inputs
        ({"sound_speed": np.ones(100)}, TypeError),
        ({"bathymetry": np.ones(50)}, TypeError),
        # wrong dimensionality / missing dims
        (
            {
                "sound_speed": DataArray(
                    np.ones((5, 10, 20)), dims=["range", "depth", "extra"]
                )
            },
            ValueError,
        ),
        ({"sound_speed": DataArray(np.ones(50), dims=["range"])}, ValueError),
        (
            {"sound_speed": DataArray(np.ones((10, 20)), dims=["depth", "extra"])},
            ValueError,
        ),
        ({"bathymetry": DataArray(np.ones(50), dims=["depth"])}, ValueError),
    ],
)
def test_constructor_rejects_bad_inputs(kwargs, exc):
    with pytest.raises(exc):
        OceanEnvironment2D(**kwargs)


# ---------------------------------------------------------------------------
# WGS-84 flat-earth transform
# ---------------------------------------------------------------------------


class TestFlatEarthTransforms:
    LATITUDE = 35.0

    def test_depths_stretch_downward(self):
        depths = np.array([100.0, 1000.0, 3000.0])
        stretched, _ = pr.eflat(depths, self.LATITUDE)
        assert (stretched > depths).all()

    def test_inverse_recovers_depth_within_1m(self):
        depths = np.array([100.0, 500.0, 1000.0, 2000.0, 4000.0])
        stretched, _ = pr.eflat(depths, self.LATITUDE)
        recovered, _ = pr.eflatinv(stretched, np.array([self.LATITUDE]))
        np.testing.assert_allclose(recovered, depths, atol=1.0)

    def test_inverse_recovers_sound_speed(self):
        depths = np.array([100.0, 500.0, 1000.0, 2000.0])
        speeds = np.array([1500.0, 1490.0, 1480.0, 1510.0])
        depf, csf = pr.eflat(depths, self.LATITUDE, speeds)
        _, recovered = pr.eflatinv(depf, np.array([self.LATITUDE]), csf)
        np.testing.assert_allclose(recovered, speeds, rtol=1e-4)


# ---------------------------------------------------------------------------
# Shooting through a flat-earth-transformed (non-uniform-grid) field
# ---------------------------------------------------------------------------


def test_flatearth_shooting_end_to_end():
    env = OceanEnvironment2D(flat_earth_transform=True)
    kw = dict(flatearth=True, interp="table", dtype="float64")
    ray_fe = pr.shoot_ray(1000.0, 0.0, -8.0, 50e3, 50, env, **kw)
    assert ray_fe is not None and np.isfinite(ray_fe.t[-1])
    ray_plain = pr.shoot_ray(
        1000.0, 0.0, -8.0, 50e3, 50, env, flatearth=False,
        interp="table", dtype="float64",
    )
    # transform changes travel time slightly but not wildly
    assert abs(ray_fe.t[-1] - ray_plain.t[-1]) < 0.1


def test_plot_smoke():
    env = OceanEnvironment2D()
    fig, ax = plt.subplots()
    plt.sca(ax)
    env.plot()
    plt.close("all")
