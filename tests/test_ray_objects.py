"""Result-container contract tests: Ray, RayFan.

These encode the reference package's documented container semantics (sign
conventions, indexing/concatenation, MATLAB export — see PARITY.md §2.6)
using this project's own synthetic-trajectory fixtures (`conftest.py`).
"""

import numpy as np
import pytest
import scipy.io
from matplotlib import pyplot as plt

from conftest import synthetic_ray
from pygenray_tpu.ray_objects import Ray, RayFan


def fan_of(n, max_range=10_000.0, n_points=10):
    rays = [
        synthetic_ray(
            launch_angle=float(-5 + 5 * i),
            source_depth=100.0 + 50.0 * i,
            n_bottom=i % 2,
            max_range=max_range,
            n_points=n_points,
        )
        for i in range(n)
    ]
    return RayFan(rays)


# ---------------------------------------------------------------------------
# Ray: sign conventions and optional metadata
# ---------------------------------------------------------------------------


def test_ray_flips_ode_convention_to_user_convention():
    r = np.linspace(0.0, 5e3, 8)
    y = np.stack([r / 1500.0, np.linspace(300, 400, 8), np.full(8, 2e-4)])
    ray = Ray(r=r, y=y, n_bottom=2, n_surface=1)
    np.testing.assert_array_equal(ray.z, -y[1])
    np.testing.assert_array_equal(ray.p, -y[2])
    np.testing.assert_array_equal(ray.t, y[0])
    assert (ray.n_bottom, ray.n_surface) == (2, 1)
    # optional metadata absent unless provided
    assert not hasattr(ray, "launch_angle")
    assert not hasattr(ray, "source_depth")


def test_ray_optional_metadata_stored():
    ray = synthetic_ray(launch_angle=-15.0, source_depth=250.0)
    assert ray.launch_angle == pytest.approx(-15.0)
    assert ray.source_depth == pytest.approx(250.0)
    for attr in ("r", "t", "z", "p"):
        assert getattr(ray, attr).shape == (10,)


def test_ray_plot_smoke():
    plt.figure()
    synthetic_ray().plot()
    plt.close("all")


# ---------------------------------------------------------------------------
# RayFan: stacking, ids, container protocol
# ---------------------------------------------------------------------------


def test_fan_stacks_to_matrix_layout(simple_rayfan):
    fan = simple_rayfan
    m, n = 3, 10
    assert fan.thetas.shape == (m,)
    for attr in ("rs", "ts", "zs", "ps"):
        assert getattr(fan, attr).shape == (m, n)
    for attr in ("n_botts", "n_surfs", "source_depths"):
        assert getattr(fan, attr).shape == (m,)


def test_ray_ids_strings_with_boundary_suffix(simple_rayfan):
    fan = simple_rayfan
    assert len(fan.ray_ids) == 3
    assert all(isinstance(rid, str) for rid in fan.ray_ids)
    # second synthetic ray has a bottom bounce -> "b" suffix
    assert fan.ray_ids[1].endswith("b")
    assert not fan.ray_ids[0].endswith("b")
    fan.compute_rayids()  # idempotent
    assert len(fan.ray_ids) == len(fan.thetas)


def test_len_matches_fan_size(simple_rayfan):
    assert len(simple_rayfan) == 3


@pytest.mark.parametrize("idx", [0, 1, -1])
def test_integer_indexing_round_trips(simple_rayfan, idx):
    ray = simple_rayfan[idx]
    assert isinstance(ray, Ray)
    np.testing.assert_array_equal(ray.r, simple_rayfan.rs[idx])
    # the extracted Ray must carry identical user-convention values
    np.testing.assert_array_equal(ray.z, simple_rayfan.zs[idx])
    np.testing.assert_array_equal(ray.p, simple_rayfan.ps[idx])


def test_out_of_bounds_raises(simple_rayfan):
    with pytest.raises(IndexError):
        simple_rayfan[100]


@pytest.mark.parametrize(
    "selector,expected",
    [
        (slice(0, 2), [0, 1]),
        (slice(1, None), [1, 2]),
        (np.array([True, False, True]), [0, 2]),
        (np.array([False, True, False]), [1]),
        (np.array([0, 2]), [0, 2]),
    ],
)
def test_fancy_indexing_returns_subfan(simple_rayfan, selector, expected):
    sub = simple_rayfan[selector]
    assert isinstance(sub, RayFan)
    np.testing.assert_array_equal(sub.thetas, simple_rayfan.thetas[expected])


def test_concatenation_requires_matching_ranges():
    a, b = fan_of(2), fan_of(3)
    merged = a + b
    assert len(merged) == 5
    for i in range(5):
        np.testing.assert_array_equal(merged.rs[i], a.rs[0])
    with pytest.raises(ValueError):
        fan_of(1) + fan_of(1, max_range=20_000.0)
    with pytest.raises(TypeError):
        a + 42


# ---------------------------------------------------------------------------
# persistence
# ---------------------------------------------------------------------------


MAT_KEYS = {"thetas", "xs", "ts", "zs", "ps", "n_botts", "n_surfs", "source_depths"}


def test_save_mat_round_trip(simple_rayfan, tmp_path):
    path = tmp_path / "fan.mat"
    simple_rayfan.save_mat(str(path))
    assert path.exists()
    loaded = scipy.io.loadmat(str(path))
    assert "rayfan" in loaded
    struct = loaded["rayfan"]
    assert MAT_KEYS <= set(struct.dtype.names)
    np.testing.assert_allclose(
        struct["thetas"][0, 0].ravel(), simple_rayfan.thetas, atol=1e-10
    )


def test_save_npz_round_trip(simple_rayfan, tmp_path):
    path = tmp_path / "fan.npz"
    simple_rayfan.save_npz(str(path))
    again = RayFan.load_npz(str(path))
    np.testing.assert_array_equal(again.thetas, simple_rayfan.thetas)
    np.testing.assert_array_equal(again.zs, simple_rayfan.zs)
    np.testing.assert_array_equal(again.n_botts, simple_rayfan.n_botts)


# ---------------------------------------------------------------------------
# plotting smokes
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "method,kwargs",
    [
        ("plot_ray_fan", {}),
        ("plot_time_front", {}),
        ("plot_time_front", {"include_lines": True}),
        ("plot_depth_v_angle", {}),
    ],
)
def test_plot_smokes(simple_rayfan, method, kwargs):
    plt.figure()
    getattr(simple_rayfan, method)(**kwargs)
    plt.close("all")
