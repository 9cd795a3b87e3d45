"""Physics correctness tests for the TPU ray engine.

Mirrors the reference's test strategy (`/root/reference/tests/test_physics.py`):
analytic oracles (Snell invariant, straight lines, turning depths,
Hamiltonian conservation), golden-file regression, steep-ray robustness, and
backwards-shooting consistency — plus a direct parity suite against the
clean-room scipy RK45 oracle (`tests/reference_impl.py`), which replaces the
reference's cross-implementation checks.

All tests use flatearth=False so closed forms hold, and interp="table"
(exact reference interpolation semantics) unless testing the spectral path.
"""

import pathlib

import numpy as np
import pytest

import pygenray_tpu as pr
from pygenray_tpu.models import const_env, linear_gradient_env, munk_env

import reference_impl as oracle

FIXTURE_DIR = pathlib.Path(__file__).parent / "fixtures"

TABLE = dict(interp="table", dtype="float64")


# ---------------------------------------------------------------------------
# A. Snell invariant in constant-c medium
# ---------------------------------------------------------------------------


def _rd_test_field():
    """The shared range-dependent test field: drifting-SOFAR Munk over a
    sloping bottom (one definition; the backwards-shot and bounce-parity
    suites must test the SAME field)."""
    z = np.linspace(0.0, 6000.0, 400)
    r = np.linspace(0.0, 100e3, 80)
    c_2d = np.array([pr.munk_ssp(z, sofar_depth=1300 + 0.01 * ri) for ri in r])
    bathy_vals = np.linspace(4500.0, 4900.0, len(r))
    return z, r, c_2d, bathy_vals


def _rd_test_env(c_2d, r, z, bathy_vals):
    from pygenray_tpu.environment import OceanEnvironment2D
    from pygenray_tpu.utils.xrlite import LiteDataArray

    return OceanEnvironment2D(
        sound_speed=LiteDataArray(
            c_2d, dims=["range", "depth"], coords={"range": r, "depth": z}
        ),
        bathymetry=LiteDataArray(bathy_vals, dims=["range"], coords={"range": r}),
        flat_earth_transform=False,
    )


class TestSnellInvariant:
    @pytest.mark.parametrize("user_angle", [-5.0, -10.0, -15.0])
    def test_p_constant_along_ray(self, user_angle):
        env = const_env(c0=1500.0)
        ray = pr.shoot_ray(
            200.0, 0.0, user_angle, 30e3, 60, env, rtol=1e-9, flatearth=False, **TABLE
        )
        assert ray is not None
        abs_p = np.abs(ray.p)
        assert np.std(abs_p) / np.mean(abs_p) < 1e-5


# ---------------------------------------------------------------------------
# B. Constant sound speed — straight-line rays
# ---------------------------------------------------------------------------


class TestConstantSSPStraightLine:
    C0 = 1500.0
    Z0 = 200.0
    R = 20e3

    def _shoot(self, angle=-10.0):
        env = const_env(c0=self.C0, r_max=self.R + 1e3)
        return pr.shoot_ray(
            self.Z0, 0.0, angle, self.R, 50, env, rtol=1e-9, flatearth=False, **TABLE
        )

    def test_travel_time_analytical(self):
        ray = self._shoot()
        t_analytical = self.R / (self.C0 * np.cos(np.radians(10.0)))
        assert abs(ray.t[-1] - t_analytical) / t_analytical < 1e-3

    def test_final_depth_analytical(self):
        ray = self._shoot()
        z_ode_end = self.Z0 + self.R * np.tan(np.radians(10.0))
        assert abs(ray.z[-1] - (-z_ode_end)) / z_ode_end < 1e-3

    def test_p_constant_in_const_c(self):
        ray = self._shoot()
        p_expected = -np.sin(np.radians(10.0)) / self.C0
        np.testing.assert_allclose(ray.p, p_expected, rtol=1e-5, atol=0)


# ---------------------------------------------------------------------------
# C. Linear gradient — turning depth & Hamiltonian
# ---------------------------------------------------------------------------


class TestLinearGradientTurningDepth:
    C0 = 1500.0
    G = 0.05
    Z_SRC = 200.0
    THETA = 20.0

    def _z_turn_analytical(self):
        c_source = self.C0 + self.G * self.Z_SRC
        return (c_source / np.cos(np.radians(self.THETA)) - self.C0) / self.G

    def _shoot(self):
        env = linear_gradient_env(c0=self.C0, g=self.G)
        return pr.shoot_ray(
            self.Z_SRC, 0.0, -self.THETA, 80e3, 400, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )

    def test_turning_depth_approx(self):
        ray = self._shoot()
        assert ray is not None
        z_turn_numerical = -np.min(ray.z)
        assert abs(z_turn_numerical - self._z_turn_analytical()) < 50.0

    def test_hamiltonian_conserved_linear_gradient(self):
        ray = self._shoot()
        z_ode = -ray.z
        p_ode = -ray.p
        c_along = self.C0 + self.G * z_ode
        H = np.sqrt(1.0 / c_along**2 - p_ode**2)
        assert np.std(H) / np.mean(H) < 1e-4


# ---------------------------------------------------------------------------
# D. Munk Hamiltonian conservation
# ---------------------------------------------------------------------------


class TestMunkHamiltonianConservation:
    @pytest.mark.parametrize("user_angle", [-5.0, -10.0, -15.0])
    def test_hamiltonian_conserved_munk(self, user_angle):
        env = munk_env(r_max=100e3)
        ray = pr.shoot_ray(
            1000.0, 0.0, user_angle, 100e3, 200, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        assert ray is not None
        z_ode = -ray.z
        p_ode = -ray.p
        c_along = pr.munk_ssp(z_ode)
        arg = np.clip(1.0 / c_along**2 - p_ode**2, 0.0, None)
        H = np.sqrt(arg)
        mask = H > 1e-6 / 1500.0
        if mask.sum() < 5:
            pytest.skip("Too few valid points away from turning point")
        H = H[mask]
        assert np.std(H) / np.mean(H) < 1e-3


# ---------------------------------------------------------------------------
# E. Golden-file regression (reference fixture + tight-oracle fixture)
# ---------------------------------------------------------------------------


class TestMunkRegression:
    """Flip-compared against the reference's own golden fixture, on the
    reference's own discretization.

    The fixture was generated by the reference's ``_regenerate_fixture``
    (reference `tests/test_physics.py:310-326`) on EXACTLY the grid used
    here: z = linspace(0, 6000, 400), r = linspace(0, 50e3, 30),
    flatearth=False, bilinear table interpolation — so the comparison
    carries no grid-mismatch confound, only integrator differences.

    It was generated by the reference's *serial* branch, which integrates
    theta_ode = +user_angle (the double-negation quirk, reference
    `launch_rays.py:67` + `:251`).  This package uses the mp/direct
    convention (theta_ode = -user_angle) everywhere, so shooting the
    negated angle list reproduces the fixture rows exactly.

    ts tolerance is 2.3e-6 s, derived by measurement (not the reference's
    own 1e-6, which is unattainable for any non-identical integrator):
    the fixture itself deviates from a tight-tolerance (rtol=1e-12)
    integration of the same field by up to 2.1e-6 s — measured with
    `tests/reference_impl.py` — and this engine lands within 6e-8 s of
    the tight integration, giving a 2.16e-6 budget (+ margin).  Measured
    deviation of this exact run: 2.146e-6 s, at the fixture's error floor.
    """

    FIXTURE = FIXTURE_DIR / "munk_regression.npz"
    ANGLES = [-8.0, -4.0, 0.0, 4.0, 8.0]

    def test_regression_vs_reference_fixture(self):
        ref = np.load(self.FIXTURE)
        # the reference fixture's exact grid (reference test_physics.py:54-64)
        env = munk_env(r_max=50e3, nr=30, nz=400)
        rf = pr.shoot_rays(
            1300.0, 0.0, [-a for a in self.ANGLES], 50e3, 50, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        np.testing.assert_allclose(rf.ts, ref["ts"], atol=2.3e-6)
        np.testing.assert_allclose(rf.zs, ref["zs"], atol=0.1)
        np.testing.assert_allclose(rf.ps, ref["ps"], atol=0.1)
        np.testing.assert_array_equal(rf.n_botts, ref["n_botts"])
        np.testing.assert_array_equal(rf.n_surfs, ref["n_surfs"])

    def test_regression_vs_tight_oracle(self, request):
        """Tighter golden: our scipy oracle at rtol=1e-12 on the same fan."""
        fixture = FIXTURE_DIR / "munk_tight_oracle.npz"
        regen = request.config.getoption("--regenerate-physics", default=False)
        if regen or not fixture.exists():
            oenv = oracle.munk_env(r_max=50e3, nr=30, nz=400)
            ts, zs = [], []
            for a in self.ANGLES:
                out = oracle.trace_ray_oracle(
                    oenv, 1300.0, 0.0, a, 50e3, 50, rtol=1e-12, atol=1e-12
                )
                assert out is not None, f"oracle dropped angle {a} during regen"
                _, Y, _, _ = out
                ts.append(Y[0])
                zs.append(-Y[1])
            np.savez(fixture, ts=np.array(ts), zs=np.array(zs))
            if regen:
                pytest.skip("Fixture regenerated")
        ref = np.load(fixture)
        env = munk_env(r_max=50e3, nr=30, nz=400)
        rf = pr.shoot_rays(
            1300.0, 0.0, [-a for a in self.ANGLES], 50e3, 50, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        np.testing.assert_allclose(rf.ts, ref["ts"], atol=5e-7)
        np.testing.assert_allclose(rf.zs, ref["zs"], atol=0.01)


# ---------------------------------------------------------------------------
# F. Near-vertical rays: no crash, dropped like the reference
# ---------------------------------------------------------------------------


class TestNearVerticalRay:
    def test_near_vertical_no_crash(self):
        env = const_env(c0=1500.0, z_max=5000.0, r_max=100e3, bathy_depth=4500.0)
        pr.shoot_ray(200.0, 0.0, -89.9, 10e3, 50, env, rtol=1e-6, flatearth=False, **TABLE)

    def test_exactly_vertical_no_crash(self):
        env = const_env(c0=1500.0, z_max=5000.0, r_max=100e3, bathy_depth=4500.0)
        pr.shoot_ray(200.0, 0.0, -90.0, 10e3, 50, env, rtol=1e-6, flatearth=False, **TABLE)

    @pytest.mark.parametrize("angle", [-85.0, -87.0, -89.0, -89.9, -90.0])
    def test_steep_rays_no_crash(self, angle):
        env = munk_env(r_max=50e3)
        pr.shoot_ray(1000.0, 0.0, angle, 10e3, 50, env, rtol=1e-6, flatearth=False, **TABLE)

    def test_vertical_ray_dropped_with_diagnostic(self):
        env = const_env(c0=1500.0)
        rf = pr.shoot_rays(
            200.0, 0.0, [-90.0, -10.0], 10e3, 50, env,
            flatearth=False, keep_dropped=True, **TABLE,
        )
        assert not rf.alive[0] and rf.alive[1]
        assert rf.death_code[0] in (1, 2)  # vertical or domain exit
        assert rf.death_code[1] == 0


# ---------------------------------------------------------------------------
# G. Backwards shooting
# ---------------------------------------------------------------------------


class TestBackwardsShooting:
    def test_endpoints_and_p_constant(self):
        env = const_env(c0=1500.0)
        ray = pr.shoot_ray(
            200.0, 30e3, -10.0, 0.0, 60, env, rtol=1e-9, flatearth=False, **TABLE
        )
        assert ray is not None
        assert ray.r[0] == 30e3
        assert ray.r[-1] == 0.0
        abs_p = np.abs(ray.p)
        assert np.std(abs_p) / np.mean(abs_p) < 1e-5

    def _rd_env_pair(self):
        z, r, c_2d, bathy_vals = _rd_test_field()
        return (
            _rd_test_env(c_2d, r, z, bathy_vals),
            _rd_test_env(c_2d[::-1, :], r, z, bathy_vals[::-1]),
        )

    def test_matches_manually_mirrored_environment(self):
        env, env_m = self._rd_env_pair()
        source_range, receiver_range = 60e3, 10e3
        angle = -15.0
        ray_bwd = pr.shoot_ray(
            200.0, source_range, angle, receiver_range, 80, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        ray_fwd_mirrored = pr.shoot_ray(
            200.0, 100e3 - source_range, angle, 100e3 - receiver_range, 80, env_m,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        assert ray_bwd is not None and ray_fwd_mirrored is not None
        assert (ray_bwd.n_bottom, ray_bwd.n_surface) == (
            ray_fwd_mirrored.n_bottom,
            ray_fwd_mirrored.n_surface,
        )
        assert (ray_bwd.n_bottom + ray_bwd.n_surface) > 0
        np.testing.assert_allclose(ray_bwd.z, ray_fwd_mirrored.z, rtol=1e-4, atol=1e-2)
        np.testing.assert_allclose(ray_bwd.t, ray_fwd_mirrored.t, rtol=1e-4, atol=1e-6)

    def test_shoot_rays_backwards_matches_shoot_ray(self):
        env = munk_env(r_max=50e3)
        angles = np.linspace(-15.0, 15.0, 80)
        rf = pr.shoot_rays(
            200.0, 40e3, angles, 5e3, 60, env, rtol=1e-9, flatearth=False, **TABLE
        )
        assert len(rf) == len(angles)
        assert np.allclose(rf.rs[:, 0], 40e3)
        assert np.allclose(rf.rs[:, -1], 5e3)
        idx = int(np.argmin(np.abs(rf.thetas - 7.0)))
        single = pr.shoot_ray(
            200.0, 40e3, rf.thetas[idx], 5e3, 60, env,
            rtol=1e-9, flatearth=False, **TABLE,
        )
        assert single is not None
        np.testing.assert_allclose(rf.zs[idx], single.z, atol=1e-6)


# ---------------------------------------------------------------------------
# H. Direct parity against the scipy RK45 oracle
# ---------------------------------------------------------------------------


class TestOracleParity:
    """The engine must match an independent tight-tolerance adaptive
    integration of the same field to well under the 0.1 ms travel-time
    budget, including bounce counts, for tomography-relevant angles."""

    def test_munk_fan_parity(self):
        env = munk_env(r_max=50e3, nr=30, nz=400)
        oenv = oracle.munk_env(r_max=50e3, nr=30, nz=400)
        angles = [-14.0, -10.0, -2.0, 6.0, 12.0]
        rf = pr.shoot_rays(
            1300.0, 0.0, angles, 50e3, 50, env, flatearth=False, **TABLE
        )
        for i, a in enumerate(angles):
            out = oracle.trace_ray_oracle(
                oenv, 1300.0, 0.0, -a, 50e3, 50, rtol=1e-12, atol=1e-12
            )
            assert out is not None
            _, Y, nb, ns = out
            assert abs(rf.ts[i][-1] - Y[0][-1]) < 1e-6
            assert abs(rf.zs[i][-1] - (-Y[1][-1])) < 0.05
            assert (rf.n_botts[i], rf.n_surfs[i]) == (nb, ns)

    def test_bouncing_rays_parity(self):
        """Sloped bottom + range-dependent profile: bounce counts exact and
        end travel time within the tomography budget even for steep rays."""
        z, r, c_2d, bathy_vals = _rd_test_field()
        env = _rd_test_env(c_2d, r, z, bathy_vals)
        oenv = oracle.OracleEnv.from_tables(c_2d, r, z, bathy_vals, r)
        angles = [-17.0, -15.0, 15.0, 17.0]
        rf = pr.shoot_rays(200.0, 0.0, angles, 100e3, 100, env, flatearth=False, **TABLE)
        for i, a in enumerate(angles):
            out = oracle.trace_ray_oracle(
                oenv, 200.0, 0.0, -a, 100e3, 100, rtol=1e-12, atol=1e-12
            )
            assert out is not None
            _, Y, nb, ns = out
            assert (rf.n_botts[i], rf.n_surfs[i]) == (nb, ns)
            assert abs(rf.ts[i][-1] - Y[0][-1]) < 1e-5


# ---------------------------------------------------------------------------
# I. Spectral (Chebyshev) path consistency
# ---------------------------------------------------------------------------


class TestSpectralPath:
    def test_cheb_matches_table_within_budget(self):
        env = munk_env(r_max=50e3, nr=30, nz=2000)
        angles = [-12.0, -6.0, 0.0, 6.0, 12.0]
        rf_t = pr.shoot_rays(
            1300.0, 0.0, angles, 50e3, 50, env, flatearth=False,
            interp="table", dtype="float64",
        )
        rf_c = pr.shoot_rays(
            1300.0, 0.0, angles, 50e3, 50, env, flatearth=False,
            interp="cheb", dtype="float64",
        )
        # spectral field vs piecewise-linear field: travel times must agree
        # to well within the 0.1 ms tomography budget
        np.testing.assert_allclose(rf_c.ts[:, -1], rf_t.ts[:, -1], atol=2e-5)
        np.testing.assert_array_equal(rf_c.n_botts, rf_t.n_botts)
        np.testing.assert_array_equal(rf_c.n_surfs, rf_t.n_surfs)

    def test_cheb_fit_guard_falls_back(self):
        """A rough (noisy) profile must fail the fit guard in auto mode."""
        rng = np.random.default_rng(0)
        z = np.linspace(0, 5000, 500)
        r = np.linspace(0, 50e3, 10)
        c = 1500 + np.cumsum(rng.normal(0, 1.0, 500))[None, :] * np.ones((10, 1))
        from pygenray_tpu.envdata import make_env_data

        env = make_env_data(c, r, z, np.full(10, 4500.0), r, interp="auto")
        assert not env.has_cheb
        with pytest.raises(ValueError):
            make_env_data(c, r, z, np.full(10, 4500.0), r, interp="cheb")


# ---------------------------------------------------------------------------
# H. 1D-profile construction (regression: the validation used to be inverted)
# ---------------------------------------------------------------------------


class Test1DProfileEnv:
    def test_1d_profile_with_explicit_grid_traces(self):
        """A 1D c profile + explicit range grid must build a usable env whose
        trace matches the equivalent pre-broadcast 2D table bitwise."""
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings, trace

        z = np.linspace(0.0, 6000.0, 601)
        r = np.asarray([0.0, 60e3])
        c1d = munk_ssp(z)
        env1 = make_env_data(c1d, r, z, np.full(2, 5000.0), r, dtype="float64")
        env2 = make_env_data(
            np.broadcast_to(c1d, (2, z.size)), r, z,
            np.full(2, 5000.0), r, dtype="float64",
        )
        assert env1.r_dom == (0.0, 60e3)

        settings = SolverSettings(dx=100.0)
        p0 = np.sin(np.radians([5.0, 10.0])) / 1500.0
        res1 = trace(env1, 1300.0, p0, 0.0, 50e3, 25, settings)
        res2 = trace(env2, 1300.0, p0, 0.0, 50e3, 25, settings)
        assert bool(res1.alive.all())
        np.testing.assert_array_equal(np.asarray(res1.ts), np.asarray(res2.ts))
        np.testing.assert_array_equal(np.asarray(res1.zs), np.asarray(res2.zs))

    def test_1d_profile_without_grid_raises(self):
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        z = np.linspace(0.0, 6000.0, 61)
        with pytest.raises(ValueError, match="range grid"):
            make_env_data(munk_ssp(z), None, z, np.full(2, 5000.0), [0.0, 1e3])

    def test_1d_profile_longer_grid_broadcasts(self):
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        z = np.linspace(0.0, 6000.0, 61)
        r = np.linspace(0.0, 50e3, 5)
        env = make_env_data(munk_ssp(z), r, z, np.full(5, 5000.0), r)
        assert env.c.shape == (5, 61)
        assert not env.range_dependent
