"""Coverage for auxiliary surfaces: flat-earth RD transform, 1D sound-speed
shooting, event-indicator parity functions, xrlite shim, profiling utils,
dropped-ray diagnostics, and solver-settings mapping."""

import numpy as np
import pytest

import pygenray_tpu as pr
from pygenray_tpu.models import const_env, munk_env
from pygenray_tpu.utils.xrlite import LiteDataArray
from pygenray_tpu.utils.profiling import Timer, timed


class TestFlatEarthRD:
    def test_flat_earth_c_range_dependent(self):
        z = np.linspace(0, 4000, 120)
        r = np.linspace(0, 80e3, 30)
        lats = np.linspace(30.0, 31.0, 30)
        c2d = np.outer(np.ones(30), pr.munk_ssp(z))
        da = LiteDataArray(
            c2d, dims=["range", "depth"],
            coords={"range": r, "depth": z, "lat": lats},
        )
        out = pr.flat_earth_c(da)
        assert out.values.shape == c2d.shape
        # flattening scales c upward, more at depth
        assert np.all(out.values[:, -1] >= c2d[:, -1])
        np.testing.assert_allclose(out.values[:, 0], c2d[:, 0], rtol=1e-6)

    def test_flat_earth_transform_rd_method(self):
        z = np.linspace(0, 4000, 100)
        r = np.linspace(0, 50e3, 20)
        lats = np.linspace(34.0, 35.0, 20)
        c2d = np.outer(np.ones(20), pr.munk_ssp(z))
        ssp = LiteDataArray(
            c2d, dims=["range", "depth"],
            coords={"range": r, "depth": z, "lat": lats},
        )
        bathy = LiteDataArray(np.full(20, 3800.0), dims=["range"], coords={"range": r})
        env = pr.OceanEnvironment2D(
            sound_speed=ssp, bathymetry=bathy, flat_earth_transform=False
        )
        env.flat_earth_transform_rd()
        assert hasattr(env, "sound_speed_fe")
        assert hasattr(env, "bathymetry_fe")


class TestOneDSoundSpeed:
    def test_shoot_with_1d_profile(self):
        """The reference accepts 1D sound speed at construction but cannot
        shoot with it; here it broadcasts to a 2-station field."""
        z = np.linspace(0.0, 5000.0, 300)
        ssp = LiteDataArray(pr.munk_ssp(z), dims=["depth"], coords={"depth": z})
        bathy = LiteDataArray(
            np.full(10, 4500.0), dims=["range"],
            coords={"range": np.linspace(0, 40e3, 10)},
        )
        env = pr.OceanEnvironment2D(
            sound_speed=ssp, bathymetry=bathy, flat_earth_transform=False
        )
        ray = pr.shoot_ray(
            1000.0, 0.0, -8.0, 30e3, 30, env, flatearth=False,
            interp="table", dtype="float64",
        )
        assert ray is not None
        assert np.isfinite(ray.t[-1])


class TestEventIndicators:
    """Reference-parity ±1 indicator functions (integration_processes.py)."""

    def setup_method(self):
        self.c = np.full((3, 5), 1500.0)
        self.rin = np.linspace(0, 10e3, 3)
        self.zin = np.linspace(0, 100, 5)
        self.depths = np.full(3, 80.0)

    def test_surface_bounce(self):
        up_above = np.array([0.0, -1.0, -1e-4])
        down_above = np.array([0.0, -1.0, 1e-4])
        up_below = np.array([0.0, 10.0, -1e-4])
        a = (5e3, up_above, self.c, None, self.rin, self.zin)
        assert pr.surface_bounce(*a) == 1.0
        assert pr.surface_bounce(5e3, down_above, self.c, None, self.rin, self.zin) == -1.0
        assert pr.surface_bounce(5e3, up_below, self.c, None, self.rin, self.zin) == -1.0

    def test_bottom_bounce(self):
        down_below = np.array([0.0, 90.0, 1e-4])
        up_below = np.array([0.0, 90.0, -1e-4])
        assert pr.bottom_bounce(
            5e3, down_below, self.c, None, self.rin, self.zin, self.depths, self.rin
        ) == 1.0
        assert pr.bottom_bounce(
            5e3, up_below, self.c, None, self.rin, self.zin, self.depths, self.rin
        ) == -1.0

    def test_vertical_ray(self):
        vert = np.array([0.0, 50.0, 1.0 / 1500.0])
        flat = np.array([0.0, 50.0, 1e-5])
        assert pr.vertical_ray(5e3, vert, self.c, None, self.rin, self.zin) == 1.0
        assert pr.vertical_ray(5e3, flat, self.c, None, self.rin, self.zin) == -1.0

    def test_bbox(self):
        inside = np.array([0.0, 50.0, 0.0])
        outside = np.array([0.0, 200.0, 0.0])
        assert pr.ray_bounding_box_event(5e3, inside, self.c, None, self.rin, self.zin) == -1.0
        assert pr.ray_bounding_box_event(5e3, outside, self.c, None, self.rin, self.zin) == 1.0
        assert pr.ray_bounding_box_event(20e3, inside, self.c, None, self.rin, self.zin) == 1.0

    def test_derivsrd_alias(self):
        y = np.array([0.0, 50.0, 1e-4])
        d = pr.derivsrd(5e3, y, self.c, np.zeros_like(self.c), self.rin, self.zin)
        s_fac = np.sqrt(1.0 - (1500.0 * 1e-4) ** 2)
        np.testing.assert_allclose(d[0], 1.0 / (1500.0 * s_fac), rtol=1e-7)


class TestXrlite:
    def test_differentiate_matches_gradient(self):
        z = np.linspace(0, 100, 50)
        vals = z**2
        da = LiteDataArray(vals, dims=["depth"], coords={"depth": z})
        dd = da.differentiate("depth")
        np.testing.assert_allclose(dd.values, np.gradient(vals, z))

    def test_isel(self):
        da = LiteDataArray(
            np.arange(12).reshape(3, 4), dims=["range", "depth"],
            coords={"range": [0, 1, 2], "depth": [0, 10, 20, 30]},
        )
        sl = da.isel(range=1)
        assert sl.values.tolist() == [4, 5, 6, 7]
        assert sl.dims == ("depth",)

    def test_coord_attr_access(self):
        da = LiteDataArray(np.zeros(3), dims=["range"], coords={"range": [1, 2, 3]})
        assert list(da.range.values) == [1, 2, 3]

    def test_sizes(self):
        da = LiteDataArray(np.zeros((2, 5)), dims=["range", "depth"])
        assert da.sizes["range"] == 2 and da.sizes["depth"] == 5


class TestProfilingUtils:
    def test_timer_phases(self):
        t = Timer()
        with t.phase("a"):
            _ = sum(range(1000))
        with t.phase("b"):
            _ = sum(range(1000))
        rep = t.report()
        assert "a" in rep and "b" in rep and "total" in rep

    def test_timed(self):
        holder = {}
        with timed("x", holder):
            pass
        assert "x" in holder


class TestDroppedRayDiagnostics:
    def test_keep_dropped_exposes_death_codes(self):
        env = const_env(c0=1500.0, r_max=40e3)
        rf = pr.shoot_rays(
            200.0, 0.0, [-90.0, -45.0, -5.0], 30e3, 10, env,
            flatearth=False, keep_dropped=True, interp="table", dtype="float64",
        )
        assert len(rf) == 3
        assert rf.death_code[2] == 0
        assert rf.death_code[0] != 0  # vertical ray dies
        # a steep-but-not-vertical ray legitimately survives by ping-ponging
        assert rf.n_botts[1] + rf.n_surfs[1] > 0
        # without keep_dropped the dead rays are filtered like the reference
        rf2 = pr.shoot_rays(
            200.0, 0.0, [-90.0, -45.0, -5.0], 30e3, 10, env,
            flatearth=False, interp="table", dtype="float64",
        )
        assert len(rf2) == 2
        assert rf2.alive.all() and (rf2.death_code == 0).all()

    def test_nan_past_death_and_container_protocol(self):
        """Reference save-grid semantics (`launch_rays.py:745-784`): save
        points a dropped ray never reached are NaN, and the termination
        diagnostics survive slicing, concatenation, and the npz round-trip."""
        env = const_env(c0=1500.0, r_max=40e3)
        rf = pr.shoot_rays(
            200.0, 0.0, [-90.0, -45.0, -5.0], 30e3, 10, env,
            flatearth=False, keep_dropped=True, interp="table", dtype="float64",
        )
        dead = ~rf.alive
        assert dead[0] and rf.alive[2]
        # the vertical ray dies immediately: every post-death save is NaN
        assert np.isnan(rf.ts[0, -1]) and np.isnan(rf.zs[0, -1])
        assert np.isnan(rf.ps[0, -1])
        # alive rays carry no NaN anywhere
        assert np.isfinite(rf.ts[rf.alive]).all()

        # slicing keeps the diagnostics aligned
        sub = rf[np.array([0, 2])]
        np.testing.assert_array_equal(sub.alive, rf.alive[[0, 2]])
        np.testing.assert_array_equal(sub.death_code, rf.death_code[[0, 2]])
        assert np.isnan(sub.ts[0, -1])
        # int indexing attaches them to the Ray
        ray0 = rf[0]
        assert ray0.alive is False and ray0.death_code == rf.death_code[0]

        # concatenation carries them through
        both = sub + rf[1:2]
        np.testing.assert_array_equal(
            both.alive, np.concatenate([sub.alive, rf.alive[1:2]]))
        np.testing.assert_array_equal(
            both.death_code,
            np.concatenate([sub.death_code, rf.death_code[1:2]]))

        # npz round-trip preserves diagnostics and the NaN mask
        import tempfile, os

        with tempfile.TemporaryDirectory() as d:
            path = os.path.join(d, "fan.npz")
            rf.save_npz(path)
            back = pr.RayFan.load_npz(path)
        np.testing.assert_array_equal(back.alive, rf.alive)
        np.testing.assert_array_equal(back.death_code, rf.death_code)
        np.testing.assert_array_equal(np.isnan(back.ts), np.isnan(rf.ts))

        # nan_dropped=False keeps the frozen last-alive state (all finite)
        rf_frozen = pr.shoot_rays(
            200.0, 0.0, [-90.0, -45.0, -5.0], 30e3, 10, env,
            flatearth=False, keep_dropped=True, nan_dropped=False,
            interp="table", dtype="float64",
        )
        assert np.isfinite(rf_frozen.ts).all()

    def test_debug_reports_terminations(self, capsys):
        """``debug=True`` prints per-ray termination diagnostics — the
        post-trace equivalent of the reference's in-loop event prints
        (`launch_rays.py:428-456`): reason, approximate location, bounces."""
        env = const_env(c0=1500.0, r_max=40e3)
        pr.shoot_rays(
            200.0, 0.0, [-90.0, -5.0], 30e3, 10, env,
            flatearth=False, debug=True, keep_dropped=True,
            interp="table", dtype="float64",
        )
        err = capsys.readouterr().err
        assert "ray 0" in err and "vertical" in err
        assert "1/2 rays alive" in err
        # single-ray path reports too, and still returns None for a drop
        ray = pr.shoot_ray(
            200.0, 0.0, -90.0, 30e3, 10, env,
            flatearth=False, debug=True, interp="table", dtype="float64",
        )
        assert ray is None
        err = capsys.readouterr().err
        assert "vertical" in err and "0/1 rays alive" in err


class TestSettingsFor:
    def test_rtol_maps_to_dx(self):
        s9 = pr.settings_for(rtol=1e-9)
        s6 = pr.settings_for(rtol=1e-6)
        assert s6.dx > s9.dx
        s = pr.settings_for(dx=33.0)
        assert s.dx == 33.0

    def test_rtol_tracks_achieved_accuracy(self):
        """Property test for the reference-compat ``rtol`` kwarg: the
        dx = 50·(rtol/1e-9)^¼ map (shoot.py) is designed so the fixed-step
        RK4 engine's O(dx⁴) travel-time error scales ∝ rtol.  On a smooth
        (spectral) profile the 4th order holds: sweep two decades against a
        self-converged dx=5 reference and assert the achieved relative
        error (a) tracks the requested rtol decade-for-decade and (b) beats
        it in absolute calibration (measured ≈1e-4·rtol on Munk).

        The map is honest only for smooth RHS: with ``interp="table"`` the
        bilinear field is C⁰ across grid lines, RK4 degrades to ~O(dx^0.6),
        and the achieved error is interpolation-limited (measured ~1e-9
        relative regardless of rtol) — documented as nominal in
        docs/api.md."""
        env = munk_env(r_max=35e3, nr=20, nz=400)
        angles = [-8.0, -3.0, 2.0, 7.0]
        kw = dict(flatearth=False, interp="auto", dtype="float64")

        ref = pr.shoot_rays(1300.0, 0.0, angles, 30e3, 5, env, dx=5.0, **kw)
        t_ref = ref.ts[:, -1]
        assert len(ref) == len(angles)

        errs = {}
        for rtol in (1e-5, 1e-7, 1e-9):
            fan = pr.shoot_rays(1300.0, 0.0, angles, 30e3, 5, env,
                                rtol=rtol, **kw)
            errs[rtol] = float(np.max(np.abs(fan.ts[:, -1] - t_ref) / t_ref))

        # (a) proportional tracking: each 100x rtol decrease buys between
        # 10x and 1000x error decrease (pure-power-law region of the map;
        # measured ~70-100x per two decades).
        for hi, lo in ((1e-5, 1e-7), (1e-7, 1e-9)):
            ratio = errs[hi] / max(errs[lo], 1e-16)
            assert 10.0 < ratio < 1000.0, (errs, ratio)
        # (b) absolute calibration: achieved relative error ≤ rtol itself
        # (measured headroom ~1e4; the bound is the user-facing contract).
        for rtol, e in errs.items():
            assert e <= rtol, (rtol, e)


class TestVerticalSourceArray:
    def test_per_ray_source_depths(self):
        """TPU extension: one trace for a vertical source array (per-ray
        source depth), matching individual scalar-source shots."""
        env = munk_env(r_max=30e3, nr=20, nz=300)
        angles = np.array([-6.0, -6.0, -6.0])
        depths = np.array([800.0, 1300.0, 1800.0])
        rf = pr.shoot_rays(
            depths, 0.0, angles, 30e3, 20, env, flatearth=False,
            interp="table", dtype="float64",
        )
        np.testing.assert_array_equal(rf.source_depths, depths)
        for i, d in enumerate(depths):
            single = pr.shoot_ray(
                float(d), 0.0, -6.0, 30e3, 20, env, flatearth=False,
                interp="table", dtype="float64",
            )
            np.testing.assert_allclose(rf.zs[i], single.z, atol=1e-9)
            np.testing.assert_allclose(rf.ts[i], single.t, atol=1e-12)


class TestStructuralJitCache:
    def test_same_structure_envs_share_executable(self):
        """Two environments with identical structure but different values
        must reuse one compiled trace — and still produce their own results."""
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings, _XLA_JIT_CACHE, trace

        z = np.linspace(0.0, 5000.0, 301)
        r = np.asarray([0.0, 50e3])
        kw = dict(interp="table", dtype="float64")
        env_a = make_env_data(np.tile(munk_ssp(z), (2, 1)), r, z,
                              np.full(2, 4500.0), r, **kw)
        env_b = make_env_data(np.tile(munk_ssp(z) + 5.0, (2, 1)), r, z,
                              np.full(2, 4500.0), r, **kw)

        settings = SolverSettings(dx=200.0, interp="table")
        p0 = np.sin(np.radians([6.0, 9.0])) / 1500.0
        n_before = len(_XLA_JIT_CACHE)
        res_a = trace(env_a, 1000.0, p0, 0.0, 30e3, 5, settings)
        n_after_a = len(_XLA_JIT_CACHE)
        res_b = trace(env_b, 1000.0, p0, 0.0, 30e3, 5, settings)
        n_after_b = len(_XLA_JIT_CACHE)

        assert n_after_a == n_before + 1
        assert n_after_b == n_after_a  # second env reused the executable
        # ...but the faster medium must yield shorter travel times
        assert np.all(np.asarray(res_b.ts[:, -1]) < np.asarray(res_a.ts[:, -1]))


class TestReviewRegressions:
    """Regression pins for the round-3 high-effort review findings."""

    def test_f32_xla_domain_edge_rays_survive(self):
        """On-device f32 range arithmetic must not spuriously kill the fan
        at a receiver sitting exactly on the domain edge (the out-of-domain
        step flags are precomputed on the host in float64)."""
        import jax.numpy as jnp

        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings, trace

        z = np.linspace(0, 6000, 400)
        r = np.linspace(0, 50e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(8, 5000.0), r, dtype=jnp.float32)
        p0 = np.sin(np.radians(-np.linspace(-8, 8, 32))) / 1500.0
        res = trace(env, 1300.0, p0, 0.0, 50e3, 5,
                    SolverSettings(dx=50.0, backend="xla"))
        assert np.asarray(res.alive).all()

    def test_duplicate_grid_coordinates_rejected(self):
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        z = np.linspace(0, 5000, 100)
        r = np.array([0.0, 25e3, 25e3, 50e3])
        c = np.outer(np.ones(4), munk_ssp(z))
        with pytest.raises(ValueError, match="monotonically increasing"):
            make_env_data(c, r, z, np.full(4, 5000.0), r)

    def test_empty_fan_is_concat_identity(self):
        from conftest import synthetic_ray
        from pygenray_tpu.ray_objects import RayFan

        fan = RayFan([synthetic_ray(launch_angle=a) for a in (-5.0, 0.0, 5.0)])
        empty = fan[np.zeros(len(fan), bool)]
        assert len(empty) == 0
        assert len(empty + fan) == len(fan)
        assert len(fan + empty) == len(fan)
        np.testing.assert_array_equal((empty + fan).thetas, fan.thetas)

    def test_received_angle_uses_positive_depth(self):
        """EigenRays received angles must interpolate c at the positive-down
        receiver depth — a linear-gradient profile makes the reference's
        above-surface extrapolation visible."""
        import pygenray_tpu as pr
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.integrate import SolverSettings

        z = np.linspace(0, 5000, 200)
        r = np.linspace(0, 20e3, 4)
        c2d = np.outer(np.ones(4), 1500.0 + 0.05 * z)  # strong gradient
        env = make_env_data(c2d, r, z, np.full(4, 5000.0), r, dtype="float64")
        fan = pr.shoot_rays(1000.0, 0.0, np.linspace(-8, 8, 41), 20e3, 2,
                            env, flatearth=False, dx=200.0)
        er = pr.find_eigenrays(fan, [1000.0], 1000.0, 0.0, 20e3, 5, env,
                               ztol=1.0, flatearth=False, dx=200.0)
        assert er.num_eigenrays_found[0] >= 1
        # receive angle from sin(theta) = p * c at the TRUE receiver depth
        for k in range(er.num_eigenrays_found[0]):
            z_end = -er.zs[0][k, -1]  # positive-down
            c_rcv = 1500.0 + 0.05 * z_end
            expect = np.degrees(np.arcsin(np.clip(
                er.ps[0][k, -1] * c_rcv, -1, 1)))
            assert abs(er.received_angles[0][k] - expect) < 0.05


class TestEnvDataBackwards:
    """Bare-EnvData backwards shots: the device pytree is mirrored directly
    (``mirror_env_data``) — must match the host-array mirroring used by
    OceanEnvironment2D inputs (reference: launch_rays.py:684-714)."""

    def _rd_env_arrays(self, bangle_rough=False):
        z = np.linspace(0, 5000, 300)
        r = np.linspace(0, 40e3, 24)
        c = np.outer(1.0 + 1e-3 * np.linspace(0, 1, 24), pr.munk_ssp(z))
        if bangle_rough:
            # forces bangle_mode="spline" (cubic spline too wiggly for cheb)
            rng = np.random.RandomState(3)
            bathy = 4500.0 + 150.0 * np.cumsum(rng.randn(24)) / 5.0
        else:
            bathy = np.linspace(4400.0, 4800.0, 24)
        return c, r, z, bathy

    @pytest.mark.parametrize("bangle_rough", [False, True])
    def test_mirror_env_data_matches_host_mirror(self, bangle_rough):
        from pygenray_tpu.envdata import make_env_data, mirror_env_arrays, mirror_env_data

        c, r, z, bathy = self._rd_env_arrays(bangle_rough)
        env = make_env_data(c, r, z, bathy, r, dtype="float64")
        dev = mirror_env_data(env)
        ci, cpi, ri, bi, bri, bai = mirror_env_arrays(
            np.asarray(env.c), np.asarray(env.dcdz), np.asarray(env.r),
            np.asarray(env.bathy), np.asarray(env.bathy_r),
            np.asarray(env.bottom_angle),
        )
        host = make_env_data(ci, ri, z, bi, bri, bottom_angle=bai,
                             dcdz=cpi, dtype="float64")
        assert dev.bangle_mode == host.bangle_mode
        np.testing.assert_allclose(np.asarray(dev.c), np.asarray(host.c))
        np.testing.assert_allclose(np.asarray(dev.r), np.asarray(host.r))
        np.testing.assert_allclose(np.asarray(dev.bottom_angle),
                                   np.asarray(host.bottom_angle))
        assert dev.r_dom == host.r_dom and dev.bathy_r_dom == host.bathy_r_dom
        # bottom-angle model evaluates identically in the mirrored frame
        from pygenray_tpu.integrate import _make_bangle

        xq = np.linspace(dev.bathy_r_dom[0], dev.bathy_r_dom[1], 64)
        sd, cd = _make_bangle(dev)(xq)
        sh, ch = _make_bangle(host)(xq)
        np.testing.assert_allclose(np.asarray(sd), np.asarray(sh),
                                   rtol=0, atol=5e-8)
        np.testing.assert_allclose(np.asarray(cd), np.asarray(ch),
                                   rtol=0, atol=5e-8)

    def test_backwards_shot_bare_envdata(self):
        """shoot_rays with receiver < source now accepts a bare EnvData and
        matches the OceanEnvironment2D backwards path exactly."""
        from pygenray_tpu.envdata import make_env_data

        c, r, z, bathy = self._rd_env_arrays()
        env = make_env_data(c, r, z, bathy, r, dtype="float64")
        angles = np.linspace(-8, 8, 17)
        fan = pr.shoot_rays(1200.0, 40e3, angles, 0.0, 8, env,
                            flatearth=False, dx=200.0, dtype="float64")
        assert len(fan) == 17
        # forward shot in the manually mirrored env must agree
        from pygenray_tpu.envdata import mirror_env_data

        fan_f = pr.shoot_rays(1200.0, -40e3, angles, 0.0, 8,
                              mirror_env_data(env), flatearth=False,
                              dx=200.0, dtype="float64")
        np.testing.assert_allclose(fan.ts, fan_f.ts, rtol=0, atol=1e-12)
        np.testing.assert_allclose(fan.zs, fan_f.zs, rtol=0, atol=1e-12)
        np.testing.assert_array_equal(fan.n_botts, fan_f.n_botts)

    def test_backwards_eigenrays_bare_envdata(self):
        from pygenray_tpu.envdata import make_env_data

        c, r, z, bathy = self._rd_env_arrays()
        env = make_env_data(c, r, z, bathy, r, dtype="float64")
        angles = np.linspace(-10, 10, 41)
        fan = pr.shoot_rays(1200.0, 40e3, angles, 0.0, 8, env,
                            flatearth=False, dx=200.0, dtype="float64")
        er = pr.find_eigenrays(fan, [1200.0], 1200.0, 40e3, 0.0, 8, env,
                               ztol=1.0, flatearth=False, dx=200.0,
                               dtype="float64")
        assert er.num_eigenrays_found[0] >= 1
        assert np.all(np.abs(er.zs[0][:, -1] + 1200.0) < 1.0)


class TestIndicatorsDriveScipy:
    """The ±1 event indicators' stated purpose is driving external scipy
    solvers (`ops/host.py:77-84`): run a real reference-style
    `solve_ivp` event-segmented shoot with them and check travel time and
    bounce counts against this package's engine."""

    def test_scipy_event_loop_matches_engine(self):
        from functools import partial

        from scipy.integrate import solve_ivp

        from pygenray_tpu.ops.host import (
            bilinear_np,
            bottom_bounce,
            derivs_np,
            ray_bounding_box_event,
            surface_bounce,
            vertical_ray,
        )

        # shallow Munk slab with a flat bottom: a steep ray bounces off
        # both boundaries within 30 km
        z = np.linspace(0.0, 1200.0, 400)
        r = np.linspace(0.0, 40e3, 8)
        c = np.outer(np.ones(8), pr.munk_ssp(z))
        bathy = np.full(8, 1000.0)
        x1 = 30e3

        angle = 12.0  # user convention; ODE convention integrates -angle
        c0 = bilinear_np(0.0, 200.0, r, z, c)
        p_ode0 = np.sin(np.radians(-angle)) / c0
        y0 = np.array([0.0, 200.0, p_ode0])

        cp = np.gradient(c, z, axis=1)
        args = (c, cp, r, z, bathy, r)
        events = []
        for f in (surface_bounce, bottom_bounce, vertical_ray,
                  ray_bounding_box_event):
            ev = partial(f, **{})
            ind = lambda x, y, f=f: f(x, y, *args)
            ind.terminal = True
            events.append(ind)

        n_surf = n_bott = 0
        x = 0.0
        for _ in range(200):
            sol = solve_ivp(
                lambda x, y: derivs_np(x, y, c, cp, r, z),
                (x, x1), y0, rtol=1e-9, atol=1e-9, events=events,
                dense_output=False, max_step=500.0,
            )
            if sol.status != 1:  # reached x1 with no event
                break
            hit = [i for i, te in enumerate(sol.t_events) if te.size][0]
            x = sol.t_events[hit][0]
            y0 = sol.y_events[hit][0].copy()
            assert hit in (0, 1), "steep shallow ray must only bounce"
            y0[2] = -y0[2]  # specular reflection (flat bottom)
            if hit == 0:
                n_surf += 1
                y0[1] = abs(y0[1])
            else:
                n_bott += 1
        else:
            raise AssertionError("event loop did not terminate")
        t_scipy = sol.y[0, -1]

        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.integrate import SolverSettings, trace

        env = make_env_data(c, r, z, bathy, r, dtype="float64")
        res = trace(env, 200.0, np.array([p_ode0]), 0.0, x1, 2,
                    SolverSettings(dx=50.0, interp="table"))
        assert int(res.n_surf[0]) == n_surf > 0
        assert int(res.n_bott[0]) == n_bott > 0
        t_engine = float(np.asarray(res.ts)[0, -1])
        # two different integrators (adaptive RK45 vs fixed RK4) on a
        # multi-bounce path: agree to ~1e-5 s over ~20 s of travel time
        assert abs(t_engine - t_scipy) < 2e-5
