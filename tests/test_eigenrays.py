"""Eigenray solver tests: analytic oracle in constant-c, Munk convergence,
bookkeeping (counts, failed brackets), and EigenRays object behavior."""

import numpy as np
import pytest
from matplotlib import pyplot as plt

import pygenray_tpu as pr
from pygenray_tpu.models import const_env, munk_env

TABLE = dict(interp="table", dtype="float64")


class TestEigenraysConstC:
    """In a homogeneous medium rays are straight lines, so the eigenray
    launch angle to a receiver at (R, zr) from a source at z0 is exactly
    atan((zr - z0)/R) — a closed-form oracle for the whole solver chain."""

    C0 = 1500.0
    Z0 = 1000.0
    R = 30e3

    def _fan(self, env):
        angles = np.linspace(-12, 12, 49)
        return pr.shoot_rays(
            self.Z0, 0.0, angles, self.R, 50, env, flatearth=False, **TABLE
        )

    def test_analytic_eigenray_angle(self):
        env = const_env(c0=self.C0, z_max=6000.0, bathy_depth=5500.0, r_max=self.R + 1e3)
        rays = self._fan(env)
        receiver_depth = 2500.0
        er = pr.find_eigenrays(
            rays, [receiver_depth], self.Z0, 0.0, self.R, 50, env,
            ztol=0.5, flatearth=False, **TABLE,
        )
        # two paths: direct (downward) and surface-bounce (upward then down)
        assert er.num_eigenrays_found[0] == 2
        direct_mask = (er.n_surfs[0] == 0) & (er.n_botts[0] == 0)
        assert direct_mask.sum() == 1 and (~direct_mask).sum() == 1
        # analytic: z_ode grows as z0 + R tan(theta_ode); theta_ode = -user
        th_direct = -np.degrees(np.arctan((receiver_depth - self.Z0) / self.R))
        th_bounce = np.degrees(np.arctan((receiver_depth + self.Z0) / self.R))
        found_direct = er.launch_angles[0][direct_mask][0]
        found_bounce = er.launch_angles[0][~direct_mask][0]
        assert found_direct == pytest.approx(th_direct, abs=0.01)
        assert found_bounce == pytest.approx(th_bounce, abs=0.01)
        assert er.n_surfs[0][~direct_mask][0] == 1
        # final depths within ztol (user convention: zs negative down)
        assert np.all(np.abs(er.zs[0][:, -1] + receiver_depth) < 0.5)
        # received angle equals launch angle magnitude in constant c
        assert abs(abs(er.received_angles[0][direct_mask][0]) - abs(th_direct)) < 0.05

    def test_travel_time_matches_straight_line(self):
        env = const_env(c0=self.C0, z_max=6000.0, bathy_depth=5500.0, r_max=self.R + 1e3)
        rays = self._fan(env)
        rd = 2500.0
        er = pr.find_eigenrays(
            rays, [rd], self.Z0, 0.0, self.R, 50, env, ztol=0.1,
            flatearth=False, **TABLE,
        )
        direct = (er.n_surfs[0] == 0) & (er.n_botts[0] == 0)
        L = np.hypot(self.R, rd - self.Z0)
        assert er.ts[0][direct, -1][0] == pytest.approx(L / self.C0, rel=1e-5)


class TestEigenraysMunk:
    def _setup(self):
        env = munk_env(r_max=50e3, nr=30, nz=400)
        angles = np.linspace(-14, 14, 141)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 50, env, flatearth=False, **TABLE)
        return env, rays

    def test_multipath_convergence(self):
        env, rays = self._setup()
        rds = [1000.0, 1300.0]
        er = pr.find_eigenrays(
            rays, rds, 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        for ridx, rd in enumerate(rds):
            assert er.num_eigenrays_found[ridx] >= 2  # multipath arrivals
            # every found eigenray ends within ztol of the receiver
            resid = np.abs(er.zs[ridx][:, -1] + rd)
            assert np.all(resid < 1.0)
            # bookkeeping consistency
            assert (
                er.num_eigenrays_found[ridx]
                + len(er.failed_eray_theta_brackets[ridx])
                == er.num_eigenrays[rd]
            )

    def test_eigenrays_match_fan_bracketing(self):
        """Each eigenray launch angle must lie inside one fan bracket."""
        env, rays = self._setup()
        rd = 1300.0
        er = pr.find_eigenrays(
            rays, [rd], 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        sign = np.sign(rays.zs[:, -1] + rd)
        starts = np.where(np.diff(sign))[0]
        brackets = [(rays.thetas[s], rays.thetas[s + 1]) for s in starts]
        for th in er.launch_angles[0]:
            assert any(min(a, b) - 1e-9 <= th <= max(a, b) + 1e-9 for a, b in brackets)

    def test_plot_smokes(self):
        env, rays = self._setup()
        er = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        plt.figure()
        er.plot()
        er.plot_angle_time()
        er.plot_ducted()
        plt.close("all")

    def test_save_mat(self, tmp_path):
        import scipy.io

        env, rays = self._setup()
        er = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        path = str(tmp_path / "erays.mat")
        er.save_mat(path)
        data = scipy.io.loadmat(path)
        assert "eigenrays" in data


class TestEigenraysEdgeCases:
    def test_no_brackets_returns_empty(self):
        env = const_env(c0=1500.0, r_max=31e3)
        angles = np.linspace(-2, -1, 11)  # all rays end above the receiver depth
        rays = pr.shoot_rays(1000.0, 0.0, angles, 30e3, 50, env, flatearth=False, **TABLE)
        er = pr.find_eigenrays(
            rays, [4000.0], 1000.0, 0.0, 30e3, 50, env, flatearth=False, **TABLE
        )
        assert er.num_eigenrays_found[0] == 0
        assert er.num_eigenrays[4000.0] == 0

    def test_timefront_many_receiver_depths(self):
        """Vertical-array timefront: eigenrays for many receiver depths in
        one call (the tomography observable)."""
        env = munk_env(r_max=50e3, nr=30, nz=400)
        angles = np.linspace(-12, 12, 97)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 50, env, flatearth=False, **TABLE)
        rds = np.linspace(800.0, 1800.0, 8)
        er = pr.find_eigenrays(
            rays, rds, 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        total = sum(er.num_eigenrays_found[i] for i in range(len(rds)))
        assert total >= len(rds)  # at least one arrival at every depth
        for i, rd in enumerate(rds):
            # every bracketed arrival converges at this short range
            assert er.num_eigenrays_found[i] == er.num_eigenrays[rd]
            assert er.num_eigenrays_found[i] >= 1
            if er.num_eigenrays_found[i]:
                assert np.all(np.abs(er.zs[i][:, -1] + rds[i]) < 1.0)


class TestEigenraysVariants:
    def test_flatearth_default_environment(self):
        """End-to-end with the default (flat-earth transformed) environment."""
        env = pr.OceanEnvironment2D()  # Munk to 100 km, fe transform applied
        angles = np.linspace(-10, 10, 81)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 60e3, 50, env, **TABLE)
        er = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 0.0, 60e3, 50, env, ztol=1.0, **TABLE
        )
        assert er.num_eigenrays_found[0] >= 1
        assert np.all(np.abs(er.zs[0][:, -1] + 1300.0) < 1.0)
        # received angles computed against the untransformed field are finite
        assert np.all(np.isfinite(er.received_angles[0]))

    def test_backwards_eigenrays(self):
        """source_range > receiver_range: brackets and convergence through
        the mirrored environment."""
        env = munk_env(r_max=50e3, nr=30, nz=400)
        angles = np.linspace(-12, 12, 97)
        rays = pr.shoot_rays(
            1300.0, 45e3, angles, 5e3, 50, env, flatearth=False, **TABLE
        )
        assert rays.rs[0, 0] == 45e3 and rays.rs[0, -1] == 5e3
        er = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 45e3, 5e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        assert er.num_eigenrays_found[0] >= 1
        assert np.all(np.abs(er.zs[0][:, -1] + 1300.0) < 1.0)
        # eigenray ranges run backwards from source to receiver
        assert er.rs[0][0, 0] == 45e3 and er.rs[0][0, -1] == 5e3


class TestCacheIsolation:
    def test_struct_identical_envs_use_own_sound_speed(self):
        """Two environments with identical structure but different c fields
        must not share launch-parameter constants through the structurally
        keyed solver cache (regression: c_src was baked into the closure)."""
        import jax.numpy as jnp

        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        z = np.linspace(0, 6000, 300)
        r = np.linspace(0, 20e3, 4)
        bathy = np.full(4, 5000.0)

        def solve_with(env):
            fan = pr.shoot_rays(1300.0, 0.0, np.linspace(-10, 10, 41), 20e3,
                                2, env, flatearth=False, dx=500.0)
            return pr.find_eigenrays(
                fan, [1300.0], 1300.0, 0.0, 20e3, 2, env, ztol=1.0,
                flatearth=False, dx=500.0,
            )

        c1 = np.outer(np.ones(4), munk_ssp(z))
        c2 = c1 * 1.02  # same structure, 2% faster medium
        env1 = make_env_data(c1, r, z, bathy, r, dtype=jnp.float64)
        env2 = make_env_data(c2, r, z, bathy, r, dtype=jnp.float64)

        er1 = solve_with(env1)  # populates the structurally keyed cache
        er2 = solve_with(env2)  # must NOT reuse env1's source sound speed
        t1 = np.sort(er1.ts[0][:, -1])
        t2 = np.sort(er2.ts[0][:, -1])
        assert er1.num_eigenrays_found[0] >= 1
        assert er2.num_eigenrays_found[0] >= 1
        # 2% faster medium -> ~2% earlier arrivals
        ratio = t2[0] / t1[0]
        assert abs(ratio - 1 / 1.02) < 2e-3, f"arrival ratio {ratio}"


class TestVerboseDeviceParity:
    """The verbose host loop and the device while_loop share ONE update
    implementation (``pygenray_tpu.rootfind.rootfind_update``); this pins
    that they produce identical hit angles and iteration counts on a Munk
    multipath case, for both methods."""

    @pytest.mark.parametrize("method", ["newton", "regula_falsi"])
    def test_verbose_matches_device(self, method):
        env = munk_env(r_max=40e3, nr=16, nz=400)
        angles = np.linspace(-10, 10, 61)
        fan = pr.shoot_rays(1000.0, 0.0, angles, 40e3, 10, env,
                            flatearth=False, dx=200.0, dtype="float64")
        kw = dict(ztol=0.5, flatearth=False, dx=200.0, dtype="float64")
        er_d = pr.find_eigenrays(fan, [1200.0, 3000.0], 1000.0, 0.0, 40e3,
                                 10, env, method=method, verbose=False, **kw)
        er_v = pr.find_eigenrays(fan, [1200.0, 3000.0], 1000.0, 0.0, 40e3,
                                 10, env, method=method, verbose=True, **kw)
        assert er_d.num_eigenrays_found == er_v.num_eigenrays_found
        assert er_d.num_eigenrays_found[0] >= 2  # real multipath case
        d_d, d_v = er_d.diagnostics, er_v.diagnostics
        np.testing.assert_array_equal(d_d["converged"], d_v["converged"])
        np.testing.assert_array_equal(d_d["iterations"], d_v["iterations"])
        for rd_idx in (0, 1):
            la_d = np.sort(np.asarray(er_d.launch_angles[rd_idx]))
            la_v = np.sort(np.asarray(er_v.launch_angles[rd_idx]))
            np.testing.assert_allclose(la_d, la_v, rtol=0, atol=1e-12)


class TestFindEigenraysBatch:
    """find_eigenrays_batch solves C (source, receiver-array) problems in
    one batched fan trace + one device solve, matching per-config
    find_eigenrays exactly (same update math, per-candidate c_src/z0)."""

    def test_matches_per_config_calls(self):
        env = munk_env(r_max=40e3, nr=16, nz=400)
        angles = np.linspace(-10, 10, 41)
        sds = [1000.0, 1400.0, 2000.0]
        rds = [900.0, 1300.0]
        kw = dict(ztol=0.5, flatearth=False, dx=200.0, dtype="float64")
        ers_b = pr.find_eigenrays_batch(angles, rds, sds, 0.0, 40e3, 10,
                                        env, **kw)
        assert len(ers_b) == 3
        for c, sd in enumerate(sds):
            fan = pr.shoot_rays(sd, 0.0, angles, 40e3, 10, env,
                                flatearth=False, dx=200.0, dtype="float64")
            er = pr.find_eigenrays(fan, rds, sd, 0.0, 40e3, 10, env, **kw)
            assert ers_b[c].num_eigenrays_found == er.num_eigenrays_found
            for d in range(2):
                np.testing.assert_allclose(
                    np.sort(ers_b[c].launch_angles[d]),
                    np.sort(er.launch_angles[d]), rtol=0, atol=1e-10,
                )
                np.testing.assert_allclose(
                    np.sort(ers_b[c].ts[d][:, -1]),
                    np.sort(er.ts[d][:, -1]), rtol=1e-11,
                )

    def test_empty_and_per_config_depths(self):
        env = munk_env(r_max=40e3, nr=16, nz=400)
        # receiver below every ray: no brackets anywhere
        ers = pr.find_eigenrays_batch(
            np.linspace(-3, 3, 9), [5800.0], [1300.0, 1500.0], 0.0, 40e3,
            10, env, ztol=0.5, flatearth=False, dx=200.0, dtype="float64",
        )
        assert [e.num_eigenrays_found for e in ers] == [{0: 0}, {0: 0}]
        # per-config receiver arrays of different lengths
        ers2 = pr.find_eigenrays_batch(
            np.linspace(-10, 10, 41), [[1300.0], [900.0, 1300.0]],
            [1300.0, 1000.0], 0.0, 40e3, 10, env,
            ztol=0.5, flatearth=False, dx=200.0, dtype="float64",
        )
        assert len(ers2[0].num_eigenrays_found) == 1
        assert len(ers2[1].num_eigenrays_found) == 2
        assert ers2[0].num_eigenrays_found[0] >= 1

    def test_heterogeneous_configs_with_failures(self):
        """The bookkeeping-heaviest batch path: C=3 configs with different
        receiver-depth arrays, one config with zero brackets anywhere, and
        failing brackets mixed in (regula falsi starved of iterations) —
        per-config counts, failed-bracket records, and diagnostics must
        match C independent ``find_eigenrays`` calls exactly."""
        env = munk_env(r_max=40e3, nr=16, nz=400)
        angles = np.linspace(-10, 10, 41)
        sds = [1000.0, 1300.0, 2000.0]
        # config 1's receiver (5800 m) lies below every ray: zero brackets
        rds = [[900.0, 1300.0, 2200.0], [5800.0], [800.0, 1500.0]]
        kw = dict(ztol=1e-3, max_iter=1, method="regula_falsi",
                  flatearth=False, dx=200.0, dtype="float64")
        ers_b = pr.find_eigenrays_batch(angles, rds, sds, 0.0, 40e3, 10,
                                        env, **kw)
        total_failed = 0
        total_found = 0
        for c, sd in enumerate(sds):
            fan = pr.shoot_rays(sd, 0.0, angles, 40e3, 10, env,
                                flatearth=False, dx=200.0, dtype="float64")
            er = pr.find_eigenrays(fan, rds[c], sd, 0.0, 40e3, 10, env, **kw)
            assert ers_b[c].num_eigenrays == er.num_eigenrays
            assert ers_b[c].num_eigenrays_found == er.num_eigenrays_found
            for d in range(len(rds[c])):
                np.testing.assert_allclose(
                    np.asarray(ers_b[c].failed_eray_theta_brackets[d], float),
                    np.asarray(er.failed_eray_theta_brackets[d], float),
                )
                np.testing.assert_allclose(
                    np.sort(ers_b[c].launch_angles[d]),
                    np.sort(er.launch_angles[d]), rtol=0, atol=1e-10,
                )
            if er.diagnostics["rd_idx"].size or ers_b[c].diagnostics["rd_idx"].size:
                for k in ("rd_idx", "iterations", "converged", "dropped"):
                    np.testing.assert_array_equal(
                        ers_b[c].diagnostics[k], er.diagnostics[k]
                    )
                np.testing.assert_allclose(
                    ers_b[c].diagnostics["depth_residual"],
                    er.diagnostics["depth_residual"], rtol=1e-12,
                )
            total_failed += sum(
                len(v) for v in er.failed_eray_theta_brackets.values()
            )
            total_found += sum(er.num_eigenrays_found.values())
        assert total_failed > 0  # failures genuinely mixed in
        assert total_found > 0  # and not everything failed
        assert ers_b[1].num_eigenrays == {5800.0: 0}
        assert ers_b[1].diagnostics["rd_idx"].size == 0


class TestEigenRaysNpz:
    def test_round_trip(self, tmp_path):
        """save_npz/load_npz preserves every per-depth field, the count
        bookkeeping, failed brackets, and solver diagnostics — including
        an empty receiver depth."""
        env = munk_env(r_max=50e3, nr=30, nz=400)
        angles = np.linspace(-14, 14, 141)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 50, env,
                             flatearth=False, **TABLE)
        # 5900 m is below every ray: zero brackets at that depth
        er = pr.find_eigenrays(
            rays, [1300.0, 5900.0], 1300.0, 0.0, 50e3, 50, env, ztol=1.0,
            flatearth=False, **TABLE,
        )
        p = tmp_path / "er.npz"
        er.save_npz(p)
        er2 = pr.EigenRays.load_npz(p)

        np.testing.assert_array_equal(er2.receiver_depths,
                                      np.asarray(er.receiver_depths, float))
        assert er2.num_eigenrays == er.num_eigenrays
        assert er2.num_eigenrays_found == er.num_eigenrays_found
        for i in range(len(er.receiver_depths)):
            for name in ("rs", "ts", "zs", "ps", "received_angles",
                         "launch_angles", "n_botts", "n_surfs",
                         "ray_id_int"):
                np.testing.assert_array_equal(
                    getattr(er2, name)[i], np.asarray(getattr(er, name)[i])
                )
            assert list(er2.ray_id[i]) == list(er.ray_id[i])
            assert er2.failed_eray_theta_brackets[i] == [
                (float(a), float(b))
                for a, b in er.failed_eray_theta_brackets[i]
            ]
        for k, v in er.diagnostics.items():
            np.testing.assert_array_equal(er2.diagnostics[k], v)
        # the empty depth survives with zero-size fields
        assert er2.rs[1].size == 0 and er2.num_eigenrays[5900.0] == 0
