"""Monte-Carlo ensemble tests: internal-wave perturbations, vmapped
ensemble tracing, and batched cross-realization eigenray solves."""

import numpy as np
import pytest

from pygenray_tpu.integrate import SolverSettings
from pygenray_tpu.models.internal_waves import iw_perturbations, perturbed_munk_tables
from pygenray_tpu.montecarlo import (
    make_env_ensemble,
    mc_eigenray_times,
    trace_ensemble,
)


class TestInternalWaves:
    def test_shapes_and_rms(self):
        z = np.linspace(0, 6000, 300)
        r = np.linspace(0, 100e3, 40)
        mu = iw_perturbations(z, r, n_realizations=4, mu_rms=5e-4, seed=1)
        assert mu.shape == (4, 40, 300)
        band = z < 2000.0
        rms = np.sqrt(np.mean(mu[..., band] ** 2))
        assert rms == pytest.approx(5e-4, rel=0.05)

    def test_decays_with_depth(self):
        z = np.linspace(0, 6000, 300)
        r = np.linspace(0, 100e3, 40)
        mu = iw_perturbations(z, r, n_realizations=4, seed=2)
        shallow = np.sqrt(np.mean(mu[..., z < 1000] ** 2))
        deep = np.sqrt(np.mean(mu[..., z > 4000] ** 2))
        assert deep < 0.2 * shallow

    def test_reproducible(self):
        z = np.linspace(0, 6000, 100)
        r = np.linspace(0, 50e3, 20)
        a = iw_perturbations(z, r, 2, seed=7)
        b = iw_perturbations(z, r, 2, seed=7)
        np.testing.assert_array_equal(a, b)


class TestEnsembleTrace:
    def _ensemble(self, E=3):
        c_ens, r, z = perturbed_munk_tables(E, r_max=50e3, nr=24, nz=400, seed=3)
        return make_env_ensemble(
            c_ens, r, z, np.full(24, 5000.0), r, dtype="float64"
        ), r, z

    def test_shapes(self):
        env_ens, r, z = self._ensemble()
        angles = np.linspace(-10, 10, 16)
        p0 = np.sin(np.radians(-angles)) / 1500.0
        res = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 20, SolverSettings(dx=100.0))
        assert res.ts.shape == (3, 16, 20)
        assert res.alive.shape == (3, 16)
        assert np.asarray(res.alive).all()

    def test_ensemble_calm_matches_event_path(self):
        """Per-realization calm ranges (classify_calm_ensemble) through the
        unrolled ensemble kernel: every realization's calm launch must
        reproduce its event path — no audit deaths, identical structure."""
        import jax.numpy as jnp

        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings, _plan
        from pygenray_tpu.ops.pallas_stepper import classify_calm_ensemble

        # range-smooth realizations: the calm drift allowance is a sound
        # worst-case (max range gradient x full path), so internal-wave
        # ensembles never prove calm — mesoscale-style smooth members do
        z = np.linspace(0, 6000, 400)
        r = np.linspace(0, 50e3, 16)
        c_ens = np.array([
            np.tile(munk_ssp(z, sofar_depth=1300.0 + 40.0 * e), (16, 1))
            for e in range(3)
        ])
        env_ens = make_env_ensemble(
            c_ens, r, z, np.full(16, 5000.0), r, dtype="float32"
        )
        s = SolverSettings(dx=500.0, backend="pallas")
        angles = np.linspace(-8, 8, 96)
        c0 = float(c_ens[0, 0, np.searchsorted(z, 1300.0)])
        p0 = (np.sin(np.radians(-angles)) / c0).astype(np.float32)
        h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
        geom = (0.0, 50e3, float(h), int(sps), int(nseg))
        tab = classify_calm_ensemble(env_ens, 1300.0, p0, geom, s)
        assert tab is not None and tab.shape == (3, 4)
        assert np.all(tab[:, 1] > tab[:, 0])  # ducted fan: all calm

        res_c = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 10, s,
                               calm=jnp.asarray(tab))
        res_0 = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 10, s)
        assert not np.any(np.asarray(res_c.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(res_c.death_code), np.asarray(res_0.death_code)
        )
        np.testing.assert_array_equal(
            np.asarray(res_c.n_surf), np.asarray(res_0.n_surf)
        )
        np.testing.assert_array_equal(
            np.asarray(res_c.n_bott), np.asarray(res_0.n_bott)
        )
        np.testing.assert_allclose(
            np.asarray(res_c.ts), np.asarray(res_0.ts), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(res_c.zs), np.asarray(res_0.zs), atol=5e-2
        )

    def test_ensemble_dyn_windows_match_event_path(self):
        """Per-realization dynamic-window tables (classify_dyn_ensemble)
        through the unrolled ensemble kernel: a bouncing fan with windows
        must reproduce the event path exactly — every bounce, every death,
        no audit kills."""
        import jax.numpy as jnp

        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings, _plan
        from pygenray_tpu.ops.pallas_stepper import classify_dyn_ensemble

        z = np.linspace(0, 6000, 400)
        r = np.linspace(0, 50e3, 16)
        c_ens = np.array([
            np.tile(munk_ssp(z, sofar_depth=1300.0 + 40.0 * e), (16, 1))
            for e in range(2)
        ])
        env_ens = make_env_ensemble(
            c_ens, r, z, np.full(16, 4600.0), r, dtype="float32"
        )
        s = SolverSettings(dx=500.0, backend="pallas")
        angles = np.linspace(-18, 18, 96)  # steep: genuinely bounces
        c0 = float(c_ens[0, 0, np.searchsorted(z, 1300.0)])
        p0 = (np.sin(np.radians(-angles)) / c0).astype(np.float32)
        h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
        geom = (0.0, 50e3, float(h), int(sps), int(nseg))
        tab = classify_dyn_ensemble(env_ens, 1300.0, p0, geom, s)
        assert tab is not None and tab.shape == (2, 1, 4)
        assert np.all(tab[:, :, 0] > 0)

        res_d = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 10, s,
                               dyn=jnp.asarray(tab))
        res_0 = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 10, s)
        assert np.asarray(res_0.n_surf).sum() > 0
        assert not np.any(np.asarray(res_d.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(res_d.death_code), np.asarray(res_0.death_code)
        )
        np.testing.assert_array_equal(
            np.asarray(res_d.n_surf), np.asarray(res_0.n_surf)
        )
        np.testing.assert_array_equal(
            np.asarray(res_d.n_bott), np.asarray(res_0.n_bott)
        )
        np.testing.assert_allclose(
            np.asarray(res_d.ts), np.asarray(res_0.ts), atol=5e-6
        )

    def test_unperturbed_realization_matches_single_trace(self):
        """An ensemble whose first member is unperturbed must reproduce the
        plain single-environment trace bit-for-bit."""
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.integrate import trace

        c_ens, r, z = perturbed_munk_tables(2, r_max=50e3, nr=24, nz=400, mu_rms=1e-4, seed=4)
        c_ens[0] = c_ens[0] * 0 + np.outer(
            np.ones(24), __import__("pygenray_tpu").munk_ssp(z)
        )
        bathy = np.full(24, 5000.0)
        env_ens = make_env_ensemble(c_ens, r, z, bathy, r, dtype="float64")
        env0 = make_env_data(
            c_ens[0], r, z, bathy, r, dtype="float64",
            cheb_order=env_ens.c_cheb.shape[-1] - 1, cheb_exact_order=True,
        )

        angles = np.linspace(-10, 10, 8)
        p0 = np.sin(np.radians(-angles)) / 1500.0
        s = SolverSettings(dx=100.0)
        res_e = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 10, s)
        res_s = trace(env0, 1300.0, p0, 0.0, 50e3, 10, s)
        np.testing.assert_allclose(
            np.asarray(res_e.ts)[0], np.asarray(res_s.ts), rtol=0, atol=1e-12
        )

    def test_perturbations_spread_travel_times(self):
        env_ens, r, z = self._ensemble()
        angles = np.linspace(-10, 10, 16)
        p0 = np.sin(np.radians(-angles)) / 1500.0
        res = trace_ensemble(env_ens, 1300.0, p0, 0.0, 50e3, 2, SolverSettings(dx=100.0))
        ts = np.asarray(res.ts)[..., -1]
        spread = np.ptp(ts, axis=0)  # across realizations
        assert np.all(spread > 0)
        assert np.all(spread < 0.1)  # small perturbations, small spread


class TestMCEigenrays:
    def test_mc_eigenray_times(self):
        c_ens, r, z = perturbed_munk_tables(3, r_max=50e3, nr=24, nz=400, seed=5)
        env_ens = make_env_ensemble(c_ens, r, z, np.full(24, 5000.0), r, dtype="float64")
        out = mc_eigenray_times(
            env_ens,
            np.linspace(-12, 12, 49),
            receiver_depth=1300.0,
            source_depth=1300.0,
            source_range=0.0,
            receiver_range=50e3,
            ztol=1.0,
            settings=SolverSettings(dx=100.0),
        )
        assert out["valid"].shape[0] == 3
        # every realization finds at least one arrival
        assert np.all(out["valid"].sum(axis=1) >= 1)
        # converged arrivals are within ztol
        assert np.all(out["z_resid"][out["valid"]] < 1.0)
        # travel times cluster near the unperturbed value
        t = out["t"][out["valid"]]
        assert np.all((t > 33.0) & (t < 34.0))


class TestMCBracketCapOverflow:
    def test_overflow_warns_and_matches_one_shot(self, monkeypatch):
        """When a realization exceeds MC_BRACKET_CAP, mc_eigenray_times must
        warn, fall back to the two-phase flow (reusing the one-shot fan's
        final depths), and find the same arrivals as the in-capacity
        one-shot path (montecarlo.py:432-457)."""
        import warnings

        import pygenray_tpu.montecarlo as mc

        c_ens, r, z = perturbed_munk_tables(2, r_max=30e3, nr=16, nz=400,
                                            seed=5)
        # f32: the one-shot path requires the ensemble tangent kernel,
        # which is f32-only (ops.pallas_stepper.tangent_supported)
        env_ens = make_env_ensemble(c_ens, r, z, np.full(16, 5000.0), r,
                                    dtype="float32")
        # backend="pallas" forces the one-shot path in interpret mode (the
        # default resolves to the XLA scan on CPU, which is two-phase-only);
        # kahan=False keeps the AD tangent chain out of XLA's pathological
        # simplification (CLAUDE.md)
        kw = dict(receiver_depth=1300.0, source_depth=1300.0,
                  source_range=0.0, receiver_range=30e3, ztol=1.0,
                  max_iter=12,
                  settings=SolverSettings(dx=250.0, backend="pallas",
                                          kahan=False))
        fan = np.linspace(-12, 12, 33)

        base = mc_eigenray_times(env_ens, fan, **kw)
        assert base["path"] == "one-shot"
        counts = base["valid"].sum(axis=1)
        assert counts.max() >= 2  # enough brackets that cap=1 overflows

        monkeypatch.setattr(mc, "MC_BRACKET_CAP", 1)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            fb = mc_eigenray_times(env_ens, fan, **kw)
        assert any("MC_BRACKET_CAP" in str(x.message) for x in w)
        assert fb["path"] == "two-phase"

        # same bracket set (the fallback reuses the fan), same arrivals
        np.testing.assert_array_equal(fb["valid"].sum(axis=1), counts)
        for e in range(2):
            tb = np.sort(base["t"][e][base["valid"][e]])
            tf = np.sort(fb["t"][e][fb["valid"][e]])
            np.testing.assert_allclose(tf, tb, atol=5e-5)
            ab = np.sort(base["theta"][e][base["valid"][e]])
            af = np.sort(fb["theta"][e][fb["valid"][e]])
            np.testing.assert_allclose(af, ab, atol=0.02)


class TestMCEigenraysMultiDepth:
    def test_depth_array_matches_per_depth_calls(self):
        """A vertical receiver array solves all depths in one device call;
        results must match independent scalar-depth solves."""
        c_ens, r, z = perturbed_munk_tables(2, r_max=30e3, nr=16, nz=400, seed=5)
        env_ens = make_env_ensemble(c_ens, r, z, np.full(16, 5000.0), r,
                                    dtype="float64")
        kw = dict(source_depth=1300.0, source_range=0.0,
                  receiver_range=30e3, ztol=1.0,
                  settings=SolverSettings(dx=250.0))
        fan = np.linspace(-12, 12, 37)
        rds = np.array([900.0, 1300.0, 1700.0])
        multi = mc_eigenray_times(env_ens, fan, rds, **kw)
        assert multi["valid"].shape[0] == 3
        for d, rd in enumerate(rds):
            single = mc_eigenray_times(env_ens, fan, float(rd), **kw)
            M = single["valid"].shape[1]
            assert np.array_equal(multi["valid"][d, :, :M], single["valid"])
            assert not multi["valid"][d, :, M:].any()
            v = single["valid"]
            np.testing.assert_allclose(
                multi["theta"][d, :, :M][v], single["theta"][v], atol=1e-6
            )
            np.testing.assert_allclose(
                multi["t"][d, :, :M][v], single["t"][v], atol=1e-9
            )
            np.testing.assert_array_equal(
                multi["n_bott"][d, :, :M][v], single["n_bott"][v]
            )


class TestMCEigenraysKernel:
    def test_newton_kernel_path_matches_xla_regula_falsi(self):
        """backend='pallas' routes the MC eigenray iterations through the
        ensemble tangent kernel (Newton, interpret mode on CPU); arrivals
        must match the XLA regula-falsi solve."""
        import dataclasses

        c_ens, r, z = perturbed_munk_tables(2, r_max=30e3, nr=16, nz=400, seed=5)
        env_ens = make_env_ensemble(
            c_ens, r, z, np.full(16, 5000.0), r, dtype="float32", cheb_order=31
        )
        # kernel-vs-XLA comparison: keep both on Clenshaw (interpret-mode
        # Horner contraction drifts; hardware paths are bitwise identical)
        env_ens = dataclasses.replace(env_ens, poly_ok=False)
        kw = dict(
            receiver_depth=1300.0,
            source_depth=1300.0,
            source_range=0.0,
            receiver_range=30e3,
            ztol=1.0,
            max_iter=8,
        )
        fan = np.linspace(-12, 12, 37)
        out_k = mc_eigenray_times(
            env_ens, fan, settings=SolverSettings(dx=250.0, backend="pallas",
                                                  kahan=False), **kw
        )
        out_x = mc_eigenray_times(
            env_ens, fan, settings=SolverSettings(dx=250.0, backend="xla",
                                                  kahan=False), **kw
        )
        assert np.array_equal(out_k["valid"], out_x["valid"])
        v = out_k["valid"]
        # same arrivals: launch angles within the ztol-induced angle slack
        np.testing.assert_allclose(out_k["theta"][v], out_x["theta"][v], atol=0.05)
        np.testing.assert_allclose(out_k["t"][v], out_x["t"][v], atol=5e-4)
        assert np.all(out_k["z_resid"][v] < 1.0)
        np.testing.assert_array_equal(out_k["n_bott"][v], out_x["n_bott"][v])


class TestGatherChunking:
    def test_table_ensemble_chunks_above_cap(self, monkeypatch):
        """Above the gather envelope the table-path ensemble is traced in
        ray-axis chunks; results must equal the unchunked trace exactly."""
        import warnings

        import jax.numpy as jnp

        import pygenray_tpu.montecarlo as mc
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings

        E, B = 3, 40
        z = np.linspace(0, 5000, 200)
        r = np.linspace(0, 30e3, 4)
        rng = np.random.default_rng(1)
        c_ens = np.stack([
            np.outer(np.ones(4), munk_ssp(z) + rng.normal(0, 0.5, z.size))
            for _ in range(E)
        ])
        envs = [
            make_env_data(c_ens[e], r, z, np.full(4, 4500.0), r,
                          interp="table", dtype="float64",
                          force_range_dependent=True)
            for e in range(E)
        ]
        import jax
        env = jax.tree_util.tree_map(lambda *ls: jnp.stack(ls), *envs)
        assert not env.has_cheb
        p0 = np.sin(np.radians(np.linspace(-10, 10, B))) / 1500.0
        s = SolverSettings(dx=300.0, interp="table")

        full = mc.trace_ensemble(env, 1300.0, p0, 0.0, 30e3, 5, s)
        monkeypatch.setattr(mc, "TABLE_GATHER_RAY_CAP", 33)  # forces 4 chunks
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            chunked = mc.trace_ensemble(env, 1300.0, p0, 0.0, 30e3, 5, s)
        assert any("chunk" in str(x.message) for x in w)
        np.testing.assert_array_equal(np.asarray(full.ts), np.asarray(chunked.ts))
        np.testing.assert_array_equal(np.asarray(full.zs), np.asarray(chunked.zs))
        np.testing.assert_array_equal(
            np.asarray(full.n_bott), np.asarray(chunked.n_bott)
        )
        np.testing.assert_array_equal(np.asarray(full.rs), np.asarray(chunked.rs))
