"""Pallas mega-kernel equivalence tests (interpreter mode on CPU).

The kernel's step math must match the XLA scan path: bounce counters and
death codes exactly, travel times to a few f32 ulps (the crossing machinery
runs under a block-level @pl.when branch, and the CPU interpreter contracts
FMAs differently across the two graph shapes — on real TPU hardware the
benchmark's equivalence gate observes the two paths bitwise identical).
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings, _plan, _trace_impl
from pygenray_tpu.ops.pallas_stepper import pallas_supported, trace_pallas


def _env(nz=512, nr=8, bathy=None, pow_path=False):
    """f32 Munk test environment.  The strict interpret-mode equivalence
    tests disable the monomial (Horner) hot path: the CPU interpreter
    contracts `acc*u + b` differently from XLA, and along chaotic
    multi-bounce trajectories that ulp-level difference amplifies past any
    tight tolerance — while on real TPU hardware the two paths are
    bitwise identical (checked by bench.py's equivalence gate and
    test_pow below, which pins the discrete event structure instead)."""
    z = np.linspace(0, 6000, nz)
    r = np.linspace(0, 100e3, nr)
    c = np.outer(np.ones(nr), munk_ssp(z))
    bathy = np.full(nr, 4600.0) if bathy is None else bathy
    env = make_env_data(c, r, z, bathy, r, dtype=jnp.float32)
    return env if pow_path else _no_pow(env)


def _no_pow(env):
    return dataclasses.replace(env, poly_ok=False)


def _compare(env, angles, x1=50e3, num_save=10, dx=200.0, z0=1300.0, ts_atol=5e-6):
    s = SolverSettings(dx=dx)
    h, sps, nseg = _plan(0.0, x1, num_save, s.dx)
    geom = (0.0, x1, h, sps, nseg)
    c_src = np.interp(z0, np.asarray(env.z), np.asarray(env.c[0]))
    p0 = jnp.asarray(np.sin(np.radians(-np.asarray(angles))) / c_src, jnp.float32)
    ref = _trace_impl(env, z0, p0, geom, s)
    out = trace_pallas(env, z0, p0, geom, s, interpret=True)
    np.testing.assert_allclose(np.asarray(ref.ts), np.asarray(out.ts), atol=ts_atol)
    np.testing.assert_allclose(np.asarray(ref.zs), np.asarray(out.zs), atol=1e-2)
    np.testing.assert_array_equal(np.asarray(ref.n_surf), np.asarray(out.n_surf))
    np.testing.assert_array_equal(np.asarray(ref.n_bott), np.asarray(out.n_bott))
    np.testing.assert_array_equal(np.asarray(ref.death_code), np.asarray(out.death_code))
    np.testing.assert_array_equal(
        np.asarray(ref.alive_save), np.asarray(out.alive_save)
    )
    return ref, out


class TestPallasEquivalence:
    def test_supported_configs(self):
        env = _env()
        s = SolverSettings()
        assert pallas_supported(env, s, True)
        # spline bottom angle unsupported
        env2 = dataclasses.replace(env, bangle_mode="spline")
        assert not pallas_supported(env2, s, True)
        assert not pallas_supported(env, s, False)

    def test_bouncing_fan_matches_xla(self):
        env = _env()
        _compare(env, np.linspace(-18, 18, 256))

    def test_sloped_bottom_matches_xla(self):
        env = _env(bathy=np.linspace(4400.0, 4800.0, 8))
        assert env.bangle_mode in ("const", "cheb")
        # cheb bottom-angle trig rounds slightly differently between the
        # two compilers; f32 noise only
        _compare(env, np.linspace(-20, -14, 128), ts_atol=1e-5)

    def test_vertical_and_domain_deaths_match(self):
        env = _env()
        ref, out = _compare(env, np.array([-90.0, -89.0, -45.0, 0.0]))
        assert (np.asarray(out.death_code) > 0).any()

    def test_nonmultiple_batch_padding(self):
        env = _env()
        _compare(env, np.linspace(-10, 10, 77))

    def test_range_dependent_matches_xla(self):
        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 100e3, 16)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.002 * ri) for ri in r])
        env = _no_pow(make_env_data(c, r, z, np.full(16, 4600.0), r, dtype=jnp.float32))
        assert env.range_dependent and env.has_cheb
        _compare(env, np.linspace(-18, 18, 128), ts_atol=2e-6)


class TestKernelSettingsParity:
    def test_kahan_false_is_honored(self):
        """SolverSettings(kahan=False) must change the kernel's arithmetic
        exactly like the XLA scan's (regression: the kernel compensated
        unconditionally, silently ignoring the flag)."""
        env = _env()
        s_off = SolverSettings(dx=200.0, kahan=False)
        h, sps, nseg = _plan(0.0, 50e3, 10, s_off.dx)
        geom = (0.0, 50e3, h, sps, nseg)
        angles = np.linspace(-12, 12, 128)
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)
        ref = _trace_impl(env, 1300.0, p0, geom, s_off)
        out = trace_pallas(env, 1300.0, p0, geom, s_off, interpret=True)
        np.testing.assert_allclose(np.asarray(ref.ts), np.asarray(out.ts), atol=5e-6)
        np.testing.assert_array_equal(np.asarray(ref.n_bott), np.asarray(out.n_bott))
        # and the flag actually matters: kahan on/off differ at f32 ulp level
        s_on = SolverSettings(dx=200.0, kahan=True)
        on = trace_pallas(env, 1300.0, p0, geom, s_on, interpret=True)
        assert not np.array_equal(np.asarray(on.ts), np.asarray(out.ts))

    def test_beyond_domain_deaths_match_xla(self):
        """A shot extending past r_dom must kill rays at the SAME step on
        both backends (per-step domain-exit flags are host-precomputed in
        f64 for both)."""
        env = _env()  # r_dom ends at 100 km
        s = SolverSettings(dx=200.0)
        h, sps, nseg = _plan(0.0, 120e3, 12, s.dx)  # 20 km past the domain
        geom = (0.0, 120e3, h, sps, nseg)
        angles = np.linspace(-10, 10, 64)
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)
        ref = _trace_impl(env, 1300.0, p0, geom, s)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        assert (np.asarray(ref.death_code) == 2).all()  # all exit the domain
        np.testing.assert_array_equal(
            np.asarray(ref.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.alive_save), np.asarray(out.alive_save)
        )
        np.testing.assert_array_equal(np.asarray(ref.n_bott), np.asarray(out.n_bott))


class TestPowPath:
    def test_pow_event_structure_and_times(self):
        """Monomial (Horner) hot path vs the Clenshaw path: identical
        discrete event structure; travel times within the f32 trajectory
        spread of two equal-accuracy representations.  (On TPU hardware
        the Pallas and XLA pow paths are bitwise identical — bench gate.)"""
        env_pow = _env(pow_path=True)
        env_cheb = _env(pow_path=False)
        assert env_pow.poly_ok and not env_cheb.poly_ok
        s = SolverSettings(dx=200.0)
        h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
        geom = (0.0, 50e3, h, sps, nseg)
        angles = np.linspace(-18, 18, 256)
        c_src = np.interp(1300.0, np.asarray(env_pow.z), np.asarray(env_pow.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)

        # XLA scan: pow vs cheb representations
        rp = _trace_impl(env_pow, 1300.0, p0, geom, s)
        rc = _trace_impl(env_cheb, 1300.0, p0, geom, s)
        np.testing.assert_array_equal(np.asarray(rp.n_surf), np.asarray(rc.n_surf))
        np.testing.assert_array_equal(np.asarray(rp.n_bott), np.asarray(rc.n_bott))
        np.testing.assert_array_equal(
            np.asarray(rp.death_code), np.asarray(rc.death_code)
        )
        np.testing.assert_allclose(
            np.asarray(rp.ts), np.asarray(rc.ts), atol=5e-4
        )
        # Pallas pow kernel: event structure matches the XLA pow path
        out = trace_pallas(env_pow, 1300.0, p0, geom, s, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.n_surf), np.asarray(rp.n_surf))
        np.testing.assert_array_equal(np.asarray(out.n_bott), np.asarray(rp.n_bott))
        np.testing.assert_array_equal(
            np.asarray(out.death_code), np.asarray(rp.death_code)
        )
        np.testing.assert_allclose(np.asarray(out.ts), np.asarray(rp.ts), atol=5e-4)

    def test_with_spectral_refreshes_pow(self):
        """Bare dataclasses.replace leaves the monomial tables stale;
        with_spectral re-derives them so the perturbation takes effect."""
        from pygenray_tpu.envdata import with_spectral

        env = _env(pow_path=True)
        cc = np.asarray(env.c_cheb, np.float64)
        cp = np.asarray(env.dcdz_cheb, np.float64)
        cc2 = cc.copy()
        cc2[:, 0] += 5.0  # +5 m/s everywhere
        env2 = with_spectral(env, cc2, cp)
        assert env2.poly_ok
        s = SolverSettings(dx=500.0)
        h, sps, nseg = _plan(0.0, 20e3, 2, s.dx)
        geom = (0.0, 20e3, h, sps, nseg)
        p0 = jnp.asarray([np.sin(np.radians(5.0)) / 1500.0], jnp.float32)
        t1 = float(_trace_impl(env, 1300.0, p0, geom, s).ts[0, -1])
        t2 = float(_trace_impl(env2, 1300.0, p0, geom, s).ts[0, -1])
        # faster medium -> earlier arrival, roughly dT ~ -T dc/c
        assert t2 < t1
        assert abs((t1 - t2) / t1 - 5.0 / 1500.0) < 1e-3

    def test_pow_f64_matches_cheb_tightly(self):
        """In float64 the two representations agree to ~1e-12 s — the pow
        conversion is exact linear algebra, not an approximation."""
        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 100e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float64)
        assert env.poly_ok
        s = SolverSettings(dx=200.0)
        h, sps, nseg = _plan(0.0, 100e3, 10, s.dx)
        geom = (0.0, 100e3, h, sps, nseg)
        p0 = jnp.asarray(
            np.sin(np.radians(-np.linspace(-15, 15, 64))) / 1500.0, jnp.float64
        )
        rp = _trace_impl(env, 1300.0, p0, geom, s)
        rc = _trace_impl(_no_pow(env), 1300.0, p0, geom, s)
        np.testing.assert_allclose(np.asarray(rp.ts), np.asarray(rc.ts), atol=1e-11)
        np.testing.assert_array_equal(np.asarray(rp.n_bott), np.asarray(rc.n_bott))


class TestTangentKernel:
    """Forward-tangent final-state kernel vs the XLA scan and its jvp."""

    def test_primal_and_tangent_match_xla_jvp(self):
        from pygenray_tpu.ops.pallas_stepper import (
            tangent_supported, trace_pallas_tangent,
        )

        env = _env()
        s = SolverSettings(dx=200.0, kahan=False)
        assert tangent_supported(env, s, True)
        h, sps, nseg = _plan(0.0, 100e3, 2, s.dx)
        geom = (0.0, 100e3, h, sps, nseg)
        angles = np.linspace(-18, 18, 128)  # ducted + bouncing + dying
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)

        def zfun(p):
            res = _trace_impl(env, 1300.0, p, geom, s)
            return (res.ts[:, -1], res.zs[:, -1], res.n_surf, res.n_bott,
                    res.death_code)

        (Tx, zx, nsx, nbx, dcx), (dTx, dzx, *_n) = jax.jvp(
            zfun, (p0,), (jnp.ones_like(p0),)
        )
        T, zk, pk, dT, dz, dp, ns, nb, dc = trace_pallas_tangent(
            env, 1300.0, p0, 1.0, geom, s, interpret=True
        )
        # discrete event structure must agree exactly
        np.testing.assert_array_equal(np.asarray(ns), np.asarray(nsx))
        np.testing.assert_array_equal(np.asarray(nb), np.asarray(nbx))
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(dcx))
        # primal within f32 compiler-contraction noise (~1 ulp/step)
        np.testing.assert_allclose(np.asarray(T), np.asarray(Tx), atol=1e-4)
        np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=0.1)
        # tangents (Newton derivative + travel-time sensitivity) within
        # f32 accumulation noise — dT is what timefront/Jacobian users
        # consume, so it is pinned alongside dz
        alive = np.asarray(dc) == 0
        for tang, ref_t in ((dz, dzx), (dT, dTx)):
            rel = np.abs(np.asarray(tang) - np.asarray(ref_t)) / (
                np.abs(np.asarray(ref_t)) + 1e3
            )
            assert rel[alive].max() < 2e-3

    def test_range_dependent_primal_and_tangent(self):
        """RD station tables through the tangent kernel (SMEM DMA rows)."""
        from pygenray_tpu.ops.pallas_stepper import (
            tangent_supported, trace_pallas_tangent,
        )

        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 100e3, 16)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.002 * ri) for ri in r])
        env = _no_pow(make_env_data(c, r, z, np.full(16, 4600.0), r, dtype=jnp.float32))
        assert env.range_dependent
        s = SolverSettings(dx=200.0, kahan=False)
        assert tangent_supported(env, s, True)
        h, sps, nseg = _plan(0.0, 60e3, 2, s.dx)
        geom = (0.0, 60e3, h, sps, nseg)
        angles = np.linspace(-16, 16, 96)
        c_src = np.interp(1300.0, z, c[0])
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)

        def zfun(p):
            res = _trace_impl(env, 1300.0, p, geom, s)
            return (res.ts[:, -1], res.zs[:, -1], res.n_surf, res.n_bott,
                    res.death_code)

        (Tx, zx, nsx, nbx, dcx), (dTx, dzx, *_n) = jax.jvp(
            zfun, (p0,), (jnp.ones_like(p0),)
        )
        T, zk, pk, dT, dz, dp, ns, nb, dc = trace_pallas_tangent(
            env, 1300.0, p0, 1.0, geom, s, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ns), np.asarray(nsx))
        np.testing.assert_array_equal(np.asarray(nb), np.asarray(nbx))
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(dcx))
        np.testing.assert_allclose(np.asarray(T), np.asarray(Tx), atol=1e-4)
        np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=0.1)
        alive = np.asarray(dc) == 0
        for tang, ref_t in ((dz, dzx), (dT, dTx)):
            rel = np.abs(np.asarray(tang) - np.asarray(ref_t)) / (
                np.abs(np.asarray(ref_t)) + 1e3
            )
            assert rel[alive].max() < 2e-3

    def test_ensemble_tangent_matches_vmapped_jvp(self):
        """Block-per-realization ensemble kernel vs vmapped XLA scan jvp."""
        from pygenray_tpu.montecarlo import make_env_ensemble
        from pygenray_tpu.ops.pallas_stepper import trace_pallas_tangent_ensemble

        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 100e3, 8)
        rng = np.random.RandomState(7)
        E, M = 3, 40
        c_ens = np.array([
            np.array([munk_ssp(z, sofar_depth=1300 + 30 * rng.randn()) for _ in r])
            for _ in range(E)
        ])
        env_ens = _no_pow(make_env_ensemble(
            c_ens, r, z, np.full(8, 4600.0), r, dtype=jnp.float32, cheb_order=31
        ))
        s = SolverSettings(dx=200.0, kahan=False)
        h, sps, nseg = _plan(0.0, 60e3, 2, s.dx)
        geom = (0.0, 60e3, h, sps, nseg)
        angles = np.linspace(-14, 14, M)
        c_src = np.interp(1300.0, z, c_ens[0, 0])
        p0 = jnp.asarray(
            np.broadcast_to(np.sin(np.radians(-angles)) / c_src, (E, M)),
            jnp.float32,
        )

        def zfun(envs, p):
            res = jax.vmap(
                lambda e, pp: _trace_impl(e, 1300.0, pp, geom, s)
            )(envs, p)
            return (res.ts[..., -1], res.zs[..., -1], res.n_surf, res.n_bott,
                    res.death_code)

        (Tx, zx, nsx, nbx, dcx), (dTx, dzx, *_n) = jax.jvp(
            lambda p: zfun(env_ens, p), (p0,), (jnp.ones_like(p0),)
        )
        T, zk, pk, dT, dz, dp, ns, nb, dc = trace_pallas_tangent_ensemble(
            env_ens, 1300.0, p0, 1.0, geom, s, interpret=True
        )
        np.testing.assert_array_equal(np.asarray(ns), np.asarray(nsx))
        np.testing.assert_array_equal(np.asarray(nb), np.asarray(nbx))
        np.testing.assert_array_equal(np.asarray(dc), np.asarray(dcx))
        np.testing.assert_allclose(np.asarray(T), np.asarray(Tx), atol=1e-4)
        np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=0.1)
        alive = np.asarray(dc) == 0
        for tang, ref_t in ((dz, dzx), (dT, dTx)):
            rel = np.abs(np.asarray(tang) - np.asarray(ref_t)) / (
                np.abs(np.asarray(ref_t)) + 1e3
            )
            assert rel[alive].max() < 2e-3


class TestCalmBlocks:
    """Calm-block classification: blocks whose rays provably never approach
    a boundary take the event-free step body; a classifier miss is audited
    with death code 5 (never a silent wrong answer)."""

    def _fan(self, env, angles, z0=1300.0, x1=50e3, dx=200.0, num_save=10):
        s = SolverSettings(dx=dx)
        h, sps, nseg = _plan(0.0, x1, num_save, s.dx)
        geom = (0.0, x1, h, sps, nseg)
        c_src = np.interp(z0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(
            np.sin(np.radians(-np.asarray(angles))) / c_src, jnp.float32
        )
        return s, geom, p0

    def test_classifier_ducted_vs_bouncing(self):
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-8, 8, 64))
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom)
        assert calm is not None and calm[1] > calm[0]
        # guard band sits strictly inside the water column
        assert 0.0 < calm[2] < calm[3] < 4600.0
        # a steep fan bounces: the single block cannot be calm
        s, geom, p_steep = self._fan(env, np.linspace(-30, 30, 64))
        assert classify_calm(env, jnp.float32(1300.0), p_steep, geom) is None
        # traced inputs: classification declines (jit-safe)
        none_under_trace = jax.jit(
            lambda p: jnp.float32(
                classify_calm(env, jnp.float32(1300.0), p, geom) is None
            )
        )(p0)
        assert float(none_under_trace) == 1.0

    def test_calm_path_matches_event_path(self):
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-8, 8, 96))
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom)
        assert calm is not None
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, calm=calm)
        # no audit deaths, identical event structure, times to interpret ulps
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(np.asarray(base.n_surf), np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(base.n_bott), np.asarray(out.n_bott))
        np.testing.assert_allclose(
            np.asarray(base.ts), np.asarray(out.ts), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(base.zs), np.asarray(out.zs), atol=1e-2
        )

    def test_calm_path_matches_event_path_range_dependent(self):
        """The RD drift allowance keeps the calm proof sound: classify a
        range-dependent field (drifting SOFAR axis + sloped bottom, the
        bench config-1 shape) and check the calm path reproduces the event
        path exactly — no audit deaths, identical bounce structure."""
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        nz, nr = 512, 8
        z = np.linspace(0, 6000, nz)
        r = np.linspace(0, 50e3, nr)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.002 * ri) for ri in r])
        bathy = np.linspace(4400.0, 4900.0, nr)
        env = _no_pow(make_env_data(c, r, z, bathy, r, dtype=jnp.float32))
        s, geom, p0 = self._fan(env, np.linspace(-9, 9, 160))
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom)
        assert calm is not None and calm[1] > calm[0]
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, calm=calm)
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(np.asarray(base.n_surf), np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(base.n_bott), np.asarray(out.n_bott))
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts), atol=5e-6)
        np.testing.assert_allclose(np.asarray(base.zs), np.asarray(out.zs), atol=1e-2)

    def test_calm_seg_mode_matches_event_path(self):
        """Segment-kernel mode with calm blocks: a smooth Munk profile
        forced onto the segment backend keeps the calm/event comparison
        well-posed in interpret mode (no chaotic amplification), and the
        classifier evaluates the segment fit it proves against."""
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        nz, nr = 2001, 8
        z = np.linspace(0, 6000, nz)
        r = np.linspace(0, 50e3, nr)
        c = np.tile(munk_ssp(z), (nr, 1))
        env = make_env_data(c, r, z, np.full(nr, 4600.0), r, interp="seg",
                            dtype=jnp.float32)
        assert not env.has_cheb and env.has_seg
        s, geom, p0 = self._fan(env, np.linspace(-8, 8, 160))
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom)
        assert calm is not None and calm[1] > calm[0]
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                           calm=jnp.asarray(calm))
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts), atol=5e-6)
        np.testing.assert_allclose(np.asarray(base.zs), np.asarray(out.zs), atol=1e-2)

    def test_calm_rough_field_short_range(self):
        """Rough (segment-fit) field: the classifier proves calm against
        the segment fit the kernel integrates — near ripple extrema a
        table-based proof is unsound (sub-m/s differences move turning
        contours tens of meters).  Range kept short so interpret-mode
        contraction ulps cannot amplify through the field's micro-ray
        chaos."""
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        nz, nr = 2001, 8
        z = np.linspace(0, 6000, nz)
        r = np.linspace(0, 10e3, nr)
        rng = np.random.RandomState(0)
        rough = sum(
            a * np.sin(2 * np.pi * z / lam + ph)
            for a, lam, ph in zip(
                rng.uniform(0.05, 0.3, 8),
                rng.uniform(15, 60, 8),
                rng.uniform(0, 7, 8),
            )
        )
        c = np.tile(munk_ssp(z) + rough, (nr, 1))
        env = make_env_data(c, r, z, np.full(nr, 4600.0), r, dtype=jnp.float32)
        assert not env.has_cheb and env.has_seg
        s, geom, p0 = self._fan(env, np.linspace(-6, 6, 160), x1=10e3)
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom)
        assert calm is not None and calm[1] > calm[0]
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                           calm=jnp.asarray(calm))
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        # 2e-5 s on a ~6.7 s f32 travel time ≈ tens of ulps: the CPU
        # interpreter contracts FMAs differently between the calm/event
        # graph shapes and 10 km of ripple micro-chaos amplifies the
        # difference (on hardware the two paths are bitwise equal —
        # bench.py's seg_calm_equiv gate).  The exact landing point moves
        # whenever the segment FIT of this field changes (e.g. round 4's
        # grid-point-sampling least squares shifted one element from
        # 4.8e-6 to 7.2e-6).
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts), atol=2e-5)
        np.testing.assert_allclose(np.asarray(base.zs), np.asarray(out.zs), atol=0.5)

    def test_calm_guard_audits_classifier_miss(self):
        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-30, 30, 96))
        # deliberately wrong: declare the (bouncing) block calm
        bad = np.array([0.0, 1.0, 15.0, 4600.0 - 15.0], np.float32)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, calm=bad)
        dc = np.asarray(out.death_code)
        # steep rays enter the guard band and die with the audit code —
        # never silently reflected or silently wrong
        assert np.any(dc == 5)
        assert np.asarray(out.n_surf).sum() == 0
        assert np.asarray(out.n_bott).sum() == 0

    def test_cached_launcher_classifies(self):
        from pygenray_tpu.ops.pallas_stepper import (
            _classify_calm_cached,
            trace_pallas_cached,
        )

        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-8, 8, 64))
        # interpret mode never auto-classifies (FMA-contraction divergence
        # on chaotic fields) — exercise the cached classifier explicitly
        calm = _classify_calm_cached(env, 1300.0, p0, geom, s)
        assert calm is not None
        assert _classify_calm_cached(env, 1300.0, p0, geom, s) is calm
        on = trace_pallas_cached(
            env, 1300.0, p0, geom, s, interpret=True, calm=calm
        )
        off = trace_pallas_cached(
            env, 1300.0, p0, geom, dataclasses.replace(s, calm=False),
            interpret=True,
        )
        np.testing.assert_array_equal(
            np.asarray(on.death_code), np.asarray(off.death_code)
        )
        np.testing.assert_allclose(
            np.asarray(on.ts), np.asarray(off.ts), atol=5e-6
        )


class TestDynCalmWindows:
    """Dynamic calm windows (settings.dyn_calm): non-calm blocks prove,
    from their runtime distance to the audit band and a host-classified
    Snell slope bound, that upcoming save segments cannot touch a boundary
    and run them event-free — phase-aware skipping between bounce clusters.
    Audited with death code 5, never silent."""

    def _fan(self, env, angles, z0=1300.0, x1=60e3, dx=200.0, num_save=10):
        s = SolverSettings(dx=dx)
        h, sps, nseg = _plan(0.0, x1, num_save, s.dx)
        geom = (0.0, x1, h, sps, nseg)
        c_src = np.interp(z0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(
            np.sin(np.radians(-np.asarray(angles))) / c_src, jnp.float32
        )
        return s, geom, p0

    def test_classifier_rows(self):
        from pygenray_tpu.ops.pallas_stepper import _layout, classify_dyn

        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-18, 18, 256))
        dyn = classify_dyn(env, jnp.float32(1300.0), p0, geom, s)
        assert dyn is not None
        nblocks = _layout(p0.shape[0])[0]
        assert dyn.shape == (nblocks, 4)
        # wstep bounds block depth motion per segment: positive, and at
        # least sin(18°)-steep per segment for a fan reaching 18°
        x0, x1, h, sps, nseg = geom
        assert (dyn[:, 0] > np.sin(np.radians(18.0)) * sps * h).all()
        # audit band strictly inside the water column
        assert 0.0 < dyn[0, 2] < dyn[0, 3] < 4600.0
        # a steeper fan gets a larger slope bound (shorter windows)
        _, _, p_steep = self._fan(env, np.linspace(-30, 30, 256))
        dyn2 = classify_dyn(env, jnp.float32(1300.0), p_steep, geom, s)
        assert dyn2 is not None and dyn2[0, 0] > dyn[0, 0]

    def test_windowed_path_matches_event_path(self):
        """Bouncing fan: windows fire between bounce clusters yet every
        bounce, death, and travel time matches the plain event path
        (bitwise in interpret mode: windowed segments are provably
        crossing-free, so both graphs take the same plain-update writes)."""
        from pygenray_tpu.ops.pallas_stepper import classify_dyn

        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-18, 18, 256))
        dyn = classify_dyn(env, jnp.float32(1300.0), p0, geom, s)
        assert dyn is not None
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        assert np.asarray(base.n_surf).sum() > 0  # fan genuinely bounces
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, dyn=dyn)
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(np.asarray(base.n_surf), np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(base.n_bott), np.asarray(out.n_bott))
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts),
                                   atol=5e-6)
        np.testing.assert_allclose(np.asarray(base.zs), np.asarray(out.zs),
                                   atol=1e-2)

    def test_windowed_path_matches_event_path_rd(self):
        """Range-dependent field: the drift-inflated slope bound stays
        sound (classify_dyn deflates the invariant by the banded drift
        allowance before bounding tan θ)."""
        from pygenray_tpu.ops.pallas_stepper import classify_dyn

        nz, nr = 512, 8
        z = np.linspace(0, 6000, nz)
        r = np.linspace(0, 50e3, nr)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.002 * ri) for ri in r])
        bathy = np.linspace(4400.0, 4900.0, nr)
        env = _no_pow(make_env_data(c, r, z, bathy, r, dtype=jnp.float32))
        s, geom, p0 = self._fan(env, np.linspace(-16, 16, 160), x1=50e3)
        dyn = classify_dyn(env, jnp.float32(1300.0), p0, geom, s)
        assert dyn is not None
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, dyn=dyn)
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(np.asarray(base.n_surf), np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(base.n_bott), np.asarray(out.n_bott))
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts),
                                   atol=5e-6)

    def test_audit_catches_unsound_table(self):
        """A deliberately unsound table (tiny wstep → giant windows) must
        kill boundary-bound rays with death code 5 — the windowed path
        executes, and a violated bound is never a silently missed
        reflection."""
        env = _env()
        s, geom, p0 = self._fan(env, np.linspace(-18, 18, 256))
        # audit band must hug THIS env's boundaries: a band that overlaps
        # where rays legitimately dwell keeps the block's distance D
        # negative at every segment end, and windows (correctly) never
        # activate at all
        bad = np.array([[1e-3, 0.0, 7.5, 4600.0 - 7.5]], np.float32)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True, dyn=bad)
        dc = np.asarray(out.death_code)
        assert np.any(dc == 5)
        assert set(np.unique(dc)) <= {0, 5}

    def test_combined_with_static_calm(self):
        """calm= and dyn= together: static-calm blocks keep the event-free
        whole-trace body, the boundary blocks window dynamically; results
        still match the plain event path exactly."""
        from pygenray_tpu.ops.pallas_stepper import classify_calm, classify_dyn

        env = _env()
        # wide batch so the layout yields several blocks
        s, geom, p0 = self._fan(env, np.linspace(-16, 16, 64 * 1024))
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom, s)
        dyn = classify_dyn(env, jnp.float32(1300.0), p0, geom, s)
        assert calm is not None and dyn is not None and dyn.shape[0] > 1
        base = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                           calm=calm, dyn=dyn)
        assert not np.any(np.asarray(out.death_code) == 5)
        np.testing.assert_array_equal(
            np.asarray(base.death_code), np.asarray(out.death_code)
        )
        np.testing.assert_array_equal(np.asarray(base.n_surf),
                                      np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(base.n_bott),
                                      np.asarray(out.n_bott))
        np.testing.assert_allclose(np.asarray(base.ts), np.asarray(out.ts),
                                   atol=5e-6)


class TestHotBlocks:
    """Hot-block kernel variant (settings.hot / classify_hot): non-calm
    blocks whose rays bounce nearly every step compile the crossing fix
    UNconditionally — no per-step any(cross) reduction, no duplicate plain
    update.  Lane-wise the fix's where() merges are the identical
    expressions, so counters and death codes must match the branched body
    exactly; travel times to interpret-mode FMA tolerance (bench.py --hot
    gates element-wise equality on hardware)."""

    def _run(self, env, angles, s, hot, x1=50e3, num_save=10):
        h, sps, nseg = _plan(0.0, x1, num_save, s.dx)
        geom = (0.0, x1, h, sps, nseg)
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-np.asarray(angles))) / c_src,
                         jnp.float32)
        return trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                            hot=hot)

    def test_hot_matches_branched_body(self):
        env = _env()
        angles = np.linspace(-24, 24, 256)  # bouncing fan
        s = SolverSettings(dx=200.0)
        ref = self._run(env, angles, s, hot=False)
        out = self._run(env, angles, s, hot=True)
        assert int(np.asarray(ref.n_bott).sum()) > 0  # events exercised
        np.testing.assert_array_equal(np.asarray(ref.n_surf),
                                      np.asarray(out.n_surf))
        np.testing.assert_array_equal(np.asarray(ref.n_bott),
                                      np.asarray(out.n_bott))
        np.testing.assert_array_equal(np.asarray(ref.death_code),
                                      np.asarray(out.death_code))
        np.testing.assert_array_equal(np.asarray(ref.alive_save),
                                      np.asarray(out.alive_save))
        # chaotic multi-bounce rays amplify interpret-mode contraction
        # ulps; most lanes are bitwise identical even here
        d = np.abs(np.asarray(ref.ts) - np.asarray(out.ts))
        np.testing.assert_allclose(np.asarray(ref.ts), np.asarray(out.ts),
                                   atol=2e-4)
        assert np.median(d) == 0.0
        np.testing.assert_allclose(np.asarray(ref.zs), np.asarray(out.zs),
                                   atol=2.0)

    def test_hot_with_calm_range_touches_only_noncalm_blocks(self):
        """A calm row + hot: calm blocks run the calm body either way, so
        a fully-calm fan is untouched by the hot flag (identical results),
        while the kernel still compiles."""
        from pygenray_tpu.ops.pallas_stepper import classify_calm

        env = _env()
        angles = np.linspace(-8, 8, 128)  # fully ducted -> whole fan calm
        s = SolverSettings(dx=200.0)
        h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
        geom = (0.0, 50e3, h, sps, nseg)
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-np.asarray(angles))) / c_src,
                         jnp.float32)
        calm = classify_calm(env, jnp.float32(1300.0), p0, geom, s)
        assert calm is not None
        ref = trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                           calm=calm, hot=False)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True,
                           calm=calm, hot=True)
        np.testing.assert_array_equal(np.asarray(ref.ts), np.asarray(out.ts))
        np.testing.assert_array_equal(np.asarray(ref.death_code),
                                      np.asarray(out.death_code))

    def test_classify_hot_policy(self):
        from pygenray_tpu.ops.pallas_stepper import classify_hot

        env = _env()
        s = SolverSettings(dx=200.0)
        h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
        geom = (0.0, 50e3, h, sps, nseg)
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        mk = lambda a, n: jnp.asarray(
            np.sin(np.radians(-np.linspace(-a, a, n))) / c_src, jnp.float32)
        # dense bouncing fan: every (single) block crosses constantly
        assert classify_hot(env, jnp.float32(1300.0), mk(28.0, 4096), geom, s)
        # fully ducted fan: the calm range covers every block -> nothing
        # left to run hot
        assert not classify_hot(env, jnp.float32(1300.0), mk(8.0, 4096),
                                geom, s)
        # sparse bouncing fan: expected crossings/step below the threshold
        assert not classify_hot(env, jnp.float32(1300.0), mk(28.0, 8),
                                geom, s)
        # traced inputs: declines (jit-safe)
        under_jit = jax.jit(
            lambda p: jnp.float32(
                classify_hot(env, jnp.float32(1300.0), p, geom, s)
            )
        )(mk(28.0, 4096))
        assert float(under_jit) == 0.0
