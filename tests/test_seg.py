"""Piecewise-segment profile backend (ops/seg.py + kernel seg mode).

The segment path serves ROUGH fields that fail the global Chebyshev guard
— previously the 50x-slower (and chip-faulting at scale) table-gather
cliff.  Correctness strategy:

- On a SMOOTH field (forced ``interp='seg'``) the segment fit is a
  sub-tolerance approximation of the same table, so seg vs table parity is
  tight over long ranges — this pins the evaluator and its kernel twin.
- On a genuinely rough field, trajectories are chaotic: ANY two
  interpolants of the same samples diverge exponentially (the table path
  itself moves more under a dx change than the seg path sits from it —
  measured: table dx=50-vs-20 max |dT| 8.7e-2 s vs seg-vs-table 4.3e-2 s
  at 50 km).  Parity there is asserted at short range, before chaos
  amplifies, plus structural agreement (aliveness, bounce counts).
"""

import numpy as np
import pytest

from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings, _use_seg, trace
from pygenray_tpu.ops.seg import SEG_S, fit_profile_seg, seg_eval_np


def rough_profile(z, seed=0, n=8, amp=(0.05, 0.3), lam=(15, 60)):
    rng = np.random.RandomState(seed)
    return munk_ssp(z) + sum(
        a * np.sin(2 * np.pi * z / l + p)
        for a, l, p in zip(rng.uniform(*amp, n), rng.uniform(*lam, n),
                           rng.uniform(0, 7, n))
    )


def rough_env(nz=2001, nr=8, r_max=50e3, bathy=5500.0, dtype="float64",
              seed=0, **kw):
    z = np.linspace(0, 6000, nz)
    r = np.linspace(0, r_max, nr)
    cramp = 1.0 + 2e-3 * np.linspace(0, 1, nr)
    c = np.outer(cramp, rough_profile(z, seed))
    return make_env_data(c, r, z, np.full(nr, bathy), r, dtype=dtype, **kw)


class TestSegFit:
    def test_rough_field_selects_seg(self):
        env = rough_env()
        assert not env.has_cheb and env.has_seg
        assert env.c_seg.shape[-1] == SEG_S
        assert _use_seg(env, SolverSettings())

    def test_smooth_field_keeps_global_cheb(self):
        z = np.linspace(0, 6000, 1001)
        env = make_env_data(munk_ssp(z), [0.0, 50e3], z, np.full(2, 5000.0),
                            [0.0, 50e3])
        assert env.has_cheb and not env.has_seg
        assert not _use_seg(env, SolverSettings())

    def test_forced_seg_on_smooth(self):
        z = np.linspace(0, 6000, 1001)
        env = make_env_data(munk_ssp(z), [0.0, 50e3], z, np.full(2, 5000.0),
                            [0.0, 50e3], interp="seg")
        assert env.has_seg and not env.has_cheb

    def test_hopeless_field_raises_on_forced_seg(self):
        # white noise at grid scale: no smooth representation can meet the
        # window-mean gate
        z = np.linspace(0, 6000, 3001)
        c = 1500.0 + 5.0 * np.random.RandomState(1).randn(z.shape[0])
        with pytest.raises(ValueError, match="segment profile fit"):
            make_env_data(c, [0.0, 50e3], z, np.full(2, 5000.0),
                          [0.0, 50e3], interp="seg")
        # auto mode on the same field falls through to the table path
        env = make_env_data(c, [0.0, 50e3], z, np.full(2, 5000.0), [0.0, 50e3])
        assert not env.has_cheb and not env.has_seg

    def test_fit_reproduces_piecewise_linear_means(self):
        z = np.linspace(0, 6000, 2001)
        c = np.atleast_2d(rough_profile(z, seed=2))
        coef, mean_r, max_r = fit_profile_seg(c, z, order=15)
        assert mean_r < 2e-3 and max_r < 0.1
        # host evaluator agrees with the audit
        zq = np.linspace(0, 6000, 5000)
        got = seg_eval_np(coef, zq, z[0], z[-1])
        ref = np.interp(zq, z, c[0])
        assert np.abs(got - ref).max() < 0.1


class TestConsistentDcdz:
    """``make_env_data(..., dcdz='consistent')`` — Hamiltonian-consistent
    dc/dz derived from the c fit (spectral and segment backends)."""

    def test_seg_derivative_matches_finite_differences(self):
        env = rough_env(dcdz="consistent")
        assert env.has_seg and not env.has_cheb
        zlo, zhi = env.z_dom
        # probe mid-segment (the piecewise fit is discontinuous at segment
        # boundaries; its derivative only exists inside)
        h_seg = (zhi - zlo) / SEG_S
        zq = zlo + h_seg * (np.arange(SEG_S) + 0.5)
        eps = 1e-3 * h_seg
        c_seg = np.asarray(env.c_seg, np.float64)
        d_seg = np.asarray(env.dcdz_seg, np.float64)
        b = env.seg_basis
        fd = (seg_eval_np(c_seg, zq + eps, zlo, zhi, basis=b)
              - seg_eval_np(c_seg, zq - eps, zlo, zhi, basis=b)) / (2 * eps)
        got = seg_eval_np(d_seg, zq, zlo, zhi, basis=b)
        # FD truncation (eps^2 f''') dominates at high segment order; the
        # comparison guards wiring, not the (exact) series derivative
        np.testing.assert_allclose(got, fd, rtol=5e-3, atol=1e-5)
        # the stored table is the derivative fit evaluated on the grid
        tab = seg_eval_np(d_seg, np.asarray(env.z, np.float64), zlo, zhi,
                          basis=b)
        np.testing.assert_allclose(np.asarray(env.dcdz, np.float64), tab,
                                   rtol=1e-12, atol=1e-12)

    def test_consistent_rejects_table_interp(self):
        z = np.linspace(0, 6000, 101)
        with pytest.raises(ValueError, match="consistent"):
            make_env_data(munk_ssp(z), [0.0, 50e3], z, np.full(2, 5000.0),
                          [0.0, 50e3], interp="table", dcdz="consistent")

    def test_consistent_rejects_unfittable_field(self):
        z = np.linspace(0, 6000, 3001)
        c = 1500.0 + 5.0 * np.random.RandomState(1).randn(z.shape[0])
        with pytest.raises(ValueError, match="consistent"):
            make_env_data(c, [0.0, 50e3], z, np.full(2, 5000.0),
                          [0.0, 50e3], dcdz="consistent")

    def test_unknown_dcdz_mode_raises(self):
        z = np.linspace(0, 6000, 101)
        with pytest.raises(ValueError, match="unknown dcdz mode"):
            make_env_data(munk_ssp(z), [0.0, 50e3], z, np.full(2, 5000.0),
                          [0.0, 50e3], dcdz="exact")


class TestSegTrace:
    P0 = np.sin(np.radians(-np.linspace(-16, 16, 48))) / 1555.0

    def test_smooth_seg_matches_table_tightly(self):
        """Forced seg on a smooth field: no chaos, so seg-vs-table parity
        holds over the full range including boundary events."""
        z = np.linspace(0, 6000, 2001)
        r = np.linspace(0, 60e3, 6)
        c = np.outer(1.0 + 1e-3 * np.linspace(0, 1, 6), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(6, 4300.0), r, interp="seg",
                            dtype="float64")
        env_t = make_env_data(c, r, z, np.full(6, 4300.0), r, interp="table",
                              dtype="float64")
        s = SolverSettings(dx=100.0, backend="xla", interp="seg")
        st = SolverSettings(dx=100.0, backend="xla", interp="table")
        rs = trace(env, 1300.0, self.P0, 0.0, 60e3, 5, s)
        rt = trace(env_t, 1300.0, self.P0, 0.0, 60e3, 5, st)
        assert int(np.asarray(rt.n_bott).sum()) > 0  # events exercised
        np.testing.assert_array_equal(np.asarray(rs.n_bott), np.asarray(rt.n_bott))
        np.testing.assert_array_equal(np.asarray(rs.n_surf), np.asarray(rt.n_surf))
        alive = np.asarray(rs.alive) & np.asarray(rt.alive)
        dT = np.abs(np.asarray(rs.ts)[alive, -1] - np.asarray(rt.ts)[alive, -1])
        dz = np.abs(np.asarray(rs.zs)[alive, -1] - np.asarray(rt.zs)[alive, -1])
        assert dT.max() < 2e-5  # fit-tolerance-level agreement
        assert dz.max() < 2.0

    def test_rough_seg_short_range_parity(self):
        """Before chaotic amplification (5 km), seg and table agree to the
        fit-residual level on a rough field."""
        env = rough_env()
        s = SolverSettings(dx=50.0, backend="xla")
        st = SolverSettings(dx=50.0, backend="xla", interp="table")
        p0 = np.sin(np.radians(-np.linspace(-12, 12, 41))) / 1510.0
        rs = trace(env, 1300.0, p0, 0.0, 5e3, 3, s)
        rt = trace(env, 1300.0, p0, 0.0, 5e3, 3, st)
        np.testing.assert_array_equal(np.asarray(rs.alive), np.asarray(rt.alive))
        dT = np.abs(np.asarray(rs.ts)[:, -1] - np.asarray(rt.ts)[:, -1])
        assert dT.max() < 1e-3
        assert np.median(dT) < 2e-4

    def test_seg_f32_matches_f64(self):
        """f32 seg trace (TPU production dtype) vs f64 seg trace."""
        env64 = rough_env(dtype="float64")
        env32 = rough_env(dtype="float32")
        s = SolverSettings(dx=100.0, backend="xla")
        p0 = np.sin(np.radians(-np.linspace(-8, 8, 33))) / 1510.0
        r64 = trace(env64, 1300.0, p0, 0.0, 10e3, 3, s)
        r32 = trace(env32, 1300.0, np.float32(p0), 0.0, 10e3, 3, s)
        dT = np.abs(np.asarray(r64.ts)[:, -1] - np.asarray(r32.ts)[:, -1])
        assert dT.max() < 5e-4  # f32 floor + mild chaos over 10 km


class TestSegKernel:
    def test_kernel_matches_xla_smooth_ri(self):
        z = np.linspace(0, 6000, 2001)
        env = make_env_data(munk_ssp(z), [0.0, 50e3], z, np.full(2, 4300.0),
                            [0.0, 50e3], interp="seg", dtype="float32")
        p0 = np.float32(np.sin(np.radians(-np.linspace(-16, 16, 40))) / 1550.0)
        sx = SolverSettings(dx=200.0, backend="xla", interp="seg")
        sp = SolverSettings(dx=200.0, backend="pallas", interp="seg")
        rx = trace(env, 1300.0, p0, 0.0, 50e3, 5, sx)
        rp = trace(env, 1300.0, p0, 0.0, 50e3, 5, sp)
        assert int(np.asarray(rx.n_bott).sum()) > 0
        np.testing.assert_array_equal(np.asarray(rx.n_bott), np.asarray(rp.n_bott))
        np.testing.assert_array_equal(np.asarray(rx.n_surf), np.asarray(rp.n_surf))
        np.testing.assert_array_equal(np.asarray(rx.death_code), np.asarray(rp.death_code))
        dT = np.abs(np.asarray(rx.ts)[:, -1] - np.asarray(rp.ts)[:, -1])
        assert dT.max() < 2e-5  # f32 ulp-level away from chaos

    def test_kernel_matches_xla_smooth_rd(self):
        z = np.linspace(0, 6000, 2001)
        r = np.linspace(0, 50e3, 8)
        c = np.outer(1.0 + 2e-3 * np.linspace(0, 1, 8), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(8, 4300.0), r, interp="seg",
                            dtype="float32")
        assert env.range_dependent
        p0 = np.float32(np.sin(np.radians(-np.linspace(-16, 16, 40))) / 1550.0)
        sx = SolverSettings(dx=200.0, backend="xla", interp="seg")
        sp = SolverSettings(dx=200.0, backend="pallas", interp="seg")
        rx = trace(env, 1300.0, p0, 0.0, 50e3, 5, sx)
        rp = trace(env, 1300.0, p0, 0.0, 50e3, 5, sp)
        np.testing.assert_array_equal(np.asarray(rx.n_bott), np.asarray(rp.n_bott))
        np.testing.assert_array_equal(np.asarray(rx.death_code), np.asarray(rp.death_code))
        dT = np.abs(np.asarray(rx.ts)[:, -1] - np.asarray(rp.ts)[:, -1])
        assert dT.max() < 2e-5

    def test_kernel_rough_rd_structural(self):
        """Rough RD field through the kernel vs the XLA seg path.

        The interpret-mode CPU kernel contracts FMAs differently across the
        block-level crossing branch (see CLAUDE.md); on a CHAOTIC rough
        field that ulp drift amplifies and can flip marginal bounce counts
        — so structural agreement is asserted for the overwhelming
        majority of rays, not bitwise (smooth-field tests above pin exact
        agreement; on real TPU hardware bench.py's gate observes the paths
        identical)."""
        env = rough_env(dtype="float32")
        p0 = np.float32(np.sin(np.radians(-np.linspace(-12, 12, 40))) / 1510.0)
        sx = SolverSettings(dx=200.0, backend="xla")
        sp = SolverSettings(dx=200.0, backend="pallas")
        rx = trace(env, 1300.0, p0, 0.0, 50e3, 5, sx)
        rp = trace(env, 1300.0, p0, 0.0, 50e3, 5, sp)
        same = (
            (np.asarray(rx.n_bott) == np.asarray(rp.n_bott))
            & (np.asarray(rx.n_surf) == np.asarray(rp.n_surf))
            & (np.asarray(rx.death_code) == np.asarray(rp.death_code))
        )
        assert same.mean() >= 0.9
        # agreeing rays' travel times stay at amplified-ulp level
        dT = np.abs(np.asarray(rx.ts)[same, -1] - np.asarray(rp.ts)[same, -1])
        assert np.median(dT) < 1e-3


class TestSegEnsemble:
    def _rough_ens(self, E=3, nz=1201, nr=6):
        z = np.linspace(0, 6000, nz)
        r = np.linspace(0, 30e3, nr)
        c = np.stack([
            np.outer(1.0 + 1e-3 * np.linspace(0, 1, nr), rough_profile(z, seed=e))
            for e in range(E)
        ])
        return c, r, z

    def test_rough_ensemble_prefers_seg_over_table(self):
        from pygenray_tpu.montecarlo import make_env_ensemble

        c, r, z = self._rough_ens()
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")  # table fallback would warn
            ens = make_env_ensemble(c, r, z, np.full(len(r), 5500.0), r,
                                    dtype="float64")
        assert ens.has_seg and not ens.has_cheb
        assert ens.c_seg.shape[0] == 3

    def test_seg_ensemble_trace_and_mc(self):
        from pygenray_tpu.montecarlo import make_env_ensemble, mc_eigenray_times, trace_ensemble

        c, r, z = self._rough_ens()
        ens = make_env_ensemble(c, r, z, np.full(len(r), 5500.0), r,
                                dtype="float64")
        p0 = np.sin(np.radians(-np.linspace(-10, 10, 31))) / 1510.0
        res = trace_ensemble(ens, 1000.0, p0, 0.0, 30e3, 3,
                             SolverSettings(dx=200.0, backend="xla"))
        assert np.asarray(res.ts).shape[:2] == (3, 31)
        assert bool(np.asarray(res.alive).any())

        out = mc_eigenray_times(
            ens, np.linspace(-10, 10, 41), 1000.0, 1000.0, 0.0, 30e3,
            ztol=1.0, settings=SolverSettings(dx=200.0, backend="xla"),
        )
        assert out["valid"].any()
        # converged candidates actually hit the receiver depth
        assert np.nanmax(np.abs(out["z_resid"][out["valid"]])) < 1.0


def extreme_profile(z, amp=10.0, seed=0):
    """Multi-m/s structure down to the table's own grid scale — beyond
    every monomial rung (the local cheb2poly conversion is
    f32-catastrophic above K~24), recovered by the high-order
    local-Chebyshev rungs."""
    rng = np.random.default_rng(seed)
    rip = np.zeros_like(z)
    for lam in (12.0, 20.0, 35.0, 60.0, 110.0, 200.0):
        rip += rng.normal(0, amp / 6) * np.sin(
            2 * np.pi * z / lam + rng.uniform(0, 6)
        )
    return munk_ssp(z) + rip * np.exp(-z / 2500.0)


def extreme_env(dtype="float64", nz=2048, nr=6, r_max=30e3, amp=10.0, seed=0):
    z = np.linspace(0, 6000, nz)
    r = np.linspace(0, r_max, nr)
    c = np.outer(np.ones(nr), extreme_profile(z, amp, seed))
    return make_env_data(c, r, z, np.full(nr, 5500.0), r, interp="seg",
                         dtype=dtype), z


class TestSegChebBasis:
    """High-order local-Chebyshev rungs: fields that used to fall off the
    table-gather cliff now fit (the per-segment least squares samples the
    table's own grid points, and Clenshaw evaluation is f32-stable at any
    order)."""

    def test_extreme_field_selects_cheb_rung(self):
        env, _ = extreme_env()
        assert env.has_seg and not env.has_cheb
        assert env.seg_basis == "cheb"
        assert env.c_seg.shape[1] >= 32  # beyond every monomial rung

    def test_moderate_field_keeps_pow_rung(self):
        env = rough_env()
        assert env.has_seg and env.seg_basis == "pow"

    def test_cheb_seg_short_range_table_parity(self):
        """Before chaotic amplification, the cheb-basis seg trace agrees
        with the exact-table trace at the fit-residual level."""
        env, _ = extreme_env()
        s = SolverSettings(dx=50.0, backend="xla")
        st = SolverSettings(dx=50.0, backend="xla", interp="table")
        p0 = np.sin(np.radians(-np.linspace(-10, 10, 21))) / 1510.0
        rs = trace(env, 1300.0, p0, 0.0, 3e3, 3, s)
        rt = trace(env, 1300.0, p0, 0.0, 3e3, 3, st)
        np.testing.assert_array_equal(np.asarray(rs.alive), np.asarray(rt.alive))
        dT = np.abs(np.asarray(rs.ts)[:, -1] - np.asarray(rt.ts)[:, -1])
        assert dT.max() < 1e-3
        assert np.median(dT) < 2e-4

    def test_cheb_seg_kernel_matches_xla(self):
        """Interpreted seg-Clenshaw kernel vs the XLA scan: discrete event
        structure exact; travel times to interpret-mode FMA tolerance at
        short range (chaotic fields amplify ulps — CLAUDE.md)."""
        from pygenray_tpu.integrate import _plan, _trace_impl, _use_cheb
        from pygenray_tpu.ops.pallas_stepper import (
            pallas_supported, trace_pallas,
        )

        env, _ = extreme_env(dtype="float32")
        assert env.seg_basis == "cheb"
        s = SolverSettings(dx=100.0, interp="seg")
        assert pallas_supported(env, s, _use_cheb(env, s))
        h, sps, nseg = _plan(0.0, 5e3, 3, s.dx)
        geom = (0.0, 5e3, h, sps, nseg)
        import jax.numpy as jnp

        p0 = jnp.asarray(
            np.sin(np.radians(-np.linspace(-8, 8, 9))) / 1510.0, jnp.float32
        )
        ref = _trace_impl(env, 1300.0, p0, geom, s)
        out = trace_pallas(env, 1300.0, p0, geom, s, interpret=True)
        np.testing.assert_array_equal(
            np.asarray(ref.n_bott), np.asarray(out.n_bott)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.n_surf), np.asarray(out.n_surf)
        )
        np.testing.assert_array_equal(
            np.asarray(ref.death_code), np.asarray(out.death_code)
        )
        dT = np.abs(np.asarray(ref.ts) - np.asarray(out.ts)).max()
        assert dT < 2e-4

    def test_property_continuous_rough_fields_never_hit_the_table(self):
        """Property sweep (the round-4 demand): every physically
        continuous rough field gets a fitted kernel path in auto mode —
        the table-gather fallback is unreachable for them.  Classes:
        internal-wave multiscale ripple up to +-10 m/s, thermocline
        staircases, and band-limited noise down to ~4x the grid scale."""
        z = np.linspace(0, 6000, 2048)
        rng = np.random.default_rng(42)
        fields = []
        for seed in (1, 2):
            fields.append(extreme_profile(z, amp=6.0, seed=seed))
        # staircase: 5-m-wide tanh steps every 400 m
        fields.append(
            munk_ssp(z)
            + 3.0 * np.tanh(
                (z[:, None] - np.arange(500.0, 4500.0, 400.0)[None, :]) / 5.0
            ).sum(1)
        )
        # band-limited noise, sigma 1.5 m/s, wavelengths >= ~12 m
        n = rng.normal(0, 1.5, z.size)
        f = np.fft.rfft(n)
        f[np.fft.rfftfreq(z.size) > 0.25] = 0
        fields.append(munk_ssp(z) + np.fft.irfft(f, z.size))
        for c1 in fields:
            env = make_env_data(
                c1, [0.0, 30e3], z, np.full(2, 5500.0), [0.0, 30e3]
            )
            assert env.has_cheb or env.has_seg  # never the gather path

    def test_mixed_ensemble_aligns_basis(self):
        """One extreme member lifts the whole ensemble onto the cheb rungs
        (static metadata must agree to stack), with no table fallback."""
        import warnings

        from pygenray_tpu.montecarlo import make_env_ensemble

        # 2.93 m grid: ~4 samples per wavelength of the finest (12 m)
        # component — the adequacy threshold below which the table's own
        # linear interpolant misrepresents the structure and the
        # window-mean gate (correctly) refuses any smooth fit
        z = np.linspace(0, 6000, 2048)
        r = np.linspace(0, 20e3, 5)
        c_ens = np.stack([
            np.outer(np.ones(5), rough_profile(z, seed=3)),
            np.outer(np.ones(5), extreme_profile(z, amp=6.0, seed=4)),
        ])
        with warnings.catch_warnings():
            warnings.simplefilter("error")  # any table fallback would warn
            ens = make_env_ensemble(c_ens, r, z, np.full(5, 5500.0), r,
                                    dtype="float64")
        assert ens.has_seg and ens.seg_basis == "cheb"
        assert ens.c_seg.shape[0] == 2
        # and it traces
        s = SolverSettings(dx=200.0, backend="xla")
        from pygenray_tpu.montecarlo import trace_ensemble

        p0 = np.sin(np.radians(-np.linspace(-6, 6, 5))) / 1510.0
        res = trace_ensemble(ens, 1300.0, p0, 0.0, 10e3, 3, s)
        assert np.all(np.isfinite(np.asarray(res.ts)[..., -1]))
