"""Differentiable travel-time tests: exact AD Jacobians vs finite
differences, and the physical sanity of the sensitivity kernel."""

import numpy as np
import pytest
import jax.numpy as jnp

from pygenray_tpu.adjoint import (
    cheb_derivative_matrix,
    perturbation_response,
    travel_time_jacobian,
)
from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings, _plan, _trace_impl


def _env(nz=800, nr=8, r_max=20e3):
    z = np.linspace(0, 6000, nz)
    r = np.linspace(0, r_max, nr)
    c = np.outer(np.ones(nr), munk_ssp(z))
    return make_env_data(c, r, z, np.full(nr, 5500.0), r, dtype=jnp.float64)


class TestChebDerivativeMatrix:
    def test_matches_chebder(self):
        import numpy.polynomial.chebyshev as ncheb

        K, zlo, zhi = 12, 0.0, 6000.0
        D = cheb_derivative_matrix(K, zlo, zhi)
        rng = np.random.default_rng(0)
        a = rng.normal(size=K)
        expected = np.zeros(K)
        d = ncheb.chebder(a) * (2.0 / (zhi - zlo))
        expected[: len(d)] = d
        np.testing.assert_allclose(D @ a, expected, rtol=1e-12, atol=1e-15)


class TestTravelTimeJacobian:
    def test_matches_finite_differences(self):
        env = _env()
        settings = SolverSettings(dx=200.0, interp="cheb")
        angles = np.array([-10.0, -4.0, 3.0, 12.0])
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-angles)) / c_src

        T0, jac = travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)
        assert jac.shape == (4, env.c_cheb.shape[1])

        # central finite differences on a random coefficient direction
        import dataclasses

        rng = np.random.default_rng(1)
        K = env.c_cheb.shape[1]
        v = rng.normal(size=K)
        v /= np.linalg.norm(v)
        eps = 1e-3
        D = cheb_derivative_matrix(K, *env.z_dom)

        def T_at(coef_shift):
            cc = np.asarray(env.c_cheb) + coef_shift[None, :]
            cp = np.asarray(env.dcdz_cheb) + (D @ coef_shift)[None, :]
            # poly_ok=False: the AD operator differentiates the Chebyshev
            # path; the FD probe must re-trace the same representation
            # (a bare replace would leave the derived monomial tables stale)
            env2 = dataclasses.replace(
                env, c_cheb=jnp.asarray(cc), dcdz_cheb=jnp.asarray(cp),
                poly_ok=False,
            )
            h, sps, nseg = _plan(0.0, 20e3, 2, settings.dx)
            geom = (0.0, 20e3, h, sps, nseg)
            res = _trace_impl(env2, 1300.0, jnp.asarray(p0), geom, settings)
            return np.asarray(res.ts)[:, -1]

        fd = (T_at(eps * v) - T_at(-eps * v)) / (2 * eps)
        ad = np.asarray(jac) @ v
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-12)

    def test_sensitivity_sign_is_physical(self):
        """A uniform sound-speed increase must decrease travel time
        (dT/dc < 0): T ~ path/c."""
        env = _env()
        settings = SolverSettings(dx=200.0, interp="cheb")
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-8.0, 0.0, 8.0]))) / c_src
        T0, jac = travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)
        # uniform δc = 1 m/s: only the T_0 Chebyshev term
        dT = np.asarray(jac)[:, 0]
        assert np.all(dT < 0)
        # magnitude ~ T/c ~ 33/1500 ≈ 0.022 s per m/s
        np.testing.assert_allclose(-dT, np.asarray(T0) / 1500.0, rtol=0.05)

    def test_perturbation_response(self):
        env = _env()
        settings = SolverSettings(dx=200.0, interp="cheb")
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-8.0, 8.0]))) / c_src
        T0, jac = travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)

        # a warm layer near 1000 m: Gaussian bump of +1 m/s
        z = np.asarray(env.z)
        dc = np.exp(-(((z - 1000.0) / 200.0) ** 2))
        dT = perturbation_response(jac, env, dc)
        assert dT.shape == (2,)
        assert np.all(dT < 0)  # faster medium -> earlier arrivals
        assert np.all(np.abs(dT) < 0.03)


class TestTravelTimeJacobian2D:
    def test_matches_finite_differences_rd(self):
        """Range-dependent 2D sensitivity vs central differences."""
        import dataclasses

        import jax.numpy as jnp

        from pygenray_tpu.adjoint import travel_time_jacobian_2d

        z = np.linspace(0, 6000, 500)
        r = np.linspace(0, 20e3, 4)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.01 * ri) for ri in r])
        env = make_env_data(c, r, z, np.full(4, 5500.0), r, dtype=jnp.float64)
        assert env.range_dependent
        settings = SolverSettings(dx=200.0, interp="cheb")

        c_src = np.interp(1300.0, z, c[0])
        p0 = np.sin(np.radians(-np.array([-8.0, 6.0]))) / c_src
        T0, jac = travel_time_jacobian_2d(env, 1300.0, p0, 0.0, 20e3, settings)
        nr, K = env.c_cheb.shape
        assert jac.shape == (2, nr, K)

        rng = np.random.default_rng(2)
        V = rng.normal(size=(nr, K))
        V /= np.linalg.norm(V)
        eps = 1e-3
        D = cheb_derivative_matrix(K, *env.z_dom)

        def T_at(shift):
            cc = np.asarray(env.c_cheb) + shift
            cp = np.asarray(env.dcdz_cheb) + shift @ D.T
            # poly_ok=False: the AD operator differentiates the Chebyshev
            # path; the FD probe must re-trace the same representation
            # (a bare replace would leave the derived monomial tables stale)
            env2 = dataclasses.replace(
                env, c_cheb=jnp.asarray(cc), dcdz_cheb=jnp.asarray(cp),
                poly_ok=False,
            )
            from pygenray_tpu.integrate import _plan, _trace_impl

            h, sps, nseg = _plan(0.0, 20e3, 2, settings.dx)
            geom = (0.0, 20e3, h, sps, nseg)
            s2 = dataclasses.replace(settings, kahan=False, backend="xla")
            res = _trace_impl(env2, 1300.0, jnp.asarray(p0), geom, s2)
            return np.asarray(res.ts)[:, -1]

        fd = (T_at(eps * V) - T_at(-eps * V)) / (2 * eps)
        ad = np.einsum("brk,rk->b", np.asarray(jac), V)
        np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-12)

    def test_sensitivity_localizes_in_range(self):
        """Perturbing stations beyond the receiver must not affect T."""
        import jax.numpy as jnp

        from pygenray_tpu.adjoint import travel_time_jacobian_2d

        z = np.linspace(0, 6000, 400)
        r = np.linspace(0, 40e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(
            c, r, z, np.full(8, 5500.0), r, dtype=jnp.float64,
            force_range_dependent=True,
        )
        settings = SolverSettings(dx=200.0, interp="cheb")
        p0 = np.sin(np.radians(-np.array([-6.0]))) / 1500.0
        # trace only to 20 km: stations at >= 25 km are never touched
        T0, jac = travel_time_jacobian_2d(env, 1300.0, p0, 0.0, 20e3, settings)
        j = np.abs(np.asarray(jac)[0]).sum(axis=1)  # (nr,)
        assert j[:4].sum() > 0
        np.testing.assert_allclose(j[5:], 0.0, atol=1e-12)

    def test_rd_kernel_matches_jacfwd(self):
        """The one-launch RD coefficient-tangent kernel (grid block =
        (station, coefficient) direction, tangent station rows synthesized
        from scalar hat weights) must reproduce the jacfwd-through-XLA-scan
        Jacobian (f32, interpret mode on CPU)."""
        import jax.numpy as jnp

        from pygenray_tpu.adjoint import travel_time_jacobian_2d

        z = np.linspace(0, 6000, 500)
        r = np.linspace(0, 20e3, 4)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.01 * ri) for ri in r])
        env = make_env_data(c, r, z, np.full(4, 5500.0), r, dtype=jnp.float32)
        assert env.range_dependent
        s = SolverSettings(dx=200.0, interp="cheb", backend="pallas",
                           kahan=False)
        c_src = np.interp(1300.0, z, c[0])
        p0 = np.float32(np.sin(np.radians(-np.array([-8.0, 6.0]))) / c_src)

        T_k, jac_k = travel_time_jacobian_2d(env, 1300.0, p0, 0.0, 20e3, s,
                                             mode="kernel")
        T_f, jac_f = travel_time_jacobian_2d(env, 1300.0, p0, 0.0, 20e3, s,
                                             mode="fwd")
        assert jac_k.shape == jac_f.shape
        np.testing.assert_allclose(np.asarray(T_k), np.asarray(T_f),
                                   atol=1e-4)
        # f32 forward-tangent accumulation noise (same budget as the 1D
        # coefficient-tangent kernel comparison)
        scale = np.abs(np.asarray(jac_f)).max()
        np.testing.assert_allclose(
            np.asarray(jac_k), np.asarray(jac_f), atol=3e-3 * scale
        )


class TestCoefVjp:
    """Reverse-mode coefficient gradients at kernel speed: jax.grad of a
    misfit through ``travel_times_of_coef`` must equal Jᵀv assembled from
    the forward Jacobian, with the cotangent contraction running through
    the coefficient-tangent kernel (O(1) launches) instead of a transposed
    scan."""

    def _rd_env(self):
        z = np.linspace(0, 6000, 500)
        r = np.linspace(0, 20e3, 4)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.01 * ri) for ri in r])
        env = make_env_data(c, r, z, np.full(4, 5500.0), r, dtype=jnp.float32)
        assert env.range_dependent
        c_src = np.interp(1300.0, z, c[0])
        p0 = np.float32(np.sin(np.radians(-np.array([-8.0, 6.0]))) / c_src)
        return env, p0

    def test_grad_matches_jacfwd_rd(self):
        import jax

        from pygenray_tpu.adjoint import (
            travel_time_jacobian_2d,
            travel_times_of_coef,
        )

        env, p0 = self._rd_env()
        s = SolverSettings(dx=200.0, interp="cheb", backend="pallas",
                           kahan=False)
        f = travel_times_of_coef(env, 1300.0, p0, 0.0, 20e3, s)
        T = np.asarray(f(env.c_cheb))
        T_obs = T + np.array([1e-3, -2e-3], np.float32)

        def misfit(cc):
            d = f(cc) - jnp.asarray(T_obs)
            return 0.5 * jnp.sum(d * d)

        g = np.asarray(jax.grad(misfit)(env.c_cheb))  # (nr, K)

        T_f, jac_f = travel_time_jacobian_2d(env, 1300.0, p0, 0.0, 20e3, s,
                                             mode="fwd")
        v = np.asarray(T_f) - T_obs
        g_ref = np.einsum("b,bjk->jk", v, np.asarray(jac_f))
        assert g.shape == g_ref.shape == env.c_cheb.shape
        scale = np.abs(g_ref).max()
        np.testing.assert_allclose(g, g_ref, atol=3e-3 * scale)

    def test_grad_matches_jacfwd_ri_and_chunks(self):
        """Range-independent variant, forced through tiny direction chunks
        to exercise the bounded-transient path."""
        import jax

        import pygenray_tpu.adjoint as adj

        z = np.linspace(0, 6000, 500)
        r = np.linspace(0, 20e3, 4)
        c = np.outer(np.ones(4), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(4, 5500.0), r, dtype=jnp.float32)
        assert not env.range_dependent
        c_src = np.interp(1300.0, z, c[0])
        p0 = np.float32(np.sin(np.radians(-np.array([-8.0, 6.0]))) / c_src)
        s = SolverSettings(dx=200.0, interp="cheb", backend="pallas",
                           kahan=False)

        old = adj._COEF_VJP_CHUNK_ELEMS
        adj._COEF_VJP_CHUNK_ELEMS = 8  # a few directions per launch
        try:
            T, g = adj.travel_time_coef_vjp(
                env, 1300.0, p0, 0.0, 20e3, np.array([1.0, -0.5], np.float32),
                s,
            )
        finally:
            adj._COEF_VJP_CHUNK_ELEMS = old
        T_f, jac_f = adj.travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, s,
                                              mode="fwd")
        g_ref = np.array([1.0, -0.5]) @ np.asarray(jac_f)
        assert np.asarray(g).shape == g_ref.shape
        scale = np.abs(g_ref).max()
        np.testing.assert_allclose(np.asarray(g), g_ref, atol=3e-3 * scale)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_f), atol=1e-4)

    def test_fallback_f64_scan(self):
        """f64 (kernel unsupported): the custom rule falls back to jax.vjp
        through the scan and still matches the forward Jacobian."""
        import jax

        from pygenray_tpu.adjoint import (
            travel_time_jacobian,
            travel_times_of_coef,
        )

        env = _env(nz=500, nr=4)
        c_src = float(munk_ssp(np.asarray([1300.0]))[0])
        p0 = np.sin(np.radians(-np.array([-6.0, 4.0]))) / c_src
        s = SolverSettings(dx=300.0)
        f = travel_times_of_coef(env, 1300.0, p0, 0.0, 20e3, s)
        cc0 = env.c_cheb[0]
        T, pull = jax.vjp(f, cc0)
        (g,) = pull(jnp.array([1.0, 2.0], T.dtype))
        T_f, jac = travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, s)
        g_ref = np.array([1.0, 2.0]) @ np.asarray(jac)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(T), np.asarray(T_f), atol=1e-9)


class TestFermatJacobian:
    def test_fermat_ad_endpoint_identity(self):
        """The fixed-angle AD Jacobian and the fixed-endpoint Fermat kernel
        differ by exactly the endpoint-drift term (eikonal relation):

            J_ad = J_fermat + p_end * dz_end/dcoef

        Verifying the identity validates both operators at once."""
        import dataclasses as dc

        import jax
        import jax.numpy as jnp

        from pygenray_tpu.adjoint import cheb_derivative_matrix, fermat_jacobian
        from pygenray_tpu.integrate import _plan, _trace_impl

        env = _env()
        settings = SolverSettings(dx=200.0, interp="cheb")
        c_src = np.interp(1300.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-10.0, -4.0, 6.0]))) / c_src

        T_ad, J_ad = travel_time_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)
        T_f, J_f = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings, num_save=800)
        np.testing.assert_allclose(np.asarray(T_f), np.asarray(T_ad), rtol=1e-9)

        # endpoint-drift Jacobian dz_end/dcoef and final slowness p_end
        K = env.c_cheb.shape[1]
        D = jnp.asarray(cheb_derivative_matrix(K, *env.z_dom))
        cp_off = env.dcdz_cheb[0] - D @ env.c_cheb[0]
        h, sps, nseg = _plan(0.0, 20e3, 2, settings.dx)
        geom = (0.0, 20e3, h, sps, nseg)
        s_ad = dc.replace(settings, backend="xla", kahan=False)

        def ends(ccoef):
            cc = jnp.broadcast_to(ccoef, env.c_cheb.shape)
            cp = jnp.broadcast_to(cp_off + D @ ccoef, env.dcdz_cheb.shape)
            env2 = dc.replace(env, c_cheb=cc, dcdz_cheb=cp, poly_ok=False)
            res = _trace_impl(env2, 1300.0, jnp.asarray(p0), geom, s_ad)
            return res.zs[:, -1], res.ps[:, -1]

        Jz = np.asarray(jax.jit(jax.jacfwd(lambda a: ends(a)[0]))(env.c_cheb[0]))
        p_end = np.asarray(ends(env.c_cheb[0])[1])

        lhs = np.asarray(J_ad)
        rhs = np.asarray(J_f) + p_end[:, None] * Jz
        scale = np.abs(lhs).max()
        np.testing.assert_allclose(lhs, rhs, atol=2e-3 * scale)

    def test_rd_shape_and_locality(self):
        from pygenray_tpu.adjoint import fermat_jacobian
        import jax.numpy as jnp

        z = np.linspace(0, 6000, 500)
        r = np.linspace(0, 40e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(
            c, r, z, np.full(8, 5500.0), r, dtype=jnp.float64,
            force_range_dependent=True,
        )
        settings = SolverSettings(dx=200.0, interp="cheb")
        p0 = np.sin(np.radians(-np.array([-6.0]))) / 1500.0
        T, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)
        nr, K = env.c_cheb.shape
        assert G.shape == (1, nr, K)
        j = np.abs(G[0]).sum(axis=1)
        assert j[:4].sum() > 0
        np.testing.assert_allclose(j[5:], 0.0, atol=1e-12)


class TestCoefTangentKernel:
    def test_kernel_jacobian_matches_jacfwd(self):
        """The one-launch coefficient-tangent kernel must reproduce the
        jacfwd-through-XLA-scan Jacobian (f32, interpret mode on CPU)."""
        import jax.numpy as jnp

        from pygenray_tpu.adjoint import travel_time_jacobian
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp
        from pygenray_tpu.integrate import SolverSettings

        import dataclasses

        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 60e3, 4)
        c = np.outer(np.ones(4), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(4, 4600.0), r, dtype=jnp.float32)
        # the env keeps poly_ok=True: the coef-tangent kernel must force
        # the Chebyshev representation internally (monomial re-expression
        # of high-order coefficient directions is f32-catastrophic) — this
        # comparison against the Chebyshev jacfwd guards that
        assert env.poly_ok
        angles = np.linspace(-12, 12, 48)
        c_src = np.interp(1300.0, z, c[0])
        p0 = np.sin(np.radians(-angles)) / c_src
        s = SolverSettings(dx=200.0, backend="pallas", kahan=False)

        T_k, jac_k = travel_time_jacobian(env, 1300.0, p0, 0.0, 60e3, s,
                                          mode="kernel")
        T_f, jac_f = travel_time_jacobian(env, 1300.0, p0, 0.0, 60e3, s,
                                          mode="fwd")
        assert jac_k.shape == jac_f.shape
        np.testing.assert_allclose(np.asarray(T_k), np.asarray(T_f), atol=1e-4)
        # f32 forward-tangent accumulation noise; the Jacobian magnitudes
        # are O(1e-2 .. 1e-5) s per unit coefficient
        scale = np.abs(np.asarray(jac_f)).max()
        np.testing.assert_allclose(
            np.asarray(jac_k), np.asarray(jac_f), atol=2e-3 * scale
        )


class TestFermatJacobianSeg:
    """Rough (segment-backed) fields: the Fermat operator in the segment
    basis — the tomography sensitivity the spectral Jacobians cannot
    express (their fit guard rejects these fields, `envdata.py` gates)."""

    def _rough_env(self, nz=1500, nr=6, r_max=20e3):
        rng = np.random.default_rng(7)
        z = np.linspace(0, 6000, nz)
        ripple = np.zeros_like(z)
        for lam in (30.0, 55.0, 90.0, 160.0):
            ripple += rng.normal(0, 0.8) * np.sin(
                2 * np.pi * z / lam + rng.uniform(0, 2 * np.pi)
            )
        c1 = munk_ssp(z) + ripple * np.exp(-z / 2500.0)
        r = np.linspace(0, r_max, nr)
        env = make_env_data(
            np.outer(np.ones(nr), c1), r, z, np.full(nr, 5500.0), r,
            interp="seg", dtype=jnp.float64,
        )
        assert env.has_seg and not env.has_cheb
        return env, z

    def test_seg_fermat_matches_ad_identity_smooth(self):
        """Eikonal endpoint identity J_fermat·v = J_ad·v − p_end·(dz_end·v)
        on a SMOOTH field forced onto the segment representation, with the
        AD side one jvp through the (differentiable) segment-scan along a
        depth-local Gaussian direction, dc/dz chained through the exact
        per-segment monomial derivative.

        The identity validates the seg-basis Fermat mechanics (scatter,
        blending, kernel).  It cannot be pinned tightly on ROUGH fields:
        the fitted dc/dz is not exactly the derivative of the fitted c
        (gated only at fit-residual level, `envdata.py` seg gates), and
        the resulting Euler-Lagrange residual couples to the path response
        — which for duct-trapped rays in a rippled waveguide is large
        (measured: a −3° ray disagrees by ~half its δT).  Rough-field
        behavior is pinned by the physical checks below instead."""
        import dataclasses as dc

        import jax

        from pygenray_tpu.adjoint import fermat_jacobian
        from pygenray_tpu.ops.seg import SEG_S, fit_profile_seg

        z = np.linspace(0, 6000, 1500)
        r = np.linspace(0, 20e3, 6)
        env = make_env_data(
            np.outer(np.ones(6), munk_ssp(z)), r, z, np.full(6, 5500.0), r,
            interp="seg", dtype=jnp.float64,
        )
        assert env.has_seg and not env.has_cheb
        settings = SolverSettings(dx=100.0, interp="seg")
        c_src = np.interp(1300.0, z, np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-10.0, -4.0, 6.0]))) / c_src

        T_f, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings,
                                 num_save=800)
        K = env.c_seg.shape[1]
        assert G.shape == (3, K, SEG_S)

        # Gaussian δc near 1100 m projected onto the segment basis; its
        # dc/dz direction is the EXACT derivative of the projected δc
        # (local monomial derivative, du/dz = 2/h_seg) so the perturbed
        # pair stays Hamiltonian-consistent
        dcz = np.exp(-(((z - 1100.0) / 150.0) ** 2))
        dcoef = fit_profile_seg(dcz[None], z, order=K - 1)[0][0]  # (K, S)
        h_seg = (z[-1] - z[0]) / SEG_S
        dcpcoef = np.zeros_like(dcoef)
        for k in range(1, K):
            dcpcoef[k - 1] = k * dcoef[k] * (2.0 / h_seg)

        h, sps, nseg = _plan(0.0, 20e3, 2, settings.dx)
        geom = (0.0, 20e3, h, sps, nseg)
        s_ad = dc.replace(settings, backend="xla", kahan=False)
        nr = env.c_seg.shape[0]

        def f(cs, cps):
            env2 = dc.replace(env, c_seg=cs, dcdz_seg=cps)
            res = _trace_impl(env2, 1300.0, jnp.asarray(p0), geom, s_ad)
            return res.ts[:, -1], res.zs[:, -1], res.ps[:, -1]

        v_c = jnp.broadcast_to(jnp.asarray(dcoef), (nr, K, SEG_S))
        v_cp = jnp.broadcast_to(jnp.asarray(dcpcoef), (nr, K, SEG_S))
        (_, _, p_end), (dT, dz, _) = jax.jvp(
            f, (env.c_seg, env.dcdz_seg), (v_c, v_cp)
        )

        lhs = np.einsum("bks,ks->b", np.asarray(G), dcoef)
        rhs = np.asarray(dT) - np.asarray(p_end) * np.asarray(dz)
        scale = max(np.abs(rhs).max(), float(np.abs(dT).max()))
        np.testing.assert_allclose(lhs, rhs, atol=2e-3 * scale)

    def test_rough_uniform_perturbation_response(self):
        """On the rough field: a uniform δc = 1 m/s must give
        δT ≈ −T/c (path shortening argument holds for any field)."""
        from pygenray_tpu.adjoint import fermat_jacobian

        env, z = self._rough_env()
        settings = SolverSettings(dx=100.0, interp="seg")
        c_src = np.interp(1300.0, z, np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-9.0, 5.0]))) / c_src
        T, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings,
                               num_save=800)
        dT = perturbation_response(G, env, np.ones_like(z))
        np.testing.assert_allclose(-dT, np.asarray(T) / 1500.0, rtol=0.05)

    def test_rough_depth_locality(self):
        """Segments the rays never visit carry zero sensitivity; the
        visited band carries all of it."""
        from pygenray_tpu.adjoint import fermat_jacobian
        from pygenray_tpu.ops.seg import SEG_S

        env, z = self._rough_env()
        settings = SolverSettings(dx=100.0, interp="seg")
        c_src = np.interp(1300.0, z, np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-6.0]))) / c_src
        T, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings,
                               num_save=1200)
        per_seg = np.abs(np.asarray(G)[0]).sum(axis=0)  # (S,)
        # a -6 deg ray from 1300 m stays hundreds of meters clear of both
        # boundaries: the top and bottom segment bands must be exactly 0
        assert per_seg[:4].sum() == 0.0
        assert per_seg[-32:].sum() == 0.0
        assert per_seg.sum() > 0

    def test_seg_perturbation_response(self):
        from pygenray_tpu.adjoint import fermat_jacobian

        env, z = self._rough_env()
        settings = SolverSettings(dx=100.0, interp="seg")
        c_src = np.interp(1300.0, z, np.asarray(env.c[0]))
        p0 = np.sin(np.radians(-np.array([-8.0, 8.0]))) / c_src
        T, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings,
                               num_save=600)
        dcz = np.exp(-(((z - 1100.0) / 200.0) ** 2))
        dT = perturbation_response(G, env, dcz)
        assert dT.shape == (2,)
        assert np.all(dT < 0)  # faster medium -> earlier arrivals
        assert np.all(np.abs(dT) < 0.03)

    def test_seg_rd_shape_and_locality(self):
        """Range-dependent seg Fermat: (B, nr, K, S) with sensitivity only
        at stations the 20 km path actually touches."""
        from pygenray_tpu.adjoint import fermat_jacobian
        from pygenray_tpu.ops.seg import SEG_S

        rng = np.random.default_rng(3)
        z = np.linspace(0, 6000, 1200)
        r = np.linspace(0, 60e3, 8)
        ripple = sum(
            rng.normal(0, 0.7) * np.sin(2 * np.pi * z / lam + rng.uniform(0, 6))
            for lam in (40.0, 75.0, 140.0)
        )
        c = np.outer(np.ones(8), munk_ssp(z) + ripple * np.exp(-z / 2500.0))
        env = make_env_data(
            c, r, z, np.full(8, 5500.0), r, interp="seg", dtype=jnp.float64,
            force_range_dependent=True,
        )
        assert env.has_seg
        settings = SolverSettings(dx=200.0, interp="seg")
        p0 = np.sin(np.radians(-np.array([-6.0]))) / 1500.0
        T, G = fermat_jacobian(env, 1300.0, p0, 0.0, 20e3, settings)
        nr, K = env.c_seg.shape[0], env.c_seg.shape[1]
        assert G.shape == (1, nr, K, SEG_S)
        j = np.abs(G[0]).sum(axis=(1, 2))
        assert j[:4].sum() > 0
        np.testing.assert_allclose(j[5:], 0.0, atol=1e-12)

    def test_table_env_raises(self):
        env, z = self._rough_env()
        import dataclasses as dc

        from pygenray_tpu.adjoint import fermat_jacobian

        env_t = dc.replace(env, has_seg=False)
        with pytest.raises(ValueError, match="spectral .* or segment"):
            fermat_jacobian(
                env_t, 1300.0, np.array([1e-4]), 0.0, 20e3,
                SolverSettings(dx=200.0, interp="table"),
            )


class TestEndpointTimeGradients:
    @staticmethod
    def _constrained_ad(env, p0, settings):
        """dT/d(endpoint depths) by constrained launch-parameter AD.

        dT/dz_src holding the receiver depth fixed is the constrained
        combination of the two launch-parameter derivatives,
        ∂T/∂z0 − (∂T/∂p0)(∂z_end/∂z0)/(∂z_end/∂p0); dT/dz_rcv holding the
        source fixed is (∂T/∂p0)/(∂z_end/∂p0).
        """
        import jax

        from pygenray_tpu.integrate import trace

        def endpoints(z0v, p0v):
            res = trace(env, z0v, p0v, 0.0, 20e3, 2, settings)
            return res.ts[:, -1], res.zs[:, -1]

        one, zero = jnp.float64(1.0), jnp.float64(0.0)
        (T, _), (dT_dz0, dz_dz0) = jax.jvp(
            endpoints, (jnp.float64(850.0), p0), (one, jnp.zeros_like(p0)))
        _, (dT_dp0, dz_dp0) = jax.jvp(
            endpoints, (jnp.float64(850.0), p0), (zero, jnp.ones_like(p0)))
        dT_src = np.asarray(dT_dz0) - (
            np.asarray(dT_dp0) * np.asarray(dz_dz0) / np.asarray(dz_dp0))
        dT_rcv = np.asarray(dT_dp0) / np.asarray(dz_dp0)
        return np.asarray(T), dT_src, dT_rcv

    def test_exact_on_derivative_consistent_field(self):
        """The eikonal endpoint identity vs the AD it short-circuits.

        On a Hamiltonian-consistent field (dcdz_cheb the EXACT derivative
        of c_cheb) the identity dT/dz_src = −p_src, dT/dz_rcv = +p_end
        holds to roundoff of the constrained-AD combination (~1e-10).
        """
        import dataclasses

        from pygenray_tpu.adjoint import endpoint_time_gradients

        env = _env()
        K = env.c_cheb.shape[1]
        D = jnp.asarray(cheb_derivative_matrix(K, *env.z_dom),
                        env.c_cheb.dtype)
        env = dataclasses.replace(env, dcdz_cheb=env.c_cheb @ D.T,
                                  poly_ok=False)
        settings = SolverSettings(dx=100.0, interp="cheb", kahan=False)
        angles = np.array([-11.0, -6.0, 4.0, 9.0])
        c_src = np.interp(850.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src)

        T, dT_src_ad, dT_rcv_ad = self._constrained_ad(env, p0, settings)
        T0, g_src, g_rcv = endpoint_time_gradients(
            env, 850.0, p0, 0.0, 20e3, settings)
        np.testing.assert_array_equal(np.asarray(T0), T)
        np.testing.assert_allclose(np.asarray(g_src), dT_src_ad, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(g_rcv), dT_rcv_ad, rtol=1e-8)

    def test_consistent_env_option_is_exact(self):
        """``make_env_data(..., dcdz="consistent")`` builds the
        Hamiltonian-consistent field directly: the endpoint identity
        matches the constrained AD to roundoff (<=1e-8 relative) with no
        manual coefficient surgery."""
        z = np.linspace(0, 6000, 800)
        r = np.linspace(0, 20e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(8, 5500.0), r,
                            dcdz="consistent", dtype=jnp.float64)
        # the derivative series must be d/dz of the c series exactly
        K = env.c_cheb.shape[1]
        D = cheb_derivative_matrix(K, *env.z_dom)
        np.testing.assert_allclose(
            np.asarray(env.dcdz_cheb), np.asarray(env.c_cheb) @ D.T,
            rtol=1e-12, atol=1e-12)

        from pygenray_tpu.adjoint import endpoint_time_gradients

        settings = SolverSettings(dx=100.0, interp="cheb", kahan=False)
        angles = np.array([-11.0, -6.0, 4.0, 9.0])
        c_src = np.interp(850.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src)

        T, dT_src_ad, dT_rcv_ad = self._constrained_ad(env, p0, settings)
        T0, g_src, g_rcv = endpoint_time_gradients(
            env, 850.0, p0, 0.0, 20e3, settings)
        np.testing.assert_array_equal(np.asarray(T0), T)
        np.testing.assert_allclose(np.asarray(g_src), dT_src_ad, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(g_rcv), dT_rcv_ad, rtol=1e-8)

    def test_table_parity_field_floor(self):
        """On a standard env the identity is floored by the c-vs-dcdz fit
        inconsistency (dcdz_cheb fits the table's central differences for
        reference parity; it is not the exact derivative of c_cheb).
        Measured worst case ~6.4e-4 relative on this config, dx-independent
        — the gradients stay plenty accurate for localization use, and
        this test pins that the floor does not regress."""
        from pygenray_tpu.adjoint import endpoint_time_gradients

        env = _env()
        settings = SolverSettings(dx=100.0, interp="cheb", kahan=False)
        angles = np.array([-11.0, -6.0, 4.0, 9.0])
        c_src = np.interp(850.0, np.asarray(env.z), np.asarray(env.c[0]))
        p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src)

        _, dT_src_ad, dT_rcv_ad = self._constrained_ad(env, p0, settings)
        _, g_src, g_rcv = endpoint_time_gradients(
            env, 850.0, p0, 0.0, 20e3, settings)
        np.testing.assert_allclose(np.asarray(g_src), dT_src_ad, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(g_rcv), dT_rcv_ad, rtol=2e-3)
