"""User-facing AD over the traced Pallas path.

``jax.jvp`` / ``jax.jacfwd`` / ``jax.grad`` of ``trace()`` over the launch
parameters must dispatch the forward-tangent save-grid kernel
(``trace_pallas_tangent_save``) through the registered ``jax.custom_jvp``
— not silently fall back to a jvp through the XLA scan — and the results
must match the scan jvp.  Source-depth (z0) tangents seed the same kernel
through its dz0 operand (one launch per seeded direction); tangents on
environment leaves have no kernel and must keep working through the scan
fallback.

(No reference counterpart: the reference has no derivative capability at
all; differentiating travel times w.r.t. launch angle replaces its
regula-falsi-only eigenray refinement, `/root/reference/src/pygenray/
eigenrays.py:206-268`.)
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import pygenray_tpu.ops.pallas_stepper as ps
from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings, _plan, _trace_impl, trace

X1 = 30e3
Z0 = 1300.0
SP = SolverSettings(dx=200.0, backend="pallas")  # force the kernel on CPU
SX = SolverSettings(dx=200.0, backend="xla", kahan=False)  # AD reference


def _env(nz=256, nr=8, bathy_depth=5000.0):
    z = np.linspace(0.0, 6000.0, nz)
    r = np.linspace(0.0, X1, nr)
    c = np.outer(np.ones(nr), munk_ssp(z))
    return make_env_data(c, r, z, np.full(nr, bathy_depth), r, dtype=jnp.float32)


def _p0(angles, c_src=1500.0):
    return jnp.asarray(np.sin(np.radians(-np.asarray(angles))) / c_src, jnp.float32)


def _scan_jvp(env, p0, v, num_save):
    h, sps, nseg = _plan(0.0, X1, num_save, SX.dx)
    geom = (0.0, X1, h, sps, nseg)
    f = lambda p: _trace_impl(env, Z0, p, geom, SX).ts
    return jax.jvp(f, (p0,), (v,))


class TestJvpHitsKernel:
    def test_jvp_dispatches_tangent_kernel_and_matches_scan(self, monkeypatch):
        env = _env()
        p0 = _p0(np.linspace(-8, 8, 9))
        v = jnp.asarray(np.linspace(0.5, 1.5, 9), jnp.float32)

        calls = {"n": 0}
        real = ps.trace_pallas_tangent_save

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", counting)
        ts_k, dts_k = jax.jvp(
            lambda p: trace(env, Z0, p, 0.0, X1, 5, SP).ts, (p0,), (v,)
        )
        assert calls["n"] == 1  # the kernel path, not the scan fallback

        ts_x, dts_x = _scan_jvp(env, p0, v, 5)
        # identical step math (non-Kahan) in both: primal matches tightly
        np.testing.assert_allclose(
            np.asarray(ts_k), np.asarray(ts_x), atol=5e-6
        )
        scale = float(jnp.abs(dts_x).max())
        np.testing.assert_allclose(
            np.asarray(dts_k), np.asarray(dts_x), atol=3e-5 * scale
        )

    def test_full_trace_result_tangent_structure(self):
        """The jvp covers the whole save grid and zeroes the non-float
        leaves; the primal TraceResult matches the non-AD kernel trace."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 5))
        v = jnp.ones_like(p0)
        res, tang = jax.jvp(
            lambda p: trace(env, Z0, p, 0.0, X1, 7, SP), (p0,), (v,)
        )
        assert res.ts.shape == (5, 7) and tang.ts.shape == (5, 7)
        # t(x0) = 0 independent of p0; interior + final tangents nonzero
        np.testing.assert_array_equal(np.asarray(tang.ts[:, 0]), 0.0)
        assert np.all(np.abs(np.asarray(tang.ts[:, 1:])) > 0)
        assert np.all(np.asarray(res.alive))
        ref = trace(env, Z0, p0, 0.0, X1, 7, SP)
        np.testing.assert_array_equal(np.asarray(res.n_bott), np.asarray(ref.n_bott))
        np.testing.assert_array_equal(
            np.asarray(res.death_code), np.asarray(ref.death_code)
        )
        np.testing.assert_array_equal(
            np.asarray(res.alive_save), np.asarray(ref.alive_save)
        )

    def test_grad_reverse_mode_rides_the_kernel(self, monkeypatch):
        """The rule is linear in dp0, so jax.grad transposes through it —
        reverse mode launches the tangent kernel too."""
        env = _env()
        p0 = _p0(np.linspace(-8, 8, 9))

        calls = {"n": 0}
        real = ps.trace_pallas_tangent_save

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", counting)
        gk = jax.grad(
            lambda p: trace(env, Z0, p, 0.0, X1, 2, SP).ts[:, -1].sum()
        )(p0)
        assert calls["n"] == 1

        h, sps, nseg = _plan(0.0, X1, 2, SX.dx)
        geom = (0.0, X1, h, sps, nseg)
        gx = jax.grad(
            lambda p: _trace_impl(env, Z0, p, geom, SX).ts[:, -1].sum()
        )(p0)
        scale = float(jnp.abs(gx).max())
        np.testing.assert_allclose(np.asarray(gk), np.asarray(gx), atol=3e-5 * scale)

    def test_jacfwd_single_launch(self, monkeypatch):
        """jacfwd vmaps the linear rule over tangent directions — the
        kernel still launches exactly once (the diagonal trick)."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 4))

        calls = {"n": 0}
        real = ps.trace_pallas_tangent_save

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", counting)
        J = jax.jacfwd(lambda p: trace(env, Z0, p, 0.0, X1, 2, SP).ts[:, -1])(p0)
        assert calls["n"] == 1
        # per-ray dependence is diagonal
        off = np.asarray(J) - np.diag(np.diag(np.asarray(J)))
        np.testing.assert_array_equal(off, 0.0)
        assert np.all(np.abs(np.diag(np.asarray(J))) > 0)


class TestJvpWithEvents:
    def test_bouncing_rays_tangent_matches_scan(self):
        """Steep rays reflecting off surface and bottom: the event-step
        tangent (crossing localization + reflection under jax.jvp inside
        the kernel) must track the scan jvp.  Interpret-mode FMA
        contraction differs between the two graphs, so bounce-amplified
        tolerances apply (see tests/test_pallas.py preamble)."""
        env = _env(bathy_depth=4500.0)
        env = dataclasses.replace(env, poly_ok=False)
        angles = np.linspace(-14, -10, 5)  # several bottom/surface bounces
        p0 = _p0(angles)
        v = jnp.ones_like(p0)
        ts_k, dts_k = jax.jvp(
            lambda p: trace(env, Z0, p, 0.0, X1, 2, SP).ts[:, -1], (p0,), (v,)
        )
        ts_x, dts_x = _scan_jvp(env, p0, v, 2)
        ts_x, dts_x = ts_x[:, -1], dts_x[:, -1]
        np.testing.assert_allclose(np.asarray(ts_k), np.asarray(ts_x), atol=5e-6)
        scale = float(jnp.abs(dts_x).max())
        np.testing.assert_allclose(
            np.asarray(dts_k), np.asarray(dts_x), atol=1e-3 * scale
        )


class TestFallbacks:
    def test_env_tangent_falls_back_to_scan(self, monkeypatch):
        """Perturbing an environment leaf has no kernel: the trace routes
        through the XLA scan (and never launches the tangent kernel)."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 5))

        def boom(*a, **k):  # the kernel must NOT be hit
            raise AssertionError("tangent kernel dispatched for env tangent")

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", boom)

        def f(c_cheb):
            e = dataclasses.replace(env, c_cheb=c_cheb, poly_ok=False)
            return trace(e, Z0, p0, 0.0, X1, 2, SP).ts[:, -1]

        ts, dts = jax.jvp(f, (env.c_cheb,), (jnp.ones_like(env.c_cheb),))
        assert np.all(np.isfinite(np.asarray(dts)))
        assert np.any(np.asarray(dts) != 0)

    def test_z0_tangent_rides_the_kernel_and_matches_scan(self, monkeypatch):
        """Source-depth sensitivity (localization): a z0 tangent seeds the
        same save-grid tangent kernel through its dz0 operand."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 5))

        calls = {"n": 0}
        real = ps.trace_pallas_tangent_save

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", counting)
        z0 = jnp.float32(Z0)
        ts_k, dts_k = jax.jvp(
            lambda z: trace(env, z, p0, 0.0, X1, 2, SP).ts[:, -1],
            (z0,), (jnp.float32(1.0),),
        )
        assert calls["n"] == 1  # one launch for the one seeded direction

        h, sps, nseg = _plan(0.0, X1, 2, SX.dx)
        geom = (0.0, X1, h, sps, nseg)
        ts_x, dts_x = jax.jvp(
            lambda z: _trace_impl(env, z, p0, geom, SX).ts[:, -1],
            (z0,), (jnp.float32(1.0),),
        )
        np.testing.assert_allclose(np.asarray(ts_k), np.asarray(ts_x), atol=5e-6)
        scale = float(jnp.abs(dts_x).max())
        np.testing.assert_allclose(
            np.asarray(dts_k), np.asarray(dts_x), atol=3e-5 * scale
        )

    def test_joint_p0_z0_tangent_two_launches(self, monkeypatch):
        """Seeding both launch parameters costs exactly two kernel launches
        and the tangents add linearly (the transposable rule)."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 5))
        v = jnp.asarray(np.linspace(0.5, 1.5, 5), jnp.float32)

        calls = {"n": 0}
        real = ps.trace_pallas_tangent_save

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(ps, "trace_pallas_tangent_save", counting)
        z0 = jnp.float32(Z0)
        _, dts_joint = jax.jvp(
            lambda z, p: trace(env, z, p, 0.0, X1, 2, SP).ts[:, -1],
            (z0, p0), (jnp.float32(0.7), v),
        )
        assert calls["n"] == 2

        _, dts_z = jax.jvp(
            lambda z: trace(env, z, p0, 0.0, X1, 2, SP).ts[:, -1],
            (z0,), (jnp.float32(0.7),),
        )
        _, dts_p = jax.jvp(
            lambda p: trace(env, z0, p, 0.0, X1, 2, SP).ts[:, -1],
            (p0,), (v,),
        )
        np.testing.assert_allclose(
            np.asarray(dts_joint), np.asarray(dts_z) + np.asarray(dts_p),
            rtol=1e-6, atol=1e-12,
        )

    def test_grad_over_z0(self):
        """Reverse mode over the source depth transposes through the same
        linear rule (sum of per-ray dT/dz0 against the cotangent)."""
        env = _env()
        p0 = _p0(np.linspace(-6, 6, 5))

        g_k = jax.grad(
            lambda z: trace(env, z, p0, 0.0, X1, 2, SP).ts[:, -1].sum()
        )(jnp.float32(Z0))

        h, sps, nseg = _plan(0.0, X1, 2, SX.dx)
        geom = (0.0, X1, h, sps, nseg)
        g_x = jax.grad(
            lambda z: _trace_impl(env, z, p0, geom, SX).ts[:, -1].sum()
        )(jnp.float32(Z0))
        np.testing.assert_allclose(
            float(g_k), float(g_x), rtol=3e-4
        )
