"""Randomized engine-vs-oracle parity sweep.

Random smooth environments (Munk base + low-order spectral perturbations,
wavy sloped bathymetry), random sources and launch angles — the engine's
travel times and bounce counts must track the clean-room scipy RK45 oracle.
Grazing rays near a bounce threshold may legitimately differ in bounce
count between any two integrators (measure-zero sensitivity); the sweep
requires a high match rate and tight travel-time agreement on matches.
"""

import numpy as np
import pytest

import pygenray_tpu as pr
from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.integrate import SolverSettings, trace

import reference_impl as oracle


def random_env(rng, nz=400, nr=24, r_max=40e3):
    z = np.linspace(0.0, 5500.0, nz)
    r = np.linspace(0.0, r_max, nr)
    base = pr.munk_ssp(z)
    # smooth random vertical structure
    import numpy.polynomial.chebyshev as ncheb

    u = (2 * z - (z[0] + z[-1])) / (z[-1] - z[0])
    coefs = rng.normal(0, 1, 8) * (8.0 / (1 + np.arange(8)))
    dc = ncheb.chebval(u, coefs)
    # mild random range dependence
    ramp = rng.normal(0, 0.5e-4)
    c2d = base[None, :] + dc[None, :] + ramp * r[:, None]
    # wavy, sloped bathymetry
    b0 = rng.uniform(4200.0, 5000.0)
    slope = rng.uniform(-0.004, 0.004)
    wav = rng.uniform(0, 60.0)
    bathy = b0 + slope * r + wav * np.sin(2 * np.pi * r / rng.uniform(15e3, 40e3))
    return c2d, r, z, bathy


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_random_env_parity(seed):
    rng = np.random.default_rng(seed)
    c2d, r, z, bathy = random_env(rng)
    env = make_env_data(c2d, r, z, bathy, r, dtype="float64")
    oenv = oracle.OracleEnv.from_tables(c2d, r, z, bathy, r)

    z_src = float(rng.uniform(300.0, 2500.0))
    angles = np.concatenate(
        [rng.uniform(-8, 8, 4), rng.uniform(8, 16, 2), rng.uniform(-16, -8, 2)]
    )
    settings = SolverSettings(dx=25.0, interp="table")
    c_src = oracle.bilinear(0.0, z_src, r, z, c2d)
    p0 = np.sin(np.radians(angles)) / c_src  # ODE-convention angles directly

    res = trace(env, z_src, p0, 0.0, float(r[-1]), 2, settings)
    t_eng = np.asarray(res.ts, float)[:, -1]
    alive_eng = np.asarray(res.alive)
    nb_eng = np.asarray(res.n_bott)
    ns_eng = np.asarray(res.n_surf)

    matches = 0
    checked = 0
    for i, a in enumerate(angles):
        out = oracle.trace_ray_oracle(
            oenv, z_src, 0.0, float(a), float(r[-1]), 2, rtol=1e-11, atol=1e-11
        )
        if out is None:
            # oracle dropped the ray; engine should have too (or it is a
            # marginal backwards-bounce case) — don't count against parity
            continue
        _, Y, nb, ns = out
        checked += 1
        if not alive_eng[i]:
            continue
        if (nb_eng[i], ns_eng[i]) == (nb, ns):
            matches += 1
            tol = 2e-6 if (nb + ns) == 0 else 5e-5
            assert abs(t_eng[i] - Y[0, -1]) < tol, (
                f"seed {seed} angle {a:.3f}: dt="
                f"{abs(t_eng[i] - Y[0, -1]):.2e} (bounces {nb},{ns})"
            )

    assert checked >= 5, "oracle dropped too many rays to compare"
    assert matches / checked >= 0.7, (
        f"bounce-count match rate {matches}/{checked} too low"
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_random_env_tangent_kernel_parity(seed):
    """Forward-tangent Pallas kernel vs jax.jvp of the XLA scan on random
    smooth range-dependent environments (f32, interpret mode): event
    structure exact, Newton derivative within f32 tangent noise."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from pygenray_tpu.integrate import _plan, _trace_impl
    from pygenray_tpu.ops.pallas_stepper import (
        tangent_supported, trace_pallas_tangent,
    )

    rng = np.random.default_rng(100 + seed)
    c2d, r, z, bathy = random_env(rng)
    env = make_env_data(c2d, r, z, bathy, r, dtype="float32",
                        force_range_dependent=True)
    if not env.has_cheb:
        pytest.skip("random field failed the spectral fit guard")
    # strict kernel-vs-XLA comparison: pin the Clenshaw representation
    # (interpret-mode Horner contraction drifts on bouncing rays)
    env = dataclasses.replace(env, poly_ok=False)
    s = SolverSettings(dx=100.0, kahan=False)
    assert tangent_supported(env, s, True)

    z_src = float(rng.uniform(500.0, 2000.0))
    angles = rng.uniform(-14, 14, 48)
    c_src = oracle.bilinear(0.0, z_src, r, z, c2d)
    p0 = jnp.asarray(np.sin(np.radians(angles)) / c_src, jnp.float32)
    x1 = float(r[-1])
    h, sps, nseg = _plan(0.0, x1, 2, s.dx)
    geom = (0.0, x1, h, sps, nseg)

    def zfun(p):
        res = _trace_impl(env, z_src, p, geom, s)
        return (res.zs[:, -1], res.n_surf, res.n_bott, res.death_code)

    (zx, nsx, nbx, dcx), (dzx, *_n) = jax.jvp(
        zfun, (p0,), (jnp.ones_like(p0),)
    )
    T, zk, pk, dT, dz, dp, ns, nb, dc = trace_pallas_tangent(
        env, z_src, p0, 1.0, geom, s, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(ns), np.asarray(nsx))
    np.testing.assert_array_equal(np.asarray(nb), np.asarray(nbx))
    np.testing.assert_array_equal(np.asarray(dc), np.asarray(dcx))
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=0.1)
    alive = np.asarray(dc) == 0
    rel = np.abs(np.asarray(dz) - np.asarray(dzx)) / (
        np.abs(np.asarray(dzx)) + 1e3
    )
    assert rel[alive].max() < 5e-3, f"seed {seed}: tangent rel {rel[alive].max():.1e}"


def test_mc_one_shot_matches_two_phase_random():
    """One-shot fused MC eigenray solve vs the two-phase flow on a random
    smooth ensemble (interpret mode; the one-shot path is forced with
    backend='pallas', the two-phase with backend='xla')."""
    from pygenray_tpu.montecarlo import make_env_ensemble, mc_eigenray_times

    rng = np.random.default_rng(7)
    E = 2
    z = np.linspace(0.0, 5500.0, 400)
    r = np.linspace(0.0, 30e3, 16)
    import numpy.polynomial.chebyshev as ncheb

    u = (2 * z - (z[0] + z[-1])) / (z[-1] - z[0])
    base = pr.munk_ssp(z)
    c_ens = np.stack([
        base[None, :] + ncheb.chebval(u, rng.normal(0, 1, 6) * 2.0)[None, :]
        + rng.normal(0, 3e-5) * r[:, None]
        for _ in range(E)
    ])
    env_ens = make_env_ensemble(c_ens, r, z, np.full(16, 5000.0), r,
                                dtype="float32", cheb_order=31)
    kw = dict(receiver_depth=1200.0, source_depth=1200.0, source_range=0.0,
              receiver_range=30e3, ztol=1.0, max_iter=8)
    fan = np.linspace(-12, 12, 33)
    out_1 = mc_eigenray_times(
        env_ens, fan,
        settings=SolverSettings(dx=250.0, backend="pallas", kahan=False), **kw
    )
    out_2 = mc_eigenray_times(
        env_ens, fan,
        settings=SolverSettings(dx=250.0, backend="xla", kahan=False), **kw
    )
    assert np.array_equal(out_1["valid"], out_2["valid"])
    v = out_1["valid"]
    assert v.sum() >= E  # at least one arrival per realization
    np.testing.assert_allclose(out_1["theta"][v], out_2["theta"][v], atol=0.05)
    np.testing.assert_allclose(out_1["t"][v], out_2["t"][v], atol=5e-4)
    np.testing.assert_array_equal(out_1["n_bott"][v], out_2["n_bott"][v])
