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
