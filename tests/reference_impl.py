"""Clean-room CPU oracle for ocean-acoustic ray tracing.

An independent, scipy-based implementation of the Hamiltonian ray equations
(Colosi 2016) used ONLY as a test oracle / accuracy anchor for the TPU engine.
It reproduces the *behavior* of the reference package (event-segmented adaptive
RK45 integration with surface/bottom reflections; see reference
`src/pygenray/launch_rays.py:325-484` and `integration_processes.py:26-98`)
but is written from the published math, in plain numpy/scipy (the reference
itself cannot run here: numba is unavailable).

State vector y = [T, z, p] with range x as the independent variable and the
ODE "positive z down" convention:

    dT/dx = 1 / (c * s),   dz/dx = c p / s,   dp/dx = -(dc/dz) / (c^2 s)

with s = sqrt(1 - c^2 p^2) clamped away from zero.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import scipy.integrate
import scipy.interpolate


def bilinear(x, y, xg, yg, v):
    """Clamped bilinear interpolation on a rectilinear grid (scalar point)."""
    i = np.searchsorted(xg, x) - 1
    j = np.searchsorted(yg, y) - 1
    i = max(0, min(i, len(xg) - 2))
    j = max(0, min(j, len(yg) - 2))
    wx = (x - xg[i]) / (xg[i + 1] - xg[i])
    wy = (y - yg[j]) / (yg[j + 1] - yg[j])
    return (
        (1 - wx) * (1 - wy) * v[i, j]
        + wx * (1 - wy) * v[i + 1, j]
        + (1 - wx) * wy * v[i, j + 1]
        + wx * wy * v[i + 1, j + 1]
    )


def lin1d(x, xg, vg):
    i = np.searchsorted(xg, x) - 1
    i = max(0, min(i, len(xg) - 2))
    w = (x - xg[i]) / (xg[i + 1] - xg[i])
    return (1 - w) * vg[i] + w * vg[i + 1]


@dataclasses.dataclass
class OracleEnv:
    """Plain-array environment: c(r, z) table + bathymetry."""

    c: np.ndarray  # (nr, nz)
    dcdz: np.ndarray  # (nr, nz)
    r: np.ndarray  # (nr,)
    z: np.ndarray  # (nz,)
    bathy: np.ndarray  # (nb,)
    bathy_r: np.ndarray  # (nb,)
    bottom_angle: np.ndarray  # (nb,) degrees

    @classmethod
    def from_tables(cls, c, r, z, bathy, bathy_r):
        c = np.asarray(c, float)
        r = np.asarray(r, float)
        z = np.asarray(z, float)
        bathy = np.asarray(bathy, float)
        bathy_r = np.asarray(bathy_r, float)
        # second-order gradient in depth, matching xarray differentiate semantics
        dcdz = np.gradient(c, z, axis=1)
        slope = np.gradient(bathy, bathy_r)
        bottom_angle = np.degrees(np.arctan(slope))
        return cls(c, dcdz, r, z, bathy, bathy_r, bottom_angle)


def _rhs(x, y, env):
    z, p = y[1], y[2]
    c = bilinear(x, z, env.r, env.z, env.c)
    cp = bilinear(x, z, env.r, env.z, env.dcdz)
    arg = 1.0 - c * c * p * p
    if arg <= 0.0:
        arg = 1e-30
    s = 1.0 / np.sqrt(arg)
    return np.array([s / c, c * p * s, -s * cp / (c * c)])


def _theta_c(x, y, env):
    c = bilinear(x, y[1], env.r, env.z, env.c)
    return np.degrees(np.arcsin(np.clip(y[2] * c, -1.0, 1.0))), c


def trace_ray_oracle(
    env: OracleEnv,
    z_src: float,
    x_src: float,
    theta_ode_deg: float,
    x_rcv: float,
    num_save: int,
    rtol: float = 1e-9,
    atol: float = 1e-6,
    terminate_backwards: bool = True,
):
    """Integrate one ray in the ODE convention (theta_ode > 0 is downward).

    Returns (range_save, Y (3, num_save), n_bottom, n_surface) or None if the
    ray is dropped (vertical / out of domain / backwards bounce).
    """

    def ev_surface(x, y, _env=None):
        th, _ = _theta_c(x, y, env)
        return 1.0 if (y[1] < 0 and th < 0) else -1.0

    def ev_bottom(x, y, _env=None):
        b = lin1d(x, env.bathy_r, env.bathy)
        th, _ = _theta_c(x, y, env)
        return 1.0 if (y[1] > b and th > 0) else -1.0

    def ev_vertical(x, y, _env=None):
        th, _ = _theta_c(x, y, env)
        return 1.0 if abs(th) > 90 - 1e-3 else -1.0

    def ev_bbox(x, y, _env=None):
        tol = 1e-6
        out = (
            y[1] > env.z[-1] + tol
            or y[1] < env.z[0] - tol
            or x < env.r[0] - tol
            or x > env.r[-1] + tol
        )
        return 1.0 if out else -1.0

    for ev in (ev_surface, ev_bottom, ev_vertical, ev_bbox):
        ev.terminal = True
    ev_surface.direction = 1
    ev_bottom.direction = 1

    bangle = scipy.interpolate.interp1d(env.bathy_r, env.bottom_angle, kind="cubic")

    c0 = bilinear(x_src, z_src, env.r, env.z, env.c)
    y = np.array([0.0, z_src, np.sin(np.radians(theta_ode_deg)) / c0])
    x = x_src
    sols = []
    n_surface = n_bottom = 0

    while x < x_rcv:
        sol = scipy.integrate.solve_ivp(
            _rhs,
            (x, x_rcv),
            y,
            args=(env,),
            events=(ev_surface, ev_bottom, ev_vertical, ev_bbox),
            rtol=rtol,
            atol=atol,
            dense_output=True,
        )
        if len(sol.t) == 0 or sol.status == -1:
            return None
        sols.append(sol)
        if sol.status == 0:
            break
        y = sol.y[:, -1].copy()
        if len(sol.t_events[0]) > 0:  # surface
            x = sol.t_events[0][0]
        elif len(sol.t_events[1]) > 0:  # bottom
            x = sol.t_events[1][0]
        elif len(sol.t_events[2]) > 0 or len(sol.t_events[3]) > 0:
            return None  # vertical or out-of-domain: drop

        theta, c = _theta_c(x, y, env)
        if len(sol.t_events[0]) > 0:
            theta_new = -theta
            n_surface += 1
        else:
            beta = float(bangle(x))
            theta_new = 2 * beta - theta
            n_bottom += 1
        if terminate_backwards and abs(theta_new) > 90:
            return None
        y[2] = np.sin(np.radians(theta_new)) / c

    range_save = np.linspace(x_src, x_rcv, num_save)
    Y = np.full((3, num_save - 1), np.nan)
    for sol in sols:
        i1 = int(np.argmin(np.abs(range_save - sol.t[0])))
        i2 = int(np.argmin(np.abs(range_save - sol.t[-1])))
        if i1 == i2:
            continue
        Y[:, i1:i2] = sol.sol(range_save[i1:i2])
    Y = np.concatenate([Y, sols[-1].y[:, -1:]], axis=1)
    return range_save, Y, n_bottom, n_surface


def munk_profile(z, sofar_depth=1300.0, eps=0.00737):
    zh = 2.0 * (np.asarray(z, float) - sofar_depth) / sofar_depth
    return 1500.0 * (1.0 + eps * (zh - 1.0 + np.exp(-zh)))


def munk_env(r_max=100e3, nr=50, nz=600, bathy_depth=5000.0):
    z = np.linspace(0.0, 6000.0, nz)
    r = np.linspace(0.0, r_max, nr)
    c2d = np.outer(np.ones(nr), munk_profile(z))
    bathy = np.full(nr, bathy_depth)
    return OracleEnv.from_tables(c2d, r, z, bathy, r)
