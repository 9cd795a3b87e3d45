"""User-facing ray shooting API: ``shoot_rays`` (fan) and ``shoot_ray``.

Reference parity (`/root/reference/src/pygenray/launch_rays.py:11-322`) with
one deliberate unification: the reference integrates a *different* sign
convention in its serial (<70 rays) branch than in its multiprocessing
branch (double angle negation, `launch_rays.py:67` + `:251`).  The
convention locked by the reference's own tests and consumed by
``find_eigenrays`` is the multiprocessing/direct-``shoot_ray`` one — user
angle θ maps to ODE launch angle -θ — and this implementation uses it for
every batch size (there is only one code path: the batched scan).

Backwards shots (receiver_range < source_range) mirror the environment
about the range axis, integrate forward, and un-mirror the saved ranges
(`launch_rays.py:124-131`).

Instead of a process pool + shared memory, the fan is one jitted batched
trace; multi-chip scaling shards the launch-angle axis (see
``pygenray_tpu.parallel``).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .envdata import EnvData
from .environment import OceanEnvironment2D
from .integrate import DEATH_CODES, SolverSettings, trace
from .envdata import host_profile_tables
from .ops.host import bilinear_np
from .ray_objects import Ray, RayFan

__all__ = ["shoot_rays", "shoot_ray", "settings_for"]


def _debug_report(res, launch_angles, backwards, stream=None):
    """Per-ray termination diagnostics, printed when ``debug=True``.

    The reference prints these *during* integration as each terminal event
    fires (`launch_rays.py:428-456,475-477`: integration failure, vertical
    ray at (x, z), bounding-box exit at (x, z), backwards bounce).  The
    whole batch integrates together here, so the equivalent report is
    post-trace: for every dropped ray, the death reason (``DEATH_CODES``)
    and the last saved alive state approximating where it died, plus
    per-ray bounce counts.
    """
    import sys

    stream = stream or sys.stderr
    alive = np.asarray(res.alive)
    code = np.asarray(res.death_code)
    alive_save = np.asarray(res.alive_save)
    rs = np.asarray(res.rs, float)
    if backwards:
        rs = -rs
    zs = -np.asarray(res.zs, float)  # user convention
    n_bott = np.asarray(res.n_bott)
    n_surf = np.asarray(res.n_surf)
    angles = np.broadcast_to(np.asarray(launch_angles, float), alive.shape)
    for k in np.flatnonzero(~alive):
        # last save point at which this ray was still alive
        idx = np.flatnonzero(alive_save[k])
        reason = DEATH_CODES.get(int(code[k]), f"code {int(code[k])}")
        if idx.size:
            j = idx[-1]
            where = f"last alive near x={rs[j]:.1f} m, z={zs[k, j]:.1f} m"
        else:
            where = "died before the first save point"
        print(
            f"debug: ray {k} (launch {angles[k]:+.4f} deg) terminated: "
            f"{reason}; {where}; bounces bottom={int(n_bott[k])} "
            f"surface={int(n_surf[k])}",
            file=stream, flush=True,
        )
    print(
        f"debug: {int(alive.sum())}/{alive.size} rays alive; "
        f"bounces bottom[min/max]={int(n_bott.min())}/{int(n_bott.max())} "
        f"surface[min/max]={int(n_surf.min())}/{int(n_surf.max())}",
        file=stream, flush=True,
    )


def settings_for(rtol=1e-9, dx=None, interp="auto", terminate_backwards=True,
                 backend="auto"):
    """Solver settings; ``rtol`` is accepted for reference-API compatibility
    and mapped onto a nominal fixed step when ``dx`` is not given."""
    if dx is None:
        dx = float(np.clip(50.0 * (rtol / 1e-9) ** 0.25, 5.0, 500.0))
    return SolverSettings(dx=dx, interp=interp,
                          terminate_backwards=terminate_backwards,
                          backend=backend)


def _resolve_env(environment, flatearth, mirrored, interp, dtype):
    if isinstance(environment, EnvData):
        if mirrored:
            # device-pytree mirror (memoized per env object); matches the
            # reference's host-array mirroring, launch_rays.py:684-714
            from .envdata import mirror_env_data

            return mirror_env_data(environment)
        return environment
    return environment.env_data(
        flatearth=flatearth, mirrored=mirrored, interp=interp, dtype=dtype
    )


def _trace_fan(
    source_depth,
    source_range,
    theta_ode,
    receiver_range,
    num_range_save,
    environment,
    settings,
    flatearth,
    dtype,
    mesh=None,
):
    """Shared fan-trace core in the ODE convention. Returns (result, env, backwards)."""
    backwards = receiver_range < source_range
    env = _resolve_env(environment, flatearth, backwards, settings.interp, dtype)
    if backwards:
        x0, x1 = -source_range, -receiver_range
    else:
        x0, x1 = source_range, receiver_range

    source_depth = np.asarray(source_depth, float)
    r_h, z_h, c_h = host_profile_tables(env)
    c_src = bilinear_np(
        np.broadcast_to(x0, source_depth.shape), source_depth, r_h, z_h, c_h
    )
    p0 = np.sin(np.radians(np.asarray(theta_ode, float))) / c_src
    p0 = jnp.asarray(p0, env.c.dtype)
    if source_depth.ndim:
        source_depth = jnp.asarray(source_depth, env.c.dtype)
    else:
        source_depth = float(source_depth)

    if mesh is not None:
        from .parallel.sharding import shard_rays

        p0 = shard_rays(p0, mesh)

    res = trace(env, source_depth, p0, x0, x1, num_range_save, settings)
    return res, env, backwards


def shoot_rays(
    source_depth: float,
    source_range: float,
    launch_angles,
    receiver_range: float,
    num_range_save: int,
    environment,
    rtol=1e-9,
    terminate_backwards: bool = True,
    n_processes: int = None,  # accepted for API compatibility; unused
    debug: bool = False,
    flatearth: bool = True,
    *,
    dx: float = None,
    interp: str = "auto",
    dtype=None,
    mesh=None,
    keep_dropped: bool = False,
    nan_dropped: bool = True,
    backend: str = "auto",
    verbose: bool = False,
) -> RayFan:
    """Integrate a fan of rays; returns a ``RayFan``.

    Reference signature `launch_rays.py:11-23` plus TPU extras: ``dx``
    (nominal step, m), ``interp`` (profile backend), ``mesh`` (shard the
    angle axis over a ``jax.sharding.Mesh``), ``keep_dropped`` (keep dead
    rays in the fan with their death diagnostics instead of dropping them).
    Rays that turn vertical, leave the domain, or bounce backwards are
    dropped from the fan exactly like the reference drops ``None`` rays
    (`launch_rays.py:169-184`).

    With ``keep_dropped=True``, save points past a ray's death are NaN
    (reference save-grid semantics, `launch_rays.py:745-784`); pass
    ``nan_dropped=False`` to keep the integrator's frozen last-alive state
    instead.  The fan's ``alive``/``death_code`` arrays survive slicing,
    concatenation, and the npz round-trip.

    ``verbose`` reports phase progress (the reference shows a per-ray tqdm
    bar, `launch_rays.py:96,159`; the whole batch advances together here,
    so progress is per phase: trace, then fetch/assemble).
    """
    import sys
    import time as _time

    launch_angles = np.atleast_1d(np.asarray(launch_angles, float))
    theta_ode = -launch_angles
    settings = settings_for(rtol, dx, interp, terminate_backwards, backend)
    # source_depth may be per-ray (a vertical source array) or scalar
    src_arr = np.asarray(source_depth, float)
    if src_arr.ndim:
        src_arr = np.broadcast_to(src_arr, launch_angles.shape)
        source_depth = src_arr

    if verbose:
        print(
            f"shoot_rays: tracing {launch_angles.size} rays to "
            f"{receiver_range / 1e3:.1f} km ...", file=sys.stderr, flush=True,
        )
        t0 = _time.perf_counter()

    res, env, backwards = _trace_fan(
        source_depth, source_range, theta_ode, receiver_range, num_range_save,
        environment, settings, flatearth, dtype, mesh,
    )

    alive = np.asarray(res.alive)
    if debug:
        _debug_report(res, launch_angles, backwards)
    if verbose:
        print(
            f"shoot_rays: done in {_time.perf_counter() - t0:.3f} s "
            f"({int(alive.sum())}/{alive.size} rays alive)",
            file=sys.stderr, flush=True,
        )
    keep = np.ones_like(alive) if keep_dropped else alive
    rs = np.asarray(res.rs, float)
    if backwards:
        rs = -rs
    M = int(keep.sum())
    rs_fan = np.broadcast_to(rs, (M, rs.shape[0])).copy()

    ts = np.asarray(res.ts, float)[keep]
    zs = -np.asarray(res.zs, float)[keep]
    ps = -np.asarray(res.ps, float)[keep]
    if keep_dropped and nan_dropped:
        # reference semantics: save points a dropped ray never reached stay
        # NaN (`launch_rays.py:745-784`) instead of freezing the last alive
        # state — frozen values LOOK plausible but were never integrated
        unreached = ~np.asarray(res.alive_save)[keep]
        ts[unreached] = np.nan
        zs[unreached] = np.nan
        ps[unreached] = np.nan

    return RayFan.from_arrays(
        thetas=launch_angles[keep],
        rs=rs_fan,
        ts=ts,
        zs=zs,
        ps=ps,
        n_botts=np.asarray(res.n_bott)[keep],
        n_surfs=np.asarray(res.n_surf)[keep],
        source_depths=(
            src_arr[keep].copy() if src_arr.ndim else np.full(M, source_depth, float)
        ),
        alive=alive[keep],
        death_code=np.asarray(res.death_code)[keep],
    )


def shoot_ray(
    source_depth: float,
    source_range: float,
    launch_angle: float,
    receiver_range: float,
    num_range_save: int,
    environment,
    rtol=1e-9,
    terminate_backwards: bool = True,
    debug: bool = False,
    flatearth: bool = True,
    *,
    dx: float = None,
    interp: str = "auto",
    dtype=None,
) -> Ray | None:
    """Integrate a single ray; returns a ``Ray`` or None if it was dropped.

    Reference quirk preserved (`launch_rays.py:251`, `:313-320`): the
    returned ``Ray.launch_angle`` is the *negated* user input;
    ``find_eigenrays`` flips it back.
    """
    theta_ode = -float(launch_angle)
    settings = settings_for(rtol, dx, interp, terminate_backwards)
    res, env, backwards = _trace_fan(
        source_depth, source_range, np.array([theta_ode]), receiver_range,
        num_range_save, environment, settings, flatearth, dtype,
    )
    if debug:
        _debug_report(res, np.array([launch_angle], float), backwards)
    if not bool(np.asarray(res.alive)[0]):
        return None
    rs = np.asarray(res.rs, float)
    if backwards:
        rs = -rs
    y = np.stack(
        [np.asarray(res.ts)[0], np.asarray(res.zs)[0], np.asarray(res.ps)[0]]
    )
    return Ray(
        rs,
        y,
        int(np.asarray(res.n_bott)[0]),
        int(np.asarray(res.n_surf)[0]),
        theta_ode,
        source_depth,
    )
