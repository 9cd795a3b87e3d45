"""Eigenray search: batched regula-falsi over launch angle.

Reference behavior (`/root/reference/src/pygenray/eigenrays.py:11-268`):
bracket sign changes of final depth across the fan, then iterate false
position per bracket, re-shooting one ray per iteration per worker process.
Here every (receiver depth × bracket) candidate across *all* receiver depths
advances together: each iteration is one jitted batched trace of all
candidate angles (final-state only), and the converged angles get a single
batched full-save trace at the end.  The per-iteration cost is therefore one
fan shot regardless of bracket count — the reference's
``processes × iterations × full-ray-shoot`` structure collapses into
``iterations × one-batched-shot``.

The reference's stale-index bookkeeping bug for failed brackets
(`eigenrays.py:159-164`: the parallel branch records loop variable ``k``
left over from args building) is fixed: each failed bracket records its own
original bracketing angles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .integrate import trace
from .envdata import host_profile_tables
from .ops.host import bilinear_np
from .ray_objects import EigenRays, Ray
from .rootfind import rootfind_update
from .shoot import _resolve_env, settings_for
from .utils.cache import LRUCache, env_struct_key

__all__ = ["find_eigenrays", "find_eigenrays_batch"]


@jax.jit
def _pack_trace(ts, zs, ps, nb, ns):
    """Pack a full-save trace into one (B, 3S+2) array for a single fetch."""
    dt = ts.dtype
    return jnp.concatenate(
        [ts, zs, ps, nb[:, None].astype(dt), ns[:, None].astype(dt)], axis=1
    )

_DEVICE_SOLVE_CACHE = LRUCache(64)


def _empty_diagnostics():
    """Zero-bracket solver diagnostics (same keys/dtypes as a real solve),
    so ``er.diagnostics`` exists whether or not any bracket was found."""
    return {
        "rd_idx": np.zeros(0, int),
        "iterations": np.zeros(0, np.int32),
        "converged": np.zeros(0, bool),
        "dropped": np.zeros(0, bool),
        "depth_residual": np.zeros(0, float),
    }


def _device_solve(env, x0, x1, num_range_save, settings, ztol, max_iter,
                  use_newton, mesh,
                  rd_a, th1_a, th2_a, z1_a, z2_a, c_src_a, z0_a):
    """All root-finding iterations in ONE device computation.

    A ``lax.while_loop`` whose body is the batched final-state trace
    plus the bracket/Newton update — eliminates the per-iteration
    host↔device round trips of the host loop (identical update math).

    On supported configurations (spectral f32 fits, range-independent
    or range-dependent) the per-iteration trace runs through the Pallas
    kernels — the tangent kernel for Newton (primal + dz_end/dθ in one
    launch), the mega-kernel for regula falsi — which is ~an order of
    magnitude faster than the XLA scan at eigenray batch sizes.

    Per-candidate receiver depth, source sound speed AND source depth all
    ride in the packed transfer (rows 5-7), so one cached executable
    serves any batch of (source, receiver-array) configurations sharing
    the range geometry — the engine of ``find_eigenrays_batch``.
    """
    import dataclasses

    import jax

    from .integrate import _plan, _trace_impl, _use_cheb

    h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    hs_, sps_s, nseg_s = _plan(float(x0), float(x1), int(num_range_save), settings.dx)
    geom_save = (float(x0), float(x1), float(hs_), int(sps_s), int(nseg_s))
    s_it = dataclasses.replace(
        settings, backend="xla",
        kahan=settings.kahan and not use_newton,
    )
    s_full = settings

    from .ops.pallas_stepper import (
        pallas_supported, tangent_supported, trace_pallas,
        trace_pallas_tangent,
    )

    on_tpu = jax.default_backend() == "tpu"
    use_kernel = (
        settings.backend != "xla"
        and tangent_supported(env, s_it, _use_cheb(env, s_it))
        and (on_tpu or settings.backend == "pallas")
    )
    full_kernel = (
        settings.backend != "xla"
        and pallas_supported(env, s_full, _use_cheb(env, s_full))
        and (on_tpu or settings.backend == "pallas")
    )
    dt = jnp.float64 if env.c.dtype == jnp.float64 else jnp.float32
    S = nseg_s + 1
    deg = np.pi / 180.0
    NB0 = th1_a.shape[0]
    # on a mesh, pad the candidate batch to divide the devices evenly
    # (duplicates of candidate 0, sliced away after the fetch)
    n_dev = 1
    if mesh is not None:
        if len(mesh.axis_names) != 1:
            raise ValueError("find_eigenrays expects a 1D mesh")
        n_dev = mesh.shape[mesh.axis_names[0]]
    NBj = -(-NB0 // n_dev) * n_dev

    key = (
        env_struct_key(env), geom, geom_save, settings, NBj,
        bool(use_newton), bool(use_kernel), float(ztol), int(max_iter),
        mesh,
    )
    solve_fn = _DEVICE_SOLVE_CACHE.get(key)
    if solve_fn is None:

        def solve(envarg, packed):
            # packed: (8, NB) = [theta0, th1, th2, z1, z2, rd, c_src, z0]
            # — a single H2D transfer; the axon tunnel charges ~10-20 ms
            # per array transfer, so the whole solver does one in, one
            # out.  c_src and z0 ride in the packed array (NOT baked into
            # the closure) so structurally-identical problems share this
            # cached executable with their own source sound speeds and
            # source depths.
            rd = packed[5]
            inv_csrc = 1.0 / packed[6]
            z0v = packed[7]
            nb_l = packed.shape[1]  # NBj locally (NBj/n_dev on a mesh)
            st0 = (
                packed[0], packed[1], packed[2], packed[3], packed[4],
                jnp.zeros(nb_l, bool), jnp.zeros(nb_l, bool),
                jnp.full(nb_l, jnp.nan, dt), jnp.zeros(nb_l, jnp.int32),
                jnp.full(nb_l, jnp.nan, dt), jnp.asarray(0, jnp.int32),
            )

            def zfun(p):
                res = _trace_impl(envarg, z0v, p, geom, s_it)
                return res.zs[:, -1], res.alive

            def body(st):
                (theta, th1, th2, z1, z2, conv, dead, th_hit,
                 iters, resid, it) = st
                p0 = jnp.sin(-theta * deg) * inv_csrc
                if use_newton:
                    if use_kernel:
                        (_, z_ode, _, _, dz_ode, _, _, _, dcode) = (
                            trace_pallas_tangent(
                                envarg, z0v, p0,
                                jnp.ones_like(p0), geom, s_it,
                                interpret=not on_tpu,
                            )
                        )
                        alive = dcode == 0
                    else:
                        (z_ode, alive), (dz_ode, _) = jax.jvp(
                            zfun, (p0,), (jnp.ones_like(p0),)
                        )
                    dz_dth = -dz_ode * (-jnp.cos(theta * deg) * deg * inv_csrc)
                elif use_kernel:
                    res = trace_pallas(
                        envarg, z0v, p0, geom, s_it,
                        interpret=not on_tpu,
                    )
                    z_ode, alive = res.zs[:, -1], res.alive
                    dz_dth = None
                else:
                    z_ode, alive = zfun(p0)
                    dz_dth = None
                z_end = -z_ode

                iters = iters + (~(conv | dead)).astype(jnp.int32)
                (theta, th1, th2, z1, z2, conv2, dead2, th_hit,
                 act, _hit) = rootfind_update(
                    jnp, theta, th1, th2, z1, z2, conv, dead, th_hit,
                    z_end, alive, dz_dth, rd, ztol, use_newton,
                )
                resid = jnp.where(act, jnp.abs(z_end + rd), resid)
                return (theta, th1, th2, z1, z2, conv2, dead2, th_hit,
                        iters, resid, it + 1)

            def cond(st):
                return jnp.any(~(st[5] | st[6])) & (st[10] < max_iter + 2)

            st = jax.lax.while_loop(cond, body, st0)
            (_, _, _, _, _, conv, dead, th_hit, iters, resid, _) = st

            # fused final full-save trace of the hit angles (same
            # device call: no second dispatch/fetch); non-converged
            # lanes trace their initial angle, discarded on the host
            th_full = jnp.where(conv, th_hit, packed[0])
            p_full = jnp.sin(-th_full * deg) * inv_csrc
            if full_kernel:
                res_f = trace_pallas(
                    envarg, z0v, p_full, geom_save, s_full,
                    interpret=not on_tpu,
                )
            else:
                res_f = _trace_impl(
                    envarg, z0v, p_full, geom_save, s_full
                )
            # single packed D2H result: (NB, 5 + 3S + 2)
            head = jnp.stack([
                th_hit, conv.astype(dt), dead.astype(dt),
                iters.astype(dt), resid,
            ], axis=1)
            return jnp.concatenate([
                head, res_f.ts.astype(dt), res_f.zs.astype(dt),
                res_f.ps.astype(dt),
                res_f.n_bott[:, None].astype(dt),
                res_f.n_surf[:, None].astype(dt),
            ], axis=1)

        if mesh is not None:
            from jax.sharding import PartitionSpec as P

            ax = mesh.axis_names[0]
            solve = jax.shard_map(
                solve, mesh=mesh,
                in_specs=(P(), P(None, ax)), out_specs=P(ax),
                # pallas_call out_shapes carry no varying-mesh-axes meta
                check_vma=False,
            )
        solve_fn = jax.jit(solve)
        _DEVICE_SOLVE_CACHE.put(key, solve_fn)

    denom0 = np.where(np.abs(z2_a - z1_a) > 0, z2_a - z1_a, 1.0)
    theta0 = th1_a - (z1_a + rd_a) * (th2_a - th1_a) / denom0
    stacked = np.stack([theta0, th1_a, th2_a, z1_a, z2_a, rd_a,
                        c_src_a, z0_a])
    if NBj != NB0:  # pad with duplicates of candidate 0 for the mesh
        stacked = np.concatenate(
            [stacked, np.repeat(stacked[:, :1], NBj - NB0, axis=1)], axis=1
        )
    packed = jnp.asarray(stacked, dt)
    out = np.asarray(solve_fn(env, packed), float)[:NB0]
    return (
        out[:, 0], out[:, 1] > 0.5, out[:, 2] > 0.5,
        out[:, 3].astype(np.int32), out[:, 4], out[:, 5:],
    )



def find_eigenrays(
    rays,
    receiver_depths,
    source_depth,
    source_range,
    receiver_range,
    num_range_save,
    environment,
    ztol=1,
    max_iter=20,
    num_workers=None,  # accepted for API compatibility; unused
    method: str = "newton",
    verbose: bool = False,
    mesh=None,
    **kwargs,
):
    """Find eigenrays for each receiver depth via batched root finding.

    ``rays`` is the initial fan (``RayFan`` from ``shoot_rays``);
    ``receiver_depths`` are positive depths (the fan's ``zs`` use the
    negative-down user convention, so an eigenray hits when
    ``z_end + receiver_depth ≈ 0``).  Extra kwargs mirror ``shoot_ray``
    (rtol, flatearth, dx, interp, dtype, terminate_backwards).

    ``method``: "newton" (default) uses exact dz/dθ derivatives obtained by
    forward-mode AD through the trace — one extra tangent per iteration for
    quadratic convergence, safeguarded by the bracket (falls back to a
    false-position step whenever the Newton candidate leaves it).
    "regula_falsi" reproduces the reference's pure false-position iteration
    (`/root/reference/src/pygenray/eigenrays.py:206-268`).

    ``verbose`` shows per-iteration progress (a tqdm bar when tqdm is
    installed); it keeps the iterations on the host, so the default
    (``False``) single-device-computation path is also the fast one.

    ``mesh``: optional 1D device mesh — the (receiver depth × bracket)
    candidate batch shards across it for the root-finding while-loop and
    the fused full-save trace (candidates never communicate; each device
    iterates until its own candidates converge).  Candidate counts that
    do not divide the mesh are padded with duplicates and sliced away.
    """
    rtol = kwargs.get("rtol", 1e-9)
    flatearth = kwargs.get("flatearth", True)
    dx = kwargs.get("dx", None)
    interp = kwargs.get("interp", "auto")
    dtype = kwargs.get("dtype", None)
    terminate_backwards = kwargs.get("terminate_backwards", True)
    backend = kwargs.get("backend", "auto")
    settings = settings_for(rtol, dx, interp, terminate_backwards, backend)

    backwards = receiver_range < source_range
    env = _resolve_env(environment, flatearth, backwards, settings.interp, dtype)
    x0 = -source_range if backwards else source_range
    x1 = -receiver_range if backwards else receiver_range
    r_h, z_h, c_h = host_profile_tables(env)
    c_src = bilinear_np(x0, source_depth, r_h, z_h, c_h)

    def shoot_batch(user_thetas, num_save):
        """Batched trace in user angle convention; returns TraceResult."""
        theta_ode = -np.asarray(user_thetas, float)
        p0 = jnp.asarray(np.sin(np.radians(theta_ode)) / c_src, env.c.dtype)
        return trace(env, source_depth, p0, x0, x1, num_save, settings)

    def shoot_batch_grad(user_thetas):
        """(z_end, alive, dz_end/dθ_user) via one forward-mode tangent.

        z_end_i depends only on p0_i, so a single jvp with a unit tangent
        yields the whole diagonal Jacobian. AD needs the XLA scan (the
        Pallas kernel has no derivative rule) and runs without Kahan
        compensation (see adjoint.py).
        """
        import dataclasses

        import jax

        from .integrate import _plan, _trace_impl

        th = np.asarray(user_thetas, float)
        p0 = np.sin(np.radians(-th)) / c_src
        dp0_dth = -np.cos(np.radians(th)) * (np.pi / 180.0) / c_src
        h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
        geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
        s_ad = dataclasses.replace(
            settings, backend="xla", kahan=False
        )

        def zs_end(p):
            res = _trace_impl(env, source_depth, p, geom, s_ad)
            return res.zs[:, -1], res.alive

        p0j = jnp.asarray(p0, env.c.dtype)
        (z_ode, alive), (dz_ode, _) = jax.jvp(
            zs_end, (p0j,), (jnp.ones_like(p0j),)
        )
        z_user = -np.asarray(z_ode, float)
        dz_dth = -np.asarray(dz_ode, float) * dp0_dth
        return z_user, np.asarray(alive), dz_dth

    def device_solve(rd_a, th1_a, th2_a, z1_a, z2_a, use_newton):
        """One-dispatch solver for this problem: constant source depth and
        source sound speed across candidates (see ``_device_solve``)."""
        return _device_solve(
            env, x0, x1, num_range_save, settings, ztol, max_iter,
            use_newton, mesh,
            rd_a, th1_a, th2_a, z1_a, z2_a,
            np.full_like(th1_a, float(c_src)),
            np.full_like(th1_a, float(source_depth)),
        )

    # ---- collect brackets across all receiver depths ---------------------
    receiver_depths = np.atleast_1d(np.asarray(receiver_depths, float))
    items = []  # (rd_idx, rd, theta1, theta2, z1, z2, theta1_orig, theta2_orig)
    num_eigenrays = {}
    for rd_idx, rd in enumerate(receiver_depths):
        depth_sign = np.sign(rays.zs[:, -1] + rd)
        sign_change = np.diff(depth_sign)
        starts = np.where(sign_change)[0]
        num_eigenrays[rd] = len(starts)
        for s in starts:
            items.append(
                dict(
                    rd_idx=rd_idx,
                    rd=rd,
                    theta1=float(rays.thetas[s]),
                    theta2=float(rays.thetas[s + 1]),
                    z1=float(rays.zs[s, -1]),
                    z2=float(rays.zs[s + 1, -1]),
                )
            )

    erays_dict = {rd_idx: [] for rd_idx in range(len(receiver_depths))}
    failed = {rd_idx: [] for rd_idx in range(len(receiver_depths))}
    num_found = {}

    if len(items) == 0:
        for rd_idx in range(len(receiver_depths)):
            num_found[rd_idx] = 0
        er = EigenRays(
            receiver_depths, erays_dict, environment, num_eigenrays, num_found, failed
        )
        er.diagnostics = _empty_diagnostics()
        return er

    NB = len(items)
    rd_arr = np.array([it["rd"] for it in items])
    th1 = np.array([it["theta1"] for it in items])
    th2 = np.array([it["theta2"] for it in items])
    z1 = np.array([it["z1"] for it in items])
    z2 = np.array([it["z2"] for it in items])
    th1_orig, th2_orig = th1.copy(), th2.copy()

    denom = np.where(np.abs(z2 - z1) > 1e-300, z2 - z1, 1.0)
    theta = th1 - (z1 + rd_arr) * (th2 - th1) / denom

    converged = np.zeros(NB, bool)
    dead = np.zeros(NB, bool)
    theta_hit = np.full(NB, np.nan)
    iterations = np.zeros(NB, np.int32)
    resid = np.full(NB, np.nan)

    def _assemble(theta_hit, converged, dead, iterations, resid, full=None):
        # final full-resolution trajectories of the converged angles.  The
        # device solver already traced them inside its single dispatch
        # (``full``); the verbose host path re-shoots and does ONE packed
        # D2H transfer (the axon tunnel charges ~10-20 ms per array even
        # when overlapped).  The save grid is recomputed on the host.
        conv_idx = np.where(converged)[0]
        if conv_idx.size:
            nseg = max(num_range_save - 1, 1)
            S = nseg + 1
            if full is None:
                res = shoot_batch(theta_hit[conv_idx], num_save=num_range_save)
                packed = np.asarray(_pack_trace(
                    res.ts, res.zs, res.ps, res.n_bott, res.n_surf
                ), float)
            else:
                packed = full[conv_idx]
            ts, zs, ps = packed[:, :S], packed[:, S:2 * S], packed[:, 2 * S:3 * S]
            nb = packed[:, 3 * S].astype(int)
            ns = packed[:, 3 * S + 1].astype(int)
            rs = x0 + (x1 - x0) * np.arange(nseg + 1) / nseg
            if backwards:
                rs = -rs
            for j, i in enumerate(conv_idx):
                ray = Ray(
                    rs,
                    np.stack([ts[j], zs[j], ps[j]]),
                    int(nb[j]),
                    int(ns[j]),
                    launch_angle=float(theta_hit[i]),
                    source_depth=source_depth,
                )
                erays_dict[items[i]["rd_idx"]].append(ray)

        for i in np.where(~converged)[0]:
            failed[items[i]["rd_idx"]].append((th1_orig[i], th2_orig[i]))

        for rd_idx in range(len(receiver_depths)):
            num_found[rd_idx] = len(erays_dict[rd_idx])

        er = EigenRays(
            receiver_depths, erays_dict, environment, num_eigenrays, num_found, failed
        )
        # structured solver diagnostics (per bracket, flattened across depths)
        er.diagnostics = {
            "rd_idx": np.array([it["rd_idx"] for it in items]),
            "iterations": np.asarray(iterations),
            "converged": np.asarray(converged),
            "dropped": np.asarray(dead),
            "depth_residual": np.asarray(resid),
        }
        return er

    # ---- batched root-finding iterations ---------------------------------
    use_newton = method == "newton"
    if not verbose:
        # all iterations in one device while_loop (no per-iteration
        # host round trips); verbose mode keeps the host loop for progress
        theta_hit, converged, dead, iterations, resid, full = device_solve(
            rd_arr, th1, th2, z1, z2, use_newton
        )
        return _assemble(
            theta_hit, converged, dead, iterations, resid, full
        )

    it_range = range(max_iter + 2)
    try:
        from tqdm import tqdm

        it_range = tqdm(it_range, desc="Finding eigenrays")
    except ImportError:  # tqdm is optional; fall back to plain iteration
        pass
    for _ in it_range:
        active = ~(converged | dead)
        if not active.any():
            break
        if use_newton:
            z_end, alive, dz_dth = shoot_batch_grad(theta)
        else:
            res = shoot_batch(theta, num_save=2)
            alive = np.asarray(res.alive)
            z_end = -np.asarray(res.zs, float)[:, -1]  # user convention
            dz_dth = None

        iterations += active.astype(np.int32)
        (theta, th1, th2, z1, z2, converged, dead, theta_hit,
         act, _hit) = rootfind_update(
            np, theta, th1, th2, z1, z2, converged, dead, theta_hit,
            z_end, alive, dz_dth, rd_arr, ztol, use_newton,
        )
        resid = np.where(act, np.abs(z_end + rd_arr), resid)

    return _assemble(theta_hit, converged, dead, iterations, resid)


def find_eigenrays_batch(
    fan_angles,
    receiver_depths,
    source_depths,
    source_range,
    receiver_range,
    num_range_save,
    environment,
    ztol=1,
    max_iter=20,
    method: str = "newton",
    mesh=None,
    **kwargs,
):
    """Solve SEVERAL eigenray problems in one fused device pipeline.

    C configurations share the environment and the (source_range,
    receiver_range) geometry but carry their own source depth and
    (optionally) their own receiver-depth array.  The whole batch costs
    TWO dispatches: one batched fan trace for all C fans (per-ray source
    depths) and one ``_device_solve`` over every (config × depth × bracket)
    candidate — amortizing the ~35 ms/dispatch tunnel fee that dominates
    single-config eigenray latency.

    - ``fan_angles``: one (B,) angle array shared by every config, or a
      list of C equal-length arrays (per-config fans).
    - ``receiver_depths``: one depth array shared by every config, or a
      list of C arrays.
    - ``source_depths``: sequence of C source depths.

    Returns a list of C ``EigenRays``, each as ``find_eigenrays`` would
    return for that configuration.  (No reference counterpart — the
    reference solves one configuration per call,
    `/root/reference/src/pygenray/eigenrays.py:11-268`.)
    """
    rtol = kwargs.get("rtol", 1e-9)
    flatearth = kwargs.get("flatearth", True)
    dx = kwargs.get("dx", None)
    interp = kwargs.get("interp", "auto")
    dtype = kwargs.get("dtype", None)
    terminate_backwards = kwargs.get("terminate_backwards", True)
    backend = kwargs.get("backend", "auto")
    settings = settings_for(rtol, dx, interp, terminate_backwards, backend)

    source_depths = [float(s) for s in np.atleast_1d(source_depths)]
    C = len(source_depths)
    if isinstance(fan_angles, (list, tuple)):
        angle_sets = [np.asarray(a, float) for a in fan_angles]
        if len(angle_sets) != C or len({a.size for a in angle_sets}) != 1:
            raise ValueError(
                "per-config fan_angles must be C equal-length arrays"
            )
    else:
        angle_sets = [np.asarray(fan_angles, float)] * C
    if isinstance(receiver_depths, (list, tuple)) and np.ndim(
        receiver_depths[0]
    ) >= 1:
        rd_sets = [np.atleast_1d(np.asarray(r, float)) for r in receiver_depths]
        if len(rd_sets) != C:
            raise ValueError("receiver_depths list must have one entry per config")
    else:
        rd_sets = [np.atleast_1d(np.asarray(receiver_depths, float))] * C
    B = angle_sets[0].size

    backwards = receiver_range < source_range
    env = _resolve_env(environment, flatearth, backwards, settings.interp, dtype)
    x0 = -source_range if backwards else source_range
    x1 = -receiver_range if backwards else receiver_range
    r_h, z_h, c_h = host_profile_tables(env)
    c_srcs = np.array(
        [bilinear_np(x0, sd, r_h, z_h, c_h) for sd in source_depths]
    )

    # ---- phase 1: ONE batched fan trace for all C configs ----------------
    p0_all = np.concatenate(
        [np.sin(np.radians(-angle_sets[c])) / c_srcs[c] for c in range(C)]
    )
    z0_all = np.repeat(source_depths, B)
    # num_range_save (not a final-only 2) so the step plan — and therefore
    # the brackets — match a user-shot `shoot_rays(..., num_range_save, ...)`
    # fan bitwise: _plan quantizes h per save segment, and a different h
    # shifts final depths at truncation level, which moves the solver's
    # stopping angle by ~1e-9 deg.
    res = trace(
        env, jnp.asarray(z0_all, env.c.dtype), jnp.asarray(p0_all, env.c.dtype),
        x0, x1, num_range_save, settings,
    )
    # trace() returns ODE-convention depths (positive down); bracketing and
    # _device_solve use the user convention (negative down, like RayFan.zs)
    z_fan = -np.asarray(res.zs, float)[:, -1].reshape(C, B)
    alive_fan = np.asarray(res.alive).reshape(C, B)

    # ---- phase 2: bracket per (config × depth) on the host ----------------
    items = []
    num_eigenrays = [dict() for _ in range(C)]
    for c in range(C):
        zc = np.where(alive_fan[c], z_fan[c], np.nan)
        for rd_idx, rd in enumerate(rd_sets[c]):
            sign = np.sign(zc + rd)
            ok = alive_fan[c][:-1] & alive_fan[c][1:]
            starts = np.where((np.diff(sign) != 0) & ok)[0]
            num_eigenrays[c][rd] = len(starts)
            for s in starts:
                items.append(dict(
                    cfg=c, rd_idx=rd_idx, rd=float(rd),
                    theta1=float(angle_sets[c][s]),
                    theta2=float(angle_sets[c][s + 1]),
                    z1=float(z_fan[c, s]), z2=float(z_fan[c, s + 1]),
                ))

    erays = [
        {rd_idx: [] for rd_idx in range(len(rd_sets[c]))} for c in range(C)
    ]
    failed = [
        {rd_idx: [] for rd_idx in range(len(rd_sets[c]))} for c in range(C)
    ]

    def _finish():
        out = []
        for c in range(C):
            num_found = {ri: len(erays[c][ri]) for ri in erays[c]}
            er = EigenRays(
                rd_sets[c], erays[c], environment, num_eigenrays[c],
                num_found, failed[c],
            )
            er.diagnostics = _empty_diagnostics()
            out.append(er)
        return out

    if not items:
        return _finish()

    # ---- phase 3: ONE device solve over every candidate -------------------
    rd_arr = np.array([it["rd"] for it in items])
    th1 = np.array([it["theta1"] for it in items])
    th2 = np.array([it["theta2"] for it in items])
    z1 = np.array([it["z1"] for it in items])
    z2 = np.array([it["z2"] for it in items])
    cand_cs = np.array([c_srcs[it["cfg"]] for it in items])
    cand_z0 = np.array([source_depths[it["cfg"]] for it in items])

    theta_hit, converged, dead, iterations, resid, full = _device_solve(
        env, x0, x1, num_range_save, settings, ztol, max_iter,
        method == "newton", mesh,
        rd_arr, th1, th2, z1, z2, cand_cs, cand_z0,
    )

    # ---- phase 4: assemble per-config EigenRays ----------------------------
    nseg = max(num_range_save - 1, 1)
    S = nseg + 1
    rs = x0 + (x1 - x0) * np.arange(nseg + 1) / nseg
    if backwards:
        rs = -rs
    for i, it in enumerate(items):
        if converged[i]:
            row = full[i]
            erays[it["cfg"]][it["rd_idx"]].append(Ray(
                rs,
                np.stack([row[:S], row[S:2 * S], row[2 * S:3 * S]]),
                int(row[3 * S]), int(row[3 * S + 1]),
                launch_angle=float(theta_hit[i]),
                source_depth=source_depths[it["cfg"]],
            ))
        else:
            failed[it["cfg"]][it["rd_idx"]].append(
                (it["theta1"], it["theta2"])
            )

    out = _finish()
    for c in range(C):
        sel = np.array([it["cfg"] == c for it in items], bool)
        out[c].diagnostics = {
            "rd_idx": np.array([it["rd_idx"] for it in items])[sel],
            "iterations": np.asarray(iterations)[sel],
            "converged": np.asarray(converged)[sel],
            "dropped": np.asarray(dead)[sel],
            "depth_residual": np.asarray(resid)[sel],
        }
    return out
