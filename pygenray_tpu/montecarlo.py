"""Monte-Carlo tomography: ensembles of perturbed environments.

Supports the 10^6-ray Monte-Carlo configuration (BASELINE.json configs[4]):
an ensemble of E internal-wave-perturbed sound-speed realizations traced as
one batched computation — the realization axis is just another vmapped
batch dimension on top of the launch-angle axis, and eigenray regula-falsi
iterations run for all (realization × bracket) candidates simultaneously.

The reference package would run this as E independent multiprocessing fans
plus E × brackets root-finding processes; here it is two nested batch axes
on one jitted scan.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .envdata import EnvData, make_env_data
from .integrate import SolverSettings, TraceResult, _plan, _trace_impl
from .ops.host import bilinear_np
from .rootfind import rootfind_update
from .utils.cache import LRUCache, env_struct_key

__all__ = ["make_env_ensemble", "trace_ensemble", "mc_eigenray_times"]

_MC_SOLVE_CACHE = LRUCache(32)


def make_env_ensemble(
    c_ens, r, z, bathy, bathy_r, interp: str = "auto", dtype=None,
    cheb_order: int = 255, **kw
) -> EnvData:
    """Stack per-realization environments into one EnvData with a leading
    ensemble axis on every data field (static metadata must agree, so the
    Chebyshev order is fixed by the first realization's adaptive fit)."""
    c_ens = np.asarray(c_ens, np.float64)
    E = c_ens.shape[0]
    # first pass: adaptive fit per realization to find the largest order any
    # member needs, so every member shares one static fit structure
    kw.setdefault("force_range_dependent", True)
    kw.setdefault("cheb_order", cheb_order)  # perturbed fields need high order
    probes = [
        make_env_data(c_ens[e], r, z, bathy, bathy_r, interp=interp, dtype=dtype, **kw)
        for e in range(E)
    ]
    kw2 = {k: v for k, v in kw.items()
           if k not in ("cheb_order", "cheb_exact_order",
                        "seg_order", "seg_exact_order", "seg_basis")}
    if interp not in ("table", "seg") and not all(p.has_cheb for p in probes):
        if interp == "cheb":
            raise ValueError(
                "some realizations fail the Chebyshev fit guard; "
                "use interp='seg' or 'table' for rough ensembles"
            )
        # auto mode: piecewise-segment fast path before the gather cliff
        try:
            probes = [
                make_env_data(c_ens[e], r, z, bathy, bathy_r, interp="seg",
                              dtype=dtype, **kw2)
                for e in range(E)
            ]
            interp = "seg"
        except ValueError:
            interp = "table"  # even the segment gates fail: exact tables
            import warnings

            warnings.warn(
                "ensemble fell back to table interpolation (global AND "
                "segment fit gates failed — reachable only for tables "
                "sampling their finest structure below ~4 points per "
                "wavelength, see ops/seg.py); the vmapped gather path is "
                "slow on TPU — resample the realizations onto a finer "
                "depth grid",
                stacklevel=2,
            )
            probes = [
                make_env_data(c_ens[e], r, z, bathy, bathy_r, interp="table", dtype=dtype, **kw)
                for e in range(E)
            ]
    elif interp == "seg":
        probes = [
            make_env_data(c_ens[e], r, z, bathy, bathy_r, interp="seg",
                          dtype=dtype, **kw2)
            for e in range(E)
        ]

    if probes[0].has_seg:
        # align the per-realization segment orders AND basis so the
        # pytrees stack (seg_basis is static metadata: one member on the
        # high-order Chebyshev rungs lifts the whole ensemble there)
        ks = max(p.c_seg.shape[1] for p in probes) - 1
        sb = "cheb" if any(p.seg_basis == "cheb" for p in probes) else "pow"
        envs = [
            p if (p.c_seg.shape[1] - 1 == ks and p.seg_basis == sb)
            else make_env_data(
                c_ens[e], r, z, bathy, bathy_r, interp="seg", dtype=dtype,
                seg_order=ks, seg_exact_order=True, seg_basis=sb, **kw2,
            )
            for e, p in enumerate(probes)
        ]
    elif interp == "table" or not probes[0].has_cheb:
        envs = probes
    else:
        order = max(p.c_cheb.shape[1] for p in probes) - 1
        # only refit members whose adaptive order differs from the shared
        # target (refitting everything doubled ensemble build time)
        envs = [
            p if p.c_cheb.shape[1] - 1 == order else make_env_data(
                c_ens[e], r, z, bathy, bathy_r, interp=interp, dtype=dtype,
                cheb_order=order, cheb_exact_order=True, **kw2,
            )
            for e, p in enumerate(probes)
        ]
    if len({e.poly_ok for e in envs}) > 1:
        # meta must agree to stack; a single non-conforming realization
        # demotes the whole ensemble to the Clenshaw path
        envs = [dataclasses.replace(e, poly_ok=False) for e in envs]
    return jax.tree_util.tree_map(lambda *leaves: jnp.stack(leaves), *envs)


# empirical TPU v5e envelope for the vmapped table-gather path: a
# 16-realization x 65,536-ray call crashes the TPU worker (fault surfaces
# on value fetch), while 16 x 8,192 completes.  Calls above the cap are
# chunked along the ray axis — slow-but-correct instead of faulting.
TABLE_GATHER_RAY_CAP = 131_072


def trace_ensemble(
    env_ens: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    num_save: int,
    settings: SolverSettings = SolverSettings(),
    mesh=None,
    calm=None,
    dyn=None,
) -> TraceResult:
    """Trace a (possibly per-realization) angle batch through every
    realization: ``p0`` is (B,) shared or (E, B) per-realization; returns a
    TraceResult with leading ensemble axis (E, B, ...).

    ``calm`` optionally supplies the (E, 4) per-realization calm-range
    table (``ops.pallas_stepper.classify_calm_ensemble``) for callers that
    jit around this function; on TPU it is classified automatically.
    ``dyn`` likewise supplies the (E, nblocks, 4) per-realization
    dynamic-window tables (``classify_dyn_ensemble``, ``settings.dyn_calm``).

    ``mesh``: an optional 1D ``jax.sharding.Mesh`` — realizations are
    embarrassingly parallel (the TPU-native replacement for the reference's
    per-realization process fan), so the ensemble axis shards across the
    mesh with zero collectives; E must divide the device count evenly.

    On TPU, table-interpolation ensembles above ``TABLE_GATHER_RAY_CAP``
    total rays are traced in sequential ray-axis chunks: the vmapped gather
    path crashes the chip above that envelope (reference parity backend,
    `/root/reference/src/pygenray/integration_processes.py:101-174`, is
    exact but gather-heavy; prefer the spectral path wherever it fits).
    """
    if not float(x1) > float(x0):
        raise ValueError(
            "trace_ensemble requires x1 > x0; mirror the environment for "
            "backwards shots"
        )
    h, sps, nseg = _plan(float(x0), float(x1), int(num_save), settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    p0 = jnp.asarray(p0)
    p_axis = 0 if p0.ndim == 2 else None

    from .integrate import _use_cheb, _use_seg

    E = env_ens.c.shape[0]
    B = p0.shape[-1]
    if mesh is not None:
        return _trace_ensemble_sharded(
            env_ens, z0, p0, p_axis, geom, settings, mesh, calm=calm
        )
    if (not _use_cheb(env_ens, settings) and not _use_seg(env_ens, settings)
            and E * B > TABLE_GATHER_RAY_CAP):
        import warnings

        nchunks = -(-(E * B) // TABLE_GATHER_RAY_CAP)
        bc = -(-B // nchunks)
        if bc >= B:
            # cannot chunk further along the ray axis (the realization
            # count alone exceeds the envelope) — fail loudly instead of
            # recursing on the identical problem
            raise ValueError(
                f"table-path ensemble of {E} realizations exceeds the TPU "
                "gather envelope even at one ray per chunk; split the "
                "ensemble across calls or use the spectral path"
            )
        warnings.warn(
            f"table-path ensemble of {E}x{B} rays exceeds the TPU gather "
            f"envelope; tracing in {nchunks} chunks of {bc} rays "
            "(slow-but-correct — use the spectral path for speed)",
            stacklevel=2,
        )
        outs = []
        for lo in range(0, B, bc):
            pc = p0[..., lo:lo + bc]
            outs.append(
                trace_ensemble(env_ens, z0, pc, x0, x1, num_save, settings)
            )
        cat = lambda get: jnp.concatenate([get(o) for o in outs], axis=1)
        return TraceResult(
            rs=outs[0].rs,  # save grid is chunk-independent
            ts=cat(lambda o: o.ts), zs=cat(lambda o: o.zs),
            ps=cat(lambda o: o.ps),
            n_bott=cat(lambda o: o.n_bott), n_surf=cat(lambda o: o.n_surf),
            alive=cat(lambda o: o.alive),
            alive_save=cat(lambda o: o.alive_save),
            death_code=cat(lambda o: o.death_code),
        )

    # Pallas mega-kernel path: the kernel cannot be vmapped, but an
    # unrolled loop of per-realization launches inside ONE jit still wins
    # (~3x) over the vmapped XLA scan — and costs a single host dispatch
    # (the axon tunnel charges ~20-30 ms per dispatch; E eager launches
    # used to pay it E times).  backend="pallas" forces the interpreted
    # kernel off-TPU (same policy as trace()).
    on_tpu = jax.default_backend() == "tpu"
    if settings.backend != "xla" and (on_tpu or settings.backend == "pallas"):
        from .integrate import _use_cheb
        from .ops.pallas_stepper import pallas_supported

        env0 = jax.tree_util.tree_map(lambda a: a[0], env_ens)
        if pallas_supported(env0, settings, _use_cheb(env0, settings)):
            return _trace_ensemble_pallas(env_ens, z0, p0, p_axis, geom,
                                          settings, interpret=not on_tpu,
                                          calm=calm, dyn=dyn)

    fn = lambda env, p: _trace_impl(env, z0, p, geom, settings)
    return jax.vmap(fn, in_axes=(0, p_axis))(env_ens, p0)


_ENS_PALLAS_CACHE = LRUCache(32)


def _trace_ensemble_pallas(env_ens, z0, p0, p_axis, geom, settings,
                           interpret=False, calm=None, dyn=None):
    """All E per-realization mega-kernel launches unrolled inside one
    jitted call — one host dispatch for the whole ensemble trace.

    ``calm`` optionally supplies the (E, 4) per-realization calm-range
    table (``classify_calm_ensemble``); by default it is classified on the
    host (memoized per ensemble+fan), so each realization's launch skips
    the event machinery for its provably-safe blocks.  ``dyn`` likewise
    supplies the (E, nblocks, 4) dynamic-window tables
    (``classify_dyn_ensemble``) so boundary blocks skip the event body
    between bounce clusters."""
    from .ops.pallas_stepper import (
        _calm_disabled,
        _classify_calm_cached,
        trace_pallas,
    )

    E = env_ens.c.shape[0]
    z0a = jnp.asarray(z0, env_ens.c.dtype)
    if calm is None and settings.calm and not interpret:
        calm = _classify_calm_cached(env_ens, z0, p0, geom, settings,
                                     ensemble=True)
    # same auto-dyn policy as trace_pallas_cached: windows only when the
    # static classifier declined (rough/IW ensembles — the production
    # case); neutral-to-negative elsewhere in the paired A/B
    if (dyn is None and settings.dyn_calm and not interpret
            and calm is None):
        dyn = _classify_calm_cached(env_ens, z0, p0, geom, settings,
                                    ensemble="dyn_ens")
    cm_tab = (_calm_disabled((E, 4)) if calm is None
              else jnp.asarray(calm, jnp.float32))
    use_dyn = dyn is not None
    key = (env_struct_key(env_ens), geom, settings, p0.shape, p_axis,
           z0a.shape, bool(interpret), use_dyn)
    fn = _ENS_PALLAS_CACHE.get(key)
    if fn is None:

        # z0 is a runtime argument (never baked into the closure): two
        # same-shape calls with different source depths must not share a
        # traced constant
        def run(envs, p, zz, cm, dy=None):
            outs = []
            for e in range(E):
                env_e = jax.tree_util.tree_map(lambda a: a[e], envs)
                p_e = p[e] if p_axis == 0 else p
                res = trace_pallas(env_e, zz, p_e, geom, settings,
                                   interpret=interpret, calm=cm[e],
                                   dyn=None if dy is None else dy[e])
                outs.append(res)
            return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

        fn = jax.jit(run)
        _ENS_PALLAS_CACHE.put(key, fn)
    if use_dyn:
        return fn(env_ens, p0, z0a, cm_tab, jnp.asarray(dyn, jnp.float32))
    return fn(env_ens, p0, z0a, cm_tab)


_ENS_SHARD_CACHE = LRUCache(16)


def _trace_ensemble_sharded(env_ens, z0, p0, p_axis, geom, settings, mesh,
                            calm=None):
    """Realization-sharded ensemble trace: ``jax.shard_map`` over the
    ensemble axis — each device runs the single-chip path (per-realization
    mega-kernel launches when supported, the vmapped XLA scan otherwise) on
    its local realizations.  Realizations never communicate, so there are
    no collectives at all — this is the TPU-native replacement for the
    reference's per-realization process fan
    (`/root/reference/src/pygenray/eigenrays.py:122-157`)."""
    from jax.sharding import PartitionSpec as P

    from .integrate import _use_cheb
    from .ops.pallas_stepper import pallas_supported, trace_pallas

    E = env_ens.c.shape[0]
    if len(mesh.axis_names) != 1:
        raise ValueError("trace_ensemble expects a 1D mesh")
    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if E % n_dev != 0:
        raise ValueError(
            f"ensemble size {E} must divide evenly over the {n_dev}-device mesh"
        )
    E_loc = E // n_dev
    on_tpu = jax.default_backend() == "tpu"
    env0 = jax.tree_util.tree_map(lambda a: a[0], env_ens)
    use_kernel = (
        settings.backend != "xla"
        and pallas_supported(env0, settings, _use_cheb(env0, settings))
        and (on_tpu or settings.backend == "pallas")
    )
    z0a = jnp.asarray(z0, env_ens.c.dtype)
    if calm is None and use_kernel and settings.calm and on_tpu:
        from .ops.pallas_stepper import _classify_calm_cached

        calm = _classify_calm_cached(env_ens, z0, p0, geom, settings,
                                     ensemble=True)
    from .ops.pallas_stepper import _calm_disabled

    cm_tab = (_calm_disabled((E, 4)) if calm is None
              else jnp.asarray(calm, jnp.float32))
    key = (env_struct_key(env_ens), geom, settings, p0.shape, p_axis,
           z0a.shape, mesh, bool(use_kernel))
    fn = _ENS_SHARD_CACHE.get(key)
    if fn is None:

        def local(envs, p, zz, cm):
            if use_kernel:
                outs = []
                for e in range(E_loc):
                    env_e = jax.tree_util.tree_map(lambda a: a[e], envs)
                    p_e = p[e] if p_axis == 0 else p
                    outs.append(
                        trace_pallas(env_e, zz, p_e, geom, settings,
                                     interpret=not on_tpu, calm=cm[e])
                    )
                return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)
            fni = lambda env, pp: _trace_impl(env, zz, pp, geom, settings)
            return jax.vmap(fni, in_axes=(0, p_axis))(envs, p)

        ens = P(axis)
        fn = jax.jit(
            jax.shard_map(
                local, mesh=mesh,
                in_specs=(ens, ens if p_axis == 0 else P(), P(),
                          P(axis, None)),
                out_specs=ens,
                # pallas_call out_shapes carry no varying-mesh-axes metadata
                check_vma=False,
            )
        )
        _ENS_SHARD_CACHE.put(key, fn)
    return fn(env_ens, p0, z0a, cm_tab)


def mc_eigenray_times(
    env_ens: EnvData,
    fan_angles,
    receiver_depth: float,
    source_depth: float,
    source_range: float,
    receiver_range: float,
    ztol: float = 1.0,
    max_iter: int = 20,
    settings: SolverSettings = SolverSettings(),
    mesh=None,
):
    """Eigenray travel times across an ensemble of environments.

    Runs a fan per realization, brackets the arrivals, then iterates all
    (realization × bracket) Newton/regula-falsi candidates together as one
    device computation.  ``receiver_depth`` is a scalar or an array of
    depths (a vertical receiver array, like ``find_eigenrays``):

    - scalar: returns a dict of (E, M) arrays (M = max bracket count over
      realizations): ``theta`` (user launch angles), ``t`` (travel times),
      ``z_resid`` (final-depth residual), ``n_surf``/``n_bott``, and
      ``valid`` (bracket exists and converged).
    - array of n depths: the SAME fan serves every depth and all
      (depth × realization × bracket) candidates solve in one device call;
      returns (n, E, M) arrays.

    ``mesh``: optional 1D device mesh — the realization axis (the natural
    multi-chip axis of a Monte-Carlo ensemble) shards across it for the fan,
    the Newton iterations, and the final evaluation; E must divide the
    device count evenly.
    """
    fan_angles = np.asarray(fan_angles, float)
    E = env_ens.c.shape[0]
    if not float(receiver_range) > float(source_range):
        raise ValueError(
            "mc_eigenray_times requires receiver_range > source_range; "
            "mirror the ensemble for backwards geometry"
        )
    rds = np.atleast_1d(np.asarray(receiver_depth, float))
    scalar_depth = np.ndim(receiver_depth) == 0

    # one overlapped device->host pull for all realizations (the axon
    # tunnel charges ~10-20 ms per transfer; E x 3 pulls used to dominate)
    from .envdata import host_profile_tables

    r_h, z_h, c_h = host_profile_tables(env_ens)
    c_src = np.array(
        [
            bilinear_np(source_range, source_depth, r_h[e], z_h[e], c_h[e])
            for e in range(E)
        ]
    )

    def angles_to_p0(theta_user):  # (E, M) user angles -> ODE p0
        return jnp.asarray(
            np.sin(np.radians(-np.asarray(theta_user))) / c_src[:, None],
            env_ens.c.dtype,
        )

    # 0. kernel-supported one-shot: fan + bracketing + Newton iterations +
    # final evaluation all inside ONE device dispatch and ONE packed fetch
    # (each dispatch costs ~20-30 ms over the axon tunnel).  Falls back to
    # the two-phase flow below if any realization overflows the fixed
    # bracket capacity — reusing the fan's final depths from the one-shot
    # output, so the fan is never traced twice.
    z_end = None
    if scalar_depth and fan_angles.size >= 2 and _ensemble_kernel_ok(env_ens, settings):
        out, z_end_f = _mc_one_shot_device(
            env_ens, fan_angles, c_src, float(source_depth),
            float(source_range), float(receiver_range),
            float(receiver_depth), float(ztol), int(max_iter), settings,
            mesh=mesh,
        )
        if out.shape[2] and not (out[7] > 0.5).any():  # no capacity overflow
            counts = out[6, :, 0].astype(int)
            M = int(counts.max()) if counts.size else 0
            if M == 0:
                return _mc_empty_result((E, 0))
            conv = out[1, :, :M] > 0.5
            return {
                "theta": np.where(conv, out[0, :, :M], np.nan),
                "t": np.where(conv, out[2, :, :M], np.nan),
                "z_resid": np.where(conv, out[3, :, :M], np.nan),
                "n_surf": np.where(conv, out[4, :, :M].astype(np.int64), -1),
                "n_bott": np.where(conv, out[5, :, :M].astype(np.int64), -1),
                "valid": conv,
                "path": "one-shot",
            }
        if out.shape[2]:
            import warnings

            warnings.warn(
                f"a realization has more than MC_BRACKET_CAP={MC_BRACKET_CAP} "
                "arrival brackets; falling back to the two-phase solve "
                "(raise pygenray_tpu.montecarlo.MC_BRACKET_CAP to keep the "
                "one-dispatch path)",
                stacklevel=2,
            )
            z_end = z_end_f  # the one-shot already traced the fan

    # 1. fan through every realization (unless the overflowed one-shot
    # already returned its final depths).  Bracketing only needs the final
    # depth and aliveness, so on kernel-supported configurations the whole
    # fan is ONE ensemble-kernel launch (block e = realization e) and one
    # packed fetch, instead of E sequential mega-kernel launches.
    if z_end is None:
        p0 = angles_to_p0(np.broadcast_to(fan_angles, (E, fan_angles.size)))
        if _ensemble_kernel_ok(env_ens, settings):
            z_ode, alive_f = _fan_final_state(env_ens, source_depth, p0,
                                              source_range, receiver_range,
                                              settings, mesh=mesh)
            z_end = np.where(alive_f, -z_ode, np.nan)
        else:
            fan = trace_ensemble(
                env_ens, source_depth, p0, source_range, receiver_range, 2,
                settings, mesh=mesh,
            )
            z_end = -np.asarray(fan.zs, float)[..., -1]  # (E, B) user convention
            z_end = np.where(np.asarray(fan.alive), z_end, np.nan)

    # 2. bracket per (depth × realization); candidates for every depth ride
    # one concatenated (E, Mtot) axis with per-candidate receiver depths
    sign = np.sign(z_end[None, :, :] + rds[:, None, None])  # (n_rd, E, B)
    keys = ("theta", "t", "z_resid", "n_surf", "n_bott", "valid")
    per_depth = []  # (M_d, th1, th2, z1, z2, valid) per depth
    for d in range(rds.shape[0]):
        starts = [np.where(np.diff(sign[d, e]) != 0)[0] for e in range(E)]
        M_d = max((len(s) for s in starts), default=0)
        th1 = np.zeros((E, M_d))
        th2 = np.zeros((E, M_d))
        z1 = np.ones((E, M_d))
        z2 = -np.ones((E, M_d))
        valid = np.zeros((E, M_d), bool)
        for e, s in enumerate(starts):
            k = len(s)
            th1[e, :k] = fan_angles[s]
            th2[e, :k] = fan_angles[s + 1]
            z1[e, :k] = z_end[e, s]
            z2[e, :k] = z_end[e, s + 1]
            valid[e, :k] = True
        per_depth.append((M_d, th1, th2, z1, z2, valid))

    Ms = [p[0] for p in per_depth]
    Mtot = sum(Ms)
    M_max = max(Ms, default=0)
    if Mtot == 0:
        return _mc_empty_result((E, 0) if scalar_depth else (rds.shape[0], E, 0))

    cat = lambda i: np.concatenate([p[i] for p in per_depth], axis=1)
    th1, th2, z1, z2 = cat(1), cat(2), cat(3), cat(4)
    valid = np.concatenate([p[5] for p in per_depth], axis=1)
    rd_arr = np.concatenate(
        [np.full((E, p[0]), rds[d]) for d, p in enumerate(per_depth)], axis=1
    )
    denom = np.where(np.abs(z2 - z1) > 1e-300, z2 - z1, 1.0)
    theta0 = th1 - (z1 + rd_arr) * (th2 - th1) / denom

    # 3+4. ALL iterations + the Kahan final evaluation of every
    # (depth × realization × bracket) candidate as ONE device computation
    out = _solve_ensemble_device(
        env_ens, theta0, th1, th2, z1, z2, ~valid, c_src,
        float(source_depth), float(source_range), float(receiver_range),
        rd_arr, float(ztol), int(max_iter), settings, mesh=mesh,
    )
    converged = out[1] > 0.5
    vals = {
        "theta": np.where(converged, out[0], np.nan),
        "t": np.where(converged, out[2], np.nan),
        "z_resid": np.where(converged, out[3], np.nan),
        "n_surf": np.where(converged, out[4].astype(np.int64), -1),
        "n_bott": np.where(converged, out[5].astype(np.int64), -1),
        "valid": converged,
        "path": "two-phase",
    }
    if scalar_depth:
        return vals

    # unpack the concatenated candidate axis back into (n_rd, E, M_max)
    fill = {"theta": np.nan, "t": np.nan, "z_resid": np.nan,
            "n_surf": -1, "n_bott": -1, "valid": False}
    result = {}
    for k in keys:
        stack = np.full((rds.shape[0], E, M_max), fill[k],
                        dtype=vals[k].dtype if k != "valid" else bool)
        lo = 0
        for d, M_d in enumerate(Ms):
            stack[d, :, :M_d] = vals[k][:, lo:lo + M_d]
            lo += M_d
        result[k] = stack
    result["path"] = "two-phase"
    return result


def _mc_empty_result(shape):
    """No-bracket result with the same dtypes as the populated path
    (``valid`` must be boolean: callers use it as a mask)."""
    return {
        "theta": np.zeros(shape), "t": np.zeros(shape),
        "z_resid": np.zeros(shape),
        "n_surf": np.zeros(shape, np.int64),
        "n_bott": np.zeros(shape, np.int64),
        "valid": np.zeros(shape, bool),
    }


_ENS_OK_CACHE = {}  # (id(env_ens), settings, backend) -> bool


def _ensemble_kernel_ok(env_ens, settings) -> bool:
    """True when the per-block-station ensemble tangent kernel can run this
    configuration (range-dependent spectral f32 fits on TPU, or forced).

    Memoized on the env object: the support check only reads static
    metadata and leaf SHAPES, but the ``a[0]`` slicing runs eagerly on
    device (~15 dispatches, ~25 ms per call on the tunnel) if repeated.
    """
    import weakref

    if settings.backend == "xla":
        return False
    k = (id(env_ens), settings, jax.default_backend())
    if k in _ENS_OK_CACHE:
        return _ENS_OK_CACHE[k]
    from .integrate import _use_cheb
    from .ops.pallas_stepper import tangent_supported

    env0 = jax.tree_util.tree_map(lambda a: a[0], env_ens)
    try:
        use_cheb = _use_cheb(env0, settings)
    except ValueError:
        use_cheb = None
    got = use_cheb is not None and (
        env0.range_dependent
        and tangent_supported(env0, settings, use_cheb)
        and (jax.default_backend() == "tpu" or settings.backend == "pallas")
    )
    try:
        weakref.finalize(env_ens, _ENS_OK_CACHE.pop, k, None)
        _ENS_OK_CACHE[k] = got
    except TypeError:
        pass
    return got


_MC_FAN_CACHE = LRUCache(32)


def _ens_shard_wrap(solve, mesh, E, in_axes, out_axes):
    """Wrap a device solve in ``jax.shard_map`` over the realization axis.

    ``in_axes``/``out_axes`` give each argument's/result's E-axis position
    (None = replicated).  Realizations never communicate, so the wrapped
    program has zero collectives."""
    from jax.sharding import PartitionSpec as P

    axis = mesh.axis_names[0]
    n_dev = mesh.shape[axis]
    if len(mesh.axis_names) != 1 or E % n_dev != 0:
        raise ValueError(
            f"ensemble size {E} must divide evenly over a 1D "
            f"{n_dev}-device mesh"
        )
    spec = lambda ax: P() if ax is None else P(*([None] * ax), axis)
    out = (tuple(spec(a) for a in out_axes) if isinstance(out_axes, tuple)
           else spec(out_axes))
    return jax.shard_map(
        solve, mesh=mesh,
        in_specs=tuple(spec(a) for a in in_axes),
        out_specs=out,
        # pallas_call out_shapes carry no varying-mesh-axes metadata
        check_vma=False,
    )


def _fan_final_state(env_ens, source_depth, p0, x0, x1, settings, mesh=None):
    """(z_end_ode, alive) of an (E, B) fan — one ensemble-kernel launch and
    one packed device->host fetch (sharded over realizations on a mesh)."""
    h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    s_it = dataclasses.replace(settings, backend="xla",
                               kahan=False)
    on_tpu = jax.default_backend() == "tpu"
    key = (env_struct_key(env_ens), geom, s_it, p0.shape, float(source_depth),
           mesh)
    fn = _MC_FAN_CACHE.get(key)
    if fn is None:
        from .ops.pallas_stepper import trace_pallas_tangent_ensemble

        def run(envs, p):
            (_, z_ode, _, _, _, _, _, _, dcode) = trace_pallas_tangent_ensemble(
                envs, source_depth, p, jnp.zeros_like(p), geom, s_it,
                interpret=not on_tpu,
            )
            return jnp.stack([z_ode, (dcode == 0).astype(z_ode.dtype)])

        if mesh is not None:
            run = _ens_shard_wrap(run, mesh, env_ens.c.shape[0],
                                  (0, 0), 1)
        fn = jax.jit(run)
        _MC_FAN_CACHE.put(key, fn)
    out = np.asarray(fn(env_ens, p0), float)
    return out[0], out[1] > 0.5


_MC_ONESHOT_CACHE = LRUCache(32)
MC_BRACKET_CAP = 24  # fixed per-realization bracket capacity of the one-shot path


def _mc_one_shot_device(
    env_ens, fan_angles, c_src, source_depth, source_range, receiver_range,
    rd, ztol, max_iter, settings, mesh=None,
):
    """Fan + bracketing + all Newton iterations + the final evaluation in
    ONE device dispatch and ONE packed fetch.

    Bracketing is a fixed-capacity compaction (the first
    ``MC_BRACKET_CAP`` sign changes per realization, matching the host
    path's ``np.where(np.diff(sign) != 0)`` order); an overflow flag is
    returned so the caller can fall back to the two-phase path in the
    (unseen in practice) case of more brackets than capacity.
    """
    h, sps, nseg = _plan(float(source_range), float(receiver_range), 2, settings.dx)
    geom = (float(source_range), float(receiver_range), float(h), int(sps), int(nseg))
    s_it = dataclasses.replace(settings, backend="xla",
                               kahan=False)
    dt = env_ens.c.dtype
    deg = np.pi / 180.0
    on_tpu = jax.default_backend() == "tpu"
    E = env_ens.c.shape[0]
    B = fan_angles.shape[0]
    M = MC_BRACKET_CAP

    from .ops.pallas_stepper import trace_pallas_tangent_ensemble

    key = (env_struct_key(env_ens), geom, s_it, E, B, M,
           float(rd), float(ztol), int(max_iter), float(source_depth), mesh)
    fn = _MC_ONESHOT_CACHE.get(key)
    if fn is None:

        def solve(envs, angles_d, csrc_d):
            El = envs.c.shape[0]  # E locally (E/n_dev under shard_map)

            def zeval(theta):
                p0 = jnp.sin(-theta * deg) / csrc_d[:, None]
                (T, z_ode, _, _, dz_ode, _, ns, nb, dcode) = (
                    trace_pallas_tangent_ensemble(
                        envs, source_depth, p0, jnp.ones_like(p0), geom,
                        s_it, interpret=not on_tpu,
                    )
                )
                dz_dth = -dz_ode * (-jnp.cos(theta * deg) * deg / csrc_d[:, None])
                return -z_ode, dcode == 0, T, ns, nb, dz_dth

            # fan + bracket (device-side fixed-capacity compaction)
            p0f = jnp.sin(-jnp.broadcast_to(angles_d, (El, B)) * deg) / csrc_d[:, None]
            (_, z_ode_f, _, _, _, _, _, _, dcode_f) = (
                trace_pallas_tangent_ensemble(
                    envs, source_depth, p0f, jnp.zeros_like(p0f), geom,
                    s_it, interpret=not on_tpu,
                )
            )
            z_end = jnp.where(dcode_f == 0, -z_ode_f, jnp.nan)
            sign = jnp.sign(z_end + rd)
            mask = (sign[:, 1:] - sign[:, :-1]) != 0  # nan-adjacent -> True
            count = mask.sum(axis=1)
            overflow = count > M
            sentinel = B  # bracket indices run 0..B-2
            keyv = jnp.where(mask, jnp.arange(B - 1)[None, :], sentinel)
            order = jnp.sort(keyv, axis=1)[:, :M]
            valid = order <= B - 2
            idx = jnp.minimum(order, B - 2)
            th1 = angles_d[idx]
            th2 = angles_d[idx + 1]
            z1 = jnp.take_along_axis(z_end, idx, 1)
            z2 = jnp.take_along_axis(z_end, idx + 1, 1)
            den = jnp.where(jnp.abs(z2 - z1) > 0, z2 - z1, 1.0)
            theta0 = th1 - (z1 + rd) * (th2 - th1) / den

            body = _make_mc_body(zeval, rd, ztol, True)

            def cond(st):
                return jnp.any(~(st[5] | st[6])) & (st[8] < max_iter + 2)

            st0 = (
                theta0.astype(dt), th1.astype(dt), th2.astype(dt),
                z1.astype(dt), z2.astype(dt),
                jnp.zeros((El, M), bool), ~valid,
                jnp.full((El, M), jnp.nan, dt), jnp.asarray(0, jnp.int32),
            )
            st = jax.lax.while_loop(cond, body, st0)
            conv, th_hit = st[5], st[7]

            # final evaluation of the converged angles through the KAHAN
            # mega-kernel (per-realization launches inside this same
            # dispatch): the tangent kernel that drives the iterations is
            # non-Kahan by design, but reported travel times must carry
            # the compensated f32 floor (same policy as find_eigenrays'
            # fused full trace)
            from .ops.pallas_stepper import trace_pallas

            th_fin = jnp.where(conv, th_hit, 0.0)
            p_fin = jnp.sin(-th_fin * deg) / csrc_d[:, None]
            s_fin = settings
            t_rows, z_rows, ns_rows, nb_rows = [], [], [], []
            for e in range(El):
                env_e = jax.tree_util.tree_map(lambda a: a[e], envs)
                res_e = trace_pallas(
                    env_e, source_depth, p_fin[e], geom, s_fin,
                    interpret=not on_tpu,
                )
                t_rows.append(res_e.ts[:, -1])
                z_rows.append(res_e.zs[:, -1])
                ns_rows.append(res_e.n_surf)
                nb_rows.append(res_e.n_bott)
            t_end = jnp.stack(t_rows)
            z_res = jnp.abs(-jnp.stack(z_rows) + rd)
            ns = jnp.stack(ns_rows)
            nb = jnp.stack(nb_rows)
            return jnp.stack([
                th_hit, conv.astype(dt), t_end, z_res,
                ns.astype(dt), nb.astype(dt),
                jnp.broadcast_to(count[:, None].astype(dt), (El, M)),
                jnp.broadcast_to(overflow[:, None].astype(dt), (El, M)),
            ]), z_end

        if mesh is not None:
            solve = _ens_shard_wrap(solve, mesh, E, (0, None, 0), (1, 0))
        fn = jax.jit(solve)
        _MC_ONESHOT_CACHE.put(key, fn)

    out, z_end = fn(env_ens, jnp.asarray(fan_angles, dt), jnp.asarray(c_src, dt))
    # ONE overlapped pull: two sequential np.asarray fetches pay the
    # tunnel round-trip twice (~80 ms each measured)
    out_h, z_end_h = jax.device_get((out, z_end))
    return np.asarray(out_h, float), np.asarray(z_end_h, float)


def _make_mc_body(zeval, rd, ztol, use_newton):
    """One root-finding update for the (E, M) candidate matrix: Newton with
    exact AD derivative safeguarded by the bracket when ``use_newton``
    (same policy as ``eigenrays.device_solve``), else regula falsi."""

    def body(st):
        theta, t1, t2, za, zb, conv, dead, th_hit, it = st
        ze, alive, _, _, _, dz_dth = zeval(theta)
        (theta, t1, t2, za, zb, conv2, dead2, th_hit, _act, _hit) = (
            rootfind_update(
                jnp, theta, t1, t2, za, zb, conv, dead, th_hit,
                ze, alive, dz_dth, rd, ztol, use_newton,
            )
        )
        return (theta, t1, t2, za, zb, conv2, dead2, th_hit, it + 1)

    return body


def _solve_ensemble_device(
    env_ens, theta0, th1, th2, z1, z2, dead0, c_src,
    source_depth, source_range, receiver_range, rd, ztol, max_iter, settings,
    mesh=None,
):
    """Root-finding over all (realization × bracket) candidates plus the
    final converged-angle evaluation in a single jitted device call: one
    packed H2D transfer in, one packed D2H out (same transfer-latency
    discipline as ``eigenrays.device_solve``).

    On supported configurations (range-dependent spectral f32 fits on TPU)
    each iteration is ONE launch of the ensemble tangent kernel — Newton
    with exact dz/dθ, every realization's station table read by its own
    grid block — instead of a vmapped XLA scan per iteration.  Otherwise a
    bracket-safeguarded regula falsi on the vmapped scan.
    """
    h, sps, nseg = _plan(source_range, receiver_range, 2, settings.dx)
    geom = (source_range, receiver_range, float(h), int(sps), int(nseg))
    dt = env_ens.c.dtype
    deg = np.pi / 180.0

    from .ops.pallas_stepper import trace_pallas_tangent_ensemble

    on_tpu = jax.default_backend() == "tpu"
    use_kernel = _ensemble_kernel_ok(env_ens, settings)
    s_it = dataclasses.replace(
        settings, backend="xla",
        kahan=settings.kahan and not use_kernel,
    )

    key = (
        env_struct_key(env_ens), geom, s_it, theta0.shape,
        ztol, max_iter, source_depth, use_kernel, mesh,
    )
    fn = _MC_SOLVE_CACHE.get(key)
    if fn is None:

        def solve(envs, packed, c_src_d):
            # rd rides in the packed array (row 6): per-candidate receiver
            # depths support multi-depth solves and are never baked into
            # the structurally keyed executable
            th0, t1, t2, za, zb, dd0, rd = (packed[i] for i in range(7))

            def zfun(theta):
                p0 = jnp.sin(-theta * deg) / c_src_d[:, None]
                res = jax.vmap(
                    lambda e, p: _trace_impl(e, source_depth, p, geom, s_it)
                )(envs, p0)
                return (-res.zs[..., -1], res.alive, res.ts[..., -1],
                        res.n_surf, res.n_bott, None)

            def zfun_kernel(theta):
                p0 = jnp.sin(-theta * deg) / c_src_d[:, None]
                (T, z_ode, _, _, dz_ode, _, ns, nb, dcode) = (
                    trace_pallas_tangent_ensemble(
                        envs, source_depth, p0, jnp.ones_like(p0), geom,
                        s_it, interpret=not on_tpu,
                    )
                )
                dz_dth = -dz_ode * (-jnp.cos(theta * deg) * deg / c_src_d[:, None])
                return -z_ode, dcode == 0, T, ns, nb, dz_dth

            zeval = zfun_kernel if use_kernel else zfun

            body = _make_mc_body(zeval, rd, ztol, use_kernel)

            def cond(st):
                return jnp.any(~(st[5] | st[6])) & (st[8] < max_iter + 2)

            st0 = (
                th0, t1, t2, za, zb,
                jnp.zeros_like(dd0, bool), dd0 > 0.5,
                jnp.full_like(th0, jnp.nan), jnp.asarray(0, jnp.int32),
            )
            st = jax.lax.while_loop(cond, body, st0)
            conv, th_hit = st[5], st[7]

            # final evaluation of the converged angles (travel times,
            # residuals, bounce counts), still on device — through the
            # KAHAN scan (the iteration path runs kahan=False for the
            # tangent convention; reported times must not)
            th_fin = jnp.where(conv, th_hit, 0.0)
            p_fin = jnp.sin(-th_fin * deg) / c_src_d[:, None]
            s_fin = dataclasses.replace(settings, backend="xla")
            res_f = jax.vmap(
                lambda e, p: _trace_impl(e, source_depth, p, geom, s_fin)
            )(envs, p_fin)
            t_end = res_f.ts[..., -1]
            z_res = jnp.abs(-res_f.zs[..., -1] + rd)
            return jnp.stack([
                th_hit, conv.astype(dt), t_end, z_res,
                res_f.n_surf.astype(dt), res_f.n_bott.astype(dt),
            ])

        if mesh is not None:
            solve = _ens_shard_wrap(solve, mesh, env_ens.c.shape[0],
                                    (0, 1, 0), 1)
        fn = jax.jit(solve)
        _MC_SOLVE_CACHE.put(key, fn)

    rd_arr = np.broadcast_to(np.asarray(rd, float), theta0.shape)
    packed = jnp.asarray(
        np.stack([theta0, th1, th2, z1, z2, dead0.astype(float), rd_arr]), dt
    )
    return np.asarray(fn(env_ens, packed, jnp.asarray(c_src, dt)), float)
