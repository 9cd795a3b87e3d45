"""Differentiable travel times: sensitivity kernels for tomography inversion.

Ocean acoustic tomography inverts eigenray travel-time anomalies δT for
sound-speed anomalies δc(r, z).  The forward operator's adjoint — the
sensitivity kernel ∂T/∂c — falls out of the engine for free because the
whole trace is a differentiable JAX computation: reverse-mode AD through
the RK4 scan gives exact discrete gradients of the travel time with respect
to the spectral (Chebyshev) sound-speed coefficients, with the dc/dz field
chained consistently through the Chebyshev derivative operator.

This has no counterpart in the CPU reference (scipy's integrator is not
differentiable); ray-perturbation sensitivities there would require finite
differences of full re-shoots.

The operators:
- ``travel_time_jacobian``: exact discrete dT/dcoef, range-independent
- ``travel_time_jacobian_2d``: exact discrete dT/dcoef per range station
- ``fermat_jacobian``: first-order path-integral kernel from one fast
  trace (any basis size; the production inversion operator)
- ``endpoint_time_gradients``: analytic eikonal dT/d(endpoint depths)
  (the free localization gradients; no AD dispatch at all)
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from .envdata import EnvData
from .integrate import SolverSettings, _plan, _trace_impl, _use_cheb

__all__ = [
    "cheb_derivative_matrix",
    "travel_time_jacobian",
    "travel_time_jacobian_2d",
    "travel_times_of_coef",
    "travel_time_coef_vjp",
    "fermat_jacobian",
    "perturbation_response",
    "endpoint_time_gradients",
]


def cheb_derivative_matrix(K: int, zlo: float, zhi: float) -> np.ndarray:
    """Matrix D with (d/dz) [Σ_k a_k T_k(u(z))] = Σ_j (D a)_j T_j(u(z)).

    u(z) maps [zlo, zhi] to [-1, 1], so D includes the 2/(zhi-zlo) scale.
    """
    import numpy.polynomial.chebyshev as ncheb

    D = np.zeros((K, K))
    for k in range(K):
        e = np.zeros(K)
        e[k] = 1.0
        d = ncheb.chebder(e)
        D[: len(d), k] = d
    return D * (2.0 / (zhi - zlo))


_COEF_KERNEL_CACHE = None


def _coef_kernel_cached(env, z0, p0, dcoef, dcpcoef, geom, settings, interpret):
    """Memoized jitted launcher for the coefficient-tangent kernel (one
    eager launch pays ~ms-per-op dispatch on the axon tunnel; jitted and
    structurally keyed it is one device computation)."""
    global _COEF_KERNEL_CACHE
    from .utils.cache import LRUCache, env_struct_key

    if _COEF_KERNEL_CACHE is None:
        _COEF_KERNEL_CACHE = LRUCache(64)
    from .ops.pallas_stepper import trace_pallas_coef_tangent

    def run(envarg, zz, p, dc, dcp):
        outs = trace_pallas_coef_tangent(
            envarg, zz, p, dc, dcp, geom, settings, interpret=interpret
        )
        return outs[0], outs[3]  # T_end, dT (D, B)

    z0a = jnp.asarray(z0, jnp.float32)
    key = (env_struct_key(env), geom, settings, p0.shape, dcoef.shape,
           z0a.shape, bool(interpret))
    fn = _COEF_KERNEL_CACHE.get(key)
    if fn is None:
        fn = jax.jit(run)
        _COEF_KERNEL_CACHE.put(key, fn)
    return fn(env, z0a, p0, dcoef, dcpcoef)


def travel_time_jacobian(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    settings: SolverSettings = SolverSettings(),
    mode: str = "auto",
):
    """∂T_end/∂(c Chebyshev coefficients) for each ray.

    Returns ``(T_end (B,), jac (B, K))`` where ``jac[b, k]`` is the exact
    discrete derivative of ray b's receiver travel time with respect to the
    k-th Chebyshev coefficient of the (range-independent) sound-speed
    profile, with the dc/dz field perturbed consistently (chained through
    the spectral derivative operator).

    ``mode``: "auto" (default) runs the whole (B, K) Jacobian as ONE Pallas
    launch on supported configurations (f32 spectral fits on TPU) — grid
    block k advances the forward tangent along coefficient direction k —
    and otherwise falls back to "fwd" (jax.jacfwd through the XLA scan;
    K tangent passes).  "rev" uses jax.jacrev.
    """
    if not _use_cheb(env, settings):
        raise ValueError("travel_time_jacobian requires a spectral (cheb) environment")
    if env.range_dependent:
        raise ValueError("travel_time_jacobian supports range-independent environments")

    h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    # force the XLA scan path for the autodiff fallback.  Kahan
    # compensation is disabled: it is unnecessary at f64 and its
    # cancellation pattern provokes pathologically slow XLA simplification
    # in the transposed (reverse-mode) scan (forward AD convention — the
    # kernel path matches it).
    settings_x = dataclasses.replace(
        settings, backend="xla", kahan=False
    )

    K = env.c_cheb.shape[1]
    zlo, zhi = env.z_dom
    D = jnp.asarray(cheb_derivative_matrix(K, zlo, zhi), env.c_cheb.dtype)
    p0 = jnp.atleast_1d(jnp.asarray(p0, env.c.dtype))

    ccoef0 = env.c_cheb[0]
    cp_offset = env.dcdz_cheb[0] - D @ ccoef0  # fitted-vs-analytic residual

    if mode in ("auto", "kernel"):
        from .ops.pallas_stepper import tangent_supported

        on_tpu = jax.default_backend() == "tpu"
        s_k = dataclasses.replace(settings_x, kahan=False)
        kernel_ok = (
            settings.backend != "xla"
            and tangent_supported(env, s_k, True)
            and (on_tpu or settings.backend == "pallas" or mode == "kernel")
        )
        if kernel_ok:
            # direction k: dc = e_k, dcdz chained through D
            dcoef = jnp.eye(K, dtype=jnp.float32)
            dcpcoef = D.T.astype(jnp.float32)  # row k = D @ e_k
            T_end, dT = _coef_kernel_cached(
                env, z0, p0, dcoef, dcpcoef, geom, s_k, not on_tpu
            )
            return T_end, dT.T  # (B, K)
        if mode == "kernel":
            raise ValueError("coefficient-tangent kernel unsupported here")
        mode = "fwd"

    def T_of(ccoef):
        cc = jnp.broadcast_to(ccoef, env.c_cheb.shape)
        cp = jnp.broadcast_to(cp_offset + D @ ccoef, env.dcdz_cheb.shape)
        env2 = dataclasses.replace(env, c_cheb=cc, dcdz_cheb=cp, poly_ok=False)
        res = _trace_impl(env2, z0, p0, geom, settings_x)
        return res.ts[:, -1]

    T_end = T_of(ccoef0)
    # forward mode by default: K tangent passes, and it sidesteps an XLA
    # pathologically-slow simplification of the transposed scan (measured
    # 20-50x faster compiles than jacrev at identical Jacobians)
    jac_fn = jax.jacfwd(T_of) if mode == "fwd" else jax.jacrev(T_of)
    jac = jax.jit(jac_fn)(ccoef0)  # (B, K)
    return T_end, jac


def travel_time_jacobian_2d(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    settings: SolverSettings = SolverSettings(),
    mode: str = "auto",
):
    """∂T_end/∂(c coefficients) for a *range-dependent* field: (B, nr, K).

    Differentiates through the per-range-station spectral coefficients —
    the full 2D tomography forward operator, with the dc/dz coefficients
    chained consistently per station.

    ``mode``: "auto" (default) runs the whole (B, nr, K) Jacobian as ONE
    Pallas launch on supported configurations (range-dependent f32
    spectral fits on TPU) — grid block (j, k) advances the forward tangent
    along station j's coefficient direction k, with the tangent station
    rows synthesized in-kernel from scalar hat weights — and otherwise
    falls back to "fwd" (jax.jacfwd through the XLA scan; nr·K tangent
    passes).
    """
    if not _use_cheb(env, settings):
        raise ValueError("travel_time_jacobian_2d requires a spectral environment")

    h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    settings_x = dataclasses.replace(settings, backend="xla", kahan=False)

    nr, K = env.c_cheb.shape
    zlo, zhi = env.z_dom
    D = jnp.asarray(cheb_derivative_matrix(K, zlo, zhi), env.c_cheb.dtype)
    p0 = jnp.atleast_1d(jnp.asarray(p0, env.c.dtype))

    cc0 = env.c_cheb
    cp_offset = env.dcdz_cheb - cc0 @ D.T

    if mode in ("auto", "kernel"):
        from .ops.pallas_stepper import tangent_supported

        on_tpu = jax.default_backend() == "tpu"
        s_k = dataclasses.replace(settings_x, kahan=False)
        kernel_ok = (
            settings.backend != "xla"
            and env.range_dependent
            and tangent_supported(env, s_k, True)
            and (on_tpu or settings.backend == "pallas" or mode == "kernel")
        )
        if kernel_ok:
            T_end, dT = _coef_kernel_rd_cached(
                env, z0, p0,
                jnp.eye(K, dtype=jnp.float32),
                D.T.astype(jnp.float32),  # row k = D @ e_k
                geom, s_k, not on_tpu,
            )
            return T_end, jnp.moveaxis(dT, -1, 0)  # (B, nr, K)
        if mode == "kernel":
            raise ValueError("RD coefficient-tangent kernel unsupported here")

    def T_of(cc):
        env2 = dataclasses.replace(env, c_cheb=cc, dcdz_cheb=cp_offset + cc @ D.T,
                                   poly_ok=False)
        res = _trace_impl(env2, z0, p0, geom, settings_x)
        return res.ts[:, -1]

    T_end = T_of(cc0)
    jac = jax.jit(jax.jacfwd(T_of))(cc0)  # (B, nr, K)
    return T_end, jac


def travel_times_of_coef(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    settings: SolverSettings = SolverSettings(),
):
    """Differentiable map from spectral coefficients to receiver travel
    times, with a reverse-mode rule at kernel speed.

    Returns ``f`` with ``f(cc) -> T_end (B,)``, where ``cc`` is the c
    Chebyshev table — ``(K,)`` for a range-independent environment
    (``travel_time_jacobian`` convention), ``(nr, K)`` for a
    range-dependent one (``travel_time_jacobian_2d``) — and the dc/dz
    field is chained consistently through the spectral derivative
    operator.  ``jax.grad`` of any misfit through ``f`` contracts the
    cotangent via a ``jax.custom_vjp`` rule: the tangent map is LINEAR in
    the coefficient direction, so its transpose is assembled from the
    coefficient-tangent kernel's unit-direction launches and contracted
    with the cotangent ON DEVICE, inside one jitted dispatch — chunked
    over direction rows so no (B, nr, K) Jacobian is ever materialized
    beyond a bounded per-chunk transient.  Falls back to ``jax.vjp``
    through the XLA scan where the kernel is unsupported (f64, table
    interpolation, non-TPU without ``backend="pallas"``).

    This is the vjp companion to ``travel_time_jacobian``/``_2d``: use
    those when the full Jacobian is the product; use this inside
    gradient-based inversion loops where only Jᵀv is needed.
    """
    if not _use_cheb(env, settings):
        raise ValueError("travel_times_of_coef requires a spectral environment")

    h, sps, nseg = _plan(float(x0), float(x1), 2, settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    settings_x = dataclasses.replace(settings, backend="xla", kahan=False)
    s_k = dataclasses.replace(settings, kahan=False)

    nr, K = env.c_cheb.shape
    zlo, zhi = env.z_dom
    D = jnp.asarray(cheb_derivative_matrix(K, zlo, zhi), env.c_cheb.dtype)
    p0j = jnp.atleast_1d(jnp.asarray(p0, env.c.dtype))
    rd = bool(env.range_dependent)
    if rd:
        cp_offset = env.dcdz_cheb - env.c_cheb @ D.T  # (nr, K)
    else:
        cp_offset = env.dcdz_cheb[0] - D @ env.c_cheb[0]  # (K,)

    from .integrate import trace

    def env_with(cc):
        if rd:
            cc2 = cc
            cp2 = cp_offset + cc @ D.T
        else:
            cc2 = jnp.broadcast_to(cc, env.c_cheb.shape)
            cp2 = jnp.broadcast_to(cp_offset + D @ cc, env.dcdz_cheb.shape)
        return dataclasses.replace(env, c_cheb=cc2, dcdz_cheb=cp2,
                                   poly_ok=False)

    @jax.custom_vjp
    def f(cc):
        return trace(env_with(cc), z0, p0j, x0, x1, 2, settings_x).ts[:, -1]

    def f_fwd(cc):
        return f(cc), cc

    def f_bwd(cc, v):
        from .ops.pallas_stepper import tangent_supported

        env2 = env_with(cc)
        on_tpu = jax.default_backend() == "tpu"
        kernel_ok = (
            settings.backend != "xla"
            and tangent_supported(env2, s_k, True)
            and (on_tpu or settings.backend == "pallas")
        )
        if kernel_ok:
            dc = jnp.eye(K, dtype=jnp.float32)
            dcp = D.T.astype(jnp.float32)  # row k = D @ e_k
            _, g = _coef_vjp_cached(env2, z0, p0j, dc, dcp,
                                    jnp.asarray(v, jnp.float32), geom, s_k,
                                    not on_tpu, rd)
            return (g.astype(cc.dtype),)
        _, pull = jax.vjp(
            lambda c: _trace_impl(env_with(c), z0, p0j, geom,
                                  settings_x).ts[:, -1],
            cc,
        )
        return pull(v)

    f.defvjp(f_fwd, f_bwd)
    return f


def travel_time_coef_vjp(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    v,
    settings: SolverSettings = SolverSettings(),
):
    """Convenience Jᵀv: contract a travel-time cotangent ``v (B,)`` against
    the coefficient Jacobian without materializing it.  Returns
    ``(T_end (B,), g)`` with ``g (K,)`` (range-independent) or ``(nr, K)``
    (range-dependent).  See ``travel_times_of_coef``."""
    f = travel_times_of_coef(env, z0, p0, x0, x1, settings)
    cc = env.c_cheb if env.range_dependent else env.c_cheb[0]
    T_end, pull = jax.vjp(f, cc)
    (g,) = pull(jnp.asarray(v, T_end.dtype))
    return T_end, g


_COEF_VJP_CACHE = None

# per-chunk transient cap for the direction-chunked cotangent contraction:
# each kernel launch materializes (nr, Dk, B) tangents in HBM before the
# on-device contraction reduces them to (nr, Dk)
_COEF_VJP_CHUNK_ELEMS = 1 << 26


def _coef_vjp_cached(env, z0, p0, dcoef, dcpcoef, v, geom, settings,
                     interpret, rd):
    """Memoized jitted Jᵀv launcher: unit-direction coefficient-tangent
    kernel launches (chunked over direction rows) with the cotangent
    contraction fused into the same jitted dispatch."""
    global _COEF_VJP_CACHE
    from .utils.cache import LRUCache, env_struct_key

    if _COEF_VJP_CACHE is None:
        _COEF_VJP_CACHE = LRUCache(64)
    from .ops.pallas_stepper import (
        trace_pallas_coef_tangent,
        trace_pallas_coef_tangent_rd,
    )

    Kdir = dcoef.shape[0]
    B = p0.shape[0]
    nr = env.c_cheb.shape[0] if rd else 1
    Dk = max(1, min(Kdir, _COEF_VJP_CHUNK_ELEMS // max(1, nr * B)))
    bounds = [(i, min(i + Dk, Kdir)) for i in range(0, Kdir, Dk)]

    def run(envarg, zz, p, dc, dcp, vv):
        T_end, gs = None, []
        for lo, hi in bounds:
            if rd:
                outs = trace_pallas_coef_tangent_rd(
                    envarg, zz, p, dc[lo:hi], dcp[lo:hi], geom, settings,
                    interpret=interpret,
                )
                gs.append(jnp.einsum("jdb,b->jd", outs[3], vv))
            else:
                outs = trace_pallas_coef_tangent(
                    envarg, zz, p, dc[lo:hi], dcp[lo:hi], geom, settings,
                    interpret=interpret,
                )
                gs.append(outs[3] @ vv)
            T_end = outs[0]
        return T_end, jnp.concatenate(gs, axis=-1)

    z0a = jnp.asarray(z0, jnp.float32)
    key = (env_struct_key(env), geom, settings, p0.shape, dcoef.shape,
           z0a.shape, bool(interpret), bool(rd), tuple(bounds))
    fn = _COEF_VJP_CACHE.get(key)
    if fn is None:
        fn = jax.jit(run)
        _COEF_VJP_CACHE.put(key, fn)
    return fn(env, z0a, p0, dcoef, dcpcoef, v)


_COEF_RD_CACHE = None


def _coef_kernel_rd_cached(env, z0, p0, dcoef, dcpcoef, geom, settings, interpret):
    """Memoized jitted launcher for the RD coefficient-tangent kernel."""
    global _COEF_RD_CACHE
    from .utils.cache import LRUCache, env_struct_key

    if _COEF_RD_CACHE is None:
        _COEF_RD_CACHE = LRUCache(64)
    from .ops.pallas_stepper import trace_pallas_coef_tangent_rd

    def run(envarg, zz, p, dc, dcp):
        outs = trace_pallas_coef_tangent_rd(
            envarg, zz, p, dc, dcp, geom, settings, interpret=interpret
        )
        return outs[0], outs[3]  # T_end (B,), dT (nr, Dk, B)

    z0a = jnp.asarray(z0, jnp.float32)
    key = (env_struct_key(env), geom, settings, p0.shape, dcoef.shape,
           z0a.shape, bool(interpret))
    fn = _COEF_RD_CACHE.get(key)
    if fn is None:
        fn = jax.jit(run)
        _COEF_RD_CACHE.put(key, fn)
    return fn(env, z0a, p0, dcoef, dcpcoef)


def fermat_jacobian(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    settings: SolverSettings = SolverSettings(),
    num_save: int = 512,
    range_dependent: bool = None,
):
    """First-order travel-time Jacobian from the Fermat path integral.

    By ray-path stationarity, the first-order travel-time response to a
    sound-speed perturbation is an integral along the *unperturbed* path:

        δT = -∫ δc / (c² cos θ) dx

    so the Jacobian with respect to the spectral coefficients is just a
    quadrature of basis functions over the saved trajectory — one fast
    (Pallas-eligible) trace for any basis size, no autodiff.  Agrees with
    ``travel_time_jacobian`` (the exact discrete derivative) to first order;
    use the AD version when exact discrete gradients matter (optimization),
    this one for assembling large inversion operators.

    Returns ``(T_end (B,), G)`` with ``G`` of shape (B, K) for
    range-independent environments or (B, nr, K) when ``range_dependent``
    (default: follows the environment).
    """
    import numpy.polynomial.chebyshev as ncheb

    from .integrate import _use_cheb, _use_seg, trace

    res = trace(env, z0, p0, float(x0), float(x1), num_save, settings)
    zs = np.asarray(res.zs, np.float64)  # (B, S) ODE convention
    ps = np.asarray(res.ps, np.float64)
    xs = np.asarray(res.rs, np.float64)  # (S,)
    T_end = np.asarray(res.ts, np.float64)[:, -1]

    if range_dependent is None:
        range_dependent = env.range_dependent

    if _use_seg(env, settings):
        # rough (segment-backed) fields: same Fermat integral, sensitivity
        # expressed in the piecewise-segment basis the engine integrates
        return T_end, _fermat_jacobian_seg(env, zs, ps, xs, range_dependent)
    if not _use_cheb(env, settings):
        raise ValueError(
            "fermat_jacobian needs a spectral (cheb) or segment fit; "
            "exact-table environments have no basis to express dT/dc in"
        )

    K = env.c_cheb.shape[1]
    zlo, zhi = env.z_dom
    u = np.clip((2.0 * zs - (zlo + zhi)) / (zhi - zlo), -1.0, 1.0)

    # local sound speed along the path from the spectral representation
    if env.range_dependent:
        rg = np.asarray(env.r, np.float64)
        cc = np.asarray(env.c_cheb, np.float64)  # (nr, K)
        i = np.clip(np.searchsorted(rg, xs, side="right") - 1, 0, len(rg) - 2)
        w = (xs - rg[i]) / (rg[i + 1] - rg[i])
        coef_x = (1 - w)[:, None] * cc[i] + w[:, None] * cc[i + 1]  # (S, K)
        Tb = ncheb.chebvander(u, K - 1)  # (B, S, K)
        c_path = np.einsum("bsk,sk->bs", Tb, coef_x)
    else:
        coef = np.asarray(env.c_cheb[0], np.float64)
        Tb = ncheb.chebvander(u, K - 1)
        c_path = Tb @ coef

    s2 = np.maximum(1.0 - (c_path * ps) ** 2, 1e-12)
    kern = -1.0 / (c_path**2 * np.sqrt(s2))  # dδT/dδc per unit range

    # trapezoid weights on the save grid
    wq = np.empty_like(xs)
    wq[1:-1] = 0.5 * (xs[2:] - xs[:-2])
    wq[0] = 0.5 * (xs[1] - xs[0])
    wq[-1] = 0.5 * (xs[-1] - xs[-2])

    if not range_dependent:
        G = np.einsum("bs,bsk->bk", kern * wq[None, :], Tb)
        return T_end, G

    # range-dependent: coefficients live on linear hats over the r grid
    rg = np.asarray(env.r, np.float64)
    nr = rg.shape[0]
    i = np.clip(np.searchsorted(rg, xs, side="right") - 1, 0, nr - 2)
    w = (xs - rg[i]) / (rg[i + 1] - rg[i])
    hats = np.zeros((xs.shape[0], nr))
    hats[np.arange(xs.shape[0]), i] = 1 - w
    hats[np.arange(xs.shape[0]), i + 1] = w
    G = np.einsum("bs,sj,bsk->bjk", kern * wq[None, :], hats, Tb)
    return T_end, G


def _trapezoid_weights(xs):
    wq = np.empty_like(xs)
    wq[1:-1] = 0.5 * (xs[2:] - xs[:-2])
    wq[0] = 0.5 * (xs[1] - xs[0])
    wq[-1] = 0.5 * (xs[-1] - xs[-2])
    return wq


def _fermat_jacobian_seg(env, zs, ps, xs, range_dependent):
    """Fermat path-integral Jacobian in the piecewise-SEGMENT basis.

    Perturbing segment-monomial coefficient (k, s) of a station perturbs
    c(z) by u_loc(z)^k inside depth segment s (see ``ops/seg.py``), so the
    sensitivity is the kernel-weighted path integral of u^k scattered into
    each point's segment (and, for range-dependent fields, split over the
    two bracketing stations' linear hats).  Returns (B, K, S) or, when
    ``range_dependent``, (B, nr, K, S) — the rough-field tomography
    forward operator the spectral Jacobians cannot express
    (their fit guard rejects these fields; `envdata.py` gates)."""
    from .ops.seg import SEG_S

    zlo, zhi = env.z_dom
    cseg = np.asarray(env.c_seg, np.float64)  # (nr, K, S)
    K, S = cseg.shape[1], cseg.shape[2]
    assert S == SEG_S
    B, Sn = zs.shape
    rg = np.asarray(env.r, np.float64)

    if env.range_dependent and rg.shape[0] > 1:
        i = np.clip(np.searchsorted(rg, xs, side="right") - 1, 0, len(rg) - 2)
        w = (xs - rg[i]) / (rg[i + 1] - rg[i])
        coef_x = (
            (1 - w)[:, None, None] * cseg[i] + w[:, None, None] * cseg[i + 1]
        )  # (Sn, K, S)
    else:
        i = np.zeros(Sn, np.int64)
        w = np.zeros(Sn)
        coef_x = np.broadcast_to(cseg[0], (Sn, K, S))

    # per-point segment pick + local coordinate (device arithmetic,
    # ops/seg.seg_eval_np)
    t = np.clip((zs - zlo) * (S / (zhi - zlo)), 0.0, float(S))
    segf = np.minimum(np.floor(t), float(S - 1))
    u = 2.0 * (t - segf) - 1.0  # (B, Sn)
    seg = segf.astype(np.int64)

    # sound speed along the path with the per-point station blend, and the
    # per-point basis functions φ_k(u): local monomials u^k ("pow") or
    # Chebyshev T_k(u) ("cheb" — the high-order rungs)
    cpk = coef_x[np.arange(Sn)[None, :], :, seg]  # (B, Sn, K)
    basis = getattr(env, "seg_basis", "pow")
    phi = np.empty((K, B, Sn))
    phi[0] = 1.0
    if K > 1:
        phi[1] = u
    if basis == "pow":
        for k in range(2, K):
            phi[k] = phi[k - 1] * u
        c_path = cpk[..., K - 1]
        for k in range(K - 2, -1, -1):
            c_path = c_path * u + cpk[..., k]
    else:
        for k in range(2, K):
            phi[k] = 2.0 * u * phi[k - 1] - phi[k - 2]
        b1 = np.zeros((B, Sn))
        b2 = np.zeros((B, Sn))
        for k in range(K - 1, 0, -1):
            b1, b2 = cpk[..., k] + 2.0 * u * b1 - b2, b1
        c_path = cpk[..., 0] + u * b1 - b2

    s2 = np.maximum(1.0 - (c_path * ps) ** 2, 1e-12)
    kern = -1.0 / (c_path**2 * np.sqrt(s2))
    contrib = kern * _trapezoid_weights(xs)[None, :]  # (B, Sn)

    b_idx = np.arange(B)[:, None]
    if not range_dependent:
        G = np.zeros((B, K, S))
        for k in range(K):
            np.add.at(G[:, k, :], (b_idx, seg), contrib * phi[k])
        return G

    nr = rg.shape[0]
    G = np.zeros((B, nr, K, S))
    i_b = np.broadcast_to(i[None, :], (B, Sn))
    for k in range(K):
        Gk = G[:, :, k, :]  # (B, nr, S) view
        np.add.at(Gk, (b_idx, i_b, seg), contrib * phi[k] * (1 - w)[None, :])
        if nr > 1:
            np.add.at(Gk, (b_idx, i_b + 1, seg), contrib * phi[k] * w[None, :])
    return G


def perturbation_response(jac, env: EnvData, delta_c, z_samples=None):
    """First-order travel-time anomaly δT for a profile perturbation δc(z).

    ``delta_c`` is sampled on ``z_samples`` (default: the environment's
    depth grid); it is projected onto the Jacobian's basis — spectral for
    a (B, K) ``jac``, piecewise-segment for a (B, K, S) one (rough fields,
    ``fermat_jacobian`` on a seg-backed environment) — and contracted:
    δT_b = Σ jac[b, ...] δcoef[...].
    """
    z_samples = np.asarray(env.z) if z_samples is None else np.asarray(z_samples)
    jac = np.asarray(jac)
    zlo, zhi = env.z_dom

    if jac.ndim == 3:  # (B, K, S): segment basis
        from .ops.seg import SEG_S, fit_profile_seg

        K, S = jac.shape[1], jac.shape[2]
        if S != SEG_S:
            raise ValueError("segment-basis Jacobian must have S == SEG_S")
        if not (np.isclose(z_samples[0], zlo) and np.isclose(z_samples[-1], zhi)):
            raise ValueError(
                "segment-basis projection needs delta_c sampled over the "
                f"environment depth domain [{zlo}, {zhi}] (the segment "
                "boundaries are tied to it)"
            )
        dcoef, _, _ = fit_profile_seg(
            np.asarray(delta_c)[None, :], z_samples, order=K - 1,
            basis=getattr(env, "seg_basis", "pow"),
        )
        return np.einsum("bks,ks->b", jac, dcoef[0])

    from .ops.cheb import fit_series_cheb

    K = jac.shape[1]
    dcoef, _ = fit_series_cheb(z_samples, np.asarray(delta_c), K - 1, lo=zlo, hi=zhi)
    # a coarsely sampled perturbation yields fewer than K coefficients
    # (fit order is clamped to len(z_samples)-1); pad with zeros
    if dcoef.shape[0] < K:
        dcoef = np.pad(dcoef, (0, K - dcoef.shape[0]))
    return jac @ dcoef[:K]


def endpoint_time_gradients(env, z0, p0, x0, x1, settings=SolverSettings(),
                            num_save=2):
    """Analytic eigenray travel-time gradients w.r.t. the endpoint depths.

    For a ray regarded as the eigenray connecting its own endpoints, the
    eikonal equation makes the travel time's endpoint derivatives local:

        ∂T/∂z_src (receiver fixed) = −p_src
        ∂T/∂z_rcv (source fixed)   = +p_end

    in ``trace()`` conventions (depths positive down, p = sin(θ_ODE)/c —
    ``TraceResult.ps`` columns 0 and −1).  One plain trace, no tangent
    launches: this is the closed form of the constrained combination of
    launch-parameter jvps, ``∂T/∂z0 − (∂T/∂p0)(∂z_end/∂z0)/(∂z_end/∂p0)``.

    Accuracy: exact (~1e-10 relative vs the constrained AD) when the
    integrated field is Hamiltonian-consistent, i.e. ``dcdz_cheb`` is the
    exact derivative of ``c_cheb`` — build one with
    ``make_env_data(..., dcdz="consistent")``.  On a standard env the dcdz
    fit reproduces the table's central differences (reference parity)
    rather than the c-fit's derivative, which floors the identity at
    ~1e-3 relative worst case (dx-independent; both regimes pinned in
    ``tests/test_adjoint.py``; the receiver identity is additionally
    retrace-validated in ``examples/rough_field_sensitivity_demo.py``).
    Callers needing the exact-AD value on a parity env should use the jvp
    combination above — it differentiates whatever system is integrated.

    These are the free localization gradients: for arrival times observed
    at known receivers, ``dT_dz_src`` is the exact sensitivity of each
    matched arrival to the source depth — no AD dispatch needed (compare
    ``examples/localization_demo.py``, which solves the joint problem with
    seeded jvps instead because it also refines the launch angles).

    Returns ``(T, dT_dz_src, dT_dz_rcv)``, each ``(B,)``.

    (No reference counterpart: `/root/reference/src/pygenray/eigenrays.py`
    offers only non-differentiable regula-falsi root finding.)
    """
    from .integrate import trace

    res = trace(env, z0, p0, x0, x1, max(int(num_save), 2), settings)
    return res.ts[:, -1], -res.ps[:, 0], res.ps[:, -1]
