"""Device-resident environment data for the ray engine.

``EnvData`` is the frozen pytree the jitted integrator closes over: sound
speed and its depth-derivative as 2D tables (canonical semantics, matching
the reference's bilinear-interpolated fields,
`/root/reference/src/pygenray/launch_rays.py:717-742`), plus optional
Chebyshev "spectral profile" coefficients — the TPU fast path (see
``pygenray_tpu.ops.cheb``) — and their guarded monomial re-expression
(``c_pow``/``dcdz_pow``, evaluated with Horner at half the Clenshaw op
count when ``poly_ok``).  The monomial tables are DERIVED: replace
spectral coefficients through ``with_spectral`` (or pass
``poly_ok=False``), never with a bare ``dataclasses.replace``.  Static metadata (uniform-grid flags, fit
availability, domain bounds) is carried as hashable aux data so the
integrator can specialize code paths at trace time.

Where the reference copies these arrays into POSIX shared memory for its
process pool (`/root/reference/src/pygenray/multi_processing.py:7-66`), here
they are simply device arrays closed over by a jitted function — replicated
(or sharded) across chips by ``jax.sharding`` with zero copies per call.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from .ops.cheb import fit_profile_cheb, fit_series_cheb
from .ops.interp import cubic_spline_coeffs
from .ops.seg import SEG_S, fit_profile_seg

__all__ = ["EnvData", "make_env_data", "with_spectral", "mirror_env_arrays",
           "mirror_env_data", "host_profile_tables"]

# fit-acceptance tolerances for the spectral fast path; exceeded → the engine
# falls back to the piecewise-SEGMENT fast path (rough fields), and only
# then to exact table interpolation
C_FIT_TOL = 2e-3  # [m/s] systematic sound-speed error << 0.1 ms travel-time budget
CP_FIT_TOL = 5e-4  # [1/s]
BANGLE_FIT_TOL = 1e-3  # [deg]
# segment-fit gates: the window-MEAN residual (systematic, accumulates into
# travel times) meets the spectral tolerance; the pointwise residual — the
# oscillatory smooth-vs-piecewise-linear gap, which cancels along rays —
# gets a looser cap (see ops/seg.py)
C_SEG_MAX_TOL = 0.1  # [m/s]
CP_SEG_MAX_TOL = 0.05  # [1/s]
# escalation rungs: local-monomial (Horner, 1 fma/term) first — the K=32
# monomial conversion is f32-hostile — then local-Chebyshev (Clenshaw,
# 2 ops/term, stable at any order): the high rungs recover fields with
# multi-m/s structure at the table's own grid scale
SEG_ORDER_LADDER = (7, 11, 15, 23)
SEG_CHEB_LADDER = (31, 47, 63, 95)


def _is_uniform(g: np.ndarray) -> bool:
    if g.shape[0] < 2:
        return False
    d = np.diff(g)
    return bool(np.all(np.abs(d - d[0]) <= 1e-9 * max(abs(g[0]), abs(g[-1]), 1.0)))


def _cheb_dz(coef, zlo, zhi):
    """Exact d/dz of per-station Chebyshev series: (nr, K) -> (nr, K),
    top coefficient zero (the derivative of a degree-(K-1) series has
    degree K-2)."""
    import numpy.polynomial.chebyshev as ncheb

    coef = np.asarray(coef, np.float64)
    out = np.zeros_like(coef)
    if coef.shape[-1] > 1:
        out[:, :-1] = ncheb.chebder(coef, scl=2.0 / (zhi - zlo), axis=1)
    return out


def _cheb_table(coef, z):
    """Evaluate per-station series (nr, K) on the depth grid -> (nr, nz)."""
    import numpy.polynomial.chebyshev as ncheb

    u = (2.0 * z - (z[0] + z[-1])) / (z[-1] - z[0])
    return ncheb.chebval(u, np.asarray(coef, np.float64).T)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "c",
        "dcdz",
        "r",
        "z",
        "bathy",
        "bathy_r",
        "bottom_angle",
        "bangle_coef",
        "c_cheb",
        "dcdz_cheb",
        "bangle_cheb",
        "c_pow",
        "dcdz_pow",
        "c_seg",
        "dcdz_seg",
    ],
    meta_fields=[
        "range_dependent",
        "uniform_z",
        "uniform_r",
        "uniform_bathy_r",
        "has_cheb",
        "bangle_mode",
        "bangle_const",
        "z_dom",
        "r_dom",
        "bathy_r_dom",
        "poly_ok",
        "has_seg",
        "seg_basis",
    ],
)
@dataclasses.dataclass(frozen=True)
class EnvData:
    # canonical tables
    c: jax.Array  # (nr, nz) sound speed [m/s]
    dcdz: jax.Array  # (nr, nz) [1/s]
    r: jax.Array  # (nr,) range grid [m]
    z: jax.Array  # (nz,) depth grid [m], increasing
    bathy: jax.Array  # (nb,) bottom depth [m]
    bathy_r: jax.Array  # (nb,) bathymetry range grid [m]
    bottom_angle: jax.Array  # (nb,) bottom slope angle [deg]
    bangle_coef: jax.Array  # (nb-1, 4) not-a-knot cubic spline coefficients
    # spectral representation (zeros when has_cheb is False)
    c_cheb: jax.Array  # (nr, K)
    dcdz_cheb: jax.Array  # (nr, K)
    bangle_cheb: jax.Array  # (Kb,)
    # monomial re-expression of the spectral fits (f64-converted at build;
    # zeros unless poly_ok) — Horner on these is the fastest hot path
    c_pow: jax.Array  # (nr, K)
    dcdz_pow: jax.Array  # (nr, K)
    # piecewise-segment representation for rough fields (ops/seg.py):
    # monomial coefficients per uniform depth segment, lane = segment
    # (zeros when has_seg is False)
    c_seg: jax.Array  # (nr, Ks, SEG_S)
    dcdz_seg: jax.Array  # (nr, Ks, SEG_S)
    # static metadata
    range_dependent: bool
    uniform_z: bool
    uniform_r: bool
    uniform_bathy_r: bool
    has_cheb: bool
    bangle_mode: str  # "const" | "cheb" | "spline"
    bangle_const: float
    z_dom: tuple  # (z[0], z[-1]) as python floats
    r_dom: tuple  # (r[0], r[-1]) as python floats
    bathy_r_dom: tuple  # (bathy_r[0], bathy_r[-1]) as python floats
    # True when the Chebyshev fits re-expressed in the monomial basis
    # evaluate (f32 Horner) within tolerance — the engine then uses Horner
    # (1 fma/term) instead of Clenshaw (2 ops/term) on the hot path
    poly_ok: bool = False
    # True when the piecewise-segment fit met its gates (used by the
    # engine only when the global spectral fit is absent)
    has_seg: bool = False
    # segment-coefficient basis: "pow" (local monomial, Horner on device)
    # or "cheb" (local Chebyshev, Clenshaw — the high-order rungs)
    seg_basis: str = "pow"

    @property
    def nz(self):
        return self.z.shape[0]

    @property
    def nr(self):
        return self.r.shape[0]


def make_env_data(
    c,
    r,
    z,
    bathy,
    bathy_r,
    bottom_angle=None,
    dcdz=None,
    interp: str = "auto",
    cheb_order: int = 47,
    cheb_exact_order: bool = False,
    seg_order: int = 95,
    seg_exact_order: bool = False,
    seg_basis: str = "auto",
    force_range_dependent: bool = False,
    dtype=None,
) -> EnvData:
    """Build an ``EnvData`` from host tables.

    Parameters mirror the reference's unpacked environment arrays
    (`/root/reference/src/pygenray/launch_rays.py:717-742`): ``c`` is
    (nr, nz) or (nz,), ``dcdz`` defaults to ``np.gradient`` along depth
    (the xarray-``differentiate`` semantics the reference uses), and
    ``bottom_angle`` defaults to ``degrees(arctan(gradient(bathy)))``.

    ``dcdz="consistent"`` derives dc/dz as the EXACT derivative of the
    fitted c representation (series derivative of ``c_cheb``, per-segment
    derivative of ``c_seg``; the stored table is re-evaluated from it) —
    the Hamiltonian-consistent field that makes the eikonal endpoint
    identity (``adjoint.endpoint_time_gradients``) exact instead of
    floored at ~1e-3 by the fit-vs-central-differences gap.  Requires a
    spectral or segment fit (raises with ``interp="table"`` or when
    neither fit accepts the field); the default stays reference parity.

    ``interp`` selects the profile backend: "table" (exact reference
    semantics), "cheb" (global spectral fast path; raises if the fit is
    poor), "seg" (piecewise-segment fast path for rough fields; raises if
    its gates fail), or "auto" (global fit → segment fit → table, first
    acceptable wins).

    ``seg_order`` caps the segment-fit escalation ladder (monomial rungs
    up to K=24, then local-Chebyshev rungs to K=96 — see ops/seg.py);
    ``seg_basis`` pins the basis ("pow"/"cheb", default "auto" = ladder
    order).  Any continuous field sampling its finest vertical structure
    at ≥ ~4 points per wavelength fits on some rung; coarser tables keep
    the exact-table path (the only faithful representation of such data).
    """
    c = np.asarray(c, np.float64)
    if c.ndim == 1:
        if r is None:
            raise ValueError(
                "1D c requires an explicit range grid (e.g. two points "
                "spanning the domain, r=[0.0, max_range])"
            )
        r = np.atleast_1d(np.asarray(r, np.float64))
        if r.shape[0] < 2:
            raise ValueError("1D c needs a range grid with at least 2 points")
        c = np.broadcast_to(c, (r.shape[0], c.shape[0])).copy()
    z = np.asarray(z, np.float64)
    r = np.asarray(r, np.float64)
    bathy = np.asarray(bathy, np.float64)
    bathy_r = np.asarray(bathy_r, np.float64)

    # strictly increasing: a duplicated coordinate (e.g. concatenated
    # datasets) would later divide by a zero interval and NaN the trace
    if r.shape[0] > 1 and not np.all(np.diff(r) > 0):
        raise ValueError("Sound speed range coordinates must be monotonically increasing.")
    if not np.all(np.diff(z) > 0):
        raise ValueError("Sound speed depth coordinates must be monotonically increasing.")
    if bathy_r.shape[0] > 1 and not np.all(np.diff(bathy_r) > 0):
        raise ValueError("Bathymetry range coordinates must be monotonically increasing.")

    consistent = isinstance(dcdz, str)
    if consistent:
        if dcdz != "consistent":
            raise ValueError(
                f"unknown dcdz mode {dcdz!r}; pass an array, None, or "
                "'consistent'"
            )
        if interp == "table":
            raise ValueError(
                "dcdz='consistent' derives dc/dz from the fitted c "
                "representation; the exact-table path has no smooth c fit "
                "to differentiate — use interp 'auto', 'cheb', or 'seg'."
            )
        # placeholder for shape bookkeeping; replaced by d/dz of the c fit
        # once a fit is accepted below
        dcdz = np.gradient(c, z, axis=1)
    elif dcdz is None:
        dcdz = np.gradient(c, z, axis=1)
    else:
        dcdz = np.asarray(dcdz, np.float64)
    if bottom_angle is None:
        slope = np.gradient(bathy, bathy_r)
        bottom_angle = np.degrees(np.arctan(slope))
    else:
        bottom_angle = np.asarray(bottom_angle, np.float64)

    range_dependent = force_range_dependent or not bool(np.all(c == c[:1]))
    if interp == "seg":
        force_seg = True
        interp = "auto"
    else:
        force_seg = False

    # spectral fit: pick the smallest order meeting tolerance (Clenshaw cost
    # on the hot path is linear in the order)
    has_cheb = False
    c_cheb = np.zeros((c.shape[0], 8))
    dcdz_cheb = np.zeros((c.shape[0], 8))
    if interp in ("auto", "cheb") and not force_seg:
        c_res = cp_res = np.inf
        if cheb_exact_order:
            orders = [cheb_order]
        else:
            ladder = (15, 23, 31, 47, 63, 95, 127, 191, 255)
            orders = [o for o in ladder if o <= cheb_order] or [cheb_order]
        for order in orders:
            order = min(order, len(z) - 1)
            c_cheb_f, c_res = fit_profile_cheb(c, z, order=order)
            if consistent:
                # Hamiltonian-consistent mode: dc/dz is the EXACT series
                # derivative of the c fit (no independent fit to gate), and
                # the stored table is re-derived from it so every backend
                # sees the same field
                cp_res = 0.0
                if c_res < C_FIT_TOL:
                    has_cheb = True
                    c_cheb = c_cheb_f
                    dcdz_cheb = _cheb_dz(c_cheb, z[0], z[-1])
                    dcdz = _cheb_table(dcdz_cheb, z)
                    break
                continue
            cp_cheb_f, cp_res = fit_profile_cheb(dcdz, z, order=order)
            if c_res < C_FIT_TOL and cp_res < CP_FIT_TOL:
                has_cheb = True
                c_cheb, dcdz_cheb = c_cheb_f, cp_cheb_f
                break
        if interp == "cheb" and not has_cheb:
            raise ValueError(
                f"Chebyshev profile fit residuals too large (c: {c_res:.2e} m/s, "
                f"dc/dz: {cp_res:.2e} 1/s); use interp='table' or 'auto'."
            )

    # monomial-basis guard: Horner halves the hot-path cost but its f32
    # conditioning must be checked per profile (smooth analytic fits pass;
    # rough high-order ensemble fits fail the 2^k coefficient growth)
    pow_ok = False
    c_pow = np.zeros_like(c_cheb)
    dcdz_pow = np.zeros_like(dcdz_cheb)
    if has_cheb:
        from .ops.cheb import cheb2poly_matrix, poly_ok as _poly_ok

        pow_ok = (_poly_ok(c_cheb, 0.5 * C_FIT_TOL)
                  and _poly_ok(dcdz_cheb, 0.5 * CP_FIT_TOL))
        if pow_ok:
            M = cheb2poly_matrix(c_cheb.shape[1])
            c_pow = c_cheb @ M.T
            dcdz_pow = dcdz_cheb @ M.T

    # piecewise-segment fit: the rough-field fast path, tried only when the
    # global fit is absent (it is strictly more expressive but its readers
    # cost a lane gather per coefficient where the global path reads free
    # SMEM scalars)
    has_seg = False
    seg_basis_used = "pow"
    c_seg = np.zeros((c.shape[0], 1, SEG_S))
    dcdz_seg = np.zeros((c.shape[0], 1, SEG_S))
    if not has_cheb and (interp == "auto" or force_seg):
        if seg_exact_order:
            b = seg_basis if seg_basis != "auto" else (
                "pow" if seg_order <= max(SEG_ORDER_LADDER) else "cheb"
            )
            rungs = [(seg_order, b)]
        else:
            rungs = []
            if seg_basis in ("auto", "pow"):
                rungs += [(o, "pow") for o in SEG_ORDER_LADDER if o <= seg_order]
            if seg_basis in ("auto", "cheb"):
                rungs += [(o, "cheb") for o in SEG_CHEB_LADDER if o <= seg_order]
            if not rungs:
                rungs = [(seg_order, "pow" if seg_basis == "pow" else "cheb")]
        c_mr = cp_mr = c_xr = cp_xr = np.inf
        for order, b in rungs:
            c_seg_f, c_mr, c_xr = fit_profile_seg(c, z, order=order, basis=b)
            if consistent:
                cp_mr = cp_xr = 0.0
                if c_mr < C_FIT_TOL and c_xr < C_SEG_MAX_TOL:
                    from .ops.seg import seg_derivative, seg_eval_np

                    has_seg = True
                    seg_basis_used = b
                    c_seg = c_seg_f
                    dcdz_seg = seg_derivative(c_seg, z[0], z[-1], basis=b)
                    dcdz = seg_eval_np(dcdz_seg, z, z[0], z[-1], basis=b)
                    break
                continue
            cp_seg_f, cp_mr, cp_xr = fit_profile_seg(dcdz, z, order=order, basis=b)
            if (c_mr < C_FIT_TOL and cp_mr < CP_FIT_TOL
                    and c_xr < C_SEG_MAX_TOL and cp_xr < CP_SEG_MAX_TOL):
                has_seg = True
                seg_basis_used = b
                c_seg, dcdz_seg = c_seg_f, cp_seg_f
                break
        if force_seg and not has_seg:
            raise ValueError(
                f"segment profile fit residuals too large (c: mean "
                f"{c_mr:.2e}/max {c_xr:.2e} m/s, dc/dz: mean {cp_mr:.2e}/"
                f"max {cp_xr:.2e} 1/s) — this table carries more "
                f"information at its own grid scale than a 128-segment "
                f"order-{rungs[-1][0]} fit can hold within the travel-time "
                f"budget; use interp='table' or 'auto'."
            )

    if consistent and not (has_cheb or has_seg):
        raise ValueError(
            "dcdz='consistent' requires the field to fit the spectral or "
            "segment representation (this table fits neither, so only the "
            "exact-table path remains, which has no smooth c to "
            "differentiate); use the default table-parity dcdz."
        )

    # bottom angle representation
    if bathy_r.shape[0] >= 2:
        bangle_coef = cubic_spline_coeffs(bathy_r, bottom_angle)
    else:
        bangle_coef = np.zeros((1, 4))
    # near-constant detection with tolerance: np.gradient of a flat bottom
    # produces O(1e-15) degree floating-point noise
    if np.ptp(bottom_angle) < 1e-9:
        bangle_mode = "const"
        bangle_const = float(np.mean(bottom_angle))
        bangle_cheb = np.zeros(8)
    else:
        # fit the cubic-spline interpolant (reference semantics:
        # interp1d(kind="cubic"), launch_rays.py:396-399) with a Chebyshev
        # series; fall back to the device spline gather if the fit is poor.
        from scipy.interpolate import CubicSpline

        cs = CubicSpline(bathy_r, bottom_angle, bc_type="not-a-knot")
        rr = np.linspace(bathy_r[0], bathy_r[-1], max(4 * len(bathy_r), 256))
        kb = min(64, len(rr) - 1)
        bangle_cheb, b_res = fit_series_cheb(rr, cs(rr), kb)
        bangle_const = 0.0
        if b_res < BANGLE_FIT_TOL:
            bangle_mode = "cheb"
        else:
            bangle_mode = "spline"
            bangle_cheb = np.zeros(8)

    dtype = dtype or jnp.float32
    dev = lambda a: jnp.asarray(a, dtype)
    return EnvData(
        c=dev(c),
        dcdz=dev(dcdz),
        r=dev(r),
        z=dev(z),
        bathy=dev(bathy),
        bathy_r=dev(bathy_r),
        bottom_angle=dev(bottom_angle),
        bangle_coef=dev(bangle_coef),
        c_cheb=dev(c_cheb),
        dcdz_cheb=dev(dcdz_cheb),
        bangle_cheb=dev(bangle_cheb),
        c_pow=dev(c_pow),
        dcdz_pow=dev(dcdz_pow),
        c_seg=dev(c_seg),
        dcdz_seg=dev(dcdz_seg),
        range_dependent=range_dependent,
        uniform_z=_is_uniform(z),
        uniform_r=_is_uniform(r),
        uniform_bathy_r=_is_uniform(bathy_r),
        has_cheb=has_cheb,
        bangle_mode=bangle_mode,
        bangle_const=bangle_const,
        z_dom=(float(z[0]), float(z[-1])),
        r_dom=(float(r[0]), float(r[-1])),
        bathy_r_dom=(float(bathy_r[0]), float(bathy_r[-1])),
        poly_ok=pow_ok,
        has_seg=has_seg,
        seg_basis=seg_basis_used,
    )


def with_spectral(env: EnvData, c_cheb, dcdz_cheb) -> EnvData:
    """Replace the spectral coefficients of an environment SAFELY.

    ``dataclasses.replace(env, c_cheb=...)`` alone leaves the derived
    monomial tables (``c_pow``/``dcdz_pow``) stale — the hot path would
    keep integrating the OLD field.  This helper re-runs the monomial
    guard/conversion (host float64) for the new coefficients.  Code that
    replaces coefficients inside a traced computation (autodiff operators)
    must instead pass ``poly_ok=False`` to force the Chebyshev path, as
    ``adjoint.travel_time_jacobian`` does.
    """
    from .ops.cheb import cheb2poly_matrix, poly_ok as _poly_ok

    cc = np.asarray(c_cheb, np.float64)
    cp = np.asarray(dcdz_cheb, np.float64)
    ok = bool(env.has_cheb) and (_poly_ok(cc.reshape(-1, cc.shape[-1]), 0.5 * C_FIT_TOL)
                                 and _poly_ok(cp.reshape(-1, cp.shape[-1]), 0.5 * CP_FIT_TOL))
    if ok:
        M = cheb2poly_matrix(cc.shape[-1])
        c_pow, dcdz_pow = cc @ M.T, cp @ M.T
    else:
        c_pow, dcdz_pow = np.zeros_like(cc), np.zeros_like(cp)
    dt = env.c_cheb.dtype
    return dataclasses.replace(
        env,
        c_cheb=jnp.asarray(cc, dt), dcdz_cheb=jnp.asarray(cp, dt),
        c_pow=jnp.asarray(c_pow, dt), dcdz_pow=jnp.asarray(dcdz_pow, dt),
        poly_ok=ok,
    )


def mirror_env_arrays(c, dcdz, r, bathy, bathy_r, bottom_angle):
    """Reflect host environment arrays about the range axis (x' = -x).

    Matches the reference's backwards-shot handling
    (`/root/reference/src/pygenray/launch_rays.py:684-714`): coordinates are
    negated and reversed so they stay increasing, fields are reversed along
    range, and bottom angles flip sign.
    """
    return (
        c[::-1, :],
        dcdz[::-1, :],
        -r[::-1],
        bathy[::-1],
        -bathy_r[::-1],
        -bottom_angle[::-1],
    )


_MIRROR_CACHE = {}  # id(env) -> mirrored EnvData; evicted when env is GC'd


def mirror_env_data(env: EnvData) -> EnvData:
    """Mirror a device-resident ``EnvData`` about the range axis (x' = -x)
    so a backwards shot integrates forward in the mirrored frame.

    Device-pytree counterpart of ``mirror_env_arrays`` (reference behavior:
    `/root/reference/src/pygenray/launch_rays.py:684-714`): coordinates
    negate and reverse, fields reverse along range, bottom angles flip
    sign.  The spectral/segment coefficient tables are DEPTH representations
    — mirroring only reverses their station order — while the bottom-angle
    Chebyshev series transforms as β'(u) = -β(-u) (``cheb_mirror``) and the
    spline coefficients are re-expanded about the mirrored knots.  Memoized
    per environment object (weakref-evicted), so repeated backwards shots
    reuse one mirrored pytree.
    """
    import weakref

    k = id(env)
    got = _MIRROR_CACHE.get(k)
    if got is not None:
        return got

    from .ops.cheb import cheb_mirror

    flip_r = lambda a: a[::-1]
    # not-a-knot spline coefficients about mirrored knots: with
    # L_i = x_{i+1} - x_i and s'(dt') = -s(L_i - dt'), per interval
    # c0' = -(c0 + c1 L + c2 L^2 + c3 L^3), c1' = c1 + 2 c2 L + 3 c3 L^2,
    # c2' = -(c2 + 3 c3 L), c3' = c3 — then reverse the interval order.
    coef = env.bangle_coef
    if env.bathy_r.shape[0] >= 2 and coef.shape[0] == env.bathy_r.shape[0] - 1:
        L = env.bathy_r[1:] - env.bathy_r[:-1]
        c0, c1, c2, c3 = coef[:, 0], coef[:, 1], coef[:, 2], coef[:, 3]
        mirrored_coef = jnp.stack(
            [
                -(c0 + c1 * L + c2 * L * L + c3 * L * L * L),
                c1 + 2.0 * c2 * L + 3.0 * c3 * L * L,
                -(c2 + 3.0 * c3 * L),
                c3,
            ],
            axis=1,
        )[::-1]
    else:
        mirrored_coef = -coef

    got = dataclasses.replace(
        env,
        c=env.c[::-1],
        dcdz=env.dcdz[::-1],
        r=-flip_r(env.r),
        bathy=flip_r(env.bathy),
        bathy_r=-flip_r(env.bathy_r),
        bottom_angle=-flip_r(env.bottom_angle),
        bangle_coef=mirrored_coef,
        c_cheb=env.c_cheb[::-1],
        dcdz_cheb=env.dcdz_cheb[::-1],
        bangle_cheb=-cheb_mirror(env.bangle_cheb),
        c_pow=env.c_pow[::-1],
        dcdz_pow=env.dcdz_pow[::-1],
        c_seg=env.c_seg[::-1],
        dcdz_seg=env.dcdz_seg[::-1],
        bangle_const=-env.bangle_const,
        r_dom=(-env.r_dom[1], -env.r_dom[0]),
        bathy_r_dom=(-env.bathy_r_dom[1], -env.bathy_r_dom[0]),
    )
    _MIRROR_CACHE[k] = got
    weakref.finalize(env, _MIRROR_CACHE.pop, k, None)
    return got


_HOST_TABLE_CACHE = {}  # id(env) -> (r, z, c); evicted when the env is GC'd


def host_profile_tables(env) -> tuple:
    """Host numpy copies of ``(r, z, c)`` for launch-angle conversions and
    received-angle bookkeeping.

    Every ``shoot_rays``/``find_eigenrays`` call needs the source sound
    speed, and on the axon TPU tunnel each device->host array pull costs
    ~10-20 ms — three pulls per call used to dominate eigenray latency.
    This fetches all three arrays in ONE overlapped ``jax.device_get`` and
    memoizes the HOST copies per environment object.  The entry holds no
    reference to the env (its device buffers stay collectable); a weakref
    finalizer evicts the entry the moment the env is garbage-collected, so
    the id() key can never alias a new object.
    """
    import weakref

    k = id(env)
    got = _HOST_TABLE_CACHE.get(k)
    if got is None:
        r, z, c = jax.device_get((env.r, env.z, env.c))
        got = (np.asarray(r, float), np.asarray(z, float), np.asarray(c, float))
        _HOST_TABLE_CACHE[k] = got
        weakref.finalize(env, _HOST_TABLE_CACHE.pop, k, None)
    return got
