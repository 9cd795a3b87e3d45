"""Batched, event-aware fixed-step ray integration under ``lax.scan``.

This is the TPU-native replacement for the reference's per-ray, event-
segmented adaptive integration loop
(`/root/reference/src/pygenray/launch_rays.py:325-484`).  Design inversions:

* **One fixed-step RK4 scan for the whole fan.**  The reference runs scipy's
  adaptive RK45 per ray in separate processes; here the full (B,) batch of
  rays advances together through shared range stations, so per-step sound
  speed profiles are evaluated once per station and broadcast to all rays.
* **Branchless reflections instead of terminal events.**  Surface/bottom
  crossings are detected per step, localized inside the step with a cubic
  Hermite model of z(x) (using the FSAL-carried end derivatives), the state
  is interpolated to the crossing, reflected (θ' = -θ at the surface,
  θ' = 2β - θ at the bottom, reference `launch_rays.py:459-471`), and the
  remainder of the step is re-integrated — all with ``jnp.where`` masks.
* **Alive-masks instead of ray dropping.**  Vertical rays, domain exits and
  backwards bounces freeze the ray state and set a death code (reference
  behavior: return None and drop, `launch_rays.py:427-477`).
* **Compensated (Kahan) accumulation** of T and z so float32 TPU runs hold
  travel-time error far below the 0.1 ms tomography budget.

The integrator is dtype-polymorphic: float64 on CPU reproduces the scipy
reference to ~1e-7 s; float32 is the TPU production path.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from .envdata import EnvData
from .ops.cheb import clenshaw, horner
from .ops.interp import cubic_spline_eval, interval_index, linear_interp
from .utils.cache import LRUCache, env_struct_key

__all__ = ["SolverSettings", "TraceResult", "trace", "DEATH_CODES"]

DEATH_CODES = {
    0: "alive",
    1: "vertical",
    2: "out_of_domain",
    3: "backwards",
    5: "calm_guard",  # Pallas calm-block audit: a ray the host classifier
    #    declared boundary-safe entered the guard band (classifier miss —
    #    never silent; see ops/pallas_stepper.classify_calm)
}

_TINY = 1e-30


@dataclasses.dataclass(frozen=True)
class SolverSettings:
    """Static solver configuration (hashable; jit recompiles per value).

    ``dx`` is the nominal range step [m]; the actual step is chosen so an
    integer number of steps lands exactly on each save point.  ``interp``
    selects the profile backend: "auto" uses the spectral (Chebyshev) path
    when the environment fit succeeded, else exact table interpolation.
    """

    dx: float = 50.0
    interp: str = "auto"  # auto | table | cheb | seg
    terminate_backwards: bool = True
    vertical_limit_deg: float = 90.0 - 1e-3
    bbox_tol: float = 1e-6
    max_bounces: int = -1  # unlimited; reserved for future use
    # compensated (Kahan) accumulation of T and z: essential in float32,
    # unnecessary in float64 (and its cancellation pattern provokes slow
    # XLA simplifier behavior under autodiff — the adjoint disables it)
    kahan: bool = True
    # "auto": Pallas mega-kernel on TPU when the configuration supports it
    # (range-independent spectral profiles; ~1.5x over the XLA scan by
    # eliminating per-step kernel-launch overhead), else the XLA scan.
    backend: str = "auto"  # auto | xla | pallas
    # Pallas only: host-side Snell classification routes grid blocks whose
    # rays provably never approach a boundary through an event-free step
    # body (no per-step any(cross) reduction).  Conservative and audited:
    # a classifier miss dies with DEATH_CODES[5], never a silent wrong
    # answer.  The calm range rides as a runtime scalar — per-fan
    # classification does not recompile.
    calm: bool = True
    # Pallas only: split each grid block's per-step crossing branch into
    # this many row groups, each gated by its own any(cross) scalar.
    # (A former `event_groups` knob — sub-block granularity for the
    # event-body branch — was DELETED after the interleaved paired A/B
    # measured monotone losses: G=4/8/16 full-event 0.80/0.65/0.51x,
    # calm-on 0.95/0.89/0.78x on 2026-08-19 hardware.  Per-group branch
    # overhead swamps the skipped reductions; docs/tpu_design.md keeps
    # the ledger entry.)
    # Pallas only: dynamic calm windows in non-calm blocks.  After each
    # event segment the kernel bounds, from the block's distance to the
    # audit band and its host-classified Snell slope bound (classify_dyn),
    # how many upcoming save segments provably cannot touch a boundary and
    # runs them through the event-free body — phase-aware skipping between
    # bounce clusters that the static all-range calm proof cannot express.
    # Audited like static calm: a violated bound dies with DEATH_CODES[5],
    # never a silent missed reflection.  Auto-classification applies ONLY
    # when the static calm classifier declined — the paired hardware A/B
    # (bench.py --dyn, 2026-08-19) measures +5% median there (calm-off
    # headline; rough/IW ensembles are the production case, their drift
    # never proves static calm), but neutral (RD calm-on +0.9%) to mildly
    # negative (headline calm-on -2.3%: boundary-block bounce phases
    # decohere and the countdown pins at 0) when static calm already
    # covers the quiet blocks.  Off in interpret mode unless a table is
    # passed explicitly (same FMA-contraction reasoning as calm).
    dyn_calm: bool = True
    # Pallas only: hot-block compilation policy.  "auto" asks classify_hot
    # whether every NON-calm block is expected to trip the crossing branch
    # nearly every step (its rays provably bounce; headline boundary
    # stripes estimate ~50-80 expected crossings/step) and, when so,
    # compiles those blocks' event fix UNconditionally — removing the
    # per-step any(cross) vector->scalar reduction and the duplicate plain
    # update.  MEASURED NEGATIVE — default "off".  The interleaved paired
    # A/B (bench.py --hot, 2026-08-19) shows the branch QUIET steps are
    # still frequent enough that always paying the fix arithmetic swamps
    # the saved reduction: headline calm-on 0.845x, RD calm-on 0.757x
    # median speedup (pairs tight to ±1%).  The measurement's byproduct is
    # load-bearing: the hot and branched bodies are BITWISE identical on
    # hardware (max |Δt| = 0.0 over the full 102,400-ray save grids),
    # proving the fix's where() merges reduce exactly to the plain update
    # on non-crossing lanes — a wrong setting costs speed, never
    # correctness.  Requires a classified calm range riding with the
    # launch when "auto"; ignored when dyn windows engage.
    hot: str = "off"  # off | auto


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["rs", "ts", "zs", "ps", "n_bott", "n_surf", "alive", "alive_save", "death_code"],
    meta_fields=[],
)
@dataclasses.dataclass(frozen=True)
class TraceResult:
    """Raw fan-trace output in the ODE convention (positive z down)."""

    rs: jax.Array  # (num_save,)
    ts: jax.Array  # (B, num_save)
    zs: jax.Array  # (B, num_save)
    ps: jax.Array  # (B, num_save)
    n_bott: jax.Array  # (B,) int32
    n_surf: jax.Array  # (B,) int32
    alive: jax.Array  # (B,) bool — survived to the receiver
    alive_save: jax.Array  # (B, num_save) bool — alive at each save point
    death_code: jax.Array  # (B,) int32 — see DEATH_CODES


# ---------------------------------------------------------------------------
# profile evaluation
# ---------------------------------------------------------------------------


def _use_cheb(env: EnvData, settings: SolverSettings) -> bool:
    if settings.interp in ("table", "seg"):
        return False
    if settings.interp == "cheb":
        if not env.has_cheb:
            raise ValueError("environment has no Chebyshev fit; use interp='auto'/'table'")
        return True
    return env.has_cheb


def _use_seg(env: EnvData, settings: SolverSettings) -> bool:
    """Piecewise-segment profile backend (ops/seg.py): the rough-field
    fast path, used when the global spectral fit is absent."""
    if settings.interp == "seg":
        if not getattr(env, "has_seg", False):
            raise ValueError("environment has no segment fit; use interp='auto'/'table'")
        return True
    return (settings.interp == "auto" and not env.has_cheb
            and bool(getattr(env, "has_seg", False)))


def _use_pow(env: EnvData, settings: SolverSettings, use_cheb: bool) -> bool:
    """Monomial (Horner) hot path: 1 fma/term vs Clenshaw's 2 ops/term.
    Guarded per environment at build time (``EnvData.poly_ok``)."""
    return use_cheb and bool(getattr(env, "poly_ok", False))


def _spectral_tabs(env: EnvData, use_pow: bool):
    """The per-station coefficient tables the hot path blends and
    evaluates: monomial when guarded-OK, Chebyshev otherwise."""
    if use_pow:
        return env.c_pow, env.dcdz_pow
    return env.c_cheb, env.dcdz_cheb


def _profile_tabs(env: EnvData, use_cheb: bool, use_pow: bool, use_seg: bool):
    """Per-station tables for the active profile backend: (nr, K) spectral
    coefficients, (nr, Ks, S) segment tiles, or (nr, nz) raw columns."""
    if use_cheb:
        return _spectral_tabs(env, use_pow)
    if use_seg:
        return env.c_seg, env.dcdz_seg
    return env.c, env.dcdz


def _make_eval(env: EnvData, use_cheb: bool, use_pow: bool = False,
               use_seg: bool = False):
    """Returns ``(ev, ev_c)``: full ``(c, dcdz)`` and c-only evaluation of a
    station profile at batched depths."""
    zlo, zhi = env.z_dom

    if use_seg:
        # piecewise-segment backend: per-lane segment pick + local-u Horner
        # ("pow" basis) or Clenshaw ("cheb" basis, the high-order rungs).
        # The Pallas kernel mirrors these expressions with in-kernel lane
        # gathers; keep the arithmetic in lockstep.
        S = env.c_seg.shape[-1]
        S_f = float(S)
        hinv = S_f / (zhi - zlo)
        seg_poly = horner if env.seg_basis == "pow" else clenshaw

        def _seg_u(z):
            t = jnp.clip((z - zlo) * hinv, 0.0, S_f)
            segf = jnp.minimum(jnp.floor(t), S_f - 1.0)
            return segf.astype(jnp.int32), 2.0 * (t - segf) - 1.0

        def ev(prof, z):
            seg, u = _seg_u(z)
            c = seg_poly(u, jnp.swapaxes(prof[0], -1, -2)[seg])
            cp = seg_poly(u, jnp.swapaxes(prof[1], -1, -2)[seg])
            return c, cp

        def ev_c(prof, z):
            seg, u = _seg_u(z)
            return seg_poly(u, jnp.swapaxes(prof[0], -1, -2)[seg])

        return ev, ev_c

    if use_cheb:
        sc = 2.0 / (zhi - zlo)
        off = (zlo + zhi) / (zhi - zlo)
        poly = horner if use_pow else clenshaw

        def ev(prof, z):
            # clamp to the fit domain: constant extrapolation at the edges,
            # mirroring the table kernels' index clamping
            u = jnp.clip(sc * z - off, -1.0, 1.0)
            return poly(u, prof[0]), poly(u, prof[1])

        def ev_c(prof, z):
            u = jnp.clip(sc * z - off, -1.0, 1.0)
            return poly(u, prof[0])

    else:

        def ev(prof, z):
            i = interval_index(z, env.z, env.uniform_z)
            z0g = env.z[i]
            w = (z - z0g) / (env.z[i + 1] - z0g)
            c = (1.0 - w) * prof[0][i] + w * prof[0][i + 1]
            cp = (1.0 - w) * prof[1][i] + w * prof[1][i + 1]
            return c, cp

        def ev_c(prof, z):
            i = interval_index(z, env.z, env.uniform_z)
            z0g = env.z[i]
            w = (z - z0g) / (env.z[i + 1] - z0g)
            return (1.0 - w) * prof[0][i] + w * prof[0][i + 1]

    return ev, ev_c


def _station_profile(env: EnvData, use_cheb: bool, x, use_pow: bool = False,
                     use_seg: bool = False):
    """Profile data at a scalar range station ``x`` (host of dynamic slices).

    Returns a pair ``(c_repr, dcdz_repr)``: spectral coefficient vectors
    (K,) (monomial when ``use_pow``), segment tiles (Ks, S), or blended
    table columns (nz,).
    """
    ctab, cptab = _profile_tabs(env, use_cheb, use_pow, use_seg)
    if not env.range_dependent:
        return (ctab[0], cptab[0])
    i = interval_index(x, env.r, env.uniform_r)
    w = (x - env.r[i]) / (env.r[i + 1] - env.r[i])
    rows_c = lax.dynamic_slice_in_dim(ctab, i, 2, axis=0)
    rows_cp = lax.dynamic_slice_in_dim(cptab, i, 2, axis=0)
    return (
        (1.0 - w) * rows_c[0] + w * rows_c[1],
        (1.0 - w) * rows_cp[0] + w * rows_cp[1],
    )


def _make_bangle(env: EnvData):
    """``sincos2b(x) -> (sin 2β, cos 2β)`` for the bottom reflection.

    The bottom reflection θ' = 2β - θ is applied without any inverse trig:
    sin θ' = sin 2β cos θ - cos 2β sin θ with sin θ = c·p taken directly
    from the ray state — mathematically identical to the reference's
    degrees(arcsin(...)) round-trip (`launch_rays.py:459-471`) but
    transcendental-free on the per-step hot path.  For a constant-slope
    bottom, sin/cos 2β are compile-time constants.
    """
    import math

    if env.bangle_mode == "const":
        b = math.radians(env.bangle_const)
        s2b, c2b = math.sin(2 * b), math.cos(2 * b)

        def sincos2b(x):
            return s2b, c2b

    elif env.bangle_mode == "cheb":
        coef = env.bangle_cheb
        # static domain floats (bathy_r_dom exists precisely so this affine
        # map constant-folds instead of gathering from the device array)
        blo, bhi = env.bathy_r_dom

        def sincos2b(x):
            u = jnp.clip((2.0 * x - (blo + bhi)) / (bhi - blo), -1.0, 1.0)
            b2 = 2.0 * jnp.radians(clenshaw(u, coef))
            return jnp.sin(b2), jnp.cos(b2)

    else:

        def sincos2b(x):
            beta = cubic_spline_eval(x, env.bathy_r, env.bangle_coef, env.uniform_bathy_r)
            b2 = 2.0 * jnp.radians(beta)
            return jnp.sin(b2), jnp.cos(b2)

    return sincos2b


# ---------------------------------------------------------------------------
# cubic Hermite (normalized s in [0,1]; slopes pre-scaled by h)
# ---------------------------------------------------------------------------


def _hermite(s, y0, y1, m0, m1):
    s2 = s * s
    s3 = s2 * s
    return (
        (2 * s3 - 3 * s2 + 1) * y0
        + (s3 - 2 * s2 + s) * m0
        + (-2 * s3 + 3 * s2) * y1
        + (s3 - s2) * m1
    )


def _hermite_d(s, y0, y1, m0, m1):
    s2 = s * s
    return (
        (6 * s2 - 6 * s) * y0
        + (3 * s2 - 4 * s + 1) * m0
        + (-6 * s2 + 6 * s) * y1
        + (3 * s2 - 2 * s) * m1
    )


def _kahan_add(val, comp, delta):
    y = delta - comp
    t = val + y
    comp = (t - val) - y
    return t, comp


# ---------------------------------------------------------------------------
# the integrator
# ---------------------------------------------------------------------------


def _plan(x0: float, x1: float, num_save: int, dx: float):
    """Static step plan: (h, steps_per_seg, num_seg)."""
    num_seg = max(1, num_save - 1)
    seg_len = (x1 - x0) / num_seg
    steps_per_seg = max(1, int(round(seg_len / dx)))
    h = seg_len / steps_per_seg
    return h, steps_per_seg, num_seg


@partial(jax.jit, static_argnames=("settings", "geom"))
def _trace_impl(env: EnvData, z0, p0, geom, settings: SolverSettings):
    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = env.c.dtype
    z0 = jnp.broadcast_to(jnp.asarray(z0, dtype), p0.shape)
    p0 = jnp.asarray(p0, dtype)
    B = p0.shape[0]

    use_cheb = _use_cheb(env, settings)
    use_pow = _use_pow(env, settings, use_cheb)
    use_seg = _use_seg(env, settings)
    ev, ev_c = _make_eval(env, use_cheb, use_pow, use_seg)
    sincos2b = _make_bangle(env)
    zlo, zhi = env.z_dom
    rlo, rhi = env.r_dom
    btol = settings.bbox_tol
    import math

    sin_lim = math.sin(math.radians(settings.vertical_limit_deg))
    hs = jnp.asarray(h, dtype)

    def rhs(prof, z, p):
        c, cp = ev(prof, z)
        cp2 = c * p
        inv_s = lax.rsqrt(jnp.maximum(1.0 - cp2 * cp2, _TINY))
        invc = 1.0 / c
        return inv_s * invc, cp2 * inv_s, -cp * inv_s * invc * invc, c

    # ---- per-step data (precomputed outside the scan) --------------------
    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xsm = xs0 + 0.5 * h
    xs1 = x0 + (ks + 1.0) * h
    b0s = linear_interp(xs0, env.bathy_r, env.bathy, env.uniform_bathy_r)
    b1s = linear_interp(xs1, env.bathy_r, env.bathy, env.uniform_bathy_r)
    # out-of-domain flags precomputed on the host in float64: on-device
    # x0 + k*h arithmetic in f32 accumulates ~mm of rounding over 100 km,
    # which can spuriously flag (and kill) the whole fan at a domain-edge
    # receiver; the Pallas kernel has always done this (any_x_oob)
    ks64 = np.arange(nsteps, dtype=np.float64)
    oob_step = jnp.asarray(
        (x0 + ks64 * h < rlo - btol) | (x0 + (ks64 + 1.0) * h > rhi + btol)
    )

    data = {"x0": xs0, "b0": b0s, "b1": b1s, "oob": oob_step}
    if env.range_dependent:
        ctab, cptab = _profile_tabs(env, use_cheb, use_pow, use_seg)

        def blend_rows(x):
            i = interval_index(x, env.r, env.uniform_r)
            w = (x - env.r[i]) / (env.r[i + 1] - env.r[i])
            w = w.reshape(w.shape + (1,) * (ctab.ndim - 1))
            return (
                (1.0 - w) * ctab[i] + w * ctab[i + 1],
                (1.0 - w) * cptab[i] + w * cptab[i + 1],
            )

        data["prof_m"] = blend_rows(xsm)
        data["prof_1"] = blend_rows(xs1)

    def seg_reshape(leaf):
        return leaf.reshape((nseg, sps) + leaf.shape[1:])

    data = jax.tree_util.tree_map(seg_reshape, data)

    prof_static = None if env.range_dependent else _station_profile(
        env, use_cheb, jnp.asarray(x0, dtype), use_pow, use_seg)

    # ---- initial state ---------------------------------------------------
    prof0 = prof_static if prof_static is not None else _station_profile(
        env, use_cheb, jnp.asarray(x0, dtype), use_pow, use_seg)
    kT0, kz0, kp0, c_src = rhs(prof0, z0, p0)
    alive0 = (z0 >= zlo - btol) & (z0 <= zhi + btol)
    death0 = jnp.where(alive0, 0, 2).astype(jnp.int32)

    carry0 = dict(
        T=jnp.zeros(B, dtype),
        Tc=jnp.zeros(B, dtype),
        z=z0,
        zc=jnp.zeros(B, dtype),
        p=p0,
        kT=kT0,
        kz=kz0,
        kp=kp0,
        alive=alive0,
        n_surf=jnp.zeros(B, jnp.int32),
        n_bott=jnp.zeros(B, jnp.int32),
        death=death0,
    )

    def step(carry, d):
        T, Tc, z, zc, p = carry["T"], carry["Tc"], carry["z"], carry["zc"], carry["p"]
        kT1, kz1, kp1 = carry["kT"], carry["kz"], carry["kp"]
        alive = carry["alive"]
        if env.range_dependent:
            prof_m = d["prof_m"]
            prof_1 = d["prof_1"]
        else:
            prof_m = prof_static
            prof_1 = prof_static

        # -- RK4 step (k1 carried from previous step's end derivative) ----
        kT2, kz2, kp2, _ = rhs(prof_m, z + 0.5 * hs * kz1, p + 0.5 * hs * kp1)
        kT3, kz3, kp3, _ = rhs(prof_m, z + 0.5 * hs * kz2, p + 0.5 * hs * kp2)
        kT4, kz4, kp4, _ = rhs(prof_1, z + hs * kz3, p + hs * kp3)
        dT = hs / 6.0 * (kT1 + 2 * kT2 + 2 * kT3 + kT4)
        dz = hs / 6.0 * (kz1 + 2 * kz2 + 2 * kz3 + kz4)
        dp = hs / 6.0 * (kp1 + 2 * kp2 + 2 * kp3 + kp4)
        z1 = z + dz
        p1 = p + dp

        # -- boundary crossing detection ----------------------------------
        b0 = d["b0"]
        b1 = d["b1"]
        surf = (z1 < 0.0) & (z >= 0.0)
        bott = (z1 > b1) & (z <= b0)
        cross = alive & (surf | bott)

        # -- localize the crossing inside the step (cubic Hermite in s) ---
        bnd0 = jnp.where(surf, 0.0, b0)
        bnd1 = jnp.where(surf, 0.0, b1)
        db = bnd1 - bnd0
        mz0 = hs * kz1
        mz1 = hs * kz4
        g0 = z - bnd0
        g1 = z1 - bnd1
        f = g0 / jnp.where(jnp.abs(g0 - g1) > _TINY, g0 - g1, 1.0)
        f = jnp.clip(f, 0.0, 1.0)
        for _ in range(2):  # Newton refinement on the Hermite cubic
            G = _hermite(f, z, z1, mz0, mz1) - (bnd0 + f * db)
            Gp = _hermite_d(f, z, z1, mz0, mz1) - db
            f = jnp.clip(f - G / jnp.where(jnp.abs(Gp) > _TINY, Gp, 1.0), 0.0, 1.0)

        # -- state at the crossing ----------------------------------------
        t_off = _hermite(f, jnp.zeros_like(dT), dT, hs * kT1, hs * kT4)
        z_c = _hermite(f, z, z1, mz0, mz1)
        p_c = _hermite(f, p, p1, hs * kp1, hs * kp4)
        x_c = d["x0"] + f * hs

        # -- reflect (transcendental-free; see _make_bangle) ---------------
        c_c = ev_c(prof_m, z_c)
        sin_th = jnp.clip(p_c * c_c, -1.0, 1.0)
        cos_th = jnp.sqrt(jnp.maximum(1.0 - sin_th * sin_th, 0.0))
        s2b, c2b = sincos2b(x_c)
        p_ref = jnp.where(surf, -p_c, (s2b * cos_th - c2b * sin_th) / c_c)
        if settings.terminate_backwards:
            # |2β - θ| > 90°  ⇔  cos(2β - θ) < 0; small epsilon so the
            # degenerate vertical-ray case (cos θ = 0 exactly) is not
            # misclassified by angle-table roundoff — it dies as vertical
            back_dead = cross & bott & (c2b * cos_th + s2b * sin_th < -1e-9)
        else:
            back_dead = jnp.zeros_like(cross)

        # -- re-integrate the remainder of the step from the crossing -----
        # (Heun: the remainder is at most one step long and starts on the
        # boundary, so second order there is far below the RK4 step error)
        hr = (1.0 - f) * hs
        rT1, rz1, rp1, _ = rhs(prof_m, z_c, p_ref)
        rT2, rz2, rp2, _ = rhs(prof_1, z_c + hr * rz1, p_ref + hr * rp1)
        dT_fix = t_off + hr * 0.5 * (rT1 + rT2)
        z_fix = z_c + hr * 0.5 * (rz1 + rz2)
        p_fix = p_ref + hr * 0.5 * (rp1 + rp2)

        # -- merge ---------------------------------------------------------
        use_fix = cross & (~back_dead)
        dT_tot = jnp.where(use_fix, dT_fix, dT)
        dz_tot = jnp.where(use_fix, z_fix - z, dz)
        p_new = jnp.where(use_fix, p_fix, p1)

        upd = alive
        if settings.kahan:
            T_n, Tc_n = _kahan_add(T, Tc, jnp.where(upd, dT_tot, 0.0))
            z_n, zc_n = _kahan_add(z, zc, jnp.where(upd, dz_tot, 0.0))
        else:
            T_n, Tc_n = T + jnp.where(upd, dT_tot, 0.0), Tc
            z_n, zc_n = z + jnp.where(upd, dz_tot, 0.0), zc
        p_n = jnp.where(upd, p_new, p)

        # -- end-of-step derivative (next step's k1) + death checks -------
        kTe, kze, kpe, c_e = rhs(prof_1, z_n, p_n)
        vert = jnp.abs(c_e * p_n) > sin_lim
        oob = (z_n > zhi + btol) | (z_n < zlo - btol) | d["oob"]
        newly = alive & (vert | oob | back_dead)
        alive_n = alive & ~newly
        death = carry["death"]
        death = jnp.where(
            alive & back_dead, 3, jnp.where(alive & vert, 1, jnp.where(alive & oob, 2, death))
        ).astype(jnp.int32)

        n_surf = carry["n_surf"] + (cross & surf & upd).astype(jnp.int32)
        n_bott = carry["n_bott"] + (cross & bott & upd).astype(jnp.int32)

        new_carry = dict(
            T=T_n,
            Tc=Tc_n,
            z=z_n,
            zc=zc_n,
            p=p_n,
            kT=jnp.where(upd, kTe, carry["kT"]),
            kz=jnp.where(upd, kze, carry["kz"]),
            kp=jnp.where(upd, kpe, carry["kp"]),
            alive=alive_n,
            n_surf=n_surf,
            n_bott=n_bott,
            death=death,
        )
        return new_carry, None

    def segment(carry, seg_data):
        carry, _ = lax.scan(step, carry, seg_data)
        # compensated readout: comp holds the amount the running value
        # OVERSHOT the true sum, so the corrected value is val - comp
        out = (carry["T"] - carry["Tc"], carry["z"] - carry["zc"], carry["p"], carry["alive"])
        return carry, out

    carry, (ts_seg, zs_seg, ps_seg, alive_seg) = lax.scan(segment, carry0, data)

    # assemble save-grid arrays: initial state + one point per segment
    rs = x0 + (x1 - x0) * jnp.arange(nseg + 1, dtype=dtype) / nseg
    ts = jnp.concatenate([jnp.zeros((1, B), dtype), ts_seg], axis=0).T
    zs = jnp.concatenate([z0[None, :], zs_seg], axis=0).T
    ps = jnp.concatenate([p0[None, :], ps_seg], axis=0).T
    alive_save = jnp.concatenate([alive0[None, :], alive_seg], axis=0).T

    return TraceResult(
        rs=rs,
        ts=ts,
        zs=zs,
        ps=ps,
        n_bott=carry["n_bott"],
        n_surf=carry["n_surf"],
        alive=carry["alive"],
        alive_save=alive_save,
        death_code=carry["death"],
    )


def trace(
    env: EnvData,
    z0,
    p0,
    x0: float,
    x1: float,
    num_save: int,
    settings: SolverSettings = SolverSettings(),
    calm=None,
    dyn=None,
    hot=None,
) -> TraceResult:
    """Trace a batch of rays from range ``x0`` to ``x1`` (x1 > x0).

    ``z0`` is the source depth (scalar or (B,)); ``p0`` the initial ray
    parameters sin(θ)/c in the ODE convention (positive down).  States are
    saved on ``num_save`` equally spaced ranges; the final point is the
    exact end state (the whole grid holds exact integration states here —
    an upgrade over the reference's dense-output interpolation,
    `/root/reference/src/pygenray/launch_rays.py:745-784`).

    ``calm`` optionally supplies a precomputed calm-block range
    (`ops.pallas_stepper.classify_calm`) for callers that jit around
    trace() — classification needs concrete launch parameters, so it
    cannot run on traced ``p0``.  ``dyn`` likewise supplies a precomputed
    dynamic-window table (`ops.pallas_stepper.classify_dyn`,
    ``settings.dyn_calm``) for the kernel path, and ``hot`` a precomputed
    hot-block decision (`ops.pallas_stepper.classify_hot`, a static bool
    — it selects which kernel variant compiles for the non-calm blocks).
    """
    if not x1 > x0:
        raise ValueError("trace requires x1 > x0; mirror the environment for backwards shots")
    h, sps, nseg = _plan(float(x0), float(x1), int(num_save), settings.dx)
    geom = (float(x0), float(x1), float(h), int(sps), int(nseg))
    sharded = (
        isinstance(p0, jax.Array)
        and getattr(p0, "sharding", None) is not None
        and len(p0.sharding.device_set) > 1
    )

    pallas_ok = False
    on_tpu = jax.default_backend() == "tpu"
    if settings.backend != "xla":
        from .ops.pallas_stepper import pallas_supported

        pallas_ok = pallas_supported(env, settings, _use_cheb(env, settings))
        if settings.backend == "pallas" and not pallas_ok:
            raise ValueError("Pallas backend unsupported for this configuration")
        pallas_ok = pallas_ok and (on_tpu or settings.backend == "pallas")
        if pallas_ok:
            # differentiating or vmapping through trace(): the kernel's DMA
            # machinery has no batching rule, and env tangents have no
            # kernel — those fall back to the XLA scan, which transforms
            # fine (same math, interpret-tested equal).  But a derivative
            # over the LAUNCH parameters (jax.jvp/jacfwd/grad of travel
            # times vs p0 and/or the source depth — the tomography and
            # localization sensitivities) routes through a custom_jvp
            # whose rule launches the forward-tangent kernel
            # (``trace_pallas_tangent_save``): primal + tangent in one
            # launch per seeded direction.  Plain jit tracing
            # (DynamicJaxprTracer) keeps the kernel: pallas_call is
            # jit-traceable.
            from jax.interpreters.partial_eval import DynamicJaxprTracer

            env_leaves = jax.tree_util.tree_leaves(env)
            bad = [
                x
                for x in (p0, z0, *env_leaves)
                if isinstance(x, jax.core.Tracer)
                and type(x) is not DynamicJaxprTracer
            ]
            if bad:
                from .ops.pallas_stepper import tangent_supported

                env_clean = not any(
                    isinstance(x, jax.core.Tracer)
                    and type(x) is not DynamicJaxprTracer
                    for x in env_leaves
                )
                if (
                    not sharded
                    and env_clean
                    and all(type(x) in _AD_TRACER_TYPES for x in bad)
                    and tangent_supported(env, settings, _use_cheb(env, settings))
                ):
                    p0j = jnp.asarray(p0)
                    p0j = p0j[None] if p0j.ndim == 0 else p0j
                    return _traced_pallas(geom, settings, env, z0, p0j)
                pallas_ok = False

    if sharded:
        if pallas_ok:
            from .ops.pallas_stepper import shardable_pallas, trace_pallas_sharded

            z0a = jnp.asarray(z0, env.c.dtype)
            if shardable_pallas(p0, z0a):
                # per-device mega-kernel launches under shard_map: sharded
                # fans keep the kernel's throughput instead of falling back
                # to the XLA scan (``calm`` here is the per-shard
                # (n_shards, 4) table from classify_calm_sharded)
                return trace_pallas_sharded(
                    env, z0, p0, geom, settings, interpret=not on_tpu,
                    calm=calm, dyn=dyn,
                )
        return _trace_impl_cached(env, z0, p0, geom, settings)

    if pallas_ok:
        from .ops.pallas_stepper import trace_pallas_cached

        # interpreter mode off-TPU for testing.  Identity-preserving 1-D
        # coercion: jnp.atleast_1d mints a NEW Array object per call even
        # for (B,) inputs, which would churn the id-keyed calm-classification
        # cache (one ~70 ms host reclassify + p0 D2H per trace on the
        # tunnel); jnp.asarray on a matching jax array is the same object.
        p0 = jnp.asarray(p0)
        p0 = p0[None] if p0.ndim == 0 else p0
        return trace_pallas_cached(
            env, z0, p0, geom, settings, interpret=not on_tpu, calm=calm,
            dyn=dyn, hot=hot,
        )

    p0 = jnp.atleast_1d(jnp.asarray(p0))
    return _trace_impl_cached(env, z0, p0, geom, settings)


_XLA_JIT_CACHE = LRUCache(128)


def _trace_impl_cached(env, z0, p0, geom, settings):
    """Memoized jitted launcher keyed on the environment *structure*
    (treedef + leaf shapes/dtypes), so same-shaped environments — eigenray
    iterations, Monte-Carlo realizations — share one executable.  The
    environment is a runtime argument, never baked into the closure."""
    z0a = jnp.asarray(z0, env.c.dtype)
    key = (env_struct_key(env), geom, settings, p0.shape, z0a.shape)
    fn = _XLA_JIT_CACHE.get(key)
    if fn is None:
        fn = jax.jit(lambda e, p, z: _trace_impl(e, z, p, geom, settings))
        _XLA_JIT_CACHE.put(key, fn)
    return fn(env, p0, z0a)


# ---------------------------------------------------------------------------
# custom JVP on the traced Pallas path: jax.jvp / jax.jacfwd / jax.grad over
# the launch parameters hit the forward-tangent kernel instead of silently
# falling back to a jvp through the XLA scan
# ---------------------------------------------------------------------------


def _ad_tracer_types():
    """Tracer classes that mean "differentiating over this value": JVPTracer
    (jvp/jacfwd) and LinearizeTracer (grad/linearize — a private class in
    current JAX, so probe defensively)."""
    from jax.interpreters.ad import JVPTracer

    types = [JVPTracer]
    try:
        from jax._src.interpreters.ad import LinearizeTracer

        types.append(LinearizeTracer)
    except ImportError:  # pragma: no cover - older/newer jax layouts
        pass
    return tuple(types)


_AD_TRACER_TYPES = _ad_tracer_types()


@partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _traced_pallas(geom, settings, env, z0, p0):
    from .ops.pallas_stepper import trace_pallas

    on_tpu = jax.default_backend() == "tpu"
    return trace_pallas(env, z0, p0, geom, settings, interpret=not on_tpu)


def _traced_pallas_jvp(geom, settings, primals, tangents):
    """JVP rule: ``trace_pallas_tangent_save`` launches with UNIT tangents
    yield the whole diagonal d(state)/dp0 and d(state)/dz0 structure (each
    ray's trajectory depends only on its own launch parameter and source
    depth), and the user tangents enter linearly —
    ``d_out = Dp ⊙ dp0 + Dz ⊙ dz0`` — which keeps the rule transposable,
    so reverse mode (``jax.grad``) rides the same kernel.  One launch per
    seeded direction: the common single-direction case costs exactly one.
    Tangents on the environment (or higher-order traces) fall back to a
    jvp through the XLA scan, Kahan off as everywhere under AD."""
    import dataclasses as _dc

    from jax.custom_derivatives import SymbolicZero
    from jax.interpreters.partial_eval import DynamicJaxprTracer

    env, z0, p0 = primals
    denv, dz0, dp0 = tangents

    def _sz(t):
        return isinstance(t, SymbolicZero)

    env_zero = all(_sz(t) for t in jax.tree_util.tree_leaves(denv, is_leaf=_sz))
    prim_ok = not any(
        isinstance(x, jax.core.Tracer) and type(x) is not DynamicJaxprTracer
        for x in jax.tree_util.tree_leaves((env, z0, p0))
    )

    if env_zero and prim_ok:
        from .ops.pallas_stepper import trace_pallas_tangent_save

        on_tpu = jax.default_backend() == "tpu"
        res = None
        dts = dzs = dps = 0.0
        if not _sz(dp0):
            res, (Dt, Dz, Dp) = trace_pallas_tangent_save(
                env, z0, p0, jnp.ones_like(p0), geom, settings,
                interpret=not on_tpu,
            )
            col = dp0[:, None]
            dts, dzs, dps = Dt * col, Dz * col, Dp * col
        if not _sz(dz0):
            res_z, (Dt, Dz, Dp) = trace_pallas_tangent_save(
                env, z0, p0, jnp.zeros_like(p0), geom, settings,
                interpret=not on_tpu, dz0=1.0,
            )
            res = res_z if res is None else res
            col = jnp.broadcast_to(
                jnp.asarray(dz0, Dt.dtype), p0.shape
            )[:, None]
            dts = dts + Dt * col
            dzs = dzs + Dz * col
            dps = dps + Dp * col
        if res is None:  # both tangents symbolically zero
            from .ops.pallas_stepper import trace_pallas

            res = trace_pallas(env, z0, p0, geom, settings,
                               interpret=not on_tpu)
            dts = dzs = dps = jnp.zeros_like(res.ts)

        def _f0(x):
            import numpy as _onp

            return _onp.zeros(_onp.shape(x), jax.dtypes.float0)

        t_out = TraceResult(
            rs=jnp.zeros_like(res.rs),
            ts=dts, zs=dzs, ps=dps,
            n_bott=_f0(res.n_bott), n_surf=_f0(res.n_surf),
            alive=_f0(res.alive), alive_save=_f0(res.alive_save),
            death_code=_f0(res.death_code),
        )
        return res, t_out

    s_ad = _dc.replace(settings, backend="xla", kahan=False)

    def _mat(prim, tang):
        return jnp.zeros_like(prim) if _sz(tang) else tang

    tang_m = jax.tree_util.tree_map(_mat, (env, z0, p0), (denv, dz0, dp0))
    return jax.jvp(
        lambda e, z, p: _trace_impl(e, z, p, geom, s_ad),
        (env, z0, p0), tang_m,
    )


_traced_pallas.defjvp(_traced_pallas_jvp, symbolic_zeros=True)
