"""Pallas TPU mega-kernel: the whole ray integration loop in one launch.

The XLA scan path compiles each range step into several fused kernels; at
~20-30 µs launch overhead each, a 500-2000-step trace pays a fixed
~0.1 ms/step regardless of batch size — half the wall time at B ~ 1e5.
This kernel runs *every* step of *every* segment inside a single
``pallas_call``: ray state lives in VMEM scratch the whole time, per-step
work is pure VPU arithmetic, and segment-boundary saves are DMA'd to HBM.

Supported configurations (falls back to the XLA path otherwise):
- piecewise-SEGMENT profiles (rough fields, ``ops/seg.py``): per-lane
  segment pick + local Horner via Mosaic's single-tile lane gather
  (``take_along_axis``) — range-independent via (K, 128) VMEM tables,
  range-dependent by keeping the full (nr, K, 128) station tables in VMEM
  and blending the two bracketing stations into a scratch tile once per
  step (station index/weights ride in SMEM),
- spectral (Chebyshev) profiles, range-independent or range-dependent —
  for the latter the per-step blended station coefficients are precomputed
  outside the kernel (same values as the XLA path's scan inputs), packed
  as scalar rows, DMA'd into SMEM per step (double-buffered) and consumed
  as scalars that broadcast against the ray lanes for free — 128x less
  DMA traffic than lane-replicated VMEM planes,
- constant-slope or Chebyshev bottom-angle models (no spline gathers).

The step math mirrors ``integrate._trace_impl`` exactly (RK4 + FSAL carry,
cubic-Hermite crossing localization, transcendental-free reflections, Heun
remainder, Kahan-compensated T/z, alive-masks with death codes); the test
suite checks equivalence in interpret mode.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ops.seg import SEG_S
from ..utils.cache import LRUCache, env_struct_key

_TINY = 1e-30

# station-table DMA block width (steps per DMA): producer padding
# (_station_rows callers) and consumer slicing (_station_step_handles)
# MUST use this one constant — a desync presents as a hardware hang.
ST_BLOCK_W = 8


def seg_kernel_ok(env, settings) -> bool:
    """True when the piecewise-segment kernel mode can run this env:
    the segment fit exists and is selected, and (range-dependent case)
    the full station tables fit comfortably in VMEM alongside the ray
    state, with the per-step index/weight rows within SMEM reach."""
    from ..integrate import _use_seg

    try:
        if not _use_seg(env, settings):
            return False
    except ValueError:
        return False
    if env.range_dependent:
        nr, Ks, S = env.c_seg.shape
        if 2 * nr * Ks * S * 4 > 6 * 1024 * 1024:  # c + dcdz tables in VMEM
            return False
    return True


def pallas_supported(env, settings, use_cheb: bool) -> bool:
    return (
        (use_cheb or seg_kernel_ok(env, settings))
        and env.bangle_mode in ("const", "cheb")
        and env.c.dtype == jnp.float32  # Mosaic has no f64 path
    )


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


def _clenshaw(u, read, K):
    """Clenshaw recurrence with coefficients supplied by ``read(k)``.

    ``read`` returns either a (128,) lane-replicated VMEM row (each
    iteration a memory row load — Mosaic handles those at any sublane,
    never an extract from a register vector, whose broadcast layouts are
    unsupported) or an SMEM scalar (broadcast against the vector operand
    for free).  Both give bitwise-identical results; SMEM rows make
    range-dependent station tables 128x smaller.
    """
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for k in range(K - 1, 0, -1):
        b1, b2 = read(k) + 2.0 * u * b1 - b2, b1
    return read(0) + u * b1 - b2


def _horner(u, read, K):
    """Monomial Horner with coefficients supplied by ``read(k)`` — half the
    ops of Clenshaw (1 fma/term).  Used when the environment's fits pass
    the f32 monomial-conditioning guard (``EnvData.poly_ok``)."""
    acc = jnp.zeros_like(u) + read(K - 1)
    for k in range(K - 2, -1, -1):
        acc = acc * u + read(k)
    return acc


def _poly_fn(use_pow: bool):
    return _horner if use_pow else _clenshaw


def _seg_horner(read, K, seg, u):
    """Local-u Horner with per-lane segment coefficient picks.

    ``read(k)`` returns the (128,) lane=segment coefficient row; each term
    costs one single-tile ``take_along_axis`` (Mosaic dynamic_gather —
    measured at scalar-Horner throughput) plus one fma."""
    def pick(k):
        row = jnp.broadcast_to(read(k)[None, :], seg.shape)
        return jnp.take_along_axis(row, seg, axis=-1)

    acc = jnp.zeros_like(u) + pick(K - 1)
    for k in range(K - 2, -1, -1):
        acc = acc * u + pick(k)
    return acc


def _seg_clenshaw(read, K, seg, u):
    """Local-u Clenshaw with per-lane segment coefficient picks — the
    "cheb" segment basis (high-order rungs; the local monomial conversion
    is f32-catastrophic above K≈24, Clenshaw is stable at any order)."""
    def pick(k):
        row = jnp.broadcast_to(read(k)[None, :], seg.shape)
        return jnp.take_along_axis(row, seg, axis=-1)

    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for k in range(K - 1, 0, -1):
        b1, b2 = pick(k) + 2.0 * u * b1 - b2, b1
    return pick(0) + u * b1 - b2


def _seg_poly_fn(use_seg):
    """Segment evaluator by the ``use_seg`` const: 1 = "pow" (Horner),
    2 = "cheb" (Clenshaw)."""
    return _seg_clenshaw if use_seg == 2 else _seg_horner


def _vmem_reader(ref, pre=()):
    return lambda k: ref[(*pre, k)]


def _launch_consts(env, settings, x0, h, nsteps, rd, use_pow,
                   use_seg=False):
    """The static per-launch constants tuple shared by every kernel, plus
    the per-step x-out-of-domain flags precomputed on the host in float64
    (on-device f32 x0 + k*h arithmetic carries ~mm of rounding over 100 km
    — far above bbox_tol — and must never decide domain-exit deaths).

    ONE builder for all four launchers: the 18-field tuple is destructured
    positionally in the kernel factories, so constructing it in one place
    is what keeps a reorder from silently misbinding adjacent fields.
    """
    zlo, zhi = env.z_dom
    rlo, rhi = env.r_dom
    sc = 2.0 / (zhi - zlo)
    off = (zlo + zhi) / (zhi - zlo)
    sin_lim = math.sin(math.radians(settings.vertical_limit_deg))
    b = math.radians(env.bangle_const)
    ks64 = np.arange(nsteps, dtype=np.float64)
    xoob = ((x0 + ks64 * h < rlo - settings.bbox_tol)
            | (x0 + (ks64 + 1.0) * h > rhi + settings.bbox_tol))
    any_x_oob = bool(xoob.any())
    consts = (
        zlo, zhi, sc, off, sin_lim, settings.bbox_tol, rlo, rhi,
        math.sin(2 * b), math.cos(2 * b), env.bangle_mode,
        env.bathy_r_dom[0], env.bathy_r_dom[1],
        settings.terminate_backwards, any_x_oob, rd, use_pow,
        bool(settings.kahan),
        # seg mode: 0 = off, 1 = "pow" basis (Horner), 2 = "cheb" basis
        # (Clenshaw) — truthy exactly when the segment backend is active
        (0 if not use_seg else (2 if env.seg_basis == "cheb" else 1)),
    )
    return consts, xoob


def _station_step_handles(k, STW, nblk, st_dma_blk, st_handle, KP):
    """Enter step k's station block: on a block boundary, prefetch the next
    W-step block (double-buffered) and wait for this one; return the
    (mid-step, end-step) coefficient handles.  Shared by the mega-kernel's
    two step bodies and the tangent kernels so the DMA discipline cannot
    drift between them (a desynced start/wait presents as a hardware hang).
    """
    jb = lax.div(k, STW)
    row = lax.rem(k, STW)
    slot = lax.rem(jb, 2)

    @pl.when(row == 0)
    def _():
        @pl.when(jb + 1 < nblk)
        def _():
            st_dma_blk(jb + 1, 1 - slot).start()
        st_dma_blk(jb, slot).wait()

    return st_handle(slot, row, 0), st_handle(slot, row, 2 * KP)


def _make_kernel(geom, consts, K, KP, Kb, R, nseg, sps, STW=ST_BLOCK_W,
                 dyn=False, hot=False):
    x0g, x1g, h = geom
    (zlo, zhi, sc, off, sin_lim, btol, rlo, rhi, s2b_c, c2b_c, bangle_mode,
     b_rlo, b_rhi, term_back, any_x_oob, rd, use_pow, use_kahan,
     use_seg) = consts

    _nblk = -(-(nseg * sps) // STW)

    def kernel(
        calm_ref, dyn_ref,
        p0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref, b0s_ref, b1s_ref,
        xoob_ref, st_tab_ref, stiw_ref,
        ts_out, zs_out, ps_out, nsurf_out, nbott_out, death_out, dseg_out,
        T_s, Tc_s, z_s, zc_s, p_s, kT_s, kz_s, kp_s, al_s, ns_s, nb_s, de_s,
        ds_s, bd_s, stage_s, st_s, sti_s, sem, stsem, stisem, stb_s, cnt_s,
    ):
        ib = pl.program_id(0)

        # station handle: (read_c, read_cp) coefficient readers; the
        # evaluator is Horner on monomial rows when poly_ok, Clenshaw
        # otherwise — or, in segment mode, per-lane gathered local Horner
        # (readers then return lane=segment rows; keep the arithmetic in
        # lockstep with integrate._make_eval's seg branch)
        _poly = _poly_fn(use_pow)

        if use_seg:
            S_f = float(SEG_S)
            seg_hinv = S_f / (zhi - zlo)
            _seg_poly = _seg_poly_fn(use_seg)

            def _seg_coords(zq):
                t = jnp.clip((zq - zlo) * seg_hinv, 0.0, S_f)
                segf = jnp.minimum(jnp.floor(t), S_f - 1.0)
                return segf.astype(jnp.int32), 2.0 * (t - segf) - 1.0

            def ev(st, zq):
                rc, rcp = st
                seg, u = _seg_coords(zq)
                return (_seg_poly(rc, K, seg, u),
                        _seg_poly(rcp, K, seg, u))

            def ev_c(st, zq):
                rc, _ = st
                seg, u = _seg_coords(zq)
                return _seg_poly(rc, K, seg, u)

            def blend_station(dst, i, w):
                # blend the two bracketing station tiles into the scratch
                # planes once per step (dst, dst+1 = c, dcdz); dynamic
                # leading-dim VMEM reads of the resident (nr, K, 128)
                # tables
                for kk in range(K):
                    stb_s[dst, kk] = ((1.0 - w) * ccoef_ref[i, kk]
                                      + w * ccoef_ref[i + 1, kk])
                    stb_s[dst + 1, kk] = ((1.0 - w) * cpcoef_ref[i, kk]
                                          + w * cpcoef_ref[i + 1, kk])
        else:

            def ev(st, zq):
                rc, rcp = st
                u = jnp.clip(sc * zq - off, -1.0, 1.0)
                return _poly(u, rc, K), _poly(u, rcp, K)

            def ev_c(st, zq):
                rc, _ = st
                u = jnp.clip(sc * zq - off, -1.0, 1.0)
                return _poly(u, rc, K)

        def rhs(st, zq, pq):
            c, cp = ev(st, zq)
            cp2 = c * pq
            inv_s = lax.rsqrt(jnp.maximum(1.0 - cp2 * cp2, _TINY))
            invc = 1.0 / c
            return inv_s * invc, cp2 * inv_s, -cp * inv_s * invc * invc, c

        def st_dma_blk(j, slot):
            # station rows ride in W-step blocks: row 0 of st_tab is the
            # init (x0) planes, rows 1+jW..1+jW+W hold steps jW..jW+W-1's
            # blended planes [c_m | cp_m | c_1 | cp_1], each KP scalars.
            # One DMA + one wait per W steps instead of per step (the
            # per-row issue/wait overhead measured ~2 us/step).
            return pltpu.make_async_copy(
                st_tab_ref.at[pl.ds(1 + j * STW, STW)],
                st_s.at[slot], stsem.at[slot],
            )

        def st_handle(slot, row, base):
            return (
                lambda j: st_s[slot, row, 0, base + j],
                lambda j: st_s[slot, row, 0, base + KP + j],
            )

        # ---- init -------------------------------------------------------
        if rd and use_seg:
            blend_station(0, stiw_ref[0, 0].astype(jnp.int32), stiw_ref[0, 1])
            st_init = (lambda j: stb_s[0, j], lambda j: stb_s[1, j])
        elif rd:
            cp0 = pltpu.make_async_copy(st_tab_ref.at[0], sti_s, stisem)
            cp0.start()
            cp0.wait()
            st_init = (
                lambda j: sti_s[0, j],
                lambda j: sti_s[0, KP + j],
            )
            st_dma_blk(0, 0).start()  # prefetch the first W-step block
        else:
            st_init = (_vmem_reader(ccoef_ref), _vmem_reader(cpcoef_ref))
        z0 = z0_ref[0]
        p0 = p0_ref[0]
        kT, kz, kp, _ = rhs(st_init, z0, p0)
        T_s[...] = jnp.zeros_like(z0)
        Tc_s[...] = jnp.zeros_like(z0)
        z_s[...] = z0
        zc_s[...] = jnp.zeros_like(z0)
        p_s[...] = p0
        kT_s[...] = kT
        kz_s[...] = kz
        kp_s[...] = kp
        alive0 = (z0 >= zlo - btol) & (z0 <= zhi + btol)
        al_s[...] = alive0.astype(jnp.float32)
        ns_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        nb_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        de_s[...] = jnp.where(alive0, 0, 2).astype(jnp.int32)

        def save(row, a, b, c):
            stage_s[0] = a
            stage_s[1] = b
            stage_s[2] = c
            # per-save aliveness as the first save index at which the ray is
            # dead (monotone: dead rays stay dead) — one int per ray, DMA'd
            # once at the end instead of a per-segment copy
            ds_s[...] = jnp.minimum(
                ds_s[...],
                jnp.where(al_s[...] > 0.5, nseg + 1, row).astype(jnp.int32),
            )
            cps = [
                pltpu.make_async_copy(stage_s.at[i], out.at[row, ib], sem.at[i])
                for i, out in enumerate((ts_out, zs_out, ps_out))
            ]
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

        ds_s[...] = jnp.full_like(ns_s[...], nseg + 1)
        save(0, T_s[...], z_s[...], p_s[...])

        hs = jnp.float32(h)

        # ``calm`` (static) elides the whole event apparatus: blocks in the
        # launcher-classified calm range hold only rays whose Snell turning
        # depths are bounded away from both boundaries, so their steps need
        # no crossing predicates and — critically — no ``jnp.any(cross)``
        # vector->scalar reduction, whose per-step sync is what even the
        # DORMANT event branch costs (measured 24% sustained on an
        # all-ducted fan: 19.1 vs 15.4M rays/s).  A classifier miss cannot
        # go silent: calm blocks die with death code 5 the moment a ray
        # enters the launcher's guard band, which sits strictly inside the
        # classified-safe region — before any un-reflected step is taken.
        def _make_step(calm, gb=None, hot=False):
          # ``gb`` supplies the calm guard-band bounds (a thunk returning
          # (lo, hi)); default reads the launcher-classified band from
          # calm_ref, the dynamic-window body reads its block row instead.
          # ``hot`` (static, non-calm blocks only) runs the crossing fix
          # UNconditionally: blocks whose rays bounce nearly every step
          # (classify_hot) pay the event arithmetic anyway, so the
          # per-step any(cross) vector->scalar reduction and the duplicate
          # plain update are pure overhead there.  The fix's where()
          # merges reduce to the plain update on non-crossing lanes, so
          # results are bitwise identical on hardware (same guarantee the
          # calm/event equivalence gate checks).
          if gb is None:
              gb = lambda: (calm_ref[2], calm_ref[3])

          def step_body(k, _):
            T = T_s[...]
            Tc = Tc_s[...]
            z = z_s[...]
            zc = zc_s[...]
            p = p_s[...]
            kT1 = kT_s[...]
            kz1 = kz_s[...]
            kp1 = kp_s[...]
            alive = al_s[...] > 0.5

            if rd and use_seg:
                blend_station(0, stiw_ref[1 + k, 0].astype(jnp.int32),
                              stiw_ref[1 + k, 1])
                blend_station(2, stiw_ref[1 + k, 2].astype(jnp.int32),
                              stiw_ref[1 + k, 3])
                st_m = (lambda j: stb_s[0, j], lambda j: stb_s[1, j])
                st_1 = (lambda j: stb_s[2, j], lambda j: stb_s[3, j])
            elif rd:
                st_m, st_1 = _station_step_handles(
                    k, STW, _nblk, st_dma_blk, st_handle, KP
                )
            else:
                st_m = st_1 = (_vmem_reader(ccoef_ref), _vmem_reader(cpcoef_ref))

            kf = k.astype(jnp.float32)
            x0 = x0g + kf * hs
            b0 = b0s_ref[k]
            b1 = b1s_ref[k]

            # RK4 (k1 carried)
            kT2, kz2, kp2, _ = rhs(st_m, z + 0.5 * hs * kz1, p + 0.5 * hs * kp1)
            kT3, kz3, kp3, _ = rhs(st_m, z + 0.5 * hs * kz2, p + 0.5 * hs * kp2)
            kT4, kz4, kp4, _ = rhs(st_1, z + hs * kz3, p + hs * kp3)
            dT = hs / 6.0 * (kT1 + 2 * kT2 + 2 * kT3 + kT4)
            dz = hs / 6.0 * (kz1 + 2 * kz2 + 2 * kz3 + kz4)
            dp = hs / 6.0 * (kp1 + 2 * kp2 + 2 * kp3 + kp4)
            z1 = z + dz
            p1 = p + dp

            if not calm:
                surf = (z1 < 0.0) & (z >= 0.0)
                bott = (z1 > b1) & (z <= b0)
                cross = alive & (surf | bott)
            upd = alive

            # -- plain update first: valid whenever no lane in the block
            # crosses a boundary this step (the common case, so the crossing
            # machinery below runs only when jnp.any(cross)).  Hot blocks
            # skip it: their unconditional fix writes every state lane-wise.
            if calm or not hot:
                dT_m = jnp.where(upd, dT, 0.0)
                dz_m = jnp.where(upd, dz, 0.0)
                if use_kahan:
                    yk = dT_m - Tc
                    T_n0 = T + yk
                    Tc_s[...] = (T_n0 - T) - yk
                    T_s[...] = T_n0
                    yz = dz_m - zc
                    z_n0 = z + yz
                    zc_s[...] = (z_n0 - z) - yz
                    z_s[...] = z_n0
                else:
                    T_s[...] = T + dT_m
                    z_s[...] = z + dz_m
                p_s[...] = jnp.where(upd, p1, p)
            if not calm:
                if not hot:
                    bd_s[...] = jnp.zeros_like(T)

                def _event_fix(sl):
                    # crossing localization, reflection and the Heun remainder,
                    # merged into the carried state; identical expressions to the
                    # unconditional form (where() merges reduce to the plain
                    # update on non-crossing lanes, so results are bitwise equal).
                    # ``sl`` restricts the fix to a row group of the tile
                    # (None = whole tile — the expressions are then exactly
                    # the historical whole-tile body).
                    ix = ... if sl is None else sl
                    g = (lambda v: v) if sl is None else (lambda v: v[sl])
                    surf_, bott_, cross_ = g(surf), g(bott), g(cross)
                    upd_ = g(upd)
                    z_, z1_, p_, p1_ = g(z), g(z1), g(p), g(p1)
                    dT_, dz_ = g(dT), g(dz)
                    T_, Tc_, zc_ = g(T), g(Tc), g(zc)
                    kT1_, kT4_ = g(kT1), g(kT4)
                    kz1_, kz4_ = g(kz1), g(kz4)
                    kp1_, kp4_ = g(kp1), g(kp4)

                    bnd0 = jnp.where(surf_, 0.0, b0)
                    bnd1 = jnp.where(surf_, 0.0, b1)
                    db = bnd1 - bnd0
                    mz0 = hs * kz1_
                    mz1 = hs * kz4_
                    g0 = z_ - bnd0
                    g1 = z1_ - bnd1
                    f = g0 / jnp.where(jnp.abs(g0 - g1) > _TINY, g0 - g1, 1.0)
                    f = jnp.clip(f, 0.0, 1.0)
                    for _i in range(2):
                        G = _hermite(f, z_, z1_, mz0, mz1) - (bnd0 + f * db)
                        Gp = _hermite_d(f, z_, z1_, mz0, mz1) - db
                        f = jnp.clip(
                            f - G / jnp.where(jnp.abs(Gp) > _TINY, Gp, 1.0), 0.0, 1.0
                        )

                    t_off = _hermite(f, jnp.zeros_like(dT_), dT_, hs * kT1_, hs * kT4_)
                    z_c = _hermite(f, z_, z1_, mz0, mz1)
                    p_c = _hermite(f, p_, p1_, hs * kp1_, hs * kp4_)
                    x_c = x0 + f * hs

                    c_c = ev_c(st_m, z_c)
                    sin_th = jnp.clip(p_c * c_c, -1.0, 1.0)
                    cos_th = jnp.sqrt(jnp.maximum(1.0 - sin_th * sin_th, 0.0))
                    if bangle_mode == "const":
                        s2b = s2b_c
                        c2b = c2b_c
                    else:
                        ub = jnp.clip(
                            (2.0 * x_c - (b_rlo + b_rhi)) / (b_rhi - b_rlo), -1.0, 1.0
                        )
                        b2 = 2.0 * jnp.radians(_clenshaw(ub, _vmem_reader(bacoef_ref), Kb))
                        s2b = jnp.sin(b2)
                        c2b = jnp.cos(b2)
                    p_ref = jnp.where(surf_, -p_c, (s2b * cos_th - c2b * sin_th) / c_c)
                    if term_back:
                        back_dead = cross_ & bott_ & (c2b * cos_th + s2b * sin_th < -1e-9)
                    else:
                        back_dead = jnp.zeros_like(cross_)

                    hr = (1.0 - f) * hs
                    rT1, rz1, rp1, _ = rhs(st_m, z_c, p_ref)
                    rT2, rz2, rp2, _ = rhs(st_1, z_c + hr * rz1, p_ref + hr * rp1)
                    dT_fix = t_off + hr * 0.5 * (rT1 + rT2)
                    z_fix = z_c + hr * 0.5 * (rz1 + rz2)
                    p_fix = p_ref + hr * 0.5 * (rp1 + rp2)

                    use_fix = cross_ & (~back_dead)
                    dT_tot = jnp.where(use_fix, dT_fix, dT_)
                    dz_tot = jnp.where(use_fix, z_fix - z_, dz_)
                    p_new = jnp.where(use_fix, p_fix, p1_)

                    dT_m = jnp.where(upd_, dT_tot, 0.0)
                    dz_m = jnp.where(upd_, dz_tot, 0.0)
                    if use_kahan:
                        yk = dT_m - Tc_
                        T_n = T_ + yk
                        Tc_s[ix] = (T_n - T_) - yk
                        T_s[ix] = T_n
                        yz = dz_m - zc_
                        z_n = z_ + yz
                        zc_s[ix] = (z_n - z_) - yz
                        z_s[ix] = z_n
                    else:
                        T_s[ix] = T_ + dT_m
                        z_s[ix] = z_ + dz_m
                    p_s[ix] = jnp.where(upd_, p_new, p_)
                    bd_s[ix] = back_dead.astype(jnp.float32)
                    ns_s[ix] = ns_s[ix] + (cross_ & surf_ & upd_).astype(jnp.int32)
                    nb_s[ix] = nb_s[ix] + (cross_ & bott_ & upd_).astype(jnp.int32)

                if hot:
                    # hot block: some lane crosses nearly every step, so
                    # gate nothing — no any(cross) reduction, no branch
                    _event_fix(None)

                else:

                    @pl.when(jnp.any(cross))
                    def _():
                        _event_fix(None)

            z_n = z_s[...]
            p_n = p_s[...]
            kTe, kze, kpe, c_e = rhs(st_1, z_n, p_n)
            vert = jnp.abs(c_e * p_n) > sin_lim
            death = de_s[...]
            if calm:
                # guard-band audit (death code 5) + host x-domain exits;
                # the z-domain oob check is subsumed by the strictly
                # tighter guard band
                g_lo, g_hi = gb()
                guard = (z_n > g_hi) | (z_n < g_lo)
                if any_x_oob:
                    xo = xoob_ref[k] > 0.5
                else:
                    xo = jnp.zeros_like(vert)
                newly = alive & (vert | guard | xo)
                death = jnp.where(
                    alive & vert, 1,
                    jnp.where(alive & xo, 2,
                              jnp.where(alive & guard, 5, death)),
                ).astype(jnp.int32)
            else:
                back_dead = bd_s[...] > 0.5
                oob = (z_n > zhi + btol) | (z_n < zlo - btol)
                if any_x_oob:
                    # host-precomputed f64 per-step flags (lockstep with
                    # the XLA scan; on-device f32 range arithmetic must not
                    # decide domain-exit deaths)
                    oob = oob | (xoob_ref[k] > 0.5)
                newly = alive & (vert | oob | back_dead)
                death = jnp.where(
                    alive & back_dead, 3,
                    jnp.where(alive & vert, 1,
                              jnp.where(alive & oob, 2, death)),
                ).astype(jnp.int32)
            alive_n = alive & ~newly

            kT_s[...] = jnp.where(upd, kTe, kT1)
            kz_s[...] = jnp.where(upd, kze, kz1)
            kp_s[...] = jnp.where(upd, kpe, kp1)
            al_s[...] = alive_n.astype(jnp.float32)
            de_s[...] = death
            return 0

          return step_body

        def _make_seg(calm, gb=None, hot=False):
            sb = _make_step(calm, gb, hot)

            def seg_body(seg, _):
                lax.fori_loop(seg * sps, (seg + 1) * sps, sb, 0)
                # compensated readout: val - comp (comp = overshoot)
                save(seg + 1, T_s[...] - Tc_s[...], z_s[...] - zc_s[...],
                     p_s[...])
                return 0

            return seg_body

        # one branch per BLOCK (not per step): blocks inside the calm range
        # run the event-free step, everything else the full event step
        calm_lo = calm_ref[0].astype(jnp.int32)
        calm_hi = calm_ref[1].astype(jnp.int32)
        is_calm = (ib >= calm_lo) & (ib < calm_hi)

        @pl.when(is_calm)
        def _():
            lax.fori_loop(0, nseg, _make_seg(True), 0)

        @pl.when(~is_calm)
        def _():
            if not dyn:
                lax.fori_loop(0, nseg, _make_seg(False, hot=hot), 0)
            else:
                # dynamic calm windows (settings.dyn_calm): after each event
                # segment, the block's min distance D to the audit band
                # [aud_lo, aud_hi] bounds how long any ray needs to reach a
                # boundary — |dz/dx| <= tan(theta_max) with theta_max from
                # the (drift-inflated) Snell invariant (classify_dyn), so
                # the next floor((D - slack)/wstep) segments provably cross
                # nothing and run the event-free body.  Phase-aware where
                # the static range is not: a bouncing block skips the
                # crossing machinery between its bounce clusters.  The
                # audit band sits strictly inside the true boundaries, so
                # a violated bound dies with death code 5, never a missed
                # reflection.
                wstep = dyn_ref[ib, 0]
                slack = dyn_ref[ib, 1]
                aud_lo = dyn_ref[ib, 2]
                aud_hi = dyn_ref[ib, 3]
                en = wstep > 0.0
                seg_evt = _make_seg(False)
                seg_win = _make_seg(True, gb=lambda: (aud_lo, aud_hi))
                cnt_s[0] = 0

                def dyn_body(seg, _):
                    c = cnt_s[0]

                    @pl.when(c > 0)
                    def _():
                        seg_win(seg, 0)
                        cnt_s[0] = c - 1

                    @pl.when(c <= 0)
                    def _():
                        seg_evt(seg, 0)
                        z = z_s[...] - zc_s[...]
                        dist = jnp.minimum(z - aud_lo, aud_hi - z)
                        dist = jnp.where(al_s[...] > 0.5, dist,
                                         jnp.float32(3.4e38))
                        D = jnp.min(dist)
                        n = jnp.where(
                            en,
                            (jnp.minimum(D, jnp.float32(1e9)) - slack)
                            / jnp.maximum(wstep, jnp.float32(1e-9)),
                            0.0,
                        )
                        cnt_s[0] = jnp.clip(n, 0.0, 65536.0).astype(jnp.int32)

                    return 0

                lax.fori_loop(0, nseg, dyn_body, 0)

        nsurf_out[0] = ns_s[...]
        nbott_out[0] = nb_s[...]
        death_out[0] = de_s[...]
        dseg_out[0] = ds_s[...]

    return kernel


# ---------------------------------------------------------------------------
# forward-tangent final-state kernel
#
# Newton eigenray search needs (z_end, dz_end/dp0) per candidate angle every
# iteration; the XLA-scan jvp pays ~5 kernel launches per range step, which
# dominates eigenray latency at small batches.  This kernel advances the
# primal AND one forward tangent through every step in a single launch.  The
# step math is the same event step as the mega-kernel above, written as a
# *pure function* of register values — the tangent arithmetic is derived by
# applying jax.jvp to it inside the kernel trace, never hand-written, so it
# cannot drift from the primal.  Supported: spectral profiles (range-
# independent or range-dependent via DMA'd SMEM station rows; the latter
# optionally with one station table per grid block for Monte-Carlo
# ensembles), const/cheb bottom angle, f32, no Kahan (forward AD
# convention, see adjoint.py).
# ---------------------------------------------------------------------------


def tangent_supported(env, settings, use_cheb: bool) -> bool:
    return (
        use_cheb
        and env.bangle_mode in ("const", "cheb")
        and env.c.dtype == jnp.float32
    )


def _make_step_math(consts, K, Kb, hs):
    """One event step (non-Kahan) as a pure function of register values —
    the shared core of the forward-tangent kernels.  Identical math to the
    mega-kernel's step_body; jax.jvp is applied OVER this function, so the
    tangent arithmetic can never drift from the primal."""
    (zlo, zhi, sc, off, sin_lim, btol, rlo, rhi, s2b_c, c2b_c, bangle_mode,
     b_rlo, b_rhi, term_back, any_x_oob, rd, use_pow, use_kahan,
     use_seg) = consts

    def step_math(rhs, ev, bacoef_read, st_m, st_1, b0, b1, x0f, upd,
                  T, z, p, kT1, kz1, kp1):
        kT2, kz2, kp2, _ = rhs(st_m, z + 0.5 * hs * kz1, p + 0.5 * hs * kp1)
        kT3, kz3, kp3, _ = rhs(st_m, z + 0.5 * hs * kz2, p + 0.5 * hs * kp2)
        kT4, kz4, kp4, _ = rhs(st_1, z + hs * kz3, p + hs * kp3)
        dT = hs / 6.0 * (kT1 + 2 * kT2 + 2 * kT3 + kT4)
        dz = hs / 6.0 * (kz1 + 2 * kz2 + 2 * kz3 + kz4)
        dp = hs / 6.0 * (kp1 + 2 * kp2 + 2 * kp3 + kp4)
        z1 = z + dz
        p1 = p + dp

        surf = (z1 < 0.0) & (z >= 0.0)
        bott = (z1 > b1) & (z <= b0)
        cross = upd & (surf | bott)

        bnd0 = jnp.where(surf, 0.0, b0)
        bnd1 = jnp.where(surf, 0.0, b1)
        db = bnd1 - bnd0
        mz0 = hs * kz1
        mz1 = hs * kz4
        g0 = z - bnd0
        g1 = z1 - bnd1
        f = g0 / jnp.where(jnp.abs(g0 - g1) > _TINY, g0 - g1, 1.0)
        f = jnp.clip(f, 0.0, 1.0)
        for _i in range(2):
            G = _hermite(f, z, z1, mz0, mz1) - (bnd0 + f * db)
            Gp = _hermite_d(f, z, z1, mz0, mz1) - db
            f = jnp.clip(
                f - G / jnp.where(jnp.abs(Gp) > _TINY, Gp, 1.0), 0.0, 1.0
            )

        t_off = _hermite(f, jnp.zeros_like(dT), dT, hs * kT1, hs * kT4)
        z_c = _hermite(f, z, z1, mz0, mz1)
        p_c = _hermite(f, p, p1, hs * kp1, hs * kp4)
        x_c = x0f + f * hs

        c_c, _ = ev(st_m, z_c)
        sin_th = jnp.clip(p_c * c_c, -1.0, 1.0)
        cos_th = jnp.sqrt(jnp.maximum(1.0 - sin_th * sin_th, 0.0))
        if bangle_mode == "const":
            s2b = s2b_c
            c2b = c2b_c
        else:
            ub = jnp.clip(
                (2.0 * x_c - (b_rlo + b_rhi)) / (b_rhi - b_rlo), -1.0, 1.0
            )
            b2 = 2.0 * jnp.radians(_clenshaw(ub, bacoef_read, Kb))
            s2b = jnp.sin(b2)
            c2b = jnp.cos(b2)
        p_refl = jnp.where(surf, -p_c, (s2b * cos_th - c2b * sin_th) / c_c)
        if term_back:
            back_dead = cross & bott & (c2b * cos_th + s2b * sin_th < -1e-9)
        else:
            back_dead = jnp.zeros_like(cross)

        hr = (1.0 - f) * hs
        rT1, rz1, rp1, _ = rhs(st_m, z_c, p_refl)
        rT2, rz2, rp2, _ = rhs(st_1, z_c + hr * rz1, p_refl + hr * rp1)
        dT_fix = t_off + hr * 0.5 * (rT1 + rT2)
        z_fix = z_c + hr * 0.5 * (rz1 + rz2)
        p_fix = p_refl + hr * 0.5 * (rp1 + rp2)

        use_fix = cross & (~back_dead)
        dT_tot = jnp.where(use_fix, dT_fix, dT)
        dz_tot = jnp.where(use_fix, z_fix - z, dz)
        p_new = jnp.where(use_fix, p_fix, p1)

        T_n = T + jnp.where(upd, dT_tot, 0.0)
        z_n = z + jnp.where(upd, dz_tot, 0.0)
        p_n = jnp.where(upd, p_new, p)

        kTe, kze, kpe, c_e = rhs(st_1, z_n, p_n)
        return (
            T_n, z_n, p_n,
            jnp.where(upd, kTe, kT1),
            jnp.where(upd, kze, kz1),
            jnp.where(upd, kpe, kp1),
            # primal-only diagnostics (tangents discarded)
            c_e * p_n,
            (cross & surf).astype(jnp.float32),
            (cross & bott).astype(jnp.float32),
            back_dead.astype(jnp.float32),
        )

    return step_math


def _make_final_kernel(geom, consts, K, KP, Kb, nsteps, ens=False,
                       save_plan=None):
    """Forward-tangent kernel: final state only (``save_plan=None``, the
    eigenray-Newton hot path) or, with ``save_plan=(sps, nseg)``, primal AND
    tangent rows staged out at every save boundary (the ``jax.custom_jvp``
    save-grid path — same step math, same layout discipline as the
    mega-kernel's ``save``)."""
    x0g, x1g, h = geom
    (zlo, zhi, sc, off, sin_lim, btol, rlo, rhi, s2b_c, c2b_c, bangle_mode,
     b_rlo, b_rhi, term_back, any_x_oob, rd, use_pow, use_kahan,
     use_seg) = consts

    STW = ST_BLOCK_W
    _nblk = -(-nsteps // STW)

    def _run(
        p0_ref, dp0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
        b0s_ref, b1s_ref, xoob_ref, st_tab_ref,
        T_s, z_s, p_s, kT_s, kz_s, kp_s,
        dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
        al_s, ns_s, nb_s, de_s, st_s, sti_s, stsem, stisem,
        save_cb, dz0_ref=None,
    ):
        ib = pl.program_id(0)

        def st_dma_blk(j, slot):
            # W-step station blocks (see the mega-kernel): row 0 is the
            # init (x0) planes, rows 1+jW.. hold the per-step planes
            src = (st_tab_ref.at[ib, pl.ds(1 + j * STW, STW)] if ens
                   else st_tab_ref.at[pl.ds(1 + j * STW, STW)])
            return pltpu.make_async_copy(src, st_s.at[slot], stsem.at[slot])

        def st_handle(slot, row, base):
            return (
                lambda j: st_s[slot, row, 0, base + j],
                lambda j: st_s[slot, row, 0, base + KP + j],
            )

        _poly = _poly_fn(use_pow)

        def ev(st, zq):
            rc, rcp = st
            u = jnp.clip(sc * zq - off, -1.0, 1.0)
            return _poly(u, rc, K), _poly(u, rcp, K)

        def rhs(st, zq, pq):
            c, cp = ev(st, zq)
            q = c * pq
            inv_s = lax.rsqrt(jnp.maximum(1.0 - q * q, _TINY))
            invc = 1.0 / c
            return inv_s * invc, q * inv_s, -cp * inv_s * invc * invc, c

        hs = jnp.float32(h)
        step_math = _make_step_math(consts, K, Kb, hs)

        # ---- init (primal + tangent via jvp) ------------------------------
        if rd:
            isrc = st_tab_ref.at[ib, 0] if ens else st_tab_ref.at[0]
            cp0 = pltpu.make_async_copy(isrc, sti_s, stisem)
            cp0.start()
            cp0.wait()
            st_init = (
                lambda j: sti_s[0, j],
                lambda j: sti_s[0, KP + j],
            )
            st_dma_blk(0, 0).start()  # prefetch the first W-step block
        else:
            st_init = (_vmem_reader(ccoef_ref), _vmem_reader(cpcoef_ref))
        z0 = z0_ref[0]
        p0 = p0_ref[0]
        dp0 = dp0_ref[0]
        # source-depth tangent seed (the save-grid custom_jvp variant);
        # absent in the final-state/ensemble kernels, whose callers only
        # differentiate over the launch parameter
        dz0 = jnp.zeros_like(z0) if dz0_ref is None else dz0_ref[0]

        def rhs3(zq, pq):
            fT, fz, fp, _ = rhs(st_init, zq, pq)
            return fT, fz, fp

        (kT0, kz0, kp0), (dkT0, dkz0, dkp0) = jax.jvp(
            rhs3, (z0, p0), (dz0, dp0)
        )
        T_s[...] = jnp.zeros_like(z0)
        z_s[...] = z0
        p_s[...] = p0
        kT_s[...] = kT0
        kz_s[...] = kz0
        kp_s[...] = kp0
        dT_s[...] = jnp.zeros_like(z0)
        dz_s[...] = dz0
        dp_s[...] = dp0
        dkT_s[...] = dkT0
        dkz_s[...] = dkz0
        dkp_s[...] = dkp0
        alive0 = (z0 >= zlo - btol) & (z0 <= zhi + btol)
        al_s[...] = alive0.astype(jnp.float32)
        ns_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        nb_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        de_s[...] = jnp.where(alive0, 0, 2).astype(jnp.int32)

        def body(k, _):
            if rd:
                st_m, st_1 = _station_step_handles(
                    k, STW, _nblk, st_dma_blk, st_handle, KP
                )
            else:
                st_m = st_1 = (_vmem_reader(ccoef_ref), _vmem_reader(cpcoef_ref))
            b0 = b0s_ref[k]
            b1 = b1s_ref[k]
            kf = k.astype(jnp.float32)
            x0f = x0g + kf * hs
            alive = al_s[...] > 0.5
            upd = alive

            def smath(T, z, p, kT1, kz1, kp1):
                # shared event-step core; closes over b0/b1/x0f/upd and the
                # station handles, so the only differentiated inputs are
                # the carried ray state
                return step_math(
                    rhs, ev, _vmem_reader(bacoef_ref), st_m, st_1,
                    b0, b1, x0f, upd, T, z, p, kT1, kz1, kp1,
                )

            prim_in = (T_s[...], z_s[...], p_s[...],
                       kT_s[...], kz_s[...], kp_s[...])
            tang_in = (dT_s[...], dz_s[...], dp_s[...],
                       dkT_s[...], dkz_s[...], dkp_s[...])
            prim, tang = jax.jvp(smath, prim_in, tang_in)
            (T_n, z_n, p_n, kTe, kze, kpe, sin_e, cs_f, cb_f, bd_f) = prim
            (dT_n, dz_n, dp_n, dkTe, dkze, dkpe, *_unused) = tang

            vert = jnp.abs(sin_e) > sin_lim
            oob = (z_n > zhi + btol) | (z_n < zlo - btol)
            if any_x_oob:
                # host-precomputed f64 flags (see _launch_consts)
                oob = oob | (xoob_ref[k] > 0.5)
            back_dead = bd_f > 0.5
            alive_n = alive & ~(vert | oob | back_dead)
            death = de_s[...]
            de_s[...] = jnp.where(
                alive & back_dead, 3,
                jnp.where(alive & vert, 1, jnp.where(alive & oob, 2, death)),
            ).astype(jnp.int32)

            T_s[...] = T_n
            z_s[...] = z_n
            p_s[...] = p_n
            kT_s[...] = kTe
            kz_s[...] = kze
            kp_s[...] = kpe
            dT_s[...] = dT_n
            dz_s[...] = dz_n
            dp_s[...] = dp_n
            dkT_s[...] = dkTe
            dkz_s[...] = dkze
            dkp_s[...] = dkpe
            al_s[...] = alive_n.astype(jnp.float32)
            ns_s[...] = ns_s[...] + (cs_f > 0.5).astype(jnp.int32)
            nb_s[...] = nb_s[...] + (cb_f > 0.5).astype(jnp.int32)
            return 0

        if save_cb is None:
            lax.fori_loop(0, nsteps, body, 0)
        else:
            sps_sv, nseg_sv = save_plan
            save_cb(0)

            def seg_body(seg, _):
                lax.fori_loop(seg * sps_sv, (seg + 1) * sps_sv, body, 0)
                save_cb(seg + 1)
                return 0

            lax.fori_loop(0, nseg_sv, seg_body, 0)

    if save_plan is None:

        def kernel(
            p0_ref, dp0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
            b0s_ref, b1s_ref, xoob_ref, st_tab_ref,
            T_out, z_out, p_out, dT_out, dz_out, dp_out,
            nsurf_out, nbott_out, death_out,
            T_s, z_s, p_s, kT_s, kz_s, kp_s,
            dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
            al_s, ns_s, nb_s, de_s, st_s, sti_s, stsem, stisem,
        ):
            _run(
                p0_ref, dp0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
                b0s_ref, b1s_ref, xoob_ref, st_tab_ref,
                T_s, z_s, p_s, kT_s, kz_s, kp_s,
                dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
                al_s, ns_s, nb_s, de_s, st_s, sti_s, stsem, stisem,
                None,
            )
            T_out[0] = T_s[...]
            z_out[0] = z_s[...]
            p_out[0] = p_s[...]
            dT_out[0] = dT_s[...]
            dz_out[0] = dz_s[...]
            dp_out[0] = dp_s[...]
            nsurf_out[0] = ns_s[...]
            nbott_out[0] = nb_s[...]
            death_out[0] = de_s[...]

        return kernel

    nseg_out = save_plan[1]

    def kernel_save(
        p0_ref, dp0_ref, z0_ref, dz0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
        b0s_ref, b1s_ref, xoob_ref, st_tab_ref,
        T_out, z_out, p_out, dT_out, dz_out, dp_out,
        nsurf_out, nbott_out, death_out, ds_out,
        T_s, z_s, p_s, kT_s, kz_s, kp_s,
        dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
        al_s, ns_s, nb_s, de_s, st_s, sti_s, stsem, stisem,
        ds_s, stage_s, svsem,
    ):
        ib = pl.program_id(0)
        ds_s[...] = jnp.full_like(ds_s[...], nseg_out + 1)

        def save_cb(row):
            # first-dead save index (monotone: dead rays stay dead), then
            # stage + DMA primal and tangent rows to the off-chip save
            # grids -- the mega-kernel's save pattern
            ds_s[...] = jnp.minimum(
                ds_s[...],
                jnp.where(al_s[...] > 0.5, nseg_out + 1, row).astype(jnp.int32),
            )
            stage_s[0] = T_s[...]
            stage_s[1] = z_s[...]
            stage_s[2] = p_s[...]
            stage_s[3] = dT_s[...]
            stage_s[4] = dz_s[...]
            stage_s[5] = dp_s[...]
            cps = [
                pltpu.make_async_copy(
                    stage_s.at[i], out.at[row, ib], svsem.at[i]
                )
                for i, out in enumerate(
                    (T_out, z_out, p_out, dT_out, dz_out, dp_out)
                )
            ]
            for cp_ in cps:
                cp_.start()
            for cp_ in cps:
                cp_.wait()

        _run(
            p0_ref, dp0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
            b0s_ref, b1s_ref, xoob_ref, st_tab_ref,
            T_s, z_s, p_s, kT_s, kz_s, kp_s,
            dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
            al_s, ns_s, nb_s, de_s, st_s, sti_s, stsem, stisem,
            save_cb, dz0_ref=dz0_ref,
        )
        nsurf_out[0] = ns_s[...]
        nbott_out[0] = nb_s[...]
        death_out[0] = de_s[...]
        ds_out[0] = ds_s[...]

    return kernel_save


def _tangent_launch_prep(env, z0, p0, dp0, geom, settings):
    """Shared operand/const preparation for the forward-tangent kernels
    (final-state and save-grid variants)."""
    from ..ops.interp import linear_interp

    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = jnp.float32
    p0 = jnp.asarray(p0, dtype)
    dp0 = jnp.broadcast_to(jnp.asarray(dp0, dtype), p0.shape)
    B = p0.shape[0]
    z0v = jnp.broadcast_to(jnp.asarray(z0, dtype), (B,))

    nblocks, R, Bb, Bpad = _layout(B)
    pad = lambda a: jnp.pad(a, (0, Bpad - B)).reshape(nblocks, R, 128)
    p0p, dp0p, z0p = pad(p0), pad(dp0), pad(z0v)

    K = env.c_cheb.shape[1]
    rd = bool(env.range_dependent)
    use_pow = bool(env.poly_ok)
    rep = lambda a: jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], 128))
    ctab0, cptab0 = (env.c_pow, env.dcdz_pow) if use_pow else (env.c_cheb, env.dcdz_cheb)
    ccoef = rep(ctab0[0])
    cpcoef = rep(cptab0[0])
    Kb = env.bangle_cheb.shape[0]
    bacoef = rep(env.bangle_cheb)

    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xsm = xs0 + 0.5 * h
    xs1 = x0 + (ks + 1.0) * h
    b0s = linear_interp(xs0, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b1s = linear_interp(xs1, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b0s = jnp.broadcast_to(b0s[:, None], (nsteps, 128))
    b1s = jnp.broadcast_to(b1s[:, None], (nsteps, 128))

    KP = -(-K // 128) * 128
    if rd:
        st_tab = _station_rows(env, dtype, K, KP, x0, xsm, xs1, use_pow)
        nblk = -(-nsteps // ST_BLOCK_W)
        st_tab = jnp.pad(
            st_tab, ((0, 1 + nblk * ST_BLOCK_W - st_tab.shape[0]), (0, 0), (0, 0))
        )
    else:
        st_tab = jnp.zeros((1, 1, 4 * KP), dtype)

    consts, xoob64 = _launch_consts(env, settings, x0, h, nsteps, rd, use_pow)
    any_x_oob = consts[14]
    xoob = (
        jnp.broadcast_to(
            jnp.asarray(xoob64, dtype)[:, None], (nsteps, 128)
        )
        if any_x_oob else jnp.zeros((1, 128), dtype)
    )

    operands = (p0p, dp0p, z0p, ccoef, cpcoef, bacoef, b0s, b1s, xoob, st_tab)
    layout = (B, nblocks, R, Bpad)
    return operands, layout, consts, K, KP, Kb, nsteps, dtype


def _tangent_scratch(R, KP, dtype):
    return (
        [pltpu.VMEM((R, 128), dtype) for _ in range(12)]
        + [pltpu.VMEM((R, 128), dtype)]  # alive (f32)
        + [pltpu.VMEM((R, 128), jnp.int32) for _ in range(3)]
        + [pltpu.SMEM((2, ST_BLOCK_W, 1, 4 * KP), dtype),
           pltpu.SMEM((1, 4 * KP), dtype),
           pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA]
    )


def trace_pallas_tangent(env, z0, p0, dp0, geom, settings, interpret: bool = False):
    """Final-state trace with one forward tangent: returns
    ``(T, z, p, dT, dz, dp, n_surf, n_bott, death)``, each (B,), in the ODE
    convention.  ``dp0`` is the tangent of ``p0`` (e.g. ones for the diagonal
    Jacobian dz_end/dp0 used by Newton eigenrays)."""
    x0, x1, h, sps, nseg = geom
    operands, (B, nblocks, R, Bpad), consts, K, KP, Kb, nsteps, dtype = (
        _tangent_launch_prep(env, z0, p0, dp0, geom, settings)
    )

    kernel = _make_final_kernel((x0, x1, h), consts, K, KP, Kb, nsteps)

    fvec = jax.ShapeDtypeStruct((nblocks, R, 128), dtype)
    ivec = jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32)
    out_shape = [fvec] * 6 + [ivec] * 3
    scratch = _tangent_scratch(R, KP, dtype)
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nblocks,),
        in_specs=[blocked, blocked, blocked] + [vmem_full] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[blocked] * 9,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*operands)

    unb = lambda a: a.reshape(Bpad)[:B]
    return tuple(unb(o) for o in outs)


def trace_pallas_tangent_save(env, z0, p0, dp0, geom, settings,
                              interpret: bool = False, dz0=None):
    """Save-grid trace with one forward tangent: returns
    ``(TraceResult, (dts, dzs, dps))`` where the tangent arrays are (B, S)
    directional derivatives of the save-grid states with respect to the
    ``(dp0, dz0)`` seed (``dz0`` defaults to zero: the launch-parameter
    direction).  This is the kernel behind the ``jax.custom_jvp``
    registered on the traced Pallas path (``integrate.trace``): one launch
    yields the primal trajectory AND its tangent, replacing a jvp through
    the XLA scan.  Step math is ``_make_step_math`` — identical to the
    final-state tangent kernel and the mega-kernel's event step."""
    from ..integrate import TraceResult

    x0, x1, h, sps, nseg = geom
    operands, (B, nblocks, R, Bpad), consts, K, KP, Kb, nsteps, dtype = (
        _tangent_launch_prep(env, z0, p0, dp0, geom, settings)
    )
    dz0v = jnp.broadcast_to(
        jnp.asarray(0.0 if dz0 is None else dz0, dtype), (B,)
    )
    dz0p = jnp.pad(dz0v, (0, Bpad - B)).reshape(nblocks, R, 128)
    operands = operands[:3] + (dz0p,) + operands[3:]
    S = nseg + 1

    kernel = _make_final_kernel((x0, x1, h), consts, K, KP, Kb, nsteps,
                                save_plan=(sps, nseg))

    fvecS = jax.ShapeDtypeStruct((S, nblocks, R, 128), dtype)
    ivec = jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32)
    out_shape = [fvecS] * 6 + [ivec] * 4
    scratch = _tangent_scratch(R, KP, dtype) + [
        pltpu.VMEM((R, 128), jnp.int32),  # first-dead save index
        pltpu.VMEM((6, R, 128), dtype),  # save staging
        pltpu.SemaphoreType.DMA((6,)),
    ]
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nblocks,),
        in_specs=[blocked, blocked, blocked, blocked] + [vmem_full] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6 + [blocked] * 4,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(*operands)

    T, Z, P, dT, dZ, dP, n_surf, n_bott, death, ds = outs
    unb = lambda a: a.reshape(Bpad)[:B]
    unbS = lambda a: a.reshape(S, Bpad).T[:B]
    death = unb(death)
    ds = unb(ds)
    alive_save = jnp.arange(S, dtype=jnp.int32)[None, :] < ds[:, None]
    rs = x0 + (x1 - x0) * jnp.arange(S, dtype=dtype) / nseg
    res = TraceResult(
        rs=rs, ts=unbS(T), zs=unbS(Z), ps=unbS(P),
        n_bott=unb(n_bott), n_surf=unb(n_surf),
        alive=death == 0, alive_save=alive_save, death_code=death,
    )
    return res, (unbS(dT), unbS(dZ), unbS(dP))


def trace_pallas_tangent_ensemble(env_ens, z0, p0, dp0, geom, settings,
                                  interpret: bool = False):
    """Final-state trace with one forward tangent across an ENSEMBLE of
    environments: grid block e integrates realization e's (M,) candidate
    angles against realization e's station table (per-block SMEM DMA rows).
    This is the Monte-Carlo eigenray hot loop — one kernel launch advances
    every (realization x bracket) Newton candidate instead of E sequential
    launches or a vmapped XLA scan.

    ``env_ens`` is a stacked EnvData (leading ensemble axis, as built by
    ``make_env_ensemble``) with shared bathymetry and range-dependent
    spectral fits; ``p0``/``dp0`` are (E, M).  Returns the same tuple as
    ``trace_pallas_tangent`` with (E, M) fields.
    """
    from ..ops.interp import linear_interp

    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = jnp.float32
    p0 = jnp.asarray(p0, dtype)
    E, M = p0.shape
    dp0 = jnp.broadcast_to(jnp.asarray(dp0, dtype), (E, M))
    R = max(1, -(-M // 128))
    Mpad = R * 128
    pad = lambda a: jnp.pad(a, ((0, 0), (0, Mpad - M))).reshape(E, R, 128)
    p0p, dp0p = pad(p0), pad(dp0)
    z0a = jnp.asarray(z0, dtype)
    if z0a.ndim != 0:
        raise ValueError(
            "trace_pallas_tangent_ensemble takes a scalar source depth "
            f"(got shape {z0a.shape}); per-candidate depths are unsupported"
        )
    z0p = jnp.broadcast_to(z0a, (E, R, 128))

    K = env_ens.c_cheb.shape[2]
    KP = -(-K // 128) * 128
    env0 = jax.tree_util.tree_map(lambda a: a[0], env_ens)
    if not env0.range_dependent:
        raise ValueError("ensemble tangent kernel requires range-dependent fits")

    use_pow = bool(env0.poly_ok)
    rep = lambda a: jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], 128))
    ccoef = rep(env0.c_cheb[0])  # unused on the rd path; placeholder
    cpcoef = rep(env0.dcdz_cheb[0])
    Kb = env0.bangle_cheb.shape[0]
    bacoef = rep(env0.bangle_cheb)

    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xsm = xs0 + 0.5 * h
    xs1 = x0 + (ks + 1.0) * h
    # shared bathymetry (realization 0's): MC ensembles perturb c only
    b0s = linear_interp(xs0, env0.bathy_r, env0.bathy, env0.uniform_bathy_r).astype(dtype)
    b1s = linear_interp(xs1, env0.bathy_r, env0.bathy, env0.uniform_bathy_r).astype(dtype)
    b0s = jnp.broadcast_to(b0s[:, None], (nsteps, 128))
    b1s = jnp.broadcast_to(b1s[:, None], (nsteps, 128))

    # (E, nsteps+1, 1, 4KP) per-realization station rows; loop-invariant in
    # the eigenray while_loop, so XLA hoists the build out of the iteration
    st_tab = jax.vmap(
        lambda e: _station_rows(e, dtype, K, KP, x0, xsm, xs1, use_pow)
    )(env_ens)
    nblk = -(-nsteps // ST_BLOCK_W)
    st_tab = jnp.pad(
        st_tab,
        ((0, 0), (0, 1 + nblk * ST_BLOCK_W - st_tab.shape[1]), (0, 0), (0, 0)),
    )

    consts, xoob64 = _launch_consts(env0, settings, x0, h, nsteps, True, use_pow)
    any_x_oob = consts[14]
    xoob = (
        jnp.broadcast_to(
            jnp.asarray(xoob64, dtype)[:, None], (nsteps, 128)
        )
        if any_x_oob else jnp.zeros((1, 128), dtype)
    )

    kernel = _make_final_kernel((x0, x1, h), consts, K, KP, Kb, nsteps, ens=True)

    fvec = jax.ShapeDtypeStruct((E, R, 128), dtype)
    ivec = jax.ShapeDtypeStruct((E, R, 128), jnp.int32)
    out_shape = [fvec] * 6 + [ivec] * 3
    scratch = (
        [pltpu.VMEM((R, 128), dtype) for _ in range(12)]
        + [pltpu.VMEM((R, 128), dtype)]  # alive (f32)
        + [pltpu.VMEM((R, 128), jnp.int32) for _ in range(3)]
        + [pltpu.SMEM((2, ST_BLOCK_W, 1, 4 * KP), dtype),
           pltpu.SMEM((1, 4 * KP), dtype),
           pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA]
    )
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(E,),
        in_specs=[blocked, blocked, blocked] + [vmem_full] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[blocked] * 9,
        scratch_shapes=scratch,
        interpret=interpret,
    )(p0p, dp0p, z0p, ccoef, cpcoef, bacoef, b0s, b1s, xoob, st_tab)

    unb = lambda a: a.reshape(E, Mpad)[:, :M]
    return tuple(unb(o) for o in outs)



def _make_coef_kernel(geom, consts, K, KP, Kb, nsteps):
    """Forward tangent along a COEFFICIENT direction: grid block k advances
    the primal and the tangent d(state)/d(alpha) where the sound-speed
    coefficients are perturbed c_j + alpha*dc_j (and dcdz chained), alpha=0.
    The direction enters jax.jvp through an explicit epsilon input whose
    primal is 0 and tangent is 1, so the shared step math stays untouched.
    Range-independent spectral profiles only (the adjoint operator's
    domain, see adjoint.travel_time_jacobian)."""
    x0g, x1g, h = geom
    (zlo, zhi, sc, off, sin_lim, btol, rlo, rhi, s2b_c, c2b_c, bangle_mode,
     b_rlo, b_rhi, term_back, any_x_oob, rd, use_pow, use_kahan,
     use_seg) = consts
    assert not rd

    def kernel(
        p0_ref, z0_ref, ccoef_ref, cpcoef_ref, bacoef_ref,
        b0s_ref, b1s_ref, xoob_ref, dtab_ref,
        T_out, z_out, p_out, dT_out, dz_out, dp_out,
        nsurf_out, nbott_out, death_out,
        T_s, z_s, p_s, kT_s, kz_s, kp_s,
        dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
        al_s, ns_s, nb_s, de_s, dt_s, dtsem,
    ):
        ib = pl.program_id(0)
        cpd = pltpu.make_async_copy(dtab_ref.at[ib], dt_s, dtsem)
        cpd.start()
        cpd.wait()

        def handles(eps):
            # eps-dual coefficient readers: tangent of eps is 1, so jvp
            # yields d/d(alpha) of the whole step at alpha=0
            return (
                lambda j: ccoef_ref[j] + eps * dt_s[0, j],
                lambda j: cpcoef_ref[j] + eps * dt_s[0, KP + j],
            )

        _poly = _poly_fn(use_pow)

        def ev(st, zq):
            rc, rcp = st
            u = jnp.clip(sc * zq - off, -1.0, 1.0)
            return _poly(u, rc, K), _poly(u, rcp, K)

        def rhs(st, zq, pq):
            c, cp = ev(st, zq)
            q = c * pq
            inv_s = lax.rsqrt(jnp.maximum(1.0 - q * q, _TINY))
            invc = 1.0 / c
            return inv_s * invc, q * inv_s, -cp * inv_s * invc * invc, c

        hs = jnp.float32(h)
        step_math = _make_step_math(consts, K, Kb, hs)

        # ---- init: k1 tangent carries the coefficient direction ----------
        z0 = z0_ref[0]
        p0 = p0_ref[0]
        zeros = jnp.zeros_like(z0)
        ones = jnp.ones_like(z0)

        def rhs3(zq, pq, eps):
            fT, fz, fp, _ = rhs(handles(eps), zq, pq)
            return fT, fz, fp

        (kT0, kz0, kp0), (dkT0, dkz0, dkp0) = jax.jvp(
            rhs3, (z0, p0, zeros), (zeros, zeros, ones)
        )
        T_s[...] = zeros
        z_s[...] = z0
        p_s[...] = p0
        kT_s[...] = kT0
        kz_s[...] = kz0
        kp_s[...] = kp0
        dT_s[...] = zeros
        dz_s[...] = zeros
        dp_s[...] = zeros
        dkT_s[...] = dkT0
        dkz_s[...] = dkz0
        dkp_s[...] = dkp0
        alive0 = (z0 >= zlo - btol) & (z0 <= zhi + btol)
        al_s[...] = alive0.astype(jnp.float32)
        ns_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        nb_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        de_s[...] = jnp.where(alive0, 0, 2).astype(jnp.int32)

        def body(k, _):
            b0 = b0s_ref[k]
            b1 = b1s_ref[k]
            kf = k.astype(jnp.float32)
            x0f = x0g + kf * hs
            alive = al_s[...] > 0.5
            upd = alive

            def smath(T, z, p, kT1, kz1, kp1, eps):
                st = handles(eps)
                return step_math(
                    rhs, ev, _vmem_reader(bacoef_ref), st, st,
                    b0, b1, x0f, upd, T, z, p, kT1, kz1, kp1,
                )

            prim_in = (T_s[...], z_s[...], p_s[...],
                       kT_s[...], kz_s[...], kp_s[...], zeros)
            tang_in = (dT_s[...], dz_s[...], dp_s[...],
                       dkT_s[...], dkz_s[...], dkp_s[...], ones)
            prim, tang = jax.jvp(smath, prim_in, tang_in)
            (T_n, z_n, p_n, kTe, kze, kpe, sin_e, cs_f, cb_f, bd_f) = prim
            (dT_n, dz_n, dp_n, dkTe, dkze, dkpe, *_unused) = tang

            vert = jnp.abs(sin_e) > sin_lim
            oob = (z_n > zhi + btol) | (z_n < zlo - btol)
            if any_x_oob:
                # host-precomputed f64 flags (see _launch_consts)
                oob = oob | (xoob_ref[k] > 0.5)
            back_dead = bd_f > 0.5
            alive_n = alive & ~(vert | oob | back_dead)
            death = de_s[...]
            de_s[...] = jnp.where(
                alive & back_dead, 3,
                jnp.where(alive & vert, 1, jnp.where(alive & oob, 2, death)),
            ).astype(jnp.int32)

            T_s[...] = T_n
            z_s[...] = z_n
            p_s[...] = p_n
            kT_s[...] = kTe
            kz_s[...] = kze
            kp_s[...] = kpe
            dT_s[...] = dT_n
            dz_s[...] = dz_n
            dp_s[...] = dp_n
            dkT_s[...] = dkTe
            dkz_s[...] = dkze
            dkp_s[...] = dkpe
            al_s[...] = alive_n.astype(jnp.float32)
            ns_s[...] = ns_s[...] + (cs_f > 0.5).astype(jnp.int32)
            nb_s[...] = nb_s[...] + (cb_f > 0.5).astype(jnp.int32)
            return 0

        lax.fori_loop(0, nsteps, body, 0)

        T_out[0] = T_s[...]
        z_out[0] = z_s[...]
        p_out[0] = p_s[...]
        dT_out[0] = dT_s[...]
        dz_out[0] = dz_s[...]
        dp_out[0] = dp_s[...]
        nsurf_out[0] = ns_s[...]
        nbott_out[0] = nb_s[...]
        death_out[0] = de_s[...]

    return kernel


def trace_pallas_coef_tangent(env, z0, p0, dcoef, dcpcoef, geom, settings,
                              interpret: bool = False):
    """Final-state trace with one forward tangent per COEFFICIENT direction.

    ``dcoef``/``dcpcoef`` are (D, K): D directions of simultaneous
    (c, dcdz) coefficient perturbation; direction d runs as grid block d
    against the full (B,) ray batch.  Returns
    ``(T, z, p, dT, dz, dp, n_surf, n_bott, death)`` where the primal
    fields are (B,) (identical across blocks; block 0's copy is returned)
    and the tangents are (D, B).  This is the engine of the spectral
    travel-time Jacobian (adjoint.travel_time_jacobian) run entirely inside
    the kernel — one launch for the whole (B, D) Jacobian.
    """
    from ..ops.interp import linear_interp

    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = jnp.float32
    if env.range_dependent:
        raise ValueError("coefficient-tangent kernel requires a range-independent fit")
    p0 = jnp.asarray(p0, dtype)
    B = p0.shape[0]
    dcoef = jnp.asarray(dcoef, dtype)
    dcpcoef = jnp.asarray(dcpcoef, dtype)
    D = dcoef.shape[0]
    z0v = jnp.broadcast_to(jnp.asarray(z0, dtype), (B,))

    R = max(1, -(-B // 128))
    Bpad = R * 128
    pad = lambda a: jnp.pad(a, (0, Bpad - B)).reshape(1, R, 128)
    p0p, z0p = pad(p0), pad(z0v)

    K = env.c_cheb.shape[1]
    KP = -(-K // 128) * 128
    # ALWAYS the Chebyshev representation here: a unit coefficient
    # direction e_k re-expressed in monomials has 2^k-scale entries, and
    # the f32 Horner TANGENT chain loses catastrophically on them (the
    # poly_ok guard covers the primal tables only, measured rel errors
    # O(1) for high-order directions) — Clenshaw keeps every direction
    # well-conditioned
    use_pow = False
    rep = lambda a: jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], 128))
    ccoef = rep(env.c_cheb[0])
    cpcoef = rep(env.dcdz_cheb[0])
    Kb = env.bangle_cheb.shape[0]
    bacoef = rep(env.bangle_cheb)

    padk = lambda a: jnp.pad(a, ((0, 0), (0, KP - K)))
    dtab = jnp.concatenate([padk(dcoef), padk(dcpcoef)], axis=1)[:, None, :]

    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xs1 = x0 + (ks + 1.0) * h
    b0s = linear_interp(xs0, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b1s = linear_interp(xs1, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b0s = jnp.broadcast_to(b0s[:, None], (nsteps, 128))
    b1s = jnp.broadcast_to(b1s[:, None], (nsteps, 128))

    consts, xoob64 = _launch_consts(env, settings, x0, h, nsteps, False, use_pow)
    any_x_oob = consts[14]
    xoob = (
        jnp.broadcast_to(
            jnp.asarray(xoob64, dtype)[:, None], (nsteps, 128)
        )
        if any_x_oob else jnp.zeros((1, 128), dtype)
    )

    kernel = _make_coef_kernel((x0, x1, h), consts, K, KP, Kb, nsteps)

    fvec = jax.ShapeDtypeStruct((D, R, 128), dtype)
    ivec = jax.ShapeDtypeStruct((D, R, 128), jnp.int32)
    out_shape = [fvec] * 6 + [ivec] * 3
    scratch = (
        [pltpu.VMEM((R, 128), dtype) for _ in range(12)]
        + [pltpu.VMEM((R, 128), dtype)]  # alive (f32)
        + [pltpu.VMEM((R, 128), jnp.int32) for _ in range(3)]
        + [pltpu.SMEM((1, 2 * KP), dtype), pltpu.SemaphoreType.DMA]
    )
    # every block reads the same ray block; block d reads direction d's row
    shared = pl.BlockSpec((1, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(D,),
        in_specs=[shared, shared] + [vmem_full] * 6
        + [pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[blocked] * 9,
        scratch_shapes=scratch,
        interpret=interpret,
    )(p0p, z0p, ccoef, cpcoef, bacoef, b0s, b1s, xoob, dtab)

    first = lambda a: a[0].reshape(Bpad)[:B]
    alld = lambda a: a.reshape(D, Bpad)[:, :B]
    (T, zf, pf, dT, dz, dp, ns, nb, dc) = outs
    return (first(T), first(zf), first(pf), alld(dT), alld(dz), alld(dp),
            first(ns), first(nb), first(dc))



def _make_coef_kernel_rd(geom, consts, K, KP, Kb, nsteps, STW=ST_BLOCK_W):
    """Forward tangents along RANGE-DEPENDENT coefficient directions:
    grid block j perturbs station j — every lane of the block is a
    (direction g, ray b) pair advancing the primal and the tangent
    d(state)/d(alpha) where station j's sound-speed Chebyshev coefficients
    are perturbed c_cheb[j] + alpha * dcoef[g] (dcdz chained).

    The per-step blended profile is (1-w) ctab[i] + w ctab[i+1], so the
    tangent station row is hat_j(step) * dcoef[g] with the scalar hat
    weight hat_j = (1-w)[i==j] + w[i+1==j] computed from the SMEM station
    index/weight rows.  The direction dependence rides as K host-packed
    VMEM planes dcpl[i][lane] = dcoef[g(lane), i] added to the scalar
    Clenshaw reads — so all Dk directions of a station share one block's
    (R, 128) vregs at full sublane occupancy (one direction per block
    measured 8x slower: (1, 128) vectors waste 7/8 of the VPU).  This is
    the engine of the 2D (range-dependent) spectral travel-time Jacobian
    (adjoint.travel_time_jacobian_2d).  Chebyshev evaluation only: unit
    coefficient directions are f32-catastrophic in the monomial basis
    (see trace_pallas_coef_tangent).
    """
    x0g, x1g, h = geom
    (zlo, zhi, sc, off, sin_lim, btol, rlo, rhi, s2b_c, c2b_c, bangle_mode,
     b_rlo, b_rhi, term_back, any_x_oob, rd, use_pow, use_kahan,
     use_seg) = consts
    assert rd and not use_pow and not use_seg

    _nblk = -(-nsteps // STW)

    def kernel(
        p0_ref, z0_ref, bacoef_ref, b0s_ref, b1s_ref, xoob_ref,
        st_tab_ref, stiw_ref, dcpl_ref, dcppl_ref,
        T_out, z_out, p_out, dT_out, dz_out, dp_out,
        nsurf_out, nbott_out, death_out,
        T_s, z_s, p_s, kT_s, kz_s, kp_s,
        dT_s, dz_s, dp_s, dkT_s, dkz_s, dkp_s,
        al_s, ns_s, nb_s, de_s, st_s, sti_s,
        stsem, stisem,
    ):
        j_st = pl.program_id(0)  # perturbed station

        def st_dma_blk(jb, slot):
            return pltpu.make_async_copy(
                st_tab_ref.at[pl.ds(1 + jb * STW, STW)],
                st_s.at[slot], stsem.at[slot],
            )

        def st_handle(slot, row, base):
            return (
                lambda kk: st_s[slot, row, 0, base + kk],
                lambda kk: st_s[slot, row, 0, base + KP + kk],
            )

        def hat(i, w):
            # d(blended row)/d(station j): (1-w) on i==j, w on i+1==j
            return jnp.where(i == j_st, 1.0 - w,
                             jnp.where(i == j_st - 1, w, 0.0))

        def perturbed(st, hatv, eps):
            rc, rcp = st
            s = eps * hatv  # scalar; the direction planes carry g(lane)
            return (
                lambda kk: rc(kk) + s * dcpl_ref[kk],
                lambda kk: rcp(kk) + s * dcppl_ref[kk],
            )

        def ev(st, zq):
            rc, rcp = st
            u = jnp.clip(sc * zq - off, -1.0, 1.0)
            return _clenshaw(u, rc, K), _clenshaw(u, rcp, K)

        def rhs(st, zq, pq):
            c, cp = ev(st, zq)
            q = c * pq
            inv_s = lax.rsqrt(jnp.maximum(1.0 - q * q, _TINY))
            invc = 1.0 / c
            return inv_s * invc, q * inv_s, -cp * inv_s * invc * invc, c

        hs = jnp.float32(h)
        step_math = _make_step_math(consts, K, Kb, hs)

        # ---- init: primal station row + hat-weighted direction tangent ---
        cp0 = pltpu.make_async_copy(st_tab_ref.at[0], sti_s, stisem)
        cp0.start()
        cp0.wait()
        st_dma_blk(0, 0).start()  # prefetch the first W-step block

        z0 = z0_ref[0]
        p0 = p0_ref[0]
        zeros = jnp.zeros_like(z0)
        ones = jnp.ones_like(z0)
        hat0 = hat(stiw_ref[0, 0].astype(jnp.int32), stiw_ref[0, 1])

        def handles0(eps):
            return perturbed(
                (lambda kk: sti_s[0, kk], lambda kk: sti_s[0, KP + kk]),
                hat0, eps,
            )

        def rhs3(zq, pq, eps):
            fT, fz, fp, _ = rhs(handles0(eps), zq, pq)
            return fT, fz, fp

        (kT0, kz0, kp0), (dkT0, dkz0, dkp0) = jax.jvp(
            rhs3, (z0, p0, zeros), (zeros, zeros, ones)
        )
        T_s[...] = zeros
        z_s[...] = z0
        p_s[...] = p0
        kT_s[...] = kT0
        kz_s[...] = kz0
        kp_s[...] = kp0
        dT_s[...] = zeros
        dz_s[...] = zeros
        dp_s[...] = zeros
        dkT_s[...] = dkT0
        dkz_s[...] = dkz0
        dkp_s[...] = dkp0
        alive0 = (z0 >= zlo - btol) & (z0 <= zhi + btol)
        al_s[...] = alive0.astype(jnp.float32)
        ns_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        nb_s[...] = jnp.zeros_like(z0, dtype=jnp.int32)
        de_s[...] = jnp.where(alive0, 0, 2).astype(jnp.int32)

        def body(k, _):
            st_m_p, st_1_p = _station_step_handles(
                k, STW, _nblk, st_dma_blk, st_handle, KP
            )
            hat_m = hat(stiw_ref[1 + k, 0].astype(jnp.int32),
                        stiw_ref[1 + k, 1])
            hat_1 = hat(stiw_ref[1 + k, 2].astype(jnp.int32),
                        stiw_ref[1 + k, 3])
            b0 = b0s_ref[k]
            b1 = b1s_ref[k]
            kf = k.astype(jnp.float32)
            x0f = x0g + kf * hs
            alive = al_s[...] > 0.5
            upd = alive

            def smath(T, z, p, kT1, kz1, kp1, eps):
                st_m = perturbed(st_m_p, hat_m, eps)
                st_1 = perturbed(st_1_p, hat_1, eps)
                return step_math(
                    rhs, ev, _vmem_reader(bacoef_ref), st_m, st_1,
                    b0, b1, x0f, upd, T, z, p, kT1, kz1, kp1,
                )

            prim_in = (T_s[...], z_s[...], p_s[...],
                       kT_s[...], kz_s[...], kp_s[...], zeros)
            tang_in = (dT_s[...], dz_s[...], dp_s[...],
                       dkT_s[...], dkz_s[...], dkp_s[...], ones)
            prim, tang = jax.jvp(smath, prim_in, tang_in)
            (T_n, z_n, p_n, kTe, kze, kpe, sin_e, cs_f, cb_f, bd_f) = prim
            (dT_n, dz_n, dp_n, dkTe, dkze, dkpe, *_unused) = tang

            vert = jnp.abs(sin_e) > sin_lim
            oob = (z_n > zhi + btol) | (z_n < zlo - btol)
            if any_x_oob:
                oob = oob | (xoob_ref[k] > 0.5)
            back_dead = bd_f > 0.5
            alive_n = alive & ~(vert | oob | back_dead)
            death = de_s[...]
            de_s[...] = jnp.where(
                alive & back_dead, 3,
                jnp.where(alive & vert, 1, jnp.where(alive & oob, 2, death)),
            ).astype(jnp.int32)

            T_s[...] = T_n
            z_s[...] = z_n
            p_s[...] = p_n
            kT_s[...] = kTe
            kz_s[...] = kze
            kp_s[...] = kpe
            dT_s[...] = dT_n
            dz_s[...] = dz_n
            dp_s[...] = dp_n
            dkT_s[...] = dkTe
            dkz_s[...] = dkze
            dkp_s[...] = dkpe
            al_s[...] = alive_n.astype(jnp.float32)
            ns_s[...] = ns_s[...] + (cs_f > 0.5).astype(jnp.int32)
            nb_s[...] = nb_s[...] + (cb_f > 0.5).astype(jnp.int32)
            return 0

        lax.fori_loop(0, nsteps, body, 0)

        T_out[0] = T_s[...]
        z_out[0] = z_s[...]
        p_out[0] = p_s[...]
        dT_out[0] = dT_s[...]
        dz_out[0] = dz_s[...]
        dp_out[0] = dp_s[...]
        nsurf_out[0] = ns_s[...]
        nbott_out[0] = nb_s[...]
        death_out[0] = de_s[...]

    return kernel


COEF_RD_LANES_MAX = 16384  # per-block (direction x ray) lane budget


def trace_pallas_coef_tangent_rd(env, z0, p0, dcoef, dcpcoef, geom, settings,
                                 interpret: bool = False):
    """Final-state trace with one forward tangent per (station, coefficient)
    direction of a RANGE-DEPENDENT spectral field.

    ``dcoef``/``dcpcoef`` are (Dk, K): Dk coefficient directions applied at
    every station in turn — grid block j perturbs station j, with all Dk
    directions x B rays packed into the block's lane axis (lane = g*B + b).
    Returns ``(T, z, p, dT, dz, dp, n_surf, n_bott, death)`` with primal
    fields (B,) and tangents (nr, Dk, B).  One launch for the whole
    (B, nr, Dk) range-dependent Jacobian — replaces nr*Dk jacfwd tangent
    passes through the XLA scan.  Ray batches whose Dk*B exceeds the
    per-block lane budget are split into chunked launches (still one jit).
    """
    from ..ops.interp import linear_interp

    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = jnp.float32
    if not env.range_dependent:
        raise ValueError("use trace_pallas_coef_tangent for range-independent fits")
    p0 = jnp.asarray(p0, dtype)
    B = p0.shape[0]
    dcoef = jnp.asarray(dcoef, dtype)
    dcpcoef = jnp.asarray(dcpcoef, dtype)
    Dk = dcoef.shape[0]
    nr = env.c_cheb.shape[0]
    z0v = jnp.broadcast_to(jnp.asarray(z0, dtype), (B,))

    Bc = max(1, COEF_RD_LANES_MAX // max(Dk, 1))
    if B > Bc:  # chunk the ray axis; each chunk is its own launch
        outs = [
            trace_pallas_coef_tangent_rd(
                env, z0v[lo:lo + Bc], p0[lo:lo + Bc], dcoef, dcpcoef,
                geom, settings, interpret=interpret,
            )
            for lo in range(0, B, Bc)
        ]
        return tuple(jnp.concatenate(parts, axis=-1) for parts in zip(*outs))

    K = env.c_cheb.shape[1]
    KP = -(-K // 128) * 128
    rep = lambda a: jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], 128))
    Kb = env.bangle_cheb.shape[0]
    bacoef = rep(env.bangle_cheb)

    # (direction, ray)-packed lane layout: lane l = g*B + b
    L = Dk * B
    R = max(1, -(-L // 128))
    Lpad = R * 128
    g_of_l = np.minimum(np.arange(Lpad) // B, Dk - 1)
    live = (np.arange(Lpad) < L).astype(np.float32)
    packl = lambda a: jnp.tile(a, -(-Lpad // B))[:Lpad].reshape(1, R, 128)
    p0p, z0p = packl(p0), packl(z0v)
    # K Clenshaw-iteration direction planes: dcpl[i][lane] = dcoef[g(lane), i]
    mk_planes = lambda dtab: (
        dtab[g_of_l, :] * jnp.asarray(live)[:, None]
    ).T.reshape(K, R, 128)
    dcpl, dcppl = mk_planes(dcoef), mk_planes(dcpcoef)

    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xsm = xs0 + 0.5 * h
    xs1 = x0 + (ks + 1.0) * h
    b0s = linear_interp(xs0, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b1s = linear_interp(xs1, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b0s = jnp.broadcast_to(b0s[:, None], (nsteps, 128))
    b1s = jnp.broadcast_to(b1s[:, None], (nsteps, 128))

    # Clenshaw-only primal station rows (direction conditioning; see
    # trace_pallas_coef_tangent) + per-step index/weight rows for the hats
    st_tab = _station_rows(env, dtype, K, KP, x0, xsm, xs1, use_pow=False)
    nblk = -(-nsteps // ST_BLOCK_W)
    st_tab = jnp.pad(
        st_tab, ((0, 1 + nblk * ST_BLOCK_W - st_tab.shape[0]), (0, 0), (0, 0))
    )
    stiw = _station_iw_rows(env, dtype, x0, xsm, xs1)

    consts, xoob64 = _launch_consts(env, settings, x0, h, nsteps, True, False)
    any_x_oob = consts[14]
    xoob = (
        jnp.broadcast_to(
            jnp.asarray(xoob64, dtype)[:, None], (nsteps, 128)
        )
        if any_x_oob else jnp.zeros((1, 128), dtype)
    )

    kernel = _make_coef_kernel_rd((x0, x1, h), consts, K, KP, Kb, nsteps)

    fvec = jax.ShapeDtypeStruct((nr, R, 128), dtype)
    ivec = jax.ShapeDtypeStruct((nr, R, 128), jnp.int32)
    out_shape = [fvec] * 6 + [ivec] * 3
    scratch = (
        [pltpu.VMEM((R, 128), dtype) for _ in range(12)]
        + [pltpu.VMEM((R, 128), dtype)]  # alive (f32)
        + [pltpu.VMEM((R, 128), jnp.int32) for _ in range(3)]
        + [pltpu.SMEM((2, ST_BLOCK_W, 1, 4 * KP), dtype),
           pltpu.SMEM((1, 4 * KP), dtype),
           pltpu.SemaphoreType.DMA((2,)), pltpu.SemaphoreType.DMA]
    )
    shared = pl.BlockSpec((1, R, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=(nr,),
        in_specs=[shared, shared]
        + [vmem_full] * 4
        + [pl.BlockSpec(memory_space=pl.ANY),
           pl.BlockSpec(memory_space=pltpu.SMEM),
           vmem_full, vmem_full],
        out_specs=[blocked] * 9,
        scratch_shapes=scratch,
        interpret=interpret,
    )(p0p, z0p, bacoef, b0s, b1s, xoob, st_tab, stiw, dcpl, dcppl)

    first = lambda a: a[0].reshape(Lpad)[:B]
    alld = lambda a: a.reshape(nr, Lpad)[:, :L].reshape(nr, Dk, B)
    (T, zf, pf, dT, dz, dp, ns, nb, dc) = outs
    return (first(T), first(zf), first(pf), alld(dT), alld(dz), alld(dp),
            first(ns), first(nb), first(dc))


BB_MAX = 16384  # rays per grid block (module-level so experiments can A/B it)


def _layout(B: int):
    """Ray-block layout: (nblocks, rows, block size, padded batch)."""
    nblocks = max(1, -(-B // BB_MAX))
    R = -(-B // (nblocks * 128))
    Bb = R * 128
    return nblocks, R, Bb, nblocks * Bb


_JIT_CACHE = LRUCache(256)

CALM_MARGIN_M = 30.0  # classification band (m); guard band audits at M/2


def _fit_eval_np(env, use_seg: bool, rows, zq):
    """Host evaluation of the profile AS THE KERNEL INTEGRATES IT.

    ``rows`` is a station slice/index array; ``zq`` (n,) depths.  Returns
    (n_rows, n) sound speeds from the segment fit or the Chebyshev series
    — never the raw table: near the ripple extrema of a rough field a
    sub-m/s table-vs-fit difference moves the Snell turning contour tens
    of meters, which would make a table-based calm proof unsound for the
    fit the kernel actually integrates.
    """
    zlo, zhi = env.z_dom
    if use_seg:
        from .seg import seg_eval_np

        coef = np.asarray(env.c_seg, np.float64)[rows]
        return np.atleast_2d(
            seg_eval_np(coef, zq, zlo, zhi, basis=env.seg_basis)
        )
    import numpy.polynomial.chebyshev as ncheb

    coef = np.asarray(env.c_cheb, np.float64)[rows]
    u = 2.0 * (np.asarray(zq, np.float64) - zlo) / (zhi - zlo) - 1.0
    return np.atleast_2d(ncheb.chebval(u, coef.T))


def _fit_band_min(env, use_seg: bool, lo_i, hi_i, z_a, z_b) -> float:
    """Min of the integrated profile over stations [lo_i, hi_i) × a dense
    depth grid of [z_a, z_b] (0.02 m spacing — ~10 samples per oscillation
    of the fastest fit the guards accept: an order-255 Chebyshev series
    oscillates on a ~0.2 m scale at the domain edge, where the surface
    band sits)."""
    zlo, zhi = env.z_dom
    z_a, z_b = max(float(z_a), zlo), min(float(z_b), zhi)
    if not z_b > z_a:
        return np.inf
    n = max(257, int((z_b - z_a) / 0.02) + 2)
    zq = np.linspace(z_a, z_b, n)
    return float(_fit_eval_np(env, use_seg, slice(lo_i, hi_i), zq).min())


def classify_calm(env, z0, p0, geom, settings=None):
    """Host-side Snell classification of the calm grid-block range.

    A ray with launch parameter ``a = cos(alpha)/c`` (the horizontally-
    stratified ray invariant) can only reach depth z where ``a*c(r,z) <= 1``
    — so a ray satisfying ``a * min c(band) > 1`` for the top
    ``CALM_MARGIN_M`` meters (resp. the band above the shallowest bathymetry
    point) can never touch that boundary.  The band minima and the launch
    sound speed are evaluated from the SAME profile backend the kernel
    integrates (Chebyshev series or segment fit, per ``settings``) — the
    raw table is a different function whose turning contours can sit tens
    of meters away on rough fields.  Range dependence drifts the
    invariant by ``da/dx = -c_x / (cos(alpha) c^2)`` (derived from the
    `derivsrd` ODE, reference integration_processes.py:176-215), bounded
    here by the table's worst range gradient.  Blocks whose every (edge-
    padded) lane passes both bands form the calm range; the kernel audits
    it at M/2 with death code 5, so a miss is visible, never silent.

    Returns a (4,) float32 ``[blk_lo, blk_hi, guard_lo, guard_hi]``
    (``blk_lo == blk_hi`` disables), or None when the inputs are traced or
    the geometry leaves no room for a safe interior.
    """
    got = _classify_safe_mask(env, z0, p0, geom, settings)
    if got is None:
        return None
    safe, bmin = got
    return _calm_range_from_mask(safe, bmin)


def classify_calm_sharded(env, z0, p0, geom, settings=None, n_shards=1):
    """Per-shard calm ranges for a fan sharded over a 1-D mesh axis.

    Each device launches the kernel on its local (B/n,) slice with its own
    block layout, so the calm range must be derived per shard.  Returns an
    (n_shards, 4) float32 array (rows as in ``classify_calm``; a row with
    ``blk_lo == blk_hi`` disables that shard), or None when classification
    declines entirely.
    """
    got = _classify_safe_mask(env, z0, p0, geom, settings)
    if got is None:
        return None
    safe, bmin = got
    B = safe.size
    if n_shards < 1 or B % n_shards:
        return None
    Bl = B // n_shards
    rows = []
    for i in range(n_shards):
        row = _calm_range_from_mask(safe[i * Bl:(i + 1) * Bl], bmin)
        rows.append(row if row is not None
                    else np.zeros(4, np.float32))
    if all(r[1] == r[0] for r in rows):
        return None
    return np.stack(rows)


def classify_calm_ensemble(env_ens, z0, p0, geom, settings=None):
    """Per-realization calm ranges for an ensemble trace: (E, 4) float32
    (rows as in ``classify_calm``; ``blk_lo == blk_hi`` disables that
    realization's launch), or None when classification declines entirely.

    ``p0`` is (B,) shared or (E, B) per-realization.  The ensemble leaves
    are pulled to the host in ONE overlapped ``jax.device_get`` and sliced
    in numpy — never one transfer per leaf or per realization.
    """
    leaves = (p0, z0, *jax.tree_util.tree_leaves(env_ens))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return None
    env_host, p0h = jax.device_get((env_ens, p0))
    p0h = np.asarray(p0h)
    E = env_host.c.shape[0]
    rows = []
    for e in range(E):
        env_e = jax.tree_util.tree_map(lambda a: a[e], env_host)
        p_e = p0h[e] if p0h.ndim == 2 else p0h
        row = classify_calm(env_e, z0, p_e, geom, settings)
        rows.append(row if row is not None else np.zeros(4, np.float32))
    if all(r[1] == r[0] for r in rows):
        return None
    return np.stack(rows)


def _classify_safe_mask(env, z0, p0, geom, settings, full=False):
    """Per-ray boundary-safety mask (see ``classify_calm``), or None.

    With ``full=True`` also returns the per-ray invariant ``a``, its drift
    allowance ``da``, the station window, and the boundary-band fit minima
    — the inputs ``classify_dyn`` (slope bound) and ``classify_hot``
    (provable-bounce test) need.
    """
    from ..envdata import host_profile_tables
    from ..integrate import SolverSettings, _use_cheb, _use_seg

    leaves = (p0, z0, *jax.tree_util.tree_leaves(env))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return None
    if settings is None:
        settings = SolverSettings()
    try:
        use_seg = (not _use_cheb(env, settings)) and _use_seg(env, settings)
    except ValueError:
        return None
    if not use_seg and not env.has_cheb:
        return None  # table-interpolation path: the kernel never runs it
    x0, x1, h, sps, nseg = geom
    M = CALM_MARGIN_M
    r_h, z_h, c_h = (np.asarray(a, float) for a in host_profile_tables(env))
    p = np.asarray(p0, float).ravel()
    z0a = np.broadcast_to(np.asarray(z0, float), p.shape)

    xs = x0 + np.arange(sps * nseg + 1) * h
    bath = np.interp(xs, np.asarray(env.bathy_r, float),
                     np.asarray(env.bathy, float))
    bmin = float(bath.min())
    if bmin - M <= M:  # no safe interior between the bands
        return None

    # launch sound speed per ray (station-blended at x0, fit-evaluated)
    i = int(np.clip(np.searchsorted(r_h, x0, "right") - 1, 0,
                    max(len(r_h) - 2, 0)))
    c_fit0 = _fit_eval_np(env, use_seg, [i, min(i + 1, len(r_h) - 1)], z0a)
    if len(r_h) > 1 and r_h[i + 1] > r_h[i]:
        w = float(np.clip((x0 - r_h[i]) / (r_h[i + 1] - r_h[i]), 0.0, 1.0))
        c0 = (1.0 - w) * c_fit0[0] + w * c_fit0[1]
    else:
        c0 = c_fit0[0]
    s0 = np.clip(c0 * p, -1.0, 1.0)
    a = np.sqrt(np.maximum(1.0 - s0 * s0, 0.0)) / c0

    # band minima over the traversed station window (one station of slack
    # each side — intermediate ranges are convex station blends, so the
    # window-station min is a valid lower bound)
    lo_i = max(0, int(np.searchsorted(r_h, min(x0, x1))) - 1)
    hi_i = min(len(r_h), int(np.searchsorted(r_h, max(x0, x1))) + 1)
    if hi_i <= lo_i:
        lo_i, hi_i = 0, len(r_h)
    c_min_surf = _fit_band_min(env, use_seg, lo_i, hi_i, z_h[0], M)
    c_min_bott = _fit_band_min(env, use_seg, lo_i, hi_i, bmin - M, bmin)
    c_win = c_h[lo_i:hi_i]

    # range-dependence drift allowance for the invariant: first the global
    # worst-gradient bound (da0), then — using da0 to bound each ray's own
    # reachable depth band — a window-by-window re-integration maxing the
    # gradient over that band only.  Internal-wave perturbations are
    # surface-intensified (N(z) ~ exp(-z/1000)): a ducted ray whose band
    # never nears the surface sees a fraction of the global gradient, which
    # is what lets IW-perturbed ensembles prove calm blocks at all.
    c_min_tab = float(c_win.min())
    cos_floor = np.maximum(a * c_min_tab, 0.5)
    if c_win.shape[0] > 1:
        rw = r_h[lo_i:hi_i]
        G = np.abs(np.diff(c_win, axis=0)) / np.diff(rw)[:, None]
        da = _banded_drift(G, rw, c_win, x0, x1, a,
                           cos_floor * c_min_tab * c_min_tab)
    else:
        da = np.zeros_like(a)

    safe = (((a - da) * c_min_surf > 1.0)
            & ((a - da) * c_min_bott > 1.0)
            & np.isfinite(p))
    if full:
        return (safe, bmin, a, da, p, use_seg, lo_i, hi_i,
                c_min_surf, c_min_bott)
    return safe, bmin


def _banded_drift(G, rw, c_win, x0, x1, a, denom):
    """Band-restricted drift allowance, integrated window-by-window along
    the ray's traversal.

    ``G`` (n_win, nz) is the table's per-station-window |∂c/∂r| — which is
    exactly the |c_x| of the field the kernel integrates, since intermediate
    ranges are linear station blends.  Induction over windows in traversal
    order: if the true invariant drift at the start of window w is ≤ da(w),
    then during w (whose own drift increment is a-priori ≤ the window's
    column-max bound ``cap``) the ray can only occupy depths where
    ``c_w(z) ≤ 1/(a - da(w) - cap)`` (cos θ = a_true·c ≤ 1), so the true
    increment is ≤ Δx_w · max over that band's contiguous hull of G_w.
    A ducted ray whose running drift stays under its surface Snell margin
    therefore keeps a surface-excluding band — and with it the small
    in-duct gradients — for the whole range, instead of the old global
    worst-gradient bound whose one-shot band was self-defeatingly wide.

    The 0.5 m/s haircut on the window column minimum covers table-vs-fit
    deviation in the *band edges* (the safety test itself stays
    fit-evaluated); a larger haircut only widens bands, i.e. is
    conservative.  Returns the per-ray total drift allowance.
    """
    nz = G.shape[1]
    # station windows clipped to the traversed range, in traversal order
    xa, xb = min(x0, x1), max(x0, x1)
    wlen = np.maximum(np.minimum(rw[1:], xb) - np.maximum(rw[:-1], xa), 0.0)
    order = np.flatnonzero(wlen > 0.0)
    if x1 < x0:
        order = order[::-1]

    da = np.zeros_like(a)
    for i in order:
        g = G[i]
        cmin_w = np.minimum(c_win[i], c_win[i + 1]) - 0.5
        # hull bounds of {z : cmin_w(z) <= t} via the running-min envelopes
        m_fwd = np.minimum.accumulate(cmin_w)        # non-increasing
        m_bwd = np.minimum.accumulate(cmin_w[::-1])[::-1]  # non-decreasing
        cap = wlen[i] * float(g.max()) / denom  # a-priori in-window overshoot
        t = 1.0 / np.maximum(a - da - cap, 1e-12)
        lo = nz - np.searchsorted(m_fwd[::-1], t, side="right")
        hi = np.searchsorted(m_bwd, t, side="right") - 1
        empty = hi < lo  # ray provably cannot occupy this window at all
        if empty.all():
            continue
        # band max via cummaxes around the common core (bands are nested:
        # they are sublevel-set hulls of one threshold family); empty-hull
        # rays are clamped to the core and masked out below
        lo_c = np.clip(np.where(empty, 0, lo), 0, nz - 1)
        hi_c = np.clip(np.where(empty, nz - 1, hi), 0, nz - 1)
        L0 = int(lo_c[~empty].max())
        H0 = int(hi_c[~empty].min())
        if L0 <= H0:
            core = g[L0:H0 + 1].max()
            left = np.maximum.accumulate(g[L0::-1])[::-1]
            right = np.maximum.accumulate(g[H0:])
            gmax = np.maximum(core, np.maximum(left[lo_c], right[hi_c - H0]))
        else:  # degenerate (non-nested edge case): direct per-ray slices
            gmax = np.array([g[l:h + 1].max() if h >= l else 0.0
                             for l, h in zip(lo_c, hi_c)])
        da = da + np.where(empty, 0.0, wlen[i] * gmax / denom)
    return da


def _calm_range_from_mask(safe, bmin):
    """Reduce a per-ray safety mask to the kernel's (4,) calm range for a
    batch of ``safe.size`` rays (edge-padded to the block layout)."""
    M = CALM_MARGIN_M
    B = safe.size
    nblocks, R, Bb, Bpad = _layout(B)
    safe_p = np.pad(safe, (0, Bpad - B), mode="edge")
    blk = safe_p.reshape(nblocks, -1).all(axis=1)

    # longest contiguous calm run of blocks
    best_lo = best_hi = 0
    run_lo = None
    for bi, ok in enumerate(list(blk) + [False]):
        if ok and run_lo is None:
            run_lo = bi
        elif not ok and run_lo is not None:
            if bi - run_lo > best_hi - best_lo:
                best_lo, best_hi = run_lo, bi
            run_lo = None
    if best_hi == best_lo:
        return None
    return np.array([best_lo, best_hi, 0.5 * M, bmin - 0.5 * M], np.float32)


def classify_dyn(env, z0, p0, geom, settings=None):
    """Per-block dynamic-window parameters for the mega-kernel's non-calm
    branch: an (nblocks, 4) float32 table of ``[wstep, slack, aud_lo,
    aud_hi]`` rows, or None when classification declines.

    ``wstep`` is an upper bound on how far (in depth, meters) any ray of
    the block can move per save segment: |dz/dx| = |tan θ| with
    cos θ = a_true·c ≥ (a − da)·c_lb, where ``da`` is the banded drift
    allowance and ``c_lb`` a sampled-plus-haircut lower bound of the fit
    over the whole column (a larger haircut only shortens windows —
    conservative).  The kernel then proves, from its runtime distance D to
    the audit band, that the next ⌊(D − slack)/wstep⌋ segments cannot
    touch a boundary and runs them event-free.  Blocks whose slope bound
    degenerates (a − da ≤ 0, or sin θ within 0.1% of the vertical-death
    limit, which also guarantees no in-window vertical deaths) get
    ``wstep = 0`` (disabled).
    """
    from ..integrate import SolverSettings

    if settings is None:
        settings = SolverSettings()
    got = _classify_safe_mask(env, z0, p0, geom, settings, full=True)
    if got is None:
        return None
    safe, bmin, a, da, p, use_seg, lo_i, hi_i, _, _ = got
    x0, x1, h, sps, nseg = geom
    M = CALM_MARGIN_M
    aud_lo = 0.25 * M
    aud_hi = bmin - 0.25 * M
    if aud_hi <= aud_lo:
        return None

    zlo, zhi = env.z_dom
    zq = np.linspace(zlo, zhi, 4096)
    c_lb = float(_fit_eval_np(env, use_seg, slice(lo_i, hi_i), zq).min()) - 1.0
    if c_lb <= 0.0:
        return None
    cos_lb = (a - da) * c_lb
    sin_lim = math.sin(math.radians(settings.vertical_limit_deg))
    smax = np.sqrt(np.maximum(1.0 - np.square(np.minimum(cos_lb, 1.0)), 0.0))
    valid = (cos_lb > 0.05) & (smax < 0.999 * sin_lim) & np.isfinite(p)
    tan = np.where(valid, smax / np.maximum(cos_lb, 1e-6), np.inf)

    B = tan.size
    nblocks, R, Bb, Bpad = _layout(B)
    tan_b = np.pad(tan, (0, Bpad - B), mode="edge").reshape(nblocks, -1).max(1)
    ok = np.isfinite(tan_b)
    if not ok.any():
        return None
    seg_len = sps * h
    wstep = np.where(ok, 1.15 * tan_b * seg_len, 0.0)
    slack = np.where(ok, 2.0 * h * tan_b + 1.0, 0.0)
    return np.stack(
        [wstep, slack, np.full(nblocks, aud_lo), np.full(nblocks, aud_hi)],
        axis=1,
    ).astype(np.float32)


def classify_dyn_sharded(env, z0, p0, geom, settings=None, n_shards=1):
    """Per-shard dynamic-window tables for a fan sharded over a 1-D mesh
    axis: (n_shards, nblocks_local, 4) float32 (rows as in
    ``classify_dyn`` for each shard's local block layout), or None when
    classification declines entirely."""
    leaves = (p0, z0, *jax.tree_util.tree_leaves(env))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return None
    p0h = np.asarray(jax.device_get(p0)).ravel()
    B = p0h.size
    if n_shards < 1 or B % n_shards:
        return None
    Bl = B // n_shards
    nblocks = _layout(Bl)[0]
    rows = []
    for i in range(n_shards):
        row = classify_dyn(env, z0, p0h[i * Bl:(i + 1) * Bl], geom, settings)
        rows.append(row if row is not None
                    else np.zeros((nblocks, 4), np.float32))
    if all((r[:, 0] <= 0.0).all() for r in rows):
        return None
    return np.stack(rows)


def classify_dyn_ensemble(env_ens, z0, p0, geom, settings=None):
    """Per-realization dynamic-window tables for an ensemble trace:
    (E, nblocks, 4) float32 (rows as in ``classify_dyn``; an all-zero
    realization row disables its launch's windows), or None when
    classification declines entirely.  One overlapped host pull, like
    ``classify_calm_ensemble``."""
    leaves = (p0, z0, *jax.tree_util.tree_leaves(env_ens))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return None
    env_host, p0h = jax.device_get((env_ens, p0))
    p0h = np.asarray(p0h)
    E = env_host.c.shape[0]
    nblocks = _layout(p0h.shape[-1])[0]
    rows = []
    for e in range(E):
        env_e = jax.tree_util.tree_map(lambda a: a[e], env_host)
        p_e = p0h[e] if p0h.ndim == 2 else p0h
        row = classify_dyn(env_e, z0, p_e, geom, settings)
        rows.append(row if row is not None
                    else np.zeros((nblocks, 4), np.float32))
    if all((r[:, 0] <= 0.0).all() for r in rows):
        return None
    return np.stack(rows)


# minimum expected boundary crossings per step, per non-calm block, for
# the hot-block (unconditional event body) compilation to engage.  The
# launch-angle estimate below underestimates near-boundary slopes, so 2.0
# leaves a wide true margin; the headline boundary stripes measure ~50-80.
HOT_MIN_CROSS = 2.0


def classify_hot(env, z0, p0, geom, settings=None):
    """Host policy for the hot-block kernel variant: True when EVERY
    non-calm grid block is expected to trip the crossing branch nearly
    every step, so compiling its event fix unconditionally (no per-step
    ``any(cross)`` vector->scalar reduction, no duplicate plain update)
    only removes overhead.

    MEASURED NEGATIVE as a default policy (bench.py --hot, 2026-08-19
    interleaved paired A/B: headline calm-on 0.845x, RD 0.757x — quiet
    steps are still frequent enough that always paying the fix arithmetic
    swamps the saved reduction), so ``SolverSettings.hot`` defaults to
    "off"; the classifier drives the experimental "auto" mode.

    Unlike ``classify_calm`` this needs no proof — a wrong answer costs
    speed, never correctness (the unconditional fix is lane-wise
    equivalent to the branched one: bitwise identical on hardware, the
    --hot gate) — but the estimate is still built
    conservatively toward NOT hot: a ray counts as bouncing only when
    even a favorable invariant drift cannot lift its Snell turning point
    out of a boundary band, and its crossing rate uses the launch-angle
    slope ``tan θ0`` (a lower bound on the near-boundary slope).  A
    bouncing ray touches a boundary about every ``bmin/tan θ0`` of range,
    so a block's expected crossings per step is ``Σ h·tanθ0/bmin`` over
    its bouncing rays; hot requires every non-calm block to clear
    ``HOT_MIN_CROSS``.
    """
    from ..integrate import SolverSettings

    if settings is None:
        settings = SolverSettings()
    got = _classify_safe_mask(env, z0, p0, geom, settings, full=True)
    if got is None:
        return False
    safe, bmin, a, da, p, use_seg, lo_i, hi_i, c_surf, c_bott = got
    x0, x1, h, sps, nseg = geom

    bounce = ((((a + da) * c_surf <= 1.0) | ((a + da) * c_bott <= 1.0))
              & np.isfinite(p) & (a > 0.0))
    tan0 = np.abs(p) / np.maximum(a, 1e-12)
    rate = np.where(bounce, abs(h) * tan0 / bmin, 0.0)

    B = rate.size
    nblocks, R, Bb, Bpad = _layout(B)
    # zero-pad: padded lanes duplicate the edge ray and cross at the SAME
    # steps, so they add no new any(cross) events
    rate_b = np.pad(rate, (0, Bpad - B)).reshape(nblocks, -1).sum(1)
    mask = np.ones(nblocks, bool)
    calm_row = _calm_range_from_mask(safe, bmin)
    if calm_row is not None:
        mask[int(calm_row[0]):int(calm_row[1])] = False
    if not mask.any():
        return False
    return bool(rate_b[mask].min() >= HOT_MIN_CROSS)


_CALM_CACHE = {}  # (id(env), id(p0), z0 key, geom) -> (4,) f32 or None
_CALM_OFF = {}  # backend name -> device-resident all-zeros (disables calm)


def _calm_disabled(shape=(4,)):
    """Device-resident zeros of ``shape`` (calm disabled) — memoized per
    (backend, shape) so the per-call device allocation/dispatch (~10-20 ms
    on the axon tunnel) is paid once.  Sharded/ensemble launchers pass
    their (n, 4) table shapes."""
    k = (jax.default_backend(), tuple(shape))
    got = _CALM_OFF.get(k)
    if got is None:
        got = _CALM_OFF[k] = jnp.zeros(shape, jnp.float32)
    return got


def _classify_calm_cached(env, z0, p0, geom, settings=None, n_shards=1,
                          ensemble=False):
    """Memoized ``classify_calm`` keyed on the (env, p0, z0) OBJECTS.

    Classification pulls ``p0`` to the host — a ~10-20 ms D2H transfer on
    the axon tunnel — so repeated traces of the same fan (benchmark loops,
    eigenray full-save re-traces) must not reclassify.  Entries hold no
    array references; weakref finalizers evict them when any key object is
    collected, so an id() can never alias a new array.
    """
    import weakref

    leaves = (p0, z0, *jax.tree_util.tree_leaves(env))
    if any(isinstance(x, jax.core.Tracer) for x in leaves):
        return None
    try:
        z0_key, z0_obj = float(z0), None
    except (TypeError, ValueError):
        z0_key, z0_obj = id(z0), z0
    # the resolved profile backend changes the classification (the fit is
    # what the kernel integrates), so it is part of the key
    interp = settings.interp if settings is not None else "auto"
    k = (id(env), id(p0), z0_key, geom, interp, n_shards, ensemble)
    if k in _CALM_CACHE:
        return _CALM_CACHE[k]
    if ensemble == "hot":
        calm = classify_hot(env, z0, p0, geom, settings)  # a plain bool
    elif ensemble == "dyn":
        calm = classify_dyn(env, z0, p0, geom, settings)
    elif ensemble == "dyn_ens":
        calm = classify_dyn_ensemble(env, z0, p0, geom, settings)
    elif ensemble == "dyn_sh":
        calm = classify_dyn_sharded(env, z0, p0, geom, settings, n_shards)
    elif ensemble:
        calm = classify_calm_ensemble(env, z0, p0, geom, settings)
    elif n_shards > 1:
        calm = classify_calm_sharded(env, z0, p0, geom, settings, n_shards)
    else:
        calm = classify_calm(env, z0, p0, geom, settings)
    if calm is not None and ensemble != "hot":
        calm = jnp.asarray(calm)  # device-resident: one H2D, not per call
    try:
        for obj in (env, p0) + ((z0_obj,) if z0_obj is not None else ()):
            weakref.finalize(obj, _CALM_CACHE.pop, k, None)
    except TypeError:
        return calm  # a key object is not weakref-able: do not cache
    _CALM_CACHE[k] = calm
    return calm


def _get_fn(env, geom, settings, p_shape, z_shape, interpret=False,
            use_dyn=False, hot=False):
    key = (env_struct_key(env), geom, settings, p_shape, z_shape, interpret,
           use_dyn, hot)
    fn = _JIT_CACHE.get(key)
    if fn is None:
        if use_dyn:
            fn = jax.jit(
                lambda envarg, p, z, cm, dy: trace_pallas(
                    envarg, z, p, geom, settings, interpret=interpret,
                    calm=cm, dyn=dy
                )
            )
        else:
            fn = jax.jit(
                lambda envarg, p, z, cm: trace_pallas(
                    envarg, z, p, geom, settings, interpret=interpret,
                    calm=cm, hot=hot
                )
            )
        _JIT_CACHE.put(key, fn)
    return fn


def trace_pallas_cached(env, z0, p0, geom, settings, interpret=False,
                        calm=None, dyn=None, hot=None):
    """Memoized jitted kernel launcher keyed on the environment *structure*
    (shapes/dtypes/static metadata), so traces over same-shaped environments
    — eigenray iterations, Monte-Carlo realizations — reuse one executable.
    The calm-block range rides as a runtime argument: per-fan classification
    never recompiles.  ``calm`` overrides the classifier (callers jitting
    around trace() can classify their concrete fan once on the host and
    thread the range through the trace); ``dyn`` likewise overrides
    ``classify_dyn`` for the dynamic-window table (``settings.dyn_calm``).
    """
    z0a = jnp.asarray(z0, env.c.dtype)
    # No auto-classification in interpret mode: the interpreter contracts
    # FMAs differently across the calm/event graph shapes, and on rough
    # (chaotic) fields that ulp seed amplifies into spurious guard deaths
    # over long ranges.  On hardware the two bodies are bitwise identical
    # (bench.py equivalence gate); interpret mode is for testing, where
    # the calm path is exercised by passing ``calm=`` explicitly.
    if calm is None and settings.calm and not interpret:
        calm = _classify_calm_cached(env, z0, p0, geom, settings)
    # auto-dyn policy (hardware-measured, bench.py --dyn interleaved
    # paired A/B, 2026-08-19): dynamic windows win only where NO static
    # calm proof exists and every block pays the event body (+5% median
    # on the calm-off headline; rough/IW ensembles are the production
    # case — their drift never proves static calm).  With static calm
    # present they measure neutral (RD +0.9%) to mildly negative
    # (headline -2.3%: boundary-block bounce phases decohere and the
    # countdown pins at 0), so the policy applies them only when the
    # static classifier declined.  Explicit ``dyn=`` always wins.
    if (dyn is None and settings.dyn_calm and not interpret
            and calm is None):
        dyn = _classify_calm_cached(env, z0, p0, geom, settings,
                                    ensemble="dyn")
    use_dyn = dyn is not None
    # hot-block policy: non-calm blocks whose rays provably bounce nearly
    # every step compile the event fix unconditionally (classify_hot — a
    # scheduling decision, lane-wise equivalent either way).  Auto is
    # gated off in interpret mode like calm (the interpreter contracts
    # FMAs differently across the two graph shapes; on hardware they are
    # bitwise identical — bench.py --hot equivalence gate).  Explicit
    # ``hot=`` always wins (callers jitting around trace() classify on
    # the host, like ``calm=``).
    if hot is None:
        hot = (settings.hot == "auto" and not interpret and not use_dyn
               and calm is not None
               and _classify_calm_cached(env, z0, p0, geom, settings,
                                         ensemble="hot"))
    if calm is None:
        calm = _calm_disabled()
    fn = _get_fn(env, geom, settings, p0.shape, z0a.shape, interpret,
                 use_dyn, bool(hot))
    if use_dyn:
        return fn(env, p0, z0a, jnp.asarray(calm), jnp.asarray(dyn))
    return fn(env, p0, z0a, jnp.asarray(calm))


_SHARD_CACHE = LRUCache(64)


def shardable_pallas(p0, z0a) -> bool:
    """True when a sharded ray batch can be dispatched through the per-device
    mega-kernel: a 1D NamedSharding over a single mesh axis, the batch evenly
    divisible across shards, and a per-ray z0 (if any) sharded identically."""
    from jax.sharding import NamedSharding

    sh = getattr(p0, "sharding", None)
    if not isinstance(sh, NamedSharding) or len(sh.device_set) < 2:
        return False
    spec = sh.spec
    if len(spec) != 1 or not isinstance(spec[0], str):
        return False
    n_shards = sh.mesh.shape[spec[0]]
    if p0.shape[0] % n_shards != 0:
        return False
    if z0a.ndim == 1 and getattr(z0a, "sharding", None) != sh:
        return False
    return True


def trace_pallas_sharded(env, z0, p0, geom, settings, interpret=False,
                         calm=None, dyn=None):
    """Mega-kernel fan trace over a device mesh: one kernel launch per device
    via ``jax.shard_map`` on the ray axis, environment replicated.

    This is the multi-chip fast path — without it a sharded fan forfeits the
    kernel's throughput by falling back to the XLA scan.  Rays never
    communicate (the reference's process fan,
    `/root/reference/src/pygenray/launch_rays.py:119-164`), so there are no
    collectives inside the trace at all.  ``calm`` is an optional
    (n_shards, 4) per-shard calm-range table (``classify_calm_sharded``);
    by default each shard's range is classified on the host, so every
    device skips the event machinery for its own provably-safe blocks.
    ``dyn`` is an optional (n_shards, nblocks_local, 4) per-shard
    dynamic-window table (``classify_dyn_sharded``); the auto policy
    matches trace_pallas_cached (RD fields or calm-less fans only).
    """
    from jax.sharding import PartitionSpec as P

    from ..integrate import TraceResult

    x0, x1, h, sps, nseg = geom
    dtype = env.c.dtype
    z0a = jnp.asarray(z0, dtype)
    sh = p0.sharding
    mesh, axis = sh.mesh, sh.spec[0]
    n_shards = mesh.shape[axis]
    z_per_ray = z0a.ndim == 1

    if calm is None and settings.calm and not interpret:
        calm = _classify_calm_cached(env, z0, p0, geom, settings,
                                     n_shards=n_shards)
    cm_tab = (_calm_disabled((n_shards, 4)) if calm is None
              else jnp.asarray(calm, jnp.float32))
    if (dyn is None and settings.dyn_calm and not interpret
            and calm is None):
        dyn = _classify_calm_cached(env, z0, p0, geom, settings,
                                    n_shards=n_shards, ensemble="dyn_sh")
    use_dyn = dyn is not None
    dy_tab = (jnp.asarray(dyn, jnp.float32) if use_dyn
              else jnp.zeros((n_shards, 1, 4), jnp.float32))

    key = (env_struct_key(env), geom, settings, p0.shape, z0a.shape,
           mesh, axis, interpret, use_dyn)
    fn = _SHARD_CACHE.get(key)
    if fn is None:

        def local(envarg, zz, pp, cm, dy):
            res = trace_pallas(envarg, zz, pp, geom, settings,
                               interpret=interpret, calm=cm[0],
                               dyn=dy[0] if use_dyn else None)
            return (res.ts, res.zs, res.ps, res.alive_save,
                    res.n_bott, res.n_surf, res.alive, res.death_code)

        ray2 = P(axis, None)
        ray1 = P(axis)
        fn = jax.jit(
            jax.shard_map(
                local,
                mesh=mesh,
                in_specs=(P(), ray1 if z_per_ray else P(), ray1,
                          P(axis, None), P(axis, None, None)),
                out_specs=(ray2, ray2, ray2, ray2, ray1, ray1, ray1, ray1),
                # pallas_call out_shapes carry no varying-mesh-axes metadata
                check_vma=False,
            )
        )
        _SHARD_CACHE.put(key, fn)

    ts, zs, ps, alive_save, n_bott, n_surf, alive, death = fn(
        env, z0a, p0, cm_tab, dy_tab
    )
    num_save = nseg + 1
    rs = x0 + (x1 - x0) * jnp.arange(num_save, dtype=dtype) / nseg
    return TraceResult(
        rs=rs, ts=ts, zs=zs, ps=ps,
        n_bott=n_bott, n_surf=n_surf,
        alive=alive, alive_save=alive_save, death_code=death,
    )


def _station_iw_rows(env, dtype, x0, xsm, xs1):
    """Per-step station interval index + blend weight rows for SMEM:
    row 0 = the x0 init values, row 1+k = step k's [i_m, w_m, i_1, w_1]
    (indices as floats; nr < 2^24 so the int round-trip is exact)."""
    from ..ops.interp import interval_index

    def iw(x):
        i = interval_index(x, env.r, env.uniform_r)
        w = (x - env.r[i]) / (env.r[i + 1] - env.r[i])
        return i.astype(dtype), w.astype(dtype)

    i0_, w0_ = iw(jnp.asarray([x0], dtype))
    im_, wm_ = iw(xsm)
    i1_, w1_ = iw(xs1)
    return jnp.concatenate(
        [
            jnp.stack([i0_, w0_, jnp.zeros_like(i0_), jnp.zeros_like(w0_)], 1),
            jnp.stack([im_, wm_, i1_, w1_], 1),
        ],
        axis=0,
    )


def _station_rows(env, dtype, K, KP, x0, xsm, xs1, use_pow=False):
    """Per-step blended station coefficients packed as SMEM-DMA rows.

    Returns (nsteps+1, 1, 4*KP): row 0 holds the init (x0) planes
    [c | dcdz | 0 | 0]; row j+1 holds step j's [c_m | cp_m | c_1 | cp_1].
    Each field is padded from K to KP (the 128-lane DMA tile).  These are
    scalar rows — 128x smaller than lane-replicated VMEM planes — consumed
    by the kernel via SMEM scalar reads that broadcast for free.
    """
    from ..ops.interp import interval_index

    if use_pow:
        ctab, cptab = env.c_pow.astype(dtype), env.dcdz_pow.astype(dtype)
    else:
        ctab, cptab = env.c_cheb.astype(dtype), env.dcdz_cheb.astype(dtype)

    def blend_rows(x):
        i = interval_index(x, env.r, env.uniform_r)
        w = ((x - env.r[i]) / (env.r[i + 1] - env.r[i]))[:, None]
        return (
            (1.0 - w) * ctab[i] + w * ctab[i + 1],
            (1.0 - w) * cptab[i] + w * cptab[i + 1],
        )

    padk = lambda a: jnp.pad(a, ((0, 0), (0, KP - K)))
    cm, cpm = blend_rows(xsm)  # (nsteps, K)
    c1, cp1 = blend_rows(xs1)
    step_rows = jnp.concatenate([padk(cm), padk(cpm), padk(c1), padk(cp1)], axis=1)
    ci0, cpi0 = blend_rows(jnp.asarray([x0], dtype))
    init_row = jnp.concatenate(
        [padk(ci0), padk(cpi0), jnp.zeros((1, 2 * KP), dtype)], axis=1
    )
    # rows are sliced one at a time for the SMEM DMA: keep the sliced axis
    # leading and UNtiled (a (nsteps, 4KP) 2D array would tile the row axis
    # by 8 and reject the single-row slice)
    return jnp.concatenate([init_row, step_rows], axis=0)[:, None, :]


def trace_pallas(env, z0, p0, geom, settings, interpret: bool = False,
                 calm=None, dyn=None, hot: bool = False):
    """Run the mega-kernel; returns a TraceResult (ODE convention).

    ``p0`` is (B,); B is padded internally to a multiple of the lane block.
    ``calm`` is an optional runtime (4,) f32 ``[blk_lo, blk_hi, guard_lo,
    guard_hi]`` from ``classify_calm`` — grid blocks in [blk_lo, blk_hi)
    take the event-free step path (None disables; the values are runtime
    scalars, so per-fan calm ranges never recompile).

    ``dyn`` is an optional (nblocks, 4) f32 table from ``classify_dyn``
    (rows ``[wstep, slack, aud_lo, aud_hi]``; ``wstep <= 0`` disables that
    block): non-calm blocks then run the countdown-windowed loop — the
    event-free body between bounce clusters, proven per segment from the
    block's distance to the audit band and its Snell slope bound.  The
    table is runtime data, but whether the windowed loop is COMPILED is
    static (``dyn is None`` keys the kernel build), so passing/omitting it
    recompiles once per launcher.

    ``hot`` (static bool) compiles the non-calm blocks' step with the
    crossing fix UNconditional — no per-step ``any(cross)`` reduction and
    no duplicate plain update.  Purely a scheduling decision: the fix's
    ``where()`` merges reduce to the plain update on non-crossing lanes,
    so a wrong setting costs speed, never correctness (``classify_hot``
    is the host policy).  Ignored when ``dyn`` windows are active.
    """
    from ..integrate import TraceResult
    from ..ops.interp import interval_index, linear_interp

    from ..integrate import _use_cheb, _use_seg

    x0, x1, h, sps, nseg = geom
    nsteps = sps * nseg
    dtype = jnp.float32
    p0 = jnp.asarray(p0, dtype)
    B = p0.shape[0]
    z0v = jnp.broadcast_to(jnp.asarray(z0, dtype), (B,))

    # block layout: rows of 128 lanes; padding replicates the edge ray so
    # padded lanes share its calm classification and never trip the event
    # branch on their own (a zero-pad lane is a surface-grazing horizontal
    # ray)
    nblocks, R, Bb, Bpad = _layout(B)
    p0p = jnp.pad(p0, (0, Bpad - B), mode="edge").reshape(nblocks, R, 128)
    z0p = jnp.pad(z0v, (0, Bpad - B), mode="edge").reshape(nblocks, R, 128)
    if calm is None:
        calm = jnp.zeros((4,), dtype)
    else:
        calm = jnp.asarray(calm, dtype)
    use_dyn = dyn is not None
    if use_dyn:
        dyn = jnp.asarray(dyn, dtype)
        assert dyn.shape == (nblocks, 4), (dyn.shape, nblocks)
    else:
        dyn = jnp.zeros((1, 4), dtype)

    rd = bool(env.range_dependent)
    use_cheb = _use_cheb(env, settings)
    use_seg = (not use_cheb) and _use_seg(env, settings)
    use_pow = use_cheb and bool(env.poly_ok)
    rep = lambda a: jnp.broadcast_to(a.astype(dtype)[:, None], (a.shape[0], 128))
    if use_seg:
        # lane = segment tables: (K, 128) for range-independent, the full
        # (nr, K, 128) station tables resident in VMEM for range-dependent
        K = env.c_seg.shape[1]
        if rd:
            ccoef = env.c_seg.astype(dtype)
            cpcoef = env.dcdz_seg.astype(dtype)
        else:
            ccoef = env.c_seg[0].astype(dtype)
            cpcoef = env.dcdz_seg[0].astype(dtype)
    else:
        K = env.c_cheb.shape[1]
        ctab0, cptab0 = (env.c_pow, env.dcdz_pow) if use_pow else (env.c_cheb, env.dcdz_cheb)
        ccoef = rep(ctab0[0])  # (K, 128) lane-replicated
        cpcoef = rep(cptab0[0])
    Kb = env.bangle_cheb.shape[0]
    bacoef = rep(env.bangle_cheb)

    ks = jnp.arange(nsteps, dtype=dtype)
    xs0 = x0 + ks * h
    xsm = xs0 + 0.5 * h
    xs1 = x0 + (ks + 1.0) * h
    b0s = linear_interp(xs0, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b1s = linear_interp(xs1, env.bathy_r, env.bathy, env.uniform_bathy_r).astype(dtype)
    b0s = jnp.broadcast_to(b0s[:, None], (nsteps, 128))
    b1s = jnp.broadcast_to(b1s[:, None], (nsteps, 128))

    KP = -(-K // 128) * 128  # station rows padded to the lane tile for DMA
    STW = ST_BLOCK_W  # steps per station-DMA block
    if rd and not use_seg:
        st_tab = _station_rows(env, dtype, K, KP, x0, xsm, xs1, use_pow)
        nblk = -(-nsteps // STW)
        st_tab = jnp.pad(st_tab, ((0, 1 + nblk * STW - st_tab.shape[0]), (0, 0), (0, 0)))
    else:
        st_tab = jnp.zeros((1, 1, 4 * KP), dtype)

    if rd and use_seg:
        stiw = _station_iw_rows(env, dtype, x0, xsm, xs1)
    else:
        stiw = jnp.zeros((1, 4), dtype)

    consts, xoob64 = _launch_consts(env, settings, x0, h, nsteps, rd, use_pow,
                                    use_seg)
    any_x_oob = consts[14]
    xoob = (
        jnp.broadcast_to(
            jnp.asarray(xoob64, dtype)[:, None], (nsteps, 128)
        )
        if any_x_oob else jnp.zeros((1, 128), dtype)
    )

    kernel = _make_kernel((x0, x1, h), consts, K, KP, Kb, R, nseg, sps, STW,
                          dyn=use_dyn, hot=bool(hot) and not use_dyn)

    num_save = nseg + 1
    out_shape = [
        jax.ShapeDtypeStruct((num_save, nblocks, R, 128), dtype),  # ts
        jax.ShapeDtypeStruct((num_save, nblocks, R, 128), dtype),  # zs
        jax.ShapeDtypeStruct((num_save, nblocks, R, 128), dtype),  # ps
        jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32),  # n_surf
        jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32),  # n_bott
        jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32),  # death
        jax.ShapeDtypeStruct((nblocks, R, 128), jnp.int32),  # first-dead save idx
    ]
    # T, Tc, z, zc, p, kT, kz, kp, alive(f32) | ns, nb, death, first-dead idx
    # | backwards-dead mask | save staging
    # | RD station SMEM W-step block double-buffer + init row
    # | save sems | station sems | init sem
    scratch = (
        [pltpu.VMEM((R, 128), dtype) for _ in range(9)]
        + [pltpu.VMEM((R, 128), jnp.int32) for _ in range(4)]
        + [
            pltpu.VMEM((R, 128), dtype),  # backwards-dead mask (f32 0/1)
            pltpu.VMEM((3, R, 128), dtype),
            pltpu.SMEM((2, STW, 1, 4 * KP), dtype),
            pltpu.SMEM((1, 4 * KP), dtype),  # init (x0) station row
            pltpu.SemaphoreType.DMA((3,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,  # init-row copy
            # segment-mode blended station planes [c_m, cp_m, c_1, cp_1]
            pltpu.VMEM((4, K, 128) if (rd and use_seg) else (1, 1, 128), dtype),
            pltpu.SMEM((1,), jnp.int32),  # dynamic-window countdown
        ]
    )

    grid = (nblocks,)
    vmem_full = pl.BlockSpec(memory_space=pltpu.VMEM)
    blocked = pl.BlockSpec((1, R, 128), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # calm range + guard band
        pl.BlockSpec(memory_space=pltpu.SMEM),  # per-block dynamic-window rows
        blocked,  # p0
        blocked,  # z0
        vmem_full,  # ccoef
        vmem_full,  # cpcoef
        vmem_full,  # bacoef
        vmem_full,  # b0s
        vmem_full,  # b1s
        vmem_full,  # xoob (host-f64 per-step domain-exit flags)
        pl.BlockSpec(memory_space=pl.ANY),  # st_tab (DMA'd per step)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # stiw (seg station idx/weights)
    ]
    out_specs = [
        pl.BlockSpec(memory_space=pltpu.HBM),  # save grids stay off-chip
        pl.BlockSpec(memory_space=pltpu.HBM),
        pl.BlockSpec(memory_space=pltpu.HBM),
        blocked,
        blocked,
        blocked,
        blocked,
    ]

    ts, zs, ps, n_surf, n_bott, death, dseg = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(calm, dyn, p0p, z0p, ccoef, cpcoef, bacoef, b0s, b1s, xoob, st_tab,
      stiw)

    def unblock(a):  # (num_save, nblocks, R, 128) -> (B, num_save)
        return a.reshape(num_save, Bpad).T[:B]

    def unblock1(a):  # (nblocks, R, 128) -> (B,)
        return a.reshape(Bpad)[:B]

    ts = unblock(ts)
    zs = unblock(zs)
    ps = unblock(ps)
    # alive at save point k  <=>  k precedes the ray's first-dead save index
    alive_save = jnp.arange(num_save, dtype=jnp.int32)[None, :] < unblock1(dseg)[:, None]
    n_surf = unblock1(n_surf)
    n_bott = unblock1(n_bott)
    death = unblock1(death)
    alive = death == 0
    rs = x0 + (x1 - x0) * jnp.arange(num_save, dtype=dtype) / nseg
    return TraceResult(
        rs=rs, ts=ts, zs=zs, ps=ps,
        n_bott=n_bott, n_surf=n_surf,
        alive=alive,
        alive_save=alive_save,
        death_code=death,
    )
