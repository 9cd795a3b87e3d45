"""Chebyshev "spectral profile" representation — the TPU fast path.

TPU vector units are fast at fused multiply-adds and slow at scattered
gathers.  The reference's hot loop does two table interpolations per
derivative evaluation (`/root/reference/src/pygenray/integration_processes.py:86-87`)
— a gather-bound pattern that measures ~25x slower on TPU than evaluating a
fitted polynomial.  So at environment construction we fit each sound-speed
profile column c(z) (and the tabulated dc/dz column) with a Chebyshev series
and evaluate on device with the Clenshaw recurrence: pure FMAs, no gathers.

The fit is guarded: ``fit_profile_cheb`` reports the max residual against the
table, and the engine falls back to exact table interpolation when the
residual exceeds tolerance (rough/measured profiles).  For smooth analytic
profiles (Munk, linear gradient, isovelocity) the fit is exact to roundoff.

Range dependence: coefficients are fitted per range station and blended
linearly in range, which is exactly the bilinear-in-range structure of the
reference field applied to the fitted columns.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

__all__ = [
    "fit_profile_cheb", "fit_series_cheb", "clenshaw", "cheb_mirror",
    "cheb2poly_matrix", "horner", "poly_ok",
]


def fit_series_cheb(x: np.ndarray, y: np.ndarray, order: int, lo=None, hi=None):
    """Least-squares Chebyshev fit of samples y(x) on domain [lo, hi].

    Returns (coef (order+1,), max_abs_residual).
    """
    import numpy.polynomial.chebyshev as ncheb

    x = np.asarray(x, np.float64)
    y = np.asarray(y, np.float64)
    lo = x[0] if lo is None else lo
    hi = x[-1] if hi is None else hi
    order = min(order, len(x) - 1)
    f = ncheb.Chebyshev.fit(x, y, order, domain=[lo, hi])
    resid = float(np.max(np.abs(f(x) - y)))
    coef = np.zeros(order + 1)
    coef[: len(f.coef)] = f.coef
    return coef, resid


def fit_profile_cheb(c: np.ndarray, z: np.ndarray, order: int = 47):
    """Fit every range-station column of c(r, z) with a Chebyshev series.

    Parameters
    ----------
    c : (nr, nz) sound-speed (or dc/dz) table
    z : (nz,) depth grid
    order : polynomial order (K-1)

    Returns
    -------
    coef : (nr, K) per-station coefficients on domain [z[0], z[-1]]
    max_resid : worst-case absolute fit residual over the whole table
    """
    import numpy.polynomial.chebyshev as ncheb

    c = np.atleast_2d(np.asarray(c, np.float64))
    z = np.asarray(z, np.float64)
    order = min(order, len(z) - 1)
    K = order + 1
    nr = c.shape[0]
    coef = np.zeros((nr, K))
    max_resid = 0.0
    # vectorized fit: chebfit supports 2D rhs (columns = separate fits)
    u = (2.0 * z - (z[0] + z[-1])) / (z[-1] - z[0])
    cf = ncheb.chebfit(u, c.T, order)  # (K, nr)
    coef[:, : cf.shape[0]] = cf.T
    fitted = ncheb.chebval(u, cf)  # (nr, nz)
    max_resid = float(np.max(np.abs(fitted - c)))
    return coef, max_resid


def clenshaw(u, coef):
    """Evaluate a Chebyshev series at u in [-1, 1].

    ``u`` is an array (any shape); ``coef`` has shape (K,) or (..., K) with
    leading dims broadcasting against u.
    """
    K = coef.shape[-1]
    b1 = jnp.zeros_like(u)
    b2 = jnp.zeros_like(u)
    for k in range(K - 1, 0, -1):
        b1, b2 = coef[..., k] + 2.0 * u * b1 - b2, b1
    return coef[..., 0] + u * b1 - b2


@functools.lru_cache(maxsize=32)
def cheb2poly_matrix(K: int) -> np.ndarray:
    """M with poly_coef = cheb_coef @ M.T (power basis in the same u).

    A degree-(K-1) Chebyshev series can be re-expressed in the monomial
    basis; Horner evaluation then costs ONE fma per term where Clenshaw
    costs two — it halves the dominant per-step cost of the integration
    kernels.  The conversion is exact linear algebra done in float64; its
    f32 *evaluation* conditioning depends on the profile and is guarded per
    environment by ``poly_ok``.
    """
    import numpy.polynomial.chebyshev as ncheb

    M = np.zeros((K, K))
    for k in range(K):
        e = np.zeros(K)
        e[k] = 1.0
        p = ncheb.cheb2poly(e)
        M[: len(p), k] = p
    return M


def horner(u, coef):
    """Evaluate a power-basis polynomial at u (monomial Horner).

    Same calling convention as ``clenshaw``: ``coef`` (K,) or (..., K).
    """
    K = coef.shape[-1]
    acc = jnp.zeros_like(u) + coef[..., K - 1]
    for k in range(K - 2, -1, -1):
        acc = acc * u + coef[..., k]
    return acc


def poly_ok(coef: np.ndarray, tol: float, nu: int = 2049) -> bool:
    """True when the monomial form of every Chebyshev row in ``coef``
    evaluates (in float32 Horner) within ``tol`` of the float64 Chebyshev
    value across u in [-1, 1].

    Smooth analytic profiles (Munk-class, K≈16) pass easily — their power
    coefficients stay O(c) and f32 Horner is as accurate as f32 Clenshaw.
    Rough high-order fits (internal-wave ensembles at K≈64+) fail the
    2^k coefficient growth and keep the Clenshaw path.
    """
    import numpy.polynomial.chebyshev as ncheb

    coef = np.atleast_2d(np.asarray(coef, np.float64))
    K = coef.shape[-1]
    with np.errstate(over="ignore", invalid="ignore"):
        M = cheb2poly_matrix(K)
        pcoef = coef @ M.T
    if not np.all(np.isfinite(pcoef)):
        return False
    # quick reject: monomial coefficients far beyond f32 range cannot pass
    # the dense check — skip the 2049-point evaluation (high-order
    # ensemble fits hit this on every realization)
    if np.abs(pcoef).max() > 1e8:
        return False
    u64 = np.linspace(-1.0, 1.0, nu)
    ref = ncheb.chebval(u64, coef.T)  # (nr, nu)
    u32 = u64.astype(np.float32)
    p32 = pcoef.astype(np.float32)
    acc = np.broadcast_to(p32[:, K - 1 : K], (p32.shape[0], nu)).astype(np.float32)
    for k in range(K - 2, -1, -1):
        acc = (acc * u32 + p32[:, k : k + 1]).astype(np.float32)
    return bool(np.max(np.abs(acc - ref)) <= tol)


def cheb_mirror(coef):
    """Coefficients of f(-u) given those of f(u): negate odd terms.

    Used when mirroring the environment about the range axis for backwards
    shots (reference behavior: `/root/reference/src/pygenray/launch_rays.py:684-714`).
    Works for numpy or jax arrays, any leading batch dims.
    """
    K = coef.shape[-1]
    sign = (-1.0) ** np.arange(K)
    return coef * sign
