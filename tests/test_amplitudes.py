"""Arrival-amplitude (geometric spreading / KMAH) tests.

The pinning limit is exact: in an unbounded isovelocity medium the
ray-tube formula must reduce to spherical spreading 1/s along the slant
path.  The general case is checked by rebuilding the spreading Jacobian
with central finite differences of two traced fans and inverting the
amplitude formula — AD and FD must agree on a smooth no-bounce config.
"""

import numpy as np
import pytest

import pygenray_tpu as pt
from pygenray_tpu.envdata import make_env_data


def const_env(c0=1500.0, depth=20000.0):
    z = np.linspace(0.0, depth, 64)
    r = np.linspace(0.0, 300e3, 8)
    c = np.full((r.size, z.size), c0)
    return make_env_data(c, r, z, np.full(r.size, depth), r,
                         dtype=np.float64)


def munk_env(depth=5000.0):
    z = np.linspace(0.0, depth, 512)
    r = np.linspace(0.0, 150e3, 8)
    c = np.broadcast_to(pt.munk_ssp(z), (r.size, z.size)).copy()
    return make_env_data(c, r, z, np.full(r.size, depth), r,
                         dtype=np.float64)


def test_isovelocity_spherical_spreading():
    env = const_env()
    angles = np.array([-10.0, -5.0, -1.0, 2.0, 8.0])
    R = 20e3
    arr = pt.arrival_amplitudes(10000.0, 0.0, angles, R, env, num_save=64)
    s = R / np.cos(np.radians(angles))  # slant range of the straight ray
    assert np.all(arr.alive)
    np.testing.assert_allclose(arr.amplitude, 1.0 / s, rtol=1e-3)
    np.testing.assert_allclose(arr.tl_db, 20 * np.log10(s), rtol=1e-3)
    assert np.all(arr.kmah == 0)
    assert np.all(arr.n_surf == 0)
    np.testing.assert_allclose(arr.phase, 0.0)
    # arrival angle of a straight ray is the launch angle
    np.testing.assert_allclose(arr.theta_r, np.abs(angles), atol=1e-3)


def test_ad_spreading_matches_finite_differences():
    env = munk_env()
    angles = np.array([-8.0, -4.0, 0.5, 3.0, 7.0])
    R, z0 = 50e3, 1300.0
    arr = pt.arrival_amplitudes(z0, 0.0, angles, R, env, num_save=128)
    assert np.all(arr.alive) and np.all(arr.n_surf == 0) and np.all(arr.n_bott == 0)

    # invert the amplitude formula back to |dz_r/dtheta0| (the c_r, cos
    # factors cancel against the module's own, leaving c_src/c0 ~ 1)
    c0 = float(pt.munk_ssp(np.asarray([z0]))[0])
    cr = pt.bilinear_np(np.full_like(arr.z_r, R), -arr.z_r,
                        np.asarray(env.r), np.asarray(env.z), np.asarray(env.c))
    cos0 = np.cos(np.radians(angles))
    cosr = np.cos(np.radians(arr.theta_r))
    jac_ad = (cr * cos0) / (c0 * R * cosr * arr.amplitude**2)

    # small FD step (f64 env keeps it clean); same num_save as the AD fan
    # — _plan picks the step h from the save segmentation, and the two
    # discrete maps must be identical for FD to probe the AD map
    d = 1e-4
    zp = pt.shoot_rays(z0, 0.0, angles + d, R, 128, env).zs[:, -1]
    zm = pt.shoot_rays(z0, 0.0, angles - d, R, 128, env).zs[:, -1]
    jac_fd = np.abs(zp - zm) / (2 * np.radians(d))
    np.testing.assert_allclose(jac_ad, jac_fd, rtol=2e-3)


def test_surface_bounce_phase():
    env = const_env(depth=30000.0)
    # up-going steep ray from a shallow source: one surface bounce, then
    # straight to the receiver (image-source geometry, no caustic)
    arr = pt.arrival_amplitudes(100.0, 0.0, np.array([20.0]), 10e3, env,
                                num_save=64)
    assert int(arr.n_surf[0]) == 1 and int(arr.kmah[0]) == 0
    np.testing.assert_allclose(arr.phase, np.pi)
    # image source: slant distance through the reflection point
    s = 10e3 / np.cos(np.radians(20.0))
    np.testing.assert_allclose(arr.amplitude, 1.0 / s, rtol=1e-3)


def test_munk_caustics_counted():
    env = munk_env()
    angles = np.linspace(-6.0, 6.0, 25)
    arr = pt.arrival_amplitudes(1300.0, 0.0, angles, 100e3, env, num_save=512)
    ok = arr.alive
    assert ok.sum() >= 20
    # SOFAR refocusing: a 100 km axial fan passes caustics
    assert np.any(arr.kmah[ok] >= 1)
    amps = arr.amplitude[ok]
    assert np.all(np.isfinite(amps)) and np.all(amps > 0)
    # complex arrival factor is consistent
    pr = arr.pressure()[ok]
    np.testing.assert_allclose(np.abs(pr), amps)


def test_dead_rays_nan():
    env = munk_env()
    # a near-vertical ray from the sound-speed minimum turns vertical the
    # moment c(z) rises above c0/sin(theta0) — death code 1 within steps
    arr = pt.arrival_amplitudes(1300.0, 0.0, np.array([0.5, 89.99]), 100e3,
                                env, num_save=64)
    assert arr.alive[0] and not arr.alive[1]
    assert np.isnan(arr.amplitude[1]) and np.isfinite(arr.amplitude[0])
