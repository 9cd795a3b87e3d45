"""Transmission-loss field tests.

Anchors are analytic: the incoherent flux estimator must reduce to
spherical spreading in an unbounded isovelocity medium (the Jacobian
cancellation is exact, so the only error is binning statistics), and the
coherent hat-beam field must reproduce the Lloyd's-mirror two-path
interference pattern (direct + surface-reflected image source) — the
textbook validation for a ray model's amplitude AND phase bookkeeping
(spreading, travel-time phase, the surface pi flip).
"""

import numpy as np
import pytest

import pygenray_tpu as pt
from pygenray_tpu.envdata import make_env_data

C0 = 1500.0


def iso_env(depth=20000.0, r_max=50e3):
    z = np.linspace(0.0, depth, 64)
    r = np.linspace(0.0, r_max, 8)
    c = np.full((r.size, z.size), C0)
    return make_env_data(c, r, z, np.full(r.size, depth), r,
                         dtype=np.float64)


def test_incoherent_spherical_spreading():
    # deep source, fan too shallow to reach either boundary: every cell
    # inside the insonified cone sees exactly one (straight) eigenray,
    # so TL_inc = 20 log10(slant range)
    env = iso_env()
    z0, R = 10000.0, 20e3
    angles = np.linspace(-14.0, 14.0, 1601)
    depths = np.linspace(6000.0, 14000.0, 161)
    fld = pt.transmission_loss_field(z0, 0.0, angles, R, env,
                                     depths=depths, num_range=101)
    assert fld.tl_coherent is None and fld.frequency is None
    assert fld.ranges[0] > 0.0 and fld.ranges[-1] == pytest.approx(R)

    zz, rr = np.meshgrid(fld.depths, fld.ranges, indexing="ij")
    s = np.hypot(rr, zz - z0)
    tl_exact = 20.0 * np.log10(s)
    # stay inside the cone (|elevation| < 12 deg) and past the first few
    # columns (near-source cells hold few rays per bin)
    elev = np.degrees(np.arctan2(np.abs(zz - z0), rr))
    sel = (elev < 12.0) & (rr > 2e3) & np.isfinite(fld.tl_incoherent)
    assert sel.sum() > 2000
    err = np.abs(fld.tl_incoherent - tl_exact)[sel]
    assert np.nanmedian(err) < 0.3          # dB
    assert np.nanpercentile(err, 95) < 1.0  # binning noise tail


def test_coherent_lloyds_mirror():
    # shallow source over a deep isovelocity half-space: the coherent
    # field is the two-path image sum p = e^{iks1}/s1 - e^{iks2}/s2
    env = iso_env(depth=30000.0)
    z0, R, f = 50.0, 4e3, 150.0
    k = 2 * np.pi * f / C0
    angles = np.linspace(-20.0, 20.0, 3201)
    depths = np.linspace(100.0, 1200.0, 111)
    fld = pt.transmission_loss_field(z0, 0.0, angles, R, env,
                                     frequency=f, depths=depths,
                                     num_range=161)
    assert fld.tl_coherent is not None and fld.frequency == f

    zz, rr = np.meshgrid(fld.depths, fld.ranges, indexing="ij")
    s1 = np.hypot(rr, zz - z0)
    s2 = np.hypot(rr, zz + z0)          # image source above the surface
    p = np.exp(1j * k * s1) / s1 - np.exp(1j * k * s2) / s2
    tl_exact = -20.0 * np.log10(np.abs(p))

    elev = np.degrees(np.arctan2(zz + z0, rr))   # reflected-path angle
    # compare away from interference nulls (estimator + analytic both
    # blow up there) and inside the fan cone
    null = tl_exact > 20.0 * np.log10(s1) + 10.0
    sel = (elev < 16.0) & (rr > 1e3) & ~null & np.isfinite(fld.tl_coherent)
    assert sel.sum() > 1000
    err = np.abs(fld.tl_coherent - tl_exact)[sel]
    assert np.nanmedian(err) < 0.5
    assert np.nanpercentile(err, 90) < 2.0

    # incoherent field on the same run: two-path power sum
    tl_inc_exact = -10.0 * np.log10(1.0 / s1**2 + 1.0 / s2**2)
    err_inc = np.abs(fld.tl_incoherent - tl_inc_exact)[sel]
    assert np.nanmedian(err_inc) < 0.5


def test_npz_round_trip(tmp_path):
    env = iso_env()
    fld = pt.transmission_loss_field(
        10000.0, 0.0, np.linspace(-10, 10, 201), 10e3, env,
        frequency=40.0, depths=np.linspace(8000.0, 12000.0, 41),
        num_range=41)
    path = tmp_path / "tl.npz"
    fld.save_npz(path)
    back = pt.TLField.load_npz(path)
    np.testing.assert_array_equal(back.ranges, fld.ranges)
    np.testing.assert_array_equal(back.depths, fld.depths)
    np.testing.assert_array_equal(back.tl_incoherent, fld.tl_incoherent)
    np.testing.assert_array_equal(back.tl_coherent, fld.tl_coherent)
    assert back.frequency == 40.0
    assert back.source_depth == 10000.0


def test_input_validation():
    env = iso_env()
    with pytest.raises(ValueError, match="receiver_range"):
        pt.transmission_loss_field(100.0, 5e3, [1.0, 2.0], 1e3, env)
    with pytest.raises(ValueError, match="at least 2"):
        pt.transmission_loss_field(100.0, 0.0, [1.0], 1e3, env)
    with pytest.raises(ValueError, match="increasing"):
        pt.transmission_loss_field(100.0, 0.0, [1.0, 2.0], 1e3, env,
                                   depths=np.array([50.0, 40.0]))
