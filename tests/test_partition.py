"""Ducted/boundary ray partitioning: classification soundness and
equivalence of the partitioned path with the plain full stepper."""

import dataclasses

import numpy as np

import pygenray_tpu as pr
from pygenray_tpu.integrate import SolverSettings, ducted_mask, trace
from pygenray_tpu.models import munk_env


def _setup(B=8192):
    env = munk_env(r_max=50e3, nr=30, nz=400)
    envd = env.env_data(flatearth=False, interp="table", dtype="float64")
    angles = np.linspace(-16, 16, B)
    c_src = np.interp(1300.0, np.asarray(envd.z), np.asarray(envd.c[0]))
    p0 = np.sin(np.radians(-angles)) / c_src
    return envd, p0, angles


class TestDuctedMask:
    def test_mask_identifies_surface_grazing(self):
        envd, p0, angles = _setup()
        mask = ducted_mask(envd, 1300.0, p0, 0.0, 50e3)
        assert mask is not None
        # flat-angle rays are ducted, steep rays are not
        assert mask[np.abs(angles) < 5.0].all()
        assert not mask[np.abs(angles) > 15.5].any()

    def test_rd_env_returns_none(self):
        envd, p0, _ = _setup()
        envd_rd = dataclasses.replace(envd, range_dependent=True)
        assert ducted_mask(envd_rd, 1300.0, p0, 0.0, 50e3) is None

    def test_mask_is_sound(self):
        """No ray classified ducted may ever bounce (checked against the
        full stepper's bounce counters)."""
        envd, p0, _ = _setup()
        mask = ducted_mask(envd, 1300.0, p0, 0.0, 50e3)
        s = SolverSettings(dx=100.0, interp="table", partition=False)
        res = trace(envd, 1300.0, p0, 0.0, 50e3, 2, s)
        bounced = (np.asarray(res.n_surf) + np.asarray(res.n_bott)) > 0
        assert not (mask & bounced).any()


class TestPartitionedEquivalence:
    def test_matches_full_stepper(self):
        envd, p0, _ = _setup()
        s_part = SolverSettings(dx=100.0, interp="table", partition=True)
        s_full = SolverSettings(dx=100.0, interp="table", partition=False)
        rp = trace(envd, 1300.0, p0, 0.0, 50e3, 20, s_part)
        rf = trace(envd, 1300.0, p0, 0.0, 50e3, 20, s_full)
        np.testing.assert_allclose(np.asarray(rp.ts), np.asarray(rf.ts), rtol=0, atol=1e-10)
        np.testing.assert_allclose(np.asarray(rp.zs), np.asarray(rf.zs), rtol=0, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(rp.n_surf), np.asarray(rf.n_surf))
        np.testing.assert_array_equal(np.asarray(rp.n_bott), np.asarray(rf.n_bott))
        np.testing.assert_array_equal(np.asarray(rp.alive), np.asarray(rf.alive))

    def test_small_batch_skips_partition(self):
        envd, p0, _ = _setup(B=64)
        s = SolverSettings(dx=100.0, interp="table", partition=True)
        res = trace(envd, 1300.0, p0, 0.0, 50e3, 5, s)
        assert np.asarray(res.ts).shape == (64, 5)

    def test_shoot_rays_end_to_end_with_partition(self):
        env = munk_env(r_max=50e3, nr=30, nz=400)
        angles = np.linspace(-16, 16, 8192)
        rf_p = pr.shoot_rays(
            1300.0, 0.0, angles, 50e3, 10, env, flatearth=False,
            interp="table", dtype="float64", dx=100.0,
        )
        rf_f = pr.shoot_rays(
            1300.0, 0.0, angles, 50e3, 10, env, flatearth=False,
            interp="table", dtype="float64", dx=100.0, keep_dropped=False,
        )
        np.testing.assert_allclose(rf_p.ts, rf_f.ts, atol=1e-10)
