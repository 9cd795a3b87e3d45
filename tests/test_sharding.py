"""Multi-device sharding tests on the 8-device virtual CPU mesh.

The fan is pure data parallelism over launch angles: sharded and unsharded
traces must agree bitwise-closely, and the sharded trace must actually
partition the batch across all devices.
"""

import numpy as np
import jax
import pytest

import pygenray_tpu as pr
from pygenray_tpu.models import munk_env
from pygenray_tpu.parallel import make_mesh, pad_to_multiple, shard_rays


@pytest.fixture(scope="module")
def env():
    return munk_env(r_max=50e3, nr=30, nz=400)


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_fan_matches_unsharded(env):
    mesh = make_mesh()
    angles = np.linspace(-14, 14, 64)
    rf0 = pr.shoot_rays(
        1300.0, 0.0, angles, 50e3, 50, env, flatearth=False,
        interp="table", dtype="float64",
    )
    rf1 = pr.shoot_rays(
        1300.0, 0.0, angles, 50e3, 50, env, flatearth=False,
        interp="table", dtype="float64", mesh=mesh,
    )
    np.testing.assert_allclose(rf1.ts, rf0.ts, rtol=0, atol=1e-12)
    np.testing.assert_allclose(rf1.zs, rf0.zs, rtol=0, atol=1e-9)
    np.testing.assert_array_equal(rf1.n_botts, rf0.n_botts)
    np.testing.assert_array_equal(rf1.n_surfs, rf0.n_surfs)


def test_trace_output_is_sharded(env):
    from pygenray_tpu.integrate import trace
    from pygenray_tpu.shoot import settings_for

    mesh = make_mesh()
    B = 64
    envd = env.env_data(flatearth=False, interp="table", dtype="float64")
    p0 = np.sin(np.radians(np.linspace(-10, 10, B))) / 1500.0
    p0 = shard_rays(np.asarray(p0), mesh)
    res = trace(envd, 1300.0, p0, 0.0, 50e3, 10, settings_for(dx=200.0, interp="table"))
    # outputs stay sharded over the ray axis — no gather to one device
    assert len(res.ts.sharding.device_set) == 8


def test_pad_to_multiple():
    import jax.numpy as jnp

    arr = jnp.arange(13.0)
    padded, n = pad_to_multiple(arr, 8)
    assert padded.shape[0] == 16
    assert n == 13


class TestEnsembleMesh:
    """Realization-axis sharding of the Monte-Carlo solvers: sharded and
    unsharded results agree (bitwise on the f64 XLA path; f32-rounding on
    the interpreted kernel path, whose FMA contraction depends on the
    surrounding graph off-TPU)."""

    E = 8

    def _ensemble(self, dtype):
        from pygenray_tpu.models.internal_waves import perturbed_munk_tables
        from pygenray_tpu.montecarlo import make_env_ensemble

        c_ens, r, z = perturbed_munk_tables(
            self.E, r_max=30e3, nr=16, nz=300, seed=3
        )
        return make_env_ensemble(
            c_ens, r, z, np.full(16, 5000.0), r, dtype=dtype
        )

    def test_sharded_ensemble_matches_unsharded_xla(self):
        from pygenray_tpu.integrate import SolverSettings
        from pygenray_tpu.montecarlo import trace_ensemble

        env_ens = self._ensemble("float64")
        mesh = make_mesh()
        angles = np.linspace(-10, 10, 8)
        p0 = np.sin(np.radians(-angles)) / 1500.0
        s = SolverSettings(dx=500.0)
        res0 = trace_ensemble(env_ens, 1300.0, p0, 0.0, 30e3, 5, s)
        res1 = trace_ensemble(env_ens, 1300.0, p0, 0.0, 30e3, 5, s, mesh=mesh)
        assert len(res1.ts.sharding.device_set) == 8
        np.testing.assert_allclose(np.asarray(res0.ts), np.asarray(res1.ts),
                                   rtol=1e-13)
        np.testing.assert_array_equal(np.asarray(res0.n_surf),
                                      np.asarray(res1.n_surf))
        np.testing.assert_array_equal(np.asarray(res0.n_bott),
                                      np.asarray(res1.n_bott))

    def test_sharded_ensemble_kernel_path(self):
        """backend='pallas' forces the per-device interpreted mega-kernel
        under shard_map (the multi-chip MC fast path)."""
        import pygenray_tpu.montecarlo as mc
        from pygenray_tpu.integrate import SolverSettings

        env_ens = self._ensemble("float32")
        mesh = make_mesh()
        angles = np.linspace(-10, 10, 8)
        p0 = (np.sin(np.radians(-angles)) / 1500.0).astype(np.float32)
        s = SolverSettings(dx=500.0, backend="pallas")
        res0 = mc.trace_ensemble(env_ens, 1300.0, p0, 0.0, 30e3, 5, s)
        res1 = mc.trace_ensemble(env_ens, 1300.0, p0, 0.0, 30e3, 5, s,
                                 mesh=mesh)
        np.testing.assert_allclose(np.asarray(res0.ts), np.asarray(res1.ts),
                                   rtol=2e-6)
        np.testing.assert_array_equal(np.asarray(res0.n_surf),
                                      np.asarray(res1.n_surf))
        np.testing.assert_array_equal(np.asarray(res0.death_code),
                                      np.asarray(res1.death_code))

    def test_mc_eigenray_times_mesh(self):
        from pygenray_tpu.integrate import SolverSettings
        from pygenray_tpu.montecarlo import mc_eigenray_times

        env_ens = self._ensemble("float32")
        mesh = make_mesh()
        s = SolverSettings(dx=500.0, backend="pallas")
        fan = np.linspace(-12, 12, 32)
        out0 = mc_eigenray_times(env_ens, fan, 1300.0, 1300.0, 0.0, 30e3,
                                 ztol=1.0, settings=s)
        out1 = mc_eigenray_times(env_ens, fan, 1300.0, 1300.0, 0.0, 30e3,
                                 ztol=1.0, settings=s, mesh=mesh)
        assert out0["path"] == out1["path"] == "one-shot"
        assert out0["valid"].sum() > 0
        np.testing.assert_array_equal(out0["valid"], out1["valid"])
        m = out0["valid"]
        np.testing.assert_allclose(out0["t"][m], out1["t"][m], rtol=2e-6)
        np.testing.assert_allclose(out0["theta"][m], out1["theta"][m],
                                   atol=1e-3)

    def test_mesh_divisibility_error(self):
        from pygenray_tpu.integrate import SolverSettings
        from pygenray_tpu.models.internal_waves import perturbed_munk_tables
        from pygenray_tpu.montecarlo import make_env_ensemble, trace_ensemble

        c_ens, r, z = perturbed_munk_tables(3, r_max=30e3, nr=16, nz=300,
                                            seed=5)
        env_ens = make_env_ensemble(c_ens, r, z, np.full(16, 5000.0), r,
                                    dtype="float64")
        p0 = np.sin(np.radians(-np.linspace(-5, 5, 4))) / 1500.0
        with pytest.raises(ValueError, match="divide evenly"):
            trace_ensemble(env_ens, 1300.0, p0, 0.0, 30e3, 5,
                           SolverSettings(dx=500.0), mesh=make_mesh())


def test_find_eigenrays_mesh_matches_unsharded(env):
    """Candidate-axis sharding of the eigenray device solve (candidates are
    padded to the device count with duplicates and sliced away)."""
    import pygenray_tpu as pr

    angles = np.linspace(-12, 12, 33)
    rays = pr.shoot_rays(1300.0, 0.0, angles, 40e3, 20, env,
                         flatearth=False, interp="cheb", dtype="float64")
    kw = dict(ztol=0.5, flatearth=False, interp="cheb", dtype="float64")
    er0 = pr.find_eigenrays(rays, [1000.0, 1300.0], 1300.0, 0.0, 40e3, 20,
                            env, **kw)
    er1 = pr.find_eigenrays(rays, [1000.0, 1300.0], 1300.0, 0.0, 40e3, 20,
                            env, mesh=make_mesh(), **kw)
    assert er0.num_eigenrays_found == er1.num_eigenrays_found
    for d in range(2):
        np.testing.assert_allclose(er0.launch_angles[d],
                                   er1.launch_angles[d], rtol=1e-12)
        np.testing.assert_allclose(er0.ts[d], er1.ts[d], rtol=1e-12)


def test_sharded_calm_blocks_match_event_path():
    """Per-shard calm ranges (classify_calm_sharded): every device skips
    the event machinery for its own provably-safe blocks and reproduces
    the event path — no audit deaths, identical discrete structure."""
    import jax.numpy as jnp

    import pygenray_tpu.ops.pallas_stepper as ps
    from pygenray_tpu.envdata import make_env_data
    from pygenray_tpu.environment import munk_ssp
    from pygenray_tpu.integrate import SolverSettings, _plan

    z = np.linspace(0, 6000, 512)
    r = np.linspace(0, 50e3, 8)
    c = np.outer(np.ones(8), munk_ssp(z))
    envd = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float32)
    s = SolverSettings(dx=500.0, backend="pallas")
    mesh = make_mesh()
    angles = np.linspace(-8, 8, 1024)
    c_src = np.interp(1300.0, z, c[0])
    p0_host = (np.sin(np.radians(-angles)) / c_src).astype(np.float32)
    p0 = shard_rays(jnp.asarray(p0_host), mesh)

    h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
    geom = (0.0, 50e3, float(h), int(sps), int(nseg))
    tab = ps.classify_calm_sharded(envd, 1300.0, p0_host, geom, s,
                                   n_shards=8)
    assert tab is not None and tab.shape == (8, 4)
    # the mid-angle fan is fully ducted: every shard proves calm
    assert np.all(tab[:, 1] > tab[:, 0])

    res_c = ps.trace_pallas_sharded(envd, 1300.0, p0, geom, s,
                                    interpret=True, calm=tab)
    res_0 = ps.trace_pallas_sharded(envd, 1300.0, p0, geom, s,
                                    interpret=True)
    assert not np.any(np.asarray(res_c.death_code) == 5)
    np.testing.assert_array_equal(
        np.asarray(res_c.death_code), np.asarray(res_0.death_code)
    )
    np.testing.assert_array_equal(
        np.asarray(res_c.n_surf), np.asarray(res_0.n_surf)
    )
    np.testing.assert_array_equal(
        np.asarray(res_c.n_bott), np.asarray(res_0.n_bott)
    )
    np.testing.assert_allclose(
        np.asarray(res_c.ts), np.asarray(res_0.ts), atol=5e-6
    )
    # interpret-mode FMA contraction differs between the calm/event graph
    # shapes; a few cm over 50 km of f32 integration is the expected ulp
    # accumulation (on hardware the paths are bitwise identical)
    np.testing.assert_allclose(
        np.asarray(res_c.zs), np.asarray(res_0.zs), atol=5e-2
    )


def test_sharded_dyn_windows_match_event_path():
    """Per-shard dynamic-window tables (classify_dyn_sharded): a bouncing
    sharded fan with windows reproduces the event path exactly on every
    device — all bounces, no audit deaths."""
    import jax.numpy as jnp

    import pygenray_tpu.ops.pallas_stepper as ps
    from pygenray_tpu.envdata import make_env_data
    from pygenray_tpu.environment import munk_ssp
    from pygenray_tpu.integrate import SolverSettings, _plan

    z = np.linspace(0, 6000, 512)
    r = np.linspace(0, 50e3, 8)
    c = np.outer(np.ones(8), munk_ssp(z))
    envd = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float32)
    s = SolverSettings(dx=500.0, backend="pallas")
    mesh = make_mesh()
    angles = np.linspace(-18, 18, 1024)  # steep: genuinely bounces
    c_src = np.interp(1300.0, z, c[0])
    p0_host = (np.sin(np.radians(-angles)) / c_src).astype(np.float32)
    p0 = shard_rays(jnp.asarray(p0_host), mesh)

    h, sps, nseg = _plan(0.0, 50e3, 10, s.dx)
    geom = (0.0, 50e3, float(h), int(sps), int(nseg))
    tab = ps.classify_dyn_sharded(envd, 1300.0, p0_host, geom, s, n_shards=8)
    assert tab is not None and tab.shape == (8, 1, 4)
    assert np.all(tab[:, :, 0] > 0)

    res_d = ps.trace_pallas_sharded(envd, 1300.0, p0, geom, s,
                                    interpret=True, dyn=tab)
    res_0 = ps.trace_pallas_sharded(envd, 1300.0, p0, geom, s,
                                    interpret=True)
    assert np.asarray(res_0.n_surf).sum() > 0
    assert not np.any(np.asarray(res_d.death_code) == 5)
    np.testing.assert_array_equal(
        np.asarray(res_d.death_code), np.asarray(res_0.death_code)
    )
    np.testing.assert_array_equal(
        np.asarray(res_d.n_surf), np.asarray(res_0.n_surf)
    )
    np.testing.assert_array_equal(
        np.asarray(res_d.n_bott), np.asarray(res_0.n_bott)
    )
    np.testing.assert_allclose(
        np.asarray(res_d.ts), np.asarray(res_0.ts), atol=5e-6
    )


def test_sharded_pallas_dispatch_matches_unsharded_kernel():
    """A sharded fan on a supported (spectral f32) environment must go
    through the per-device mega-kernel (shard_map) and agree with the
    single-device kernel."""
    import dataclasses

    import jax.numpy as jnp

    import pygenray_tpu.ops.pallas_stepper as ps
    from pygenray_tpu.envdata import make_env_data
    from pygenray_tpu.environment import munk_ssp
    from pygenray_tpu.integrate import SolverSettings, trace

    z = np.linspace(0, 6000, 512)
    r = np.linspace(0, 50e3, 8)
    c = np.outer(np.ones(8), munk_ssp(z))
    envd = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float32)
    s = SolverSettings(dx=500.0, backend="pallas")  # force kernel off-TPU

    mesh = make_mesh()
    angles = np.linspace(-16, 16, 128)
    p0_host = (np.sin(np.radians(-angles)) / 1500.0).astype(np.float32)

    called = []
    orig = ps.trace_pallas_sharded

    def spy(*args, **kw):
        called.append(True)
        return orig(*args, **kw)

    ps.trace_pallas_sharded = spy
    try:
        res_sh = trace(envd, 1300.0, shard_rays(jnp.asarray(p0_host), mesh),
                       0.0, 50e3, 10, s)
    finally:
        ps.trace_pallas_sharded = orig
    assert called, "sharded trace did not dispatch the Pallas shard_map path"
    assert len(res_sh.ts.sharding.device_set) == 8

    res_1 = trace(envd, 1300.0, jnp.asarray(p0_host), 0.0, 50e3, 10, s)
    np.testing.assert_array_equal(np.asarray(res_sh.ts), np.asarray(res_1.ts))
    np.testing.assert_array_equal(np.asarray(res_sh.zs), np.asarray(res_1.zs))
    np.testing.assert_array_equal(np.asarray(res_sh.n_bott), np.asarray(res_1.n_bott))
    np.testing.assert_array_equal(np.asarray(res_sh.n_surf), np.asarray(res_1.n_surf))
    np.testing.assert_array_equal(
        np.asarray(res_sh.death_code), np.asarray(res_1.death_code)
    )
    np.testing.assert_array_equal(
        np.asarray(res_sh.alive_save), np.asarray(res_1.alive_save)
    )
