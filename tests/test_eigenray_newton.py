"""Newton (AD-derivative) eigenray search: agreement with regula falsi and
faster convergence."""

import numpy as np

import pygenray_tpu as pr
from pygenray_tpu.models import munk_env

TABLE = dict(interp="table", dtype="float64")


def _setup():
    env = munk_env(r_max=50e3, nr=30, nz=400)
    angles = np.linspace(-14, 14, 141)
    rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 50, env, flatearth=False, **TABLE)
    return env, rays


class TestNewtonEigenrays:
    def test_matches_regula_falsi(self):
        env, rays = self._cached()
        rds = [1000.0, 1300.0]
        er_n = pr.find_eigenrays(
            rays, rds, 1300.0, 0.0, 50e3, 50, env, ztol=0.1,
            flatearth=False, method="newton", **TABLE,
        )
        er_r = pr.find_eigenrays(
            rays, rds, 1300.0, 0.0, 50e3, 50, env, ztol=0.1,
            flatearth=False, method="regula_falsi", **TABLE,
        )
        for i in range(len(rds)):
            assert er_n.num_eigenrays_found[i] == er_r.num_eigenrays_found[i]
            # same arrivals to well under the fan spacing
            np.testing.assert_allclose(
                np.sort(er_n.launch_angles[i]),
                np.sort(er_r.launch_angles[i]),
                atol=5e-3,
            )
            np.testing.assert_allclose(
                np.sort(er_n.ts[i][:, -1]), np.sort(er_r.ts[i][:, -1]), atol=1e-6
            )

    def test_converges_faster(self):
        env, rays = self._cached()
        er_n = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 0.0, 50e3, 50, env, ztol=0.01,
            flatearth=False, method="newton", **TABLE,
        )
        er_r = pr.find_eigenrays(
            rays, [1300.0], 1300.0, 0.0, 50e3, 50, env, ztol=0.01,
            flatearth=False, method="regula_falsi", **TABLE,
        )
        assert er_n.num_eigenrays_found[0] == er_n.num_eigenrays[1300.0]
        n_it = er_n.diagnostics["iterations"].max()
        r_it = er_r.diagnostics["iterations"].max()
        assert n_it <= r_it
        assert n_it <= 6  # quadratic convergence at tight ztol

    _cache = None

    @classmethod
    def _cached(cls):
        if cls._cache is None:
            cls._cache = _setup()
        return cls._cache


class TestKernelEigenrays:
    """Eigenray iterations through the Pallas kernels (interpret mode on
    CPU, forced with backend='pallas'): arrivals must match the XLA path."""

    def _setup_f32(self):
        import jax.numpy as jnp

        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        import dataclasses

        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 50e3, 8)
        c = np.outer(np.ones(8), munk_ssp(z))
        env = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float32)
        # strict kernel-vs-XLA comparisons: keep both paths on Clenshaw
        # (interpret-mode Horner contraction drifts on bouncing rays; the
        # hardware paths are bitwise identical — see test_pallas.TestPowPath)
        env = dataclasses.replace(env, poly_ok=False)
        angles = np.linspace(-14, 14, 141)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 2, env,
                             flatearth=False, dx=200.0)
        return env, rays

    def _run(self, method, backend):
        env, rays = self._setup_f32()
        return pr.find_eigenrays(
            rays, [800.0, 1300.0], 1300.0, 0.0, 50e3, 10, env, ztol=0.5,
            flatearth=False, dx=200.0, method=method, backend=backend,
        )

    def test_newton_kernel_matches_xla(self):
        er_k = self._run("newton", "pallas")
        er_x = self._run("newton", "xla")
        for i in range(2):
            assert er_k.num_eigenrays_found[i] == er_x.num_eigenrays_found[i]
            np.testing.assert_allclose(
                np.sort(er_k.launch_angles[i]),
                np.sort(er_x.launch_angles[i]), atol=5e-3,
            )
            np.testing.assert_allclose(
                np.sort(er_k.ts[i][:, -1]), np.sort(er_x.ts[i][:, -1]), atol=1e-5
            )

    def test_regula_falsi_kernel_matches_xla(self):
        er_k = self._run("regula_falsi", "pallas")
        er_x = self._run("regula_falsi", "xla")
        for i in range(2):
            assert er_k.num_eigenrays_found[i] == er_x.num_eigenrays_found[i]
            np.testing.assert_allclose(
                np.sort(er_k.launch_angles[i]),
                np.sort(er_x.launch_angles[i]), atol=5e-3,
            )

    def test_newton_kernel_range_dependent(self):
        """RD environments run Newton through the tangent kernel too
        (station rows DMA'd per step)."""
        import jax.numpy as jnp

        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        import dataclasses

        z = np.linspace(0, 6000, 512)
        r = np.linspace(0, 50e3, 8)
        c = np.array([munk_ssp(z, sofar_depth=1300 + 0.003 * ri) for ri in r])
        env = make_env_data(c, r, z, np.full(8, 4600.0), r, dtype=jnp.float32)
        env = dataclasses.replace(env, poly_ok=False)  # see _setup_f32 note
        assert env.range_dependent
        angles = np.linspace(-14, 14, 141)
        rays = pr.shoot_rays(1300.0, 0.0, angles, 50e3, 2, env,
                             flatearth=False, dx=200.0)

        def run(backend):
            return pr.find_eigenrays(
                rays, [1300.0], 1300.0, 0.0, 50e3, 10, env, ztol=0.5,
                flatearth=False, dx=200.0, method="newton", backend=backend,
            )

        er_k = run("pallas")
        er_x = run("xla")
        assert er_k.num_eigenrays_found[0] == er_x.num_eigenrays_found[0]
        assert er_k.num_eigenrays_found[0] >= 2
        np.testing.assert_allclose(
            np.sort(er_k.launch_angles[0]),
            np.sort(er_x.launch_angles[0]), atol=5e-3,
        )
        np.testing.assert_allclose(
            np.sort(er_k.ts[0][:, -1]), np.sort(er_x.ts[0][:, -1]), atol=1e-5
        )
