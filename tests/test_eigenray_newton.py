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
