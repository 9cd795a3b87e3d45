import time
import numpy as np, jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/pygenray_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
from pygenray_tpu.adjoint import travel_time_jacobian
from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings

z = np.linspace(0, 6000, 1024)
r = np.linspace(0, 100e3, 4)
c = np.outer(np.ones(4), munk_ssp(z))
env = make_env_data(c, r, z, np.full(4, 5000.0), r, dtype=jnp.float32)
angles = np.linspace(-14, 14, 512)
c_src = np.interp(1300.0, z, c[0])
p0 = np.sin(np.radians(-angles)) / c_src
s = SolverSettings(dx=200.0)

for mode in ("kernel", "fwd"):
    t0 = time.perf_counter()
    T, jac = travel_time_jacobian(env, 1300.0, p0, 0.0, 100e3, s, mode=mode)
    jac = np.asarray(jac); T = np.asarray(T)
    t1 = time.perf_counter()
    t2 = time.perf_counter()
    T, jac2 = travel_time_jacobian(env, 1300.0, p0, 0.0, 100e3, s, mode=mode)
    jac2 = np.asarray(jac2)
    t3 = time.perf_counter()
    print(f"mode={mode}: K={jac.shape[1]} first {t1-t0:.2f}s warm {t3-t2:.3f}s |jac|max={np.abs(jac).max():.3e}")
    if mode == "kernel":
        jk = jac
scale = np.abs(jac2).max()
print("kernel vs fwd max rel:", np.abs(jk - jac2).max() / scale)
