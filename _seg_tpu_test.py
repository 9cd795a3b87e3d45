"""Seg-mode kernel on real TPU: correctness vs XLA + throughput."""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/pygenray_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from pygenray_tpu.envdata import make_env_data
from pygenray_tpu.environment import munk_ssp
from pygenray_tpu.integrate import SolverSettings, trace

nz, nr = 3001, 16
z = np.linspace(0, 6000, nz)
r = np.linspace(0, 100e3, nr)
rng = np.random.RandomState(0)
rough = sum(a*np.sin(2*np.pi*z/lam + p) for a, lam, p in
            zip(rng.uniform(0.05,0.3,8), rng.uniform(15,60,8), rng.uniform(0,7,8)))
cramp = 1.0 + 2e-3*np.linspace(0,1,nr)
c = np.outer(cramp, munk_ssp(z) + rough)
env = make_env_data(c, r, z, np.full(nr, 5000.0), r, dtype="float32")
print("has_seg:", env.has_seg, "Ks:", env.c_seg.shape[1], "rd:", env.range_dependent, flush=True)

B = 102_400
p0 = np.float32(np.sin(np.radians(-np.linspace(-15, 15, B))) / 1510.0)
sx = SolverSettings(dx=50.0, backend="xla")
sp = SolverSettings(dx=50.0, backend="pallas")

# correctness: small batch, kernel vs XLA on hardware
p0s = np.float32(np.sin(np.radians(-np.linspace(-15, 15, 256))) / 1510.0)
t0 = time.time()
rx = trace(env, 1300.0, p0s, 0.0, 100e3, 5, sx)
tsx = np.asarray(rx.ts)  # force fetch
print(f"xla small done {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
rp = trace(env, 1300.0, p0s, 0.0, 100e3, 5, sp)
tsp = np.asarray(rp.ts)
print(f"pallas small done (compile) {time.time()-t0:.1f}s", flush=True)
dT = np.abs(tsx[:, -1] - tsp[:, -1])
print("small-batch kernel vs XLA on TPU: max dT", dT.max(),
      "counters eq:", np.array_equal(np.asarray(rx.n_bott), np.asarray(rp.n_bott))
      and np.array_equal(np.asarray(rx.death_code), np.asarray(rp.death_code)), flush=True)

# throughput: single-call + sustained
t0 = time.time()
res = trace(env, 1300.0, p0, 0.0, 100e3, 50, sp)
v = float(np.asarray(res.ts)[:, -1].mean())  # fetch forces fault surfacing
t_first = time.time() - t0
t0 = time.time()
res = trace(env, 1300.0, p0, 0.0, 100e3, 50, sp)
v = float(np.asarray(res.ts)[:, -1].mean())
t_single = time.time() - t0
print(f"seg mega-kernel single-call: {t_single:.3f}s -> {B/t_single/1e6:.2f}M rays/s (first {t_first:.1f}s, mean T {v:.4f})", flush=True)

# sustained: loop inside one jit
from pygenray_tpu.integrate import _plan
from pygenray_tpu.ops.pallas_stepper import trace_pallas
import jax.numpy as jnp
h, sps, nseg = _plan(0.0, 100e3, 50, 50.0)
geom = (0.0, 100e3, float(h), int(sps), int(nseg))

@jax.jit
def run5(envarg, p):
    acc = jnp.zeros((), jnp.float32)
    for i in range(5):
        res = trace_pallas(envarg, 1300.0, p * (1.0 + 1e-7 * i), geom, sp)
        acc = acc + res.ts[:, -1].sum()
    return acc

p0j = jnp.asarray(p0)
s = float(run5(env, p0j))
t0 = time.time()
s = float(run5(env, p0j))
t5 = time.time() - t0
print(f"seg sustained (5 traces/jit): {5*B/t5/1e6:.2f}M rays/s ({t5:.3f}s, acc {s:.1f})", flush=True)

# XLA big-batch for comparison
t0 = time.time()
resx = trace(env, 1300.0, p0, 0.0, 100e3, 50, sx)
vx = float(np.asarray(resx.ts)[:, -1].mean())
t0 = time.time()
resx = trace(env, 1300.0, p0, 0.0, 100e3, 50, sx)
vx = float(np.asarray(resx.ts)[:, -1].mean())
t_xla = time.time() - t0
print(f"xla seg single-call: {t_xla:.3f}s -> {B/t_xla/1e6:.2f}M rays/s", flush=True)
