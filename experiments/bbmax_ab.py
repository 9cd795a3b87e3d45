"""Paired A/B of the mega-kernel's rays-per-block cap (BB_MAX).

Round-3 concluded "BB_MAX 8192 neutral-to-worse" from single-shot
measurements — the same methodology that produced the phantom
event_groups win (same-program sustained throughput drifts ~9% across
runs on the axon tunnel).  This re-measures with the interleaved paired
protocol: adjacent (A, B) runs share the minute-scale drift, the median
per-pair ratio isolates the effect.

BB_MAX is NOT part of the launcher cache keys (it is a module constant),
so each arm switch flushes the jit launcher cache and reclassifies calm
for its own block layout; XLA's persistent compile cache makes the
reflushes cheap after the first pair.

    python experiments/bbmax_ab.py [--rd] [ALT_BB_MAX ...]

``--rd`` measures the range-dependent bench config (config 1 geometry,
dx=100) instead of the headline Munk fan — the other tracked sustained
metric a BB_MAX default change could move.
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/pygenray_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

import bench
from pygenray_tpu.integrate import SolverSettings, _plan, trace
from pygenray_tpu.ops.host import bilinear_np
import pygenray_tpu.ops.pallas_stepper as ps
from pygenray_tpu.utils.cache import LRUCache

R_MAX, NUM_RAYS, NUM_SAVE, SRC = bench.R_MAX, bench.NUM_RAYS, bench.NUM_SAVE, bench.SRC_DEPTH


def make_arm(env, p0, settings, bb, src=None):
    src = SRC if src is None else src
    h, sps, nseg = _plan(0.0, R_MAX, NUM_SAVE, settings.dx)
    geom = (0.0, R_MAX, float(h), sps, nseg)

    def measure():
        ps.BB_MAX = bb
        # launcher caches do not key on BB_MAX: flush so this arm traces
        # its own layout (persistent XLA cache keeps recompiles cheap)
        ps._JIT_CACHE = LRUCache(256)
        ps._CALM_CACHE.clear()
        calm = ps.classify_calm(env, src, p0, geom, settings)

        def best(n):
            @jax.jit
            def fn(p):
                acc = jnp.zeros((), p.dtype)
                pin = p
                for _ in range(n):
                    acc = acc + trace(env, src, pin, 0.0, R_MAX, NUM_SAVE,
                                      settings, calm=calm).ts.sum()
                    pin = lax.optimization_barrier(p)
                return acc

            float(fn(p0))
            b = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                float(fn(p0))
                b = min(b, time.perf_counter() - t0)
            return b

        t1, t9 = best(1), best(9)
        return max((t9 - t1) / 8.0, 1e-9)

    return measure


def main():
    rd = "--rd" in sys.argv
    alts = [int(a) for a in sys.argv[1:] if a != "--rd"] or [8192, 32768]
    if rd:
        # bench config 1 geometry (range-dependent Munk + sloped bottom)
        from pygenray_tpu.envdata import make_env_data
        from pygenray_tpu.environment import munk_ssp

        z = np.linspace(0.0, 6000.0, bench.NZ)
        r = np.linspace(0.0, R_MAX, 64)
        c_rd = np.array([munk_ssp(z, sofar_depth=1300 + 0.002 * ri)
                         for ri in r])
        env = make_env_data(c_rd, r, z, np.linspace(4400.0, 4900.0, 64), r,
                            dtype=jnp.float32)
        s = SolverSettings(dx=100.0, dyn_calm=False)
    else:
        env = bench.build_env(jnp.float32)
        s = SolverSettings(dx=200.0, dyn_calm=False)
    angles = np.linspace(-bench.ANGLE_SPAN, bench.ANGLE_SPAN, NUM_RAYS)
    c_src = bilinear_np(0.0, SRC, np.asarray(env.r), np.asarray(env.z),
                        np.asarray(env.c))
    p0 = jnp.asarray(np.sin(np.radians(-angles)) / c_src, jnp.float32)

    base = 16384
    for alt in alts:
        mA = make_arm(env, p0, s, base)
        mB = make_arm(env, p0, s, alt)
        med, a, b, rr = bench._ab_paired(mA, mB)
        print(json.dumps({
            "metric": "bb_max_ab",
            "config": "rd" if rd else "headline",
            "base": base,
            "alt": alt,
            "median_speedup_vs_base": round(med, 4),
            "base_rays_per_sec": round(NUM_RAYS / a, 1),
            "alt_rays_per_sec": round(NUM_RAYS / b, 1),
            "pair_speedups": rr,
            "unit": "rays/s",
        }), flush=True)
    ps.BB_MAX = base


if __name__ == "__main__":
    main()
