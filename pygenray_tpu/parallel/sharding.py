"""Multi-chip scaling: shard the launch-angle axis over a device mesh.

The reference's only parallelism is a CPU process pool with shared-memory
environment arrays (`/root/reference/src/pygenray/multi_processing.py:7-66`,
`launch_rays.py:119-164`).  The TPU-native equivalent: rays never
communicate, so the fan is pure data parallelism — a 1D ``jax.sharding.Mesh``
over the angle axis, environment arrays replicated (they are a few MB), and
XLA partitions the whole scan with zero collectives inside the trace.
Multi-host deployments only need ``jax.distributed.initialize`` before
building the mesh.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "shard_rays", "replicate_env", "pad_to_multiple"]

RAY_AXIS = "rays"


def make_mesh(n_devices: int = None, devices=None) -> Mesh:
    """1D mesh over the ray axis (defaults to all available devices)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.array(devices), (RAY_AXIS,))


def pad_to_multiple(arr, multiple: int, fill=0.0):
    """Pad the leading axis so it divides evenly across devices."""
    n = arr.shape[0]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, rem)] + [(0, 0)] * (arr.ndim - 1)
    import jax.numpy as jnp

    return jnp.pad(arr, pad, constant_values=fill), n


def shard_rays(p0, mesh: Mesh):
    """Place a (B,) ray batch sharded across the mesh's ray axis.

    B must be divisible by the device count (use ``pad_to_multiple``).
    """
    return jax.device_put(p0, NamedSharding(mesh, P(RAY_AXIS)))


def replicate_env(env, mesh: Mesh):
    """Replicate environment arrays on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), env)
