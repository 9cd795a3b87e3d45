"""pygenray_tpu — TPU-native 2D ocean-acoustic ray tracing.

A ground-up JAX/XLA rebuild of the capabilities of the pygenray reference
package (ray paths, travel times, and eigenrays for acoustic tomography):
fixed-step RK4 under ``lax.scan`` across whole batched ray fans, branchless
surface/bottom reflections, spectral (Chebyshev) sound-speed profiles on the
hot path, batched eigenray root-finding, and launch-angle sharding for
multi-chip scaling.

Flat public namespace mirrors the reference
(`/root/reference/src/pygenray/__init__.py:5-10`).
"""

from .environment import (
    OceanEnvironment2D,
    eflat,
    eflatinv,
    flat_earth_c,
    munk_ssp,
)
from .envdata import EnvData, make_env_data, with_spectral
from .integrate import DEATH_CODES, SolverSettings, TraceResult, trace
from .shoot import shoot_ray, shoot_rays, settings_for
from .eigenrays import find_eigenrays, find_eigenrays_batch
from .montecarlo import make_env_ensemble, mc_eigenray_times, trace_ensemble
from .adjoint import (
    endpoint_time_gradients,
    fermat_jacobian,
    perturbation_response,
    travel_time_jacobian,
    travel_time_jacobian_2d,
)
from .amplitudes import Arrivals, arrival_amplitudes
from .response import (
    ArrayResponse,
    Response,
    array_response,
    impulse_response,
    received_waveform,
    synthesize_response,
    thorp_attenuation,
)
from .signals import msequence_code, msequence_signal
from .tlfield import TLField, transmission_loss_field
from .ray_objects import EigenRays, Ray, RayFan
from .ops.host import (
    bilinear_np,
    bottom_bounce,
    derivs_np,
    linear_np,
    ray_angle_np,
    ray_bounding_box_event,
    surface_bounce,
    vertical_ray,
)
from .ops.interp import bilinear_interp, linear_interp
from .utils.xrlite import DataArray, LiteDataArray

# reference-compatible kernel aliases (integration_processes.py:337-346)
derivsrd = derivs_np
ray_angle = ray_angle_np

__version__ = "0.1.0"

__all__ = [
    "OceanEnvironment2D",
    "munk_ssp",
    "eflat",
    "eflatinv",
    "flat_earth_c",
    "EnvData",
    "make_env_data",
    "with_spectral",
    "SolverSettings",
    "TraceResult",
    "DEATH_CODES",
    "trace",
    "shoot_ray",
    "shoot_rays",
    "settings_for",
    "find_eigenrays",
    "find_eigenrays_batch",
    "make_env_ensemble",
    "trace_ensemble",
    "mc_eigenray_times",
    "travel_time_jacobian",
    "travel_time_jacobian_2d",
    "fermat_jacobian",
    "endpoint_time_gradients",
    "perturbation_response",
    "Arrivals",
    "arrival_amplitudes",
    "Response",
    "ArrayResponse",
    "synthesize_response",
    "impulse_response",
    "array_response",
    "received_waveform",
    "thorp_attenuation",
    "msequence_code",
    "msequence_signal",
    "TLField",
    "transmission_loss_field",
    "Ray",
    "RayFan",
    "EigenRays",
    "bilinear_interp",
    "linear_interp",
    "bilinear_np",
    "linear_np",
    "derivs_np",
    "derivsrd",
    "ray_angle",
    "surface_bounce",
    "bottom_bounce",
    "vertical_ray",
    "ray_bounding_box_event",
    "ray_angle_np",
    "DataArray",
    "LiteDataArray",
]
