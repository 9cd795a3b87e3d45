"""Classic tomography demo: Munk-profile ray fan, timefront, and eigenrays.

Reproduces the reference's quick-start workflow
(`/root/reference/docs/quick_start.md`) at TPU scale: a 4096-ray fan to
100 km, the timefront at the receiver range, and eigenrays at a vertical
receiver array.  Writes PNGs next to this script.

    python examples/timefront_demo.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import matplotlib

matplotlib.use("Agg")
from matplotlib import pyplot as plt

import pygenray_tpu as pr
from pygenray_tpu.models import munk_env
from pygenray_tpu.utils.profiling import Timer

OUT = pathlib.Path(__file__).parent


def main():
    env = munk_env(r_max=100e3, nr=50, nz=1200)
    angles = np.linspace(-14.0, 14.0, 4096)
    timer = Timer()

    with timer.phase("fan"):
        fan = pr.shoot_rays(
            1300.0, 0.0, angles, 100e3, 400, env, flatearth=False
        )

    plt.figure(figsize=(11, 5))
    fan[:: len(fan) // 128].plot_ray_fan()
    plt.savefig(OUT / "ray_fan.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    plt.figure(figsize=(7, 6))
    fan.plot_time_front()
    plt.savefig(OUT / "timefront.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    receiver_depths = np.linspace(600.0, 2200.0, 32)
    with timer.phase("eigenrays"):
        erays = pr.find_eigenrays(
            fan, receiver_depths, 1300.0, 0.0, 100e3, 400, env,
            ztol=1.0, flatearth=False,
        )

    found = sum(erays.num_eigenrays_found[i] for i in range(len(receiver_depths)))
    print(f"eigenrays found across {len(receiver_depths)} depths: {found}")

    plt.figure(figsize=(8, 5))
    erays.plot_angle_time(s=8)
    plt.savefig(OUT / "arrival_pattern.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    print(timer.report())


if __name__ == "__main__":
    main()
