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


def main(smoke=False, outdir=None):
    """``smoke=True`` shrinks every size for the test suite (the demos run
    as CI smoke tests, ``tests/test_examples.py``); ``outdir`` redirects
    the figures."""
    out = pathlib.Path(outdir) if outdir is not None else OUT
    r_max = 30e3 if smoke else 100e3
    env = munk_env(r_max=r_max, nr=12 if smoke else 50, nz=500 if smoke else 1200)
    angles = np.linspace(-14.0, 14.0, 256 if smoke else 4096)
    num_save = 100 if smoke else 400
    timer = Timer()

    with timer.phase("fan"):
        fan = pr.shoot_rays(
            1300.0, 0.0, angles, r_max, num_save, env, flatearth=False
        )

    plt.figure(figsize=(11, 5))
    fan[:: max(len(fan) // 128, 1)].plot_ray_fan()
    plt.savefig(out / "ray_fan.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    plt.figure(figsize=(7, 6))
    fan.plot_time_front()
    plt.savefig(out / "timefront.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    receiver_depths = np.linspace(600.0, 2200.0, 8 if smoke else 32)
    with timer.phase("eigenrays"):
        erays = pr.find_eigenrays(
            fan, receiver_depths, 1300.0, 0.0, r_max, num_save, env,
            ztol=1.0, flatearth=False,
        )

    found = sum(erays.num_eigenrays_found[i] for i in range(len(receiver_depths)))
    print(f"eigenrays found across {len(receiver_depths)} depths: {found}")
    assert found > 0, "timefront demo found no eigenrays"

    plt.figure(figsize=(8, 5))
    erays.plot_angle_time(s=8)
    plt.savefig(out / "arrival_pattern.png", dpi=120, bbox_inches="tight")
    plt.close("all")

    print(timer.report())


if __name__ == "__main__":
    main()
