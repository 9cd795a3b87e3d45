"""Transmission-loss field demo: Munk channel convergence zones.

The classic ray-model deliverable: a TL(r, z) map of the deep sound
channel showing the insonified duct, caustic envelopes, and
convergence-zone focusing, from ONE traced fan + one forward-tangent
launch (`transmission_loss_field`).  The incoherent (flux) field gives
the smooth energy picture; the coherent (geometric-beam) field adds the
interference structure at a chosen frequency.

    python examples/tl_demo.py
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

OUT = pathlib.Path(__file__).parent


def main(smoke=False, outdir=None):
    out = pathlib.Path(outdir) if outdir is not None else OUT
    r_max = 30e3 if smoke else 120e3
    env = munk_env(r_max=r_max, nr=12 if smoke else 50,
                   nz=500 if smoke else 1200)
    angles = np.linspace(-13.0, 13.0, 301 if smoke else 2001)
    depths = np.linspace(0.0, 5000.0, 101 if smoke else 251)

    fld = pr.transmission_loss_field(
        1000.0, 0.0, angles, r_max, env,
        frequency=75.0, depths=depths,
        num_range=81 if smoke else 301, flatearth=False)

    # the duct must be insonified and TL must grow with range on axis
    axis = np.argmin(np.abs(depths - 1000.0))
    on_axis = fld.tl_incoherent[axis]
    finite = np.isfinite(on_axis)
    assert finite.mean() > 0.8, "sound channel axis not insonified"
    near = on_axis[finite][: finite.sum() // 4].mean()
    far = on_axis[finite][-finite.sum() // 4:].mean()
    assert far > near, "TL should increase with range along the axis"
    assert np.isfinite(fld.tl_coherent).any()

    fig, axes = plt.subplots(2, 1, figsize=(10, 7), sharex=True)
    fld.plot("incoherent", ax=axes[0], vmin=60, vmax=110)
    fld.plot("coherent", ax=axes[1], vmin=60, vmax=110)
    fig.tight_layout()
    fig.savefig(out / "tl_field.png", dpi=110)
    print(f"wrote {out / 'tl_field.png'}")
    print(f"on-axis TL: {near:.1f} dB (near) -> {far:.1f} dB (far)")


if __name__ == "__main__":
    main()
